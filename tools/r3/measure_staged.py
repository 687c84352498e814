"""Staged-ladder cold/render measurement (cache optionally off)."""
import os, sys, time
if "cold" in sys.argv:
    os.environ["TPU_RAY_CACHE_DIR"] = "0"
sys.path.insert(0, "/root/repo")
if "cold" not in sys.argv:
    from tpu_ray.utils.cache import enable_compilation_cache
    enable_compilation_cache()
from tpu_ray.models.scenes import SCENES
from tpu_ray.renderer import render, clear_auto_checkpoints

cfg = sys.argv[1]
W, H, SPP = dict(cornell=(500,500,1000), book1=(600,400,100),
                 twospheres=(600,400,100))[cfg]
scene_name = dict(cornell="cornell", book1="book1-final",
                  twospheres="two-spheres")[cfg]
spec = SCENES[scene_name]
t0 = time.perf_counter()
scene = spec.build(seed=1024)
camera = spec.camera(W, H)
print(f"build {time.perf_counter()-t0:.1f}s", flush=True)
from tpu_ray.renderer import plan_pool, resolve_engine
k_pool, s_wave, n_waves = plan_pool(scene, W, H, SPP, 1 << 20,
                                    engine=resolve_engine(scene, "auto"))
t0 = time.perf_counter()
render(scene, camera, W, H, spp=k_pool, max_depth=50, seed=1024)
print(f"{cfg} {sys.argv[2:]}: warmup {time.perf_counter()-t0:.1f}s", flush=True)
clear_auto_checkpoints()
for rep in range(2):
    t0 = time.perf_counter()
    render(scene, camera, W, H, spp=SPP, max_depth=50, seed=1024)
    print(f"{cfg} {sys.argv[2:]}: full {SPP}spp {time.perf_counter()-t0:.2f}s", flush=True)
