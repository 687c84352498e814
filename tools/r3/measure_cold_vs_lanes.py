"""Cold warmup vs pool lane count (fresh process per run).
Usage: measure_cold_vs_lanes.py RAYS_PER_WAVE [timed]"""
import os, sys, time
os.environ["TPU_RAY_CACHE_DIR"] = "0"
sys.path.insert(0, "/root/repo")
from tpu_ray.models.scenes import SCENES
from tpu_ray.renderer import render, plan_pool

rpw = int(sys.argv[1])
spec = SCENES["cornell"]
scene = spec.build(seed=1024)
camera = spec.camera(500, 500)
k_pool, s_wave, n_waves = plan_pool(scene, 500, 500, 1000, rpw)
print(f"rpw={rpw}: k_pool={k_pool} s_wave={s_wave} n_waves={n_waves}", flush=True)
t0 = time.perf_counter()
render(scene, camera, 500, 500, spp=k_pool, max_depth=50, seed=1024,
       rays_per_wave=rpw)
print(f"rpw={rpw}: warmup {time.perf_counter()-t0:.1f}s", flush=True)
if "timed" in sys.argv:
    t0 = time.perf_counter()
    render(scene, camera, 500, 500, spp=1000, max_depth=50, seed=1024,
           rays_per_wave=rpw)
    print(f"rpw={rpw}: full 1000spp render {time.perf_counter()-t0:.2f}s", flush=True)
