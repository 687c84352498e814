"""Cornell full-render cost with/without the tiny-scene ladder (warm cache)."""
import os, sys, time
sys.path.insert(0, "/root/repo")
from tpu_ray.utils.cache import enable_compilation_cache
enable_compilation_cache()
import tpu_ray.integrator as integ
if "noladder" in sys.argv:
    integ.COMPACT_MIN = 1 << 30
from tpu_ray.models.scenes import SCENES
from tpu_ray.renderer import render, clear_auto_checkpoints

spec = SCENES["cornell"]
scene = spec.build(seed=1024)
camera = spec.camera(500, 500)
t0 = time.perf_counter()
render(scene, camera, 500, 500, spp=4, max_depth=50, seed=1024)
print(f"{sys.argv[1:]}: warmup {time.perf_counter()-t0:.1f}s", flush=True)
clear_auto_checkpoints()
for rep in range(2):
    t0 = time.perf_counter()
    render(scene, camera, 500, 500, spp=1000, max_depth=50, seed=1024)
    print(f"{sys.argv[1:]}: full 1000spp {time.perf_counter()-t0:.2f}s", flush=True)
