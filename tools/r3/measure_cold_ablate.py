"""Cold-warmup ablation: which piece costs the ~600s server-side compile?
Usage: measure_cold_ablate.py [noladder] [noshade]"""
import os, sys, time
os.environ["TPU_RAY_CACHE_DIR"] = "0"
if "noshade" in sys.argv:
    os.environ["TPU_RAY_SHADE"] = "off"
sys.path.insert(0, "/root/repo")
import tpu_ray.integrator as integ
if "noladder" in sys.argv:
    integ.COMPACT_MIN = 1 << 30   # disables compaction levels entirely
from tpu_ray.models.scenes import SCENES
from tpu_ray.renderer import render

spec = SCENES["cornell"]
scene = spec.build(seed=1024)
camera = spec.camera(500, 500)
t0 = time.perf_counter()
img = render(scene, camera, 500, 500, spp=4, max_depth=50, seed=1024)
print(f"ARGS={sys.argv[1:]} warmup {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
img = render(scene, camera, 500, 500, spp=4, max_depth=50, seed=1024)
print(f"re-render {time.perf_counter()-t0:.2f}s", flush=True)
