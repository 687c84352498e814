"""Attribute cornell's 440s cold warmup: per-executable compile times."""
import os, sys, time
os.environ["TPU_RAY_CACHE_DIR"] = "0"   # force cold compiles
import jax
jax.config.update("jax_log_compiles", True)
sys.path.insert(0, "/root/repo")
from tpu_ray.models.scenes import SCENES
from tpu_ray.renderer import render, plan_pool, resolve_engine

spec = SCENES["cornell"]
t0 = time.perf_counter()
scene = spec.build(seed=1024)
camera = spec.camera(500, 500)
print(f"scene build {time.perf_counter()-t0:.2f}s", flush=True)
k_pool, s_wave, n_waves = plan_pool(scene, 500, 500, 1000, 1 << 20,
                                    engine=resolve_engine(scene, "auto"))
print(f"k_pool={k_pool} s_wave={s_wave} n_waves={n_waves}", flush=True)
t0 = time.perf_counter()
img = render(scene, camera, 500, 500, spp=k_pool, max_depth=50, seed=1024)
print(f"warmup render {time.perf_counter()-t0:.2f}s", flush=True)
t0 = time.perf_counter()
img = render(scene, camera, 500, 500, spp=k_pool, max_depth=50, seed=1024)
print(f"re-render {time.perf_counter()-t0:.2f}s", flush=True)
