"""Warm-cache warmup anatomy: trace / compile(cache load) / first run."""
import sys, time
sys.path.insert(0, "/root/repo")
T0 = time.perf_counter()
from tpu_ray.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
jnp.zeros(4).block_until_ready()
print(f"backend init+imports: {time.perf_counter()-T0:.1f}s", flush=True)
from tpu_ray.models.scenes import SCENES
from tpu_ray.renderer import _pool_step, plan_pool, resolve_engine
from tpu_ray.integrator import _use_fused_shading

t0 = time.perf_counter()
spec = SCENES["cornell"]
scene = spec.build(seed=1024)
camera = spec.camera(500, 500)
print(f"scene build: {time.perf_counter()-t0:.2f}s", flush=True)
engine = resolve_engine(scene, "auto")
k_pool, s_wave, n_waves = plan_pool(scene, 500, 500, 1000, 1 << 20, engine=engine)
shade = "fused" if _use_fused_shading(scene, None, engine) else "xla"
accum = jnp.zeros((500, 500, 3), jnp.float32)
key = jax.random.PRNGKey(0)
t0 = time.perf_counter()
lowered = _pool_step.lower(accum, scene, camera, key, 500, 500, k_pool,
                           jnp.int32(1), jnp.uint32(0), 50, jnp.uint32(1024),
                           engine, None, 0, 500, shade, 0)
print(f"trace+lower: {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
compiled = lowered.compile()
print(f"compile (warm cache): {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
out = compiled(jnp.zeros((500, 500, 3), jnp.float32), scene, camera, key,
               jnp.int32(1), jnp.uint32(0), jnp.uint32(1024), None)
out.block_until_ready()
print(f"first run: {time.perf_counter()-t0:.1f}s", flush=True)
