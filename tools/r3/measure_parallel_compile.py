"""Does the axon backend compile independent executables concurrently?
Compiles the cornell pool body at 3 lane counts, parallel vs serial.
Usage: measure_parallel_compile.py {parallel|serial}"""
import os, sys, time
os.environ["TPU_RAY_CACHE_DIR"] = "0"
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import tpu_ray.integrator as integ
integ.COMPACT_MIN = 1 << 30      # plain single-run body, no in-jit ladder
from tpu_ray.models.scenes import SCENES
from tpu_ray.integrator import trace_pool

spec = SCENES["cornell"]
scene = spec.build(seed=1024)
camera = spec.camera(500, 500)

def make(R):
    def fn(key):
        s = jnp.zeros((R,), jnp.float32)
        t = jnp.zeros((R,), jnp.float32)
        acc, _ = trace_pool(scene, camera, s, t, (1/500., 1/500.), key,
                            jnp.int32(1), jnp.uint32(0), 50,
                            slot_ids=jnp.arange(R, dtype=jnp.uint32),
                            shade="fused")
        return acc
    return jax.jit(fn)

Rs = [1 << 20, 1 << 17, 1 << 14]
key = jax.random.PRNGKey(0)
# force backend init before timing
jnp.zeros(8).block_until_ready()
t0 = time.perf_counter()
if sys.argv[1] == "parallel":
    from concurrent.futures import ThreadPoolExecutor
    def compile_one(R):
        t = time.perf_counter()
        c = make(R).lower(key).compile()
        print(f"R={R}: {time.perf_counter()-t:.1f}s", flush=True)
        return c
    with ThreadPoolExecutor(3) as ex:
        list(ex.map(compile_one, Rs))
else:
    for R in Rs:
        t = time.perf_counter()
        make(R).lower(key).compile()
        print(f"R={R}: {time.perf_counter()-t:.1f}s", flush=True)
print(f"TOTAL {sys.argv[1]}: {time.perf_counter()-t0:.1f}s", flush=True)
