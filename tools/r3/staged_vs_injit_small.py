"""Did the staged ladder regress small scenes?  Time the pool integrator
both ways (staged eager-dispatch ladder vs the single in-jit program) on
two-spheres' exact bench config, warm executables, readback-proved
completion (PERFLOG: block_until_ready through the tunnel returns early).
"""
import sys, time
sys.path.insert(0, "/root/repo")
from tpu_ray.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
import numpy as np
from tpu_ray.models.scenes import SCENES
from tpu_ray.renderer import (plan_pool, resolve_engine, _pixel_grid,
                              _slot_ids, _film_add)
from tpu_ray.integrator import trace_pool, trace_pool_staged, _use_fused_shading

spec = SCENES["two-spheres"]
scene = spec.build(seed=1024)
W, H, SPP = 600, 400, 100
camera = spec.camera(W, H)
engine = resolve_engine(scene, "auto")
k_pool, s_wave, n_waves = plan_pool(scene, W, H, SPP, 1 << 20, engine=engine)
print(f"k_pool={k_pool} s_wave={s_wave} n_waves={n_waves} engine={engine}")
fused = _use_fused_shading(scene, None, engine)
shade = "fused" if fused else "xla"
xs, ys = _pixel_grid(W, H, k_pool)
sids = _slot_ids(W, H, k_pool)
key = jax.random.fold_in(jax.random.PRNGKey(1024), 0)
ns = jnp.int32(s_wave)

injit = jax.jit(lambda k: trace_pool(
    scene, camera, xs, ys, (1.0 / W, 1.0 / H), k, ns, jnp.uint32(0), 50,
    cam_salt=jnp.uint32(1024), engine=engine, slot_ids=sids, shade=shade)[0])

def run_staged(k):
    rad, _ = trace_pool_staged(
        scene, camera, xs, ys, (1.0 / W, 1.0 / H), k, ns, jnp.uint32(0), 50,
        cam_salt=jnp.uint32(1024), engine=engine, slot_ids=sids, shade=shade)
    return rad

# warm both
np.asarray(injit(key)).sum()
np.asarray(run_staged(key)).sum()

for label, fn in [("in-jit", injit), ("staged", run_staged),
                  ("in-jit", injit), ("staged", run_staged)]:
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        r = fn(key)
        s = float(np.asarray(r).sum())  # readback proves completion
        ts.append(time.perf_counter() - t0)
    print(f"{label}: min {min(ts)*1e3:.1f} ms  med {sorted(ts)[2]*1e3:.1f} ms  sum={s:.3f}")
