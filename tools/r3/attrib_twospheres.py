"""Attribute the two-spheres 0.33s dispatch floor: per-stage device time
of the one staged wave (block_until_ready between phases)."""
import sys, time
sys.path.insert(0, "/root/repo")
from tpu_ray.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
import numpy as np
from tpu_ray.models.scenes import SCENES
from tpu_ray.renderer import (render, plan_pool, resolve_engine,
                              _pixel_grid, _slot_ids, _film_add,
                              clear_auto_checkpoints)
from tpu_ray.integrator import (_pool_levels, _pool_stage_first,
                                _pool_level, _use_fused_shading)

spec = SCENES["two-spheres"]
scene = spec.build(seed=1024)
W, H, SPP = 600, 400, 100
camera = spec.camera(W, H)
engine = resolve_engine(scene, "auto")
k_pool, s_wave, n_waves = plan_pool(scene, W, H, SPP, 1 << 20, engine=engine)
print(f"k_pool={k_pool} s_wave={s_wave} n_waves={n_waves} engine={engine}")
# warm everything
render(scene, camera, W, H, spp=SPP, max_depth=50, seed=1024)
clear_auto_checkpoints()
# end-to-end reference
for _ in range(3):
    t0 = time.perf_counter()
    render(scene, camera, W, H, spp=SPP, max_depth=50, seed=1024)
    print(f"full render: {time.perf_counter()-t0:.3f}s")
# phase attribution of one wave
fused = _use_fused_shading(scene, None, engine)
xs, ys = _pixel_grid(W, H, k_pool)
sids = _slot_ids(W, H, k_pool)
R = xs.shape[0]
levels = _pool_levels(R, scene.n_prims)
print("levels:", levels)
key = jax.random.fold_in(jax.random.PRNGKey(1024), 0)
ns = jnp.int32(s_wave)
common = dict()
def tick(label, t0):
    print(f"  {label}: {(time.perf_counter()-t0)*1e3:.1f} ms")
for rep in range(2):
    print(f"wave rep {rep}:")
    t0 = time.perf_counter()
    st = _pool_stage_first(scene, camera, xs, ys, sids, key, ns,
                           jnp.uint32(0), jnp.uint32(1024),
                           jnp.int32(levels[0] if levels else 0),
                           1.0/W, 1.0/H, 50, engine, fused, 0, None)
    jax.block_until_ready(st)
    tick(f"stage_first R={R}", t0)
    accum, sample = st.accum, st.sample
    gids = jnp.arange(R, dtype=jnp.int32)
    for li, m in enumerate(levels):
        nxt = jnp.int32(levels[li+1] if li+1 < len(levels) else 0)
        t0 = time.perf_counter()
        st, gids, accum, sample = _pool_level(
            st, gids, accum, sample, scene, camera, xs, ys, sids, key, ns,
            jnp.uint32(0), jnp.uint32(1024), nxt, m,
            1.0/W, 1.0/H, 50, engine, fused, 0, None)
        jax.block_until_ready(st)
        tick(f"level m={m} (compact+stage+fold)", t0)
    t0 = time.perf_counter()
    film = _film_add(jnp.zeros((H, W, 3), jnp.float32), accum, k_pool, H, W)
    np.asarray(film)
    tick("film_add + fetch", t0)
