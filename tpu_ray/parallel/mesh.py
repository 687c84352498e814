"""Multi-chip rendering over a JAX device mesh.

The reference's only parallelism is GHC sparks across the pixels of a row
(src/Lib.hs:1519-1520).  The TPU-native equivalent (SURVEY.md section 2.4):
sample waves are data-parallel - device d renders waves d, d+D, ... with
keys derived from the *global* wave index, partial films are summed locally
with ``lax.scan`` and combined with one ``psum`` over ICI at the end.  The
image is therefore bit-identical (up to float summation order) to the
single-device render with the same seed and wave count.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "d") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def render_sharded(wave_fn, n_waves: int, s_wave: int, base_key, mesh: Mesh,
                   out_shape):
    """Sum ``wave_fn(fold_in(base_key, w), w * s_wave)`` for w in
    [0, n_waves) over the mesh (keys/sample offsets come from the *global*
    wave index, so the image matches the single-device render)."""
    d = mesh.devices.size
    n_pad = -(-n_waves // d) * d
    keys = jax.vmap(lambda i: jax.random.fold_in(base_key, i))(jnp.arange(n_pad))
    weights = (jnp.arange(n_pad) < n_waves).astype(jnp.float32)
    sample0s = (jnp.arange(n_pad) * s_wave).astype(jnp.uint32)

    def body(keys_local, w_local, s0_local):
        def step(acc, kws):
            key, wt, s0 = kws
            return acc + wt * wave_fn(key, s0), None

        acc, _ = jax.lax.scan(
            step, jnp.zeros(out_shape, jnp.float32), (keys_local, w_local, s0_local)
        )
        return jax.lax.psum(acc, "d")

    # check_vma=False: the while_loop carry in the integrator starts as
    # device-invariant zeros and becomes device-varying through the per-device
    # keys; the automatic varying-manual-axes check cannot express that.
    fn = jax.shard_map(
        body, mesh=mesh, in_specs=(P("d"), P("d"), P("d")), out_specs=P(),
        check_vma=False,
    )
    return jax.jit(fn)(keys, weights, sample0s)
