"""Multi-chip rendering over a JAX device mesh.

The reference's only parallelism is GHC sparks across the pixels of a row
(src/Lib.hs:1519-1520).  The TPU-native equivalent (SURVEY.md section 2.4):
sample waves are data-parallel - in every ROUND, device d renders one wave
whose key derives from the *global* wave index, and the D partial films are
combined with one ``psum`` over ICI.  The host loop over rounds lives in
the renderer (renderer.render), which gives the mesh path the same
progress reporting and checkpoint/resume as the single-device path: a
round is the unit of accumulation, and Monte-Carlo accumulation is
associative, so a killed multi-chip render resumes from its last
checkpointed round.  The image matches the single-device render with the
same seed and wave count up to f32 summation order.
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


def make_round_fn(wave_fn, mesh: Mesh):
    """One jitted mesh round: fn(keys (D,2), weights (D,), sample0s (D,))
    -> psum over the mesh of ``weights[d] * wave_fn(keys[d], sample0s[d])``
    (weight 0 pads the final round when the wave count doesn't divide D).
    """
    axis = mesh.axis_names[0]

    def body(keys_local, w_local, s0_local):
        return jax.lax.psum(
            w_local[0] * wave_fn(keys_local[0], s0_local[0]), axis)

    # check_vma=False: the while_loop carry in the integrator starts as
    # device-invariant zeros and becomes device-varying through the
    # per-device keys; the automatic varying-manual-axes check cannot
    # express that.
    return jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(P(axis), P(axis), P(axis)), out_specs=P(),
        check_vma=False,
    ))
