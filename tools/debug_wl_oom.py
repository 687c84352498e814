"""Compile-only probe for the worklist-mode OOM (adaptive sampling).

The first adaptive cornell run (500x500, pilot 32: R=1M lanes, pad=8.4M
items, L=64M log rows) failed AOT compile with a 32 GB allocation:
``f32[67108864,3]{1,0:T(8,128)} output of copy.3`` - the (L, 3) radiance
log column-padded 3->128 by a copy.  The plain next-week queue (R=390k,
total=16M, L=128M) compiles and runs, so something about the new shapes
or the worklist gather flips the layout.  This probe lowers + compiles
_queue_epoch for a grid of (R, total, L, worklist?) WITHOUT running it
and prints peak memory or the compile error.

    python tools/debug_wl_oom.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from tpu_ray.integrator import WL_SAMP_BITS, _queue_epoch, _QueueState
from tpu_ray.models.scenes import SCENES


def probe(scene, camera, W, H, R, total, L, use_wl, engine, fused):
    st = _QueueState(
        iteration=jnp.int32(0), frontier=jnp.int32(0),
        origin=jnp.zeros((R, 3), jnp.float32),
        direction=jnp.ones((R, 3), jnp.float32),
        time=jnp.zeros((R,), jnp.float32),
        throughput=jnp.ones((R, 3), jnp.float32),
        accum=jnp.zeros((R, 3), jnp.float32),
        bounce=jnp.zeros((R,), jnp.int32),
        work=jnp.full((R,), total, jnp.int32),
        active=jnp.zeros((R,), bool),
        plane=tuple(jnp.zeros((total,), jnp.float32) for _ in range(3)),
        log=jnp.zeros((L, 3), jnp.float32),
        posmap=jnp.full((total,), -1, jnp.int32),
        cursor=jnp.int32(0),
    )
    wl = (jnp.zeros((total,), jnp.uint32) if use_wl else None)
    key = jax.random.PRNGKey(0)
    try:
        lowered = _queue_epoch.lower(
            st, scene, camera, jax.random.fold_in(key, 0),
            jax.random.fold_in(key, 1), jnp.uint32(0), jnp.uint32(0),
            jnp.int32(total), R, 16, 0, W, H, engine, fused, 50, 0,
            worklist=wl)
        comp = lowered.compile()
        ma = comp.memory_analysis()
        peak = getattr(ma, "temp_size_in_bytes", None)
        out = getattr(ma, "output_size_in_bytes", None)
        arg = getattr(ma, "argument_size_in_bytes", None)
        print(f"R={R:>9,} total={total:>11,} L={L:>11,} wl={int(use_wl)}"
              f"  OK  temp={peak and peak/1e9:.2f}GB"
              f" out={out and out/1e9:.2f}GB arg={arg and arg/1e9:.2f}GB")
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:160]
        print(f"R={R:>9,} total={total:>11,} L={L:>11,} wl={int(use_wl)}"
              f"  FAIL  {msg}")


def main() -> int:
    spec = SCENES["cornell"]
    scene = spec.build(seed=1024)
    W = H = 500
    cam = spec.camera(W, H)
    engine, fused = "xla", True

    cases = [
        # (R, total, L, use_wl)
        (1 << 20, 8_388_608, 1 << 26, True),    # the failing adaptive round
        (1 << 20, 8_388_608, 1 << 26, False),   # same shapes, no worklist
        (393_216, 16_000_000, 1 << 27, False),  # ~ next-week plain (works)
        (393_216, 16_000_000, 1 << 27, True),   # ~ next-week + worklist
        (1 << 20, 8_388_608, 1 << 23, True),    # small log
        (393_216, 8_388_608, 1 << 26, True),    # small pool, big log
    ]
    for c in cases:
        probe(scene, cam, W, H, *c, engine, fused)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
