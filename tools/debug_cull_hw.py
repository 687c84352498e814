"""Bisect the hardware mismatch of the sorted+culled sweep.

Stages:
  mask   - compare _needed_mask on TPU vs CPU-golden (pure XLA)
  ones   - run the culled kernel with needed forced all-ones vs plain
  real   - run the culled kernel with the real mask vs plain + report
           whether mismatched lanes sit in skipped blocks
"""
from __future__ import annotations

import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tpu_ray.models.scenes import SCENES
    from tpu_ray.ops import intersect_pallas as ip

    print("device:", jax.devices()[0], file=sys.stderr)
    scene = SCENES["next-week-final"].build(seed=1024)
    R = 4096
    rng = np.random.default_rng(0)
    ro = jnp.asarray(rng.uniform(-50, 400, (R, 3)).astype(np.float32))
    rd = jnp.asarray(rng.normal(0, 1, (R, 3)).astype(np.float32))
    rt = jnp.asarray(rng.random(R).astype(np.float32))
    rt2 = rt[:, None]

    # --- stage: mask (sphere range only) ---
    lo, hi = 0, scene.n_sphere_static
    pad = (-(hi - lo)) % ip.PBLK

    def mask_fn(ro, rd):
        alo, ahi = ip._range_aabbs(scene, lo, hi, "sphere")
        blo, bhi = ip._block_aabbs(alo, ahi, pad)
        return ip._needed_mask(ro, rd, blo, bhi, float(scene.t_min))

    m_dev = np.asarray(jax.jit(mask_fn)(ro, rd))
    with jax.default_device(jax.devices("cpu")[0]):
        m_cpu = np.asarray(jax.jit(mask_fn)(ro, rd))
    print("mask: tpu==cpu:", np.array_equal(m_dev, m_cpu),
          "tpu needed frac", m_dev.mean(), "cpu", m_cpu.mean())

    # --- stage: plain vs cull-all-ones vs cull-real, sphere range only ---
    def sweep(ro, rd, rt2, cull, force_ones=False):
        if not cull:
            return ip._sweep_range(scene, ro, rd, rt2, lo, hi, "sphere",
                                   False, moving=False, cull=False)
        if force_ones:
            orig = ip._needed_mask
            ip._needed_mask = lambda *a, **k: jnp.ones_like(orig(*a, **k))
            try:
                out = ip._sweep_range(scene, ro, rd, rt2, lo, hi, "sphere",
                                      False, moving=False, cull=True)
            finally:
                ip._needed_mask = orig
            return out
        return ip._sweep_range(scene, ro, rd, rt2, lo, hi, "sphere",
                               False, moving=False, cull=True)

    bt_p, bi_p = jax.jit(lambda a, b, c: sweep(a, b, c, False))(ro, rd, rt2)
    bt_1, bi_1 = jax.jit(lambda a, b, c: sweep(a, b, c, True, True))(ro, rd, rt2)
    bt_c, bi_c = jax.jit(lambda a, b, c: sweep(a, b, c, True))(ro, rd, rt2)
    bt_p, bi_p, bt_1, bi_1, bt_c, bi_c = map(
        np.asarray, (bt_p, bi_p, bt_1, bi_1, bt_c, bi_c))
    print("ones == plain:", np.array_equal(bt_p, bt_1),
          np.array_equal(bi_p, bi_1))
    print("real == plain:", np.array_equal(bt_p, bt_c),
          np.array_equal(bi_p, bi_c))
    bad = bt_p != bt_c
    print(f"mismatched lanes {bad.sum()}/{R}")
    if bad.any():
        # are the mismatches explained by wrongly-skipped blocks?
        tiles = np.nonzero(bad)[0] // ip.TILE_R
        hit_blk = np.where(np.isfinite(bt_p), bi_p // ip.PBLK, -1)
        wrong_skip = 0
        for lane in np.nonzero(bad)[0][:50]:
            b = hit_blk[lane]
            if b >= 0 and m_dev[lane // ip.TILE_R, b] == 0:
                wrong_skip += 1
        print(f"of first {min(50, bad.sum())} mismatches, {wrong_skip} are "
              f"lanes whose true hit block was masked off")
        print("example tiles:", sorted(set(tiles.tolist()))[:8])


if __name__ == "__main__":
    main()
