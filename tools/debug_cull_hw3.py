"""Stage 3 bisect at full R: sort plumbing vs mask vs kernels.

  1) is idx a permutation?
  2) pack/sort/unsort roundtrip (no kernel) exact?
  3) plain sweep on sorted rays + unsort == plain on original rays?
  4) needed mask / tile lists: TPU vs CPU process golden
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
    R = 163840
    rng = np.random.default_rng(0)
    ro = jnp.asarray(rng.uniform(-50, 400, (R, 3)).astype(np.float32))
    rd = jnp.asarray(rng.normal(0, 1, (R, 3)).astype(np.float32))
    rt = jnp.asarray(rng.random(R).astype(np.float32))

    @jax.jit
    def sortu(ro, rd, rt):
        key = ip._sort_key(scene, ro, rd)
        _, idx = jax.lax.sort_key_val(key, jnp.arange(R, dtype=jnp.int32))
        packed = jnp.concatenate(
            [ro, rd, rt[:, None], jnp.zeros((R, 1), jnp.float32)], axis=1)
        sp = jnp.take(packed, idx, axis=0)
        inv = jnp.zeros((R,), jnp.int32).at[idx].set(
            jnp.arange(R, dtype=jnp.int32))
        back = jnp.take(sp, inv, axis=0)
        return key, idx, sp, back

    key, idx, sp, back = sortu(ro, rd, rt)
    idx_np = np.asarray(idx)
    print("1) idx is permutation:",
          np.array_equal(np.sort(idx_np), np.arange(R)))
    packed_np = np.concatenate(
        [np.asarray(ro), np.asarray(rd), np.asarray(rt)[:, None],
         np.zeros((R, 1), np.float32)], axis=1)
    print("2) roundtrip exact:",
          np.array_equal(np.asarray(back), packed_np))
    # also: does device-sorted packed equal numpy-applied permutation?
    print("2b) gather matches numpy:",
          np.array_equal(np.asarray(sp), packed_np[idx_np]))

    # 3) plain sweep on sorted rays, unsorted back
    @jax.jit
    def plain(ro, rd, rt):
        return ip.intersect_solids_pallas(scene, ro, rd, rt, sort=False)

    @jax.jit
    def plain_on_sorted(ro, rd, rt):
        key = ip._sort_key(scene, ro, rd)
        _, idx = jax.lax.sort_key_val(key, jnp.arange(R, dtype=jnp.int32))
        packed = jnp.concatenate(
            [ro, rd, rt[:, None], jnp.zeros((R, 1), jnp.float32)], axis=1)
        sp = jnp.take(packed, idx, axis=0)
        bt, bi = ip.intersect_solids_pallas(
            scene, sp[:, 0:3], sp[:, 3:6], sp[:, 6], sort=False)
        inv = jnp.zeros((R,), jnp.int32).at[idx].set(
            jnp.arange(R, dtype=jnp.int32))
        out = jnp.stack(
            [bt, jax.lax.bitcast_convert_type(bi, jnp.float32)], axis=1)
        out = jnp.take(out, inv, axis=0)
        return out[:, 0], jax.lax.bitcast_convert_type(out[:, 1], jnp.int32)

    bt0, bi0 = map(np.asarray, plain(ro, rd, rt))
    bt1, bi1 = map(np.asarray, plain_on_sorted(ro, rd, rt))
    h = np.isfinite(bt0)
    print("3) plain-on-sorted == plain: hit",
          np.array_equal(h, np.isfinite(bt1)),
          "t", np.array_equal(bt0[h], bt1[h]),
          "i", np.array_equal(bi0[h], bi1[h]),
          f"({(~np.isclose(bt0, bt1, equal_nan=True)).sum()} t-lanes differ)")

    # 4) mask + lists vs CPU
    lo, hi = 0, scene.n_sphere_static
    pad = (-(hi - lo)) % ip.PBLK

    def lists_fn(ro, rd):
        alo, ahi = ip._range_aabbs(scene, lo, hi, "sphere")
        blo, bhi = ip._block_aabbs(alo, ahi, pad)
        return ip._tile_lists(ro, rd, blo, bhi, float(scene.t_min))

    sro = sp[:, 0:3]
    srd = sp[:, 3:6]
    c_dev, l_dev = map(np.asarray, jax.jit(lists_fn)(sro, srd))
    with jax.default_device(jax.devices("cpu")[0]):
        c_cpu, l_cpu = map(np.asarray, jax.jit(lists_fn)(sro, srd))
    print("4) lists: cnt eq", np.array_equal(c_dev, c_cpu),
          "lst eq", np.array_equal(l_dev, l_cpu),
          "mean needed frac", c_dev.mean() / l_dev.shape[1])


if __name__ == "__main__":
    main()
