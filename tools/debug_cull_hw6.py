"""Stage 6 (CPU): why does the cull drop lane 51828's winner block?

Recomputes the sort, finds the lane's sorted position/tile, and checks
whether the blocks containing the true winners (box 1406, quad 1517)
survive the tile's needed list; prints the slab numbers for that pair.
"""
from __future__ import annotations

import sys

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tpu_ray.models.scenes import SCENES
    from tpu_ray.ops import intersect_pallas as ip

    scene = SCENES["next-week-final"].build(seed=1024)
    R = 163840
    rng = np.random.default_rng(0)
    ro = jnp.asarray(rng.uniform(-50, 400, (R, 3)).astype(np.float32))
    rd = jnp.asarray(rng.normal(0, 1, (R, 3)).astype(np.float32))
    rt = jnp.asarray(rng.random(R).astype(np.float32))
    LANE = 51828

    print("n_sphere", scene.n_sphere, "n_box", scene.n_box,
          "n_solid", scene.n_solid, "n_sphere_static", scene.n_sphere_static)

    key = ip._sort_key(scene, ro, rd)
    _, idx = jax.lax.sort_key_val(key, jnp.arange(R, dtype=jnp.int32))
    idx_np = np.asarray(idx)
    pos = int(np.nonzero(idx_np == LANE)[0][0])
    tile = pos // ip.TILE_R
    print(f"lane {LANE} -> sorted pos {pos}, tile {tile}, "
          f"slot {pos % ip.TILE_R}")

    packed = jnp.concatenate(
        [ro, rd, rt[:, None], jnp.zeros((R, 1), jnp.float32)], axis=1)
    sp = jnp.take(packed, idx, axis=0)
    sro, srd = sp[:, 0:3], sp[:, 3:6]

    n_sb = scene.n_sphere + scene.n_box
    ranges = [
        ("box", scene.n_sphere, n_sb),
        ("quad", n_sb, scene.n_solid),
    ]
    winners = {"box": 1406, "quad": 1517}
    for flavor, lo, hi in ranges:
        pad = (-(hi - lo)) % ip.PBLK
        alo, ahi = ip._range_aabbs(scene, lo, hi, flavor)
        blo, bhi = ip._block_aabbs(alo, ahi, pad)
        cnt, lst = map(np.asarray,
                       ip._tile_lists(sro, srd, blo, bhi,
                                      float(scene.t_min)))
        w = winners[flavor]
        if not (lo <= w < hi):
            print(f"{flavor}: winner {w} outside range [{lo},{hi})")
            continue
        blk = (w - lo) // ip.PBLK
        in_list = blk in lst[tile, :cnt[tile, 0]].tolist()
        print(f"{flavor}: winner prim {w} -> local blk {blk}; "
              f"tile cnt={cnt[tile,0]} in_list={in_list} "
              f"list={lst[tile,:cnt[tile,0]].tolist()}")
        # slab numbers for this ray x block
        o = np.asarray(sro[pos])
        d = np.asarray(srd[pos])
        safe = np.where(np.abs(d) < 1e-30, np.where(d < 0, -1e-30, 1e-30), d)
        inv = 1.0 / safe
        lo3 = np.asarray(blo[blk])
        hi3 = np.asarray(bhi[blk])
        t0 = (lo3 - o) * inv
        t1 = (hi3 - o) * inv
        tn = np.minimum(t0, t1).max()
        tf = np.maximum(t0, t1).min()
        print(f"  slab: tn={tn} tf={tf} t_min={scene.t_min} "
              f"blo={lo3} bhi={hi3}")
        # prim AABB
        print(f"  prim aabb lo={np.asarray(alo[w - lo])} "
              f"hi={np.asarray(ahi[w - lo])}")

    # CPU interpret: sorted-vs-plain on the same rays, this lane only
    bt_p, bi_p = map(np.asarray, jax.jit(
        lambda a, b, c: ip.intersect_solids_pallas(
            scene, a, b, c, sort=False, interpret=True))(ro, rd, rt))
    bt_s, bi_s = map(np.asarray, jax.jit(
        lambda a, b, c: ip.intersect_solids_pallas(
            scene, a, b, c, sort=True, interpret=True))(ro, rd, rt))
    print(f"cpu interpret lane {LANE}: plain t={bt_p[LANE]!r} i={bi_p[LANE]} "
          f"sorted t={bt_s[LANE]!r} i={bi_s[LANE]}")
    bad = (bt_p != bt_s) | (bi_p != bi_s)
    print("cpu interpret total bad lanes:", int(bad.sum()),
          np.nonzero(bad)[0][:10])


if __name__ == "__main__":
    main()
