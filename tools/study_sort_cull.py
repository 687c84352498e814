"""Potential study: would sorting rays between bounces make per-tile
block culling fire?

Round-2 hardware data (PERFLOG.md) showed per-tile AABB culling is a
wash-to-loss because a 256-ray tile of bounced rays virtually never
agrees to skip a 128-prim block.  Sorting the pool by a direction/origin
key between bounces could restore tile coherence - but the sort itself
costs gathers, so before burning tunnel compiles this script measures
the CEILING: on real steady-state pool waves (captured by simulating the
pool body on CPU), what fraction of (tile, block) slab tests would be
skipped under each candidate ordering?

    python tools/study_sort_cull.py --scene next-week-final --rays 65536

Skip semantics mirror ops/intersect.py's chunk cull (entry tn with
relative slack cannot beat min(tf, best_t)), evaluated per 256-ray tile
per 128-prim block, both with best_t = final hit t (optimistic: perfect
front-to-back accumulation) and best_t = INF (pessimistic: first block).
"""
from __future__ import annotations

import argparse
import sys

import numpy as np


def _prim_aabbs(p) -> tuple[np.ndarray, np.ndarray]:
    """Per-prim conservative AABB (motion union over t in [0,1])."""
    kind = np.asarray(p.kind)
    n = kind.shape[0]
    lo = np.full((n, 3), np.inf, np.float64)
    hi = np.full((n, 3), -np.inf, np.float64)
    c = np.asarray(p.center, np.float64)
    v = np.asarray(p.velocity, np.float64)
    t0 = np.asarray(p.time0, np.float64)[:, None]
    r = np.asarray(p.radius, np.float64)[:, None]
    c0 = c + v * (0.0 - t0)
    c1 = c + v * (1.0 - t0)
    sph = kind == 0
    lo[sph] = (np.minimum(c0, c1) - r)[sph]
    hi[sph] = (np.maximum(c0, c1) + r)[sph]
    box = kind == 1
    lo[box] = np.asarray(p.box_min, np.float64)[box]
    hi[box] = np.asarray(p.box_max, np.float64)[box]
    quad = kind == 2
    p0 = np.asarray(p.quad_p0, np.float64)
    e1 = np.asarray(p.quad_e1, np.float64)
    e2 = np.asarray(p.quad_e2, np.float64)
    corners = np.stack([p0, p0 + e1, p0 + e2, p0 + e1 + e2])  # (4, N, 3)
    lo[quad] = corners.min(0)[quad]
    hi[quad] = corners.max(0)[quad]
    return lo, hi


def _block_aabbs(scene, blk: int):
    """AABBs of the Pallas sweep's 128-prim blocks, per kind range."""
    lo, hi = _prim_aabbs(scene.prims)
    ranges = [
        (0, int(scene.n_sphere), "sphere"),
        (int(scene.n_sphere), int(scene.n_sphere) + int(scene.n_box), "box"),
        (int(scene.n_sphere) + int(scene.n_box), int(scene.n_solid), "quad"),
    ]
    blos, bhis = [], []
    for a, b, _name in ranges:
        for s in range(a, b, blk):
            e = min(s + blk, b)
            blos.append(lo[s:e].min(0))
            bhis.append(hi[s:e].max(0))
    return np.stack(blos), np.stack(bhis)


def _morton(x: np.ndarray, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """30-bit Morton code of points in the scene box (10 bits/axis)."""
    q = np.clip((x - lo) / np.maximum(hi - lo, 1e-9), 0, 0.999999)
    q = (q * 1024).astype(np.uint64)

    def spread(v):
        v = (v | (v << 16)) & np.uint64(0x030000FF)
        v = (v | (v << 8)) & np.uint64(0x0300F00F)
        v = (v | (v << 4)) & np.uint64(0x030C30C3)
        v = (v | (v << 2)) & np.uint64(0x09249249)
        return v

    return (spread(q[:, 0]) << np.uint64(2)) | (spread(q[:, 1]) << np.uint64(1)) \
        | spread(q[:, 2])


def tile_skip_fraction(ro, rd, bt, blo, bhi, tile: int, t_min: float):
    """Fraction of (tile, block) pairs every ray in the tile agrees to skip."""
    R = ro.shape[0]
    R -= R % tile
    ro, rd, bt = ro[:R], rd[:R], bt[:R]
    inv = 1.0 / np.where(np.abs(rd) < 1e-30, 1e-30, rd)
    # (R, B, 3) slab — vectorized, f64 host math
    t0 = (blo[None] - ro[:, None]) * inv[:, None]
    t1 = (bhi[None] - ro[:, None]) * inv[:, None]
    tn = np.minimum(t0, t1).max(-1)
    tf = np.maximum(t0, t1).min(-1)
    slack = 1e-4 * (1.0 + np.abs(tn))
    needed = (tn - slack <= np.minimum(tf, bt[:, None])) & (tf > t_min)
    needed = needed.reshape(R // tile, tile, -1).any(1)  # (T, B)
    return 1.0 - needed.mean()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="next-week-final")
    ap.add_argument("--rays", type=int, default=65536)
    ap.add_argument("--iters", type=int, default=14)
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--blk", type=int, default=128)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tpu_ray.models.scenes import SCENES
    from tpu_ray.ops.intersect import intersect_scene
    from tpu_ray.ops.scatter import scatter
    from tpu_ray.core import vec

    spec = SCENES[args.scene]
    scene = spec.build(seed=1024)
    cam = spec.camera(400, 400)
    R = args.rays
    print(f"{args.scene}: {scene.n_prims} prims, n_solid={scene.n_solid}, "
          f"pool {R} lanes", file=sys.stderr)

    @jax.jit
    def step(carry, k):
        ro, rd, rt = carry
        ids = jnp.arange(R, dtype=jnp.uint32)
        rec = intersect_scene(scene, ro, rd, rt, jax.random.fold_in(k, 0),
                              lane_ids=ids)
        sc = scatter(scene, jax.random.fold_in(k, 1), rd, rec, ids)
        cont = rec.hit & sc.scattered
        # regen dead lanes with fresh camera rays at random pixels
        u = jax.random.uniform(jax.random.fold_in(k, 2), (R, 5))
        nro, nrd, nrt = cam.rays_from_uniforms(u[:, 0], u[:, 1], u[:, 2:5])
        ro2 = vec.where3(cont, rec.point, nro)
        rd2 = vec.where3(cont, sc.direction, nrd)
        rt2 = jnp.where(cont, rt, nrt)
        return (ro2, rd2, rt2), (ro, rd, rec.t, rec.hit, cont)

    key = jax.random.PRNGKey(7)
    u = jax.random.uniform(key, (R, 5))
    carry = cam.rays_from_uniforms(u[:, 0], u[:, 1], u[:, 2:5])
    snaps = []
    for i in range(args.iters):
        carry, snap = step(carry, jax.random.fold_in(key, i))
        snaps.append(jax.tree_util.tree_map(np.asarray, snap))

    blo, bhi = _block_aabbs(scene, args.blk)
    slo, shi = blo.min(0), bhi.max(0)
    print(f"{blo.shape[0]} blocks of {args.blk}", file=sys.stderr)

    t_min = float(scene.t_min)

    def okey(ro, rd):
        """The winning sort key: 3-bit octant major, origin morton minor."""
        oct_ = ((rd[:, 0] < 0) * 4 + (rd[:, 1] < 0) * 2 +
                (rd[:, 2] < 0)).astype(np.uint64)
        return (oct_ << np.uint64(30)) | _morton(ro.astype(np.float64),
                                                 slo, shi)

    # stale-key test: permute iteration i's rays by the key computed from
    # the SAME lanes' state at iteration i-1 (a pipelined sort would use
    # exactly this).  Lanes that regenerated between i-1 and i carry an
    # unrelated key - that miss-grouping is part of what we measure.
    print("stale-key (sort by iter i-1's octant+omorton, eval at iter i):")
    for i in (1, 3, 6, 9, args.iters - 1):
        if i >= len(snaps):
            continue
        po, pd = snaps[i - 1][0], snaps[i - 1][1]
        ro, rd, t, hit, cont = snaps[i]
        bt = np.where(hit, t, 3.4e38).astype(np.float64)
        idx = np.argsort(okey(po, pd), kind="stable")
        opt = tile_skip_fraction(ro[idx], rd[idx], bt[idx], blo, bhi,
                                 args.tile, t_min)
        pess = tile_skip_fraction(ro[idx], rd[idx],
                                  np.full(R, 3.4e38), blo, bhi,
                                  args.tile, t_min)
        print(f"  iter {i:>2}: skip {100*opt:5.1f}% opt / {100*pess:5.1f}% pess")

    orders = ["none", "octant", "octant+omorton", "omorton", "dir+omorton"]
    print(f"{'iter':>4} {'bounced%':>8} | " +
          " | ".join(f"{o:>16}" for o in orders) +
          "   (skip% opt/pess)")
    for i in (0, 1, 2, 3, 5, 8, 11, args.iters - 1):
        if i >= len(snaps):
            continue
        ro, rd, t, hit, cont = snaps[i]
        bt = np.where(hit, t, 3.4e38).astype(np.float64)
        keys = {}
        keys["none"] = np.arange(R)
        oct_ = ((rd[:, 0] < 0) * 4 + (rd[:, 1] < 0) * 2 +
                (rd[:, 2] < 0)).astype(np.uint64)
        om = _morton(ro.astype(np.float64), slo, shi)
        # direction quantized to 6 bits/axis, major over origin morton
        dq = np.clip(((rd / np.maximum(np.abs(rd).max(1, keepdims=True),
                                       1e-9)) + 1) * 31.5, 0, 63
                     ).astype(np.uint64)
        dkey = (dq[:, 0] << np.uint64(12)) | (dq[:, 1] << np.uint64(6)) | dq[:, 2]
        keys["octant"] = np.argsort(oct_, kind="stable")
        keys["octant+omorton"] = np.argsort((oct_ << np.uint64(30)) | om,
                                            kind="stable")
        keys["omorton"] = np.argsort(om, kind="stable")
        keys["dir+omorton"] = np.argsort((dkey << np.uint64(30)) | om,
                                         kind="stable")
        row = []
        for o in orders:
            idx = keys[o]
            opt = tile_skip_fraction(ro[idx], rd[idx], bt[idx], blo, bhi,
                                     args.tile, t_min)
            pess = tile_skip_fraction(ro[idx], rd[idx],
                                      np.full(R, 3.4e38), blo, bhi,
                                      args.tile, t_min)
            row.append(f"{100*opt:7.1f}/{100*pess:5.1f}")
        print(f"{i:>4} {100 * cont.mean():7.1f}% | " + " | ".join(
            f"{r:>16}" for r in row))


if __name__ == "__main__":
    main()
