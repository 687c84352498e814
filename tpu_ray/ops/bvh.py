"""BVH: host-side build, flattened arrays, lockstep device traversal.

TPU-native equivalent of the reference's ``makeBVH`` + recursive descent
(src/Lib.hs:941-961, 970-988).  Differences by design:

* the build runs on the host (numpy) over world-space primitive AABBs and
  splits at the median of centroids on the largest-extent axis - the
  reference picks a *random* axis per node (src/Lib.hs:943), which exists
  only because its RNG was already threaded through scene construction;
  deterministic largest-extent splits are strictly better and reproducible.
* the tree is flattened to arrays (node AABBs, child indices, leaf prim
  ranges over a reordered index list) and traversed iteratively with a
  fixed-size per-ray stack, all rays in lockstep: each loop step processes
  one node per ray (AABB slab test, leaf primitive tests, push/pop), with
  lanes that finished masked out.

The brute-force intersector (ops/intersect.py) is the default at EVERY
measured scene size.  Rounds 1-4 claimed "the BVH wins once scenes get
large" without data; round 5 measured the crossover hunt on synthetic
N-sphere scenes up to 100k prims on v5e (tools/bench_bvh_crossover.py,
PERFLOG "BVH crossover") and found the opposite: the chunk-culled dense
sweep beats this traversal 71-88x at every size from 3.4k to 100k prims - Morton-ordered chunk-AABB culling already gives the sweep
sublinear scaling, while lockstep traversal pays the ~10 ns/lane
per-index gather floor at every node visit.  On this hardware the dense
sweep IS the acceleration structure; the BVH stays as a validated
correctness oracle (exact t/prim-id parity tests) and a CPU-backend
alternative.  ``tpu_ray.renderer.render(bvh=True)`` switches it on.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core import vec
from ..models.scene_data import (
    PRIM_BOX,
    PRIM_MEDIUM_BOX,
    PRIM_MEDIUM_SPHERE,
    PRIM_QUAD,
    PRIM_SPHERE,
    SceneData,
)
from .intersect import INF, MED_EPS, HitRecord, _hit_record

STACK_DEPTH = 32


@struct.dataclass
class BVHArrays:
    node_min: jnp.ndarray   # (M, 3)
    node_max: jnp.ndarray   # (M, 3)
    child_l: jnp.ndarray    # (M,) int32 (internal nodes)
    child_r: jnp.ndarray    # (M,) int32
    first: jnp.ndarray      # (M,) int32 first index into ``order`` (leaves)
    count: jnp.ndarray      # (M,) int32 leaf primitive count; 0 = internal
    order: jnp.ndarray      # (N,) int32 leaf-contiguous primitive ids
    n_nodes: int = struct.field(pytree_node=False, default=1)
    leaf_size: int = struct.field(pytree_node=False, default=4)


def prim_aabbs(scene: SceneData, time0: float = 0.0, time1: float = 1.0) -> np.ndarray:
    """World-space AABBs (N, 2, 3), mirroring ``boundingBox`` (src/Lib.hs:905-927)."""
    p = jax.tree.map(np.asarray, scene.prims)
    n = scene.n_prims
    lo = np.full((n, 3), np.inf, np.float64)
    hi = np.full((n, 3), -np.inf, np.float64)

    kind = p.kind[:n]
    sph = (kind == PRIM_SPHERE) | (kind == PRIM_MEDIUM_SPHERE)
    if sph.any():
        c0 = p.center[:n] + p.velocity[:n] * (time0 - p.time0[:n])[:, None]
        c1 = p.center[:n] + p.velocity[:n] * (time1 - p.time0[:n])[:, None]
        r = p.radius[:n][:, None]
        lo[sph] = np.minimum(c0, c1)[sph] - r[sph]
        hi[sph] = np.maximum(c0, c1)[sph] + r[sph]
    quad = kind == PRIM_QUAD
    if quad.any():
        corners = np.stack([
            p.quad_p0[:n],
            p.quad_p0[:n] + p.quad_e1[:n],
            p.quad_p0[:n] + p.quad_e2[:n],
            p.quad_p0[:n] + p.quad_e1[:n] + p.quad_e2[:n],
        ])
        # the reference pads rect boxes by +-epsilon (src/Lib.hs:914-919)
        lo[quad] = corners.min(0)[quad] - MED_EPS
        hi[quad] = corners.max(0)[quad] + MED_EPS
    sbox = kind == PRIM_BOX
    if sbox.any():
        lo[sbox] = p.box_min[:n][sbox]
        hi[sbox] = p.box_max[:n][sbox]
    mbox = kind == PRIM_MEDIUM_BOX
    if mbox.any():
        bmin, bmax = p.box_min[:n], p.box_max[:n]
        corners = np.stack([
            np.where(np.array(m)[None, :], bmax, bmin)
            for m in np.ndindex(2, 2, 2)
        ])  # (8, N, 3) object-space corners
        world = np.einsum("nij,knj->kni", p.xf_rot[:n], corners) + p.xf_off[:n]
        lo[mbox] = world.min(0)[mbox]
        hi[mbox] = world.max(0)[mbox]
    return np.stack([lo, hi], axis=1)


def build_bvh(scene: SceneData, leaf_size: int = 4,
              time0: float = 0.0, time1: float = 1.0,
              use_native: bool = True) -> BVHArrays:
    """Median-split BVH over primitive AABB centroids.

    Uses the C++ builder (tpu_ray.native) when available; numpy otherwise.
    Both produce the same node layout (split choice may differ on exact
    centroid ties).
    """
    boxes = prim_aabbs(scene, time0, time1)
    n = boxes.shape[0]
    if use_native:
        try:
            from ..native import bvh_build_native

            out = bvh_build_native(boxes.astype(np.float32), leaf_size)
        except Exception:
            out = None
        if out is not None:
            nmin, nmax, cl, cr, first, count, order = out
            return BVHArrays(
                node_min=jnp.asarray(nmin), node_max=jnp.asarray(nmax),
                child_l=jnp.asarray(cl), child_r=jnp.asarray(cr),
                first=jnp.asarray(first), count=jnp.asarray(count),
                order=jnp.asarray(order), n_nodes=nmin.shape[0],
                leaf_size=leaf_size,
            )
    centroids = boxes.mean(axis=1)

    node_min, node_max = [], []
    child_l, child_r, first, count = [], [], [], []
    order: list[int] = []

    def new_node():
        node_min.append(None); node_max.append(None)
        child_l.append(-1); child_r.append(-1)
        first.append(0); count.append(0)
        return len(node_min) - 1

    # iterative build: (node_id, prim index array)
    root = new_node()
    stack = [(root, np.arange(n))]
    while stack:
        node, ids = stack.pop()
        lo = boxes[ids, 0].min(0)
        hi = boxes[ids, 1].max(0)
        node_min[node], node_max[node] = lo, hi
        if len(ids) <= leaf_size:
            first[node] = len(order)
            count[node] = len(ids)
            order.extend(ids.tolist())
            continue
        axis = int(np.argmax(hi - lo))
        key = centroids[ids, axis]
        half = len(ids) // 2
        part = ids[np.argsort(key, kind="stable")]
        l, r = new_node(), new_node()
        child_l[node], child_r[node] = l, r
        stack.append((l, part[:half]))
        stack.append((r, part[half:]))

    return BVHArrays(
        node_min=jnp.asarray(np.stack(node_min).astype(np.float32)),
        node_max=jnp.asarray(np.stack(node_max).astype(np.float32)),
        child_l=jnp.asarray(np.array(child_l, np.int32)),
        child_r=jnp.asarray(np.array(child_r, np.int32)),
        first=jnp.asarray(np.array(first, np.int32)),
        count=jnp.asarray(np.array(count, np.int32)),
        order=jnp.asarray(np.array(order, np.int32)),
        n_nodes=len(node_min),
        leaf_size=leaf_size,
    )


def _one_prim_t(scene: SceneData, pid, ro, rd, rt, u_med, t_min, a, dlen):
    """Hit distance of each ray against its own (gathered) primitive: (R,).

    KEEP IN SYNC with ops/intersect.py::_chunk_t (broadcast layout) and
    ops/intersect_pallas.py::_kernel (VMEM layout) - same math, different
    indexing.  tests/test_bvh.py and tests/test_pallas.py enforce exact
    agreement across all three.
    """
    prims = scene.prims
    kind = prims.kind[pid]
    t = jnp.full(pid.shape, INF)

    if scene.has_spheres:
        ct = prims.center[pid]
        if scene.has_moving:
            ct = ct + prims.velocity[pid] * (rt - prims.time0[pid])[:, None]
        oc = ro - ct
        b = vec.dot(oc, rd)
        c = vec.dot(oc, oc) - prims.radius[pid] ** 2
        disc = b * b - a * c
        ok = disc > 0.0
        sd = jnp.sqrt(jnp.maximum(disc, 0.0))
        t1 = (-b - sd) / a
        t2 = (-b + sd) / a
        t_sph = jnp.where(
            ok & (t1 > t_min), t1, jnp.where(ok & (t2 > t_min), t2, INF)
        )
        t = jnp.where(kind == PRIM_SPHERE, t_sph, t)

    if scene.has_quads:
        nq = prims.quad_n[pid]
        dn = vec.dot(rd, nq)
        tq = (prims.quad_d[pid] - vec.dot(ro, nq)) / dn
        x = ro + tq[:, None] * rd - prims.quad_p0[pid]
        uq = vec.dot(x, prims.quad_inv1[pid])
        vq = vec.dot(x, prims.quad_inv2[pid])
        ok_q = (tq > t_min) & (uq >= 0) & (uq <= 1) & (vq >= 0) & (vq <= 1)
        t = jnp.where(kind == PRIM_QUAD, jnp.where(ok_q, tq, INF), t)

    if scene.has_solid_box:
        inv = 1.0 / rd
        ta_b = (prims.box_min[pid] - ro) * inv
        tb_b = (prims.box_max[pid] - ro) * inv
        tn_b = jnp.max(jnp.minimum(ta_b, tb_b), axis=-1)
        tf_b = jnp.min(jnp.maximum(ta_b, tb_b), axis=-1)
        ok_b = tf_b > tn_b
        t_box = jnp.where(
            ok_b & (tn_b > t_min), tn_b,
            jnp.where(ok_b & (tf_b > t_min), tf_b, INF),
        )
        t = jnp.where(kind == PRIM_BOX, t_box, t)

    if scene.has_media:
        te = jnp.full_like(t, INF)
        tx = jnp.full_like(t, -INF)
        exists = jnp.zeros(t.shape, bool)
        if scene.has_spheres:
            te = jnp.where(kind == PRIM_MEDIUM_SPHERE, t1, te)
            tx = jnp.where(kind == PRIM_MEDIUM_SPHERE, t2, tx)
            exists = exists | ((kind == PRIM_MEDIUM_SPHERE) & ok)
        if scene.has_box_media:
            if scene.any_transform:
                rot = prims.xf_rot[pid]
                ro_o = jnp.einsum("rij,ri->rj", rot, ro - prims.xf_off[pid],
                                  precision="highest")
                rd_o = jnp.einsum("rij,ri->rj", rot, rd, precision="highest")
            else:
                ro_o, rd_o = ro, rd
            inv = 1.0 / rd_o
            ta = (prims.box_min[pid] - ro_o) * inv
            tb = (prims.box_max[pid] - ro_o) * inv
            te_b = jnp.max(jnp.minimum(ta, tb), axis=-1)
            tx_b = jnp.min(jnp.maximum(ta, tb), axis=-1)
            te = jnp.where(kind == PRIM_MEDIUM_BOX, te_b, te)
            tx = jnp.where(kind == PRIM_MEDIUM_BOX, tx_b, tx)
            exists = exists | ((kind == PRIM_MEDIUM_BOX) & (tx_b > te_b))
        exists = exists & (tx > te + MED_EPS)
        rec1 = jnp.maximum(t_min, te)
        dist_inside = (tx - rec1) * dlen
        u = u_med[jnp.arange(pid.shape[0]), prims.medium_slot[pid]]
        hit_dist = prims.neg_inv_density[pid] * jnp.log(jnp.maximum(u, 1e-12))
        ok_m = exists & (rec1 < tx) & (hit_dist <= dist_inside)
        t = jnp.where(
            kind >= PRIM_MEDIUM_SPHERE,
            jnp.where(ok_m, rec1 + hit_dist / dlen, INF),
            t,
        )
    return t


def intersect_scene_bvh(scene: SceneData, bvh: BVHArrays, ro, rd, rt, key,
                        t_max=INF, lane_ids=None) -> HitRecord:
    """Closest hit via lockstep stack-based BVH traversal."""
    R = ro.shape[0]
    t_min = jnp.float32(scene.t_min)
    a = vec.dot(rd, rd)
    dlen = jnp.sqrt(a)
    inv_d = 1.0 / rd
    lanes = jnp.arange(R)
    if scene.has_media:
        from ..core import rng as rng_mod

        if lane_ids is None:
            lane_ids = jnp.arange(R, dtype=jnp.uint32)
        u_med = rng_mod.lane_uniforms(key, lane_ids, scene.n_media)
    else:
        u_med = None

    class T(tuple):
        pass

    state = (
        jnp.zeros((R,), jnp.int32),               # current node
        jnp.zeros((R,), jnp.int32),               # stack pointer
        jnp.zeros((R, STACK_DEPTH), jnp.int32),   # stack
        jnp.full((R,), INF),                      # best_t
        jnp.zeros((R,), jnp.int32),               # best prim
        jnp.zeros((R,), bool),                    # done
    )

    def cond(st):
        return jnp.any(~st[5])

    def body(st):
        node, sp, stack, best_t, best_i, done = st
        nmin = bvh.node_min[node]
        nmax = bvh.node_max[node]
        t0 = (nmin - ro) * inv_d
        t1 = (nmax - ro) * inv_d
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        # slab test with running-min clipping (cf. src/Lib.hs:971-988)
        hit_box = (
            jnp.minimum(tf, jnp.minimum(best_t, t_max))
            > jnp.maximum(tn, t_min)
        ) & ~done
        cnt = bvh.count[node]
        is_leaf = cnt > 0

        do_leaf = hit_box & is_leaf
        for k in range(bvh.leaf_size):
            pid = bvh.order[jnp.clip(bvh.first[node] + k, 0, bvh.order.shape[0] - 1)]
            tk = _one_prim_t(scene, pid, ro, rd, rt, u_med, t_min, a, dlen)
            closer = do_leaf & (k < cnt) & (tk < best_t) & (tk < t_max)
            best_t = jnp.where(closer, tk, best_t)
            best_i = jnp.where(closer, pid, best_i)

        descend = hit_box & ~is_leaf
        # push the right child, descend into the left
        stack = stack.at[lanes, jnp.minimum(sp, STACK_DEPTH - 1)].set(
            jnp.where(descend, bvh.child_r[node], stack[lanes, jnp.minimum(sp, STACK_DEPTH - 1)])
        )
        sp = sp + descend.astype(jnp.int32)
        node = jnp.where(descend, bvh.child_l[node], node)
        # everyone else pops (or finishes)
        pop = ~descend & ~done
        can_pop = sp > 0
        sp = jnp.where(pop & can_pop, sp - 1, sp)
        node = jnp.where(pop & can_pop, stack[lanes, jnp.minimum(sp, STACK_DEPTH - 1)], node)
        done = done | (pop & ~can_pop)
        return node, sp, stack, best_t, best_i, done

    _, _, _, best_t, best_i, _ = jax.lax.while_loop(cond, body, state)
    best_t = jnp.where(best_t < t_max, best_t, INF)
    return _hit_record(scene, ro, rd, rt, best_t, best_i)
