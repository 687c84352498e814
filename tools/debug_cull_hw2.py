"""Stage 2 bisect: which piece breaks at full scale on hardware?

  a) per-range culled sweeps (box, quad) at R=4096
  b) full intersect_solids_pallas with sort but mask forced all-ones
  c) full intersect_solids_pallas sort+cull at R=163840 (repro)
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
    rng = np.random.default_rng(0)

    def rays(R):
        ro = jnp.asarray(rng.uniform(-50, 400, (R, 3)).astype(np.float32))
        rd = jnp.asarray(rng.normal(0, 1, (R, 3)).astype(np.float32))
        rt = jnp.asarray(rng.random(R).astype(np.float32))
        return ro, rd, rt

    n_sb = scene.n_sphere + scene.n_box
    ro, rd, rt = rays(4096)
    rt2 = rt[:, None]
    for name, lo, hi, flavor in [("box", scene.n_sphere, n_sb, "box"),
                                 ("quad", n_sb, scene.n_solid, "quad")]:
        f_p = jax.jit(lambda a, b, c, lo=lo, hi=hi, fl=flavor: ip._sweep_range(
            scene, a, b, c, lo, hi, fl, False, cull=False))
        f_c = jax.jit(lambda a, b, c, lo=lo, hi=hi, fl=flavor: ip._sweep_range(
            scene, a, b, c, lo, hi, fl, False, cull=True))
        bt_p, bi_p = map(np.asarray, f_p(ro, rd, rt2))
        bt_c, bi_c = map(np.asarray, f_c(ro, rd, rt2))
        print(f"{name}: cull==plain t {np.array_equal(bt_p, bt_c)} "
              f"i {np.array_equal(bi_p, bi_c)} "
              f"({(bt_p != bt_c).sum()} lanes differ)")

    # b) sort on, cull mask all ones
    orig = ip._needed_mask
    ip._needed_mask = lambda *a, **k: jnp.ones_like(orig(*a, **k))
    try:
        f_s1 = jax.jit(lambda a, b, c: ip.intersect_solids_pallas(
            scene, a, b, c, sort=True))
        bt_s1, bi_s1 = map(np.asarray, f_s1(ro, rd, rt))
    finally:
        ip._needed_mask = orig
    f_pl = jax.jit(lambda a, b, c: ip.intersect_solids_pallas(
        scene, a, b, c, sort=False))
    bt_pl, bi_pl = map(np.asarray, f_pl(ro, rd, rt))
    h = np.isfinite(bt_pl)
    print("sort+ones == plain:", np.array_equal(bt_pl, bt_s1),
          np.array_equal(bi_pl[h], bi_s1[h]))

    # c) sort+cull full, 4096
    f_sc = jax.jit(lambda a, b, c: ip.intersect_solids_pallas(
        scene, a, b, c, sort=True))
    bt_sc, bi_sc = map(np.asarray, f_sc(ro, rd, rt))
    bad = bt_pl != bt_sc
    print(f"sort+cull == plain @4096: {not bad.any()} ({bad.sum()} lanes)")


if __name__ == "__main__":
    main()
