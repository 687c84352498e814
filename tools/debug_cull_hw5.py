"""Stage 5: dump the lone differing lane after the int32 unsort fix."""
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

    plain = jax.jit(lambda a, b, c: ip.intersect_solids_pallas(
        scene, a, b, c, sort=False))
    srt = jax.jit(lambda a, b, c: ip.intersect_solids_pallas(
        scene, a, b, c, sort=True))
    bt_p, bi_p = map(np.asarray, plain(ro, rd, rt))
    bt_s, bi_s = map(np.asarray, srt(ro, rd, rt))
    bad = (bt_p != bt_s) | (bi_p != bi_s)
    lanes = np.nonzero(bad)[0]
    print("bad lanes:", lanes)
    for ln in lanes[:8]:
        print(f"lane {ln}: plain t={bt_p[ln]!r} i={bi_p[ln]} | "
              f"sorted t={bt_s[ln]!r} i={bi_s[ln]}")
        print(f"  ro={np.asarray(ro)[ln]} rd={np.asarray(rd)[ln]} "
              f"rt={np.asarray(rt)[ln]}")
        # classify both prims
        for which, i in (("plain", bi_p[ln]), ("sorted", bi_s[ln])):
            if i < scene.n_sphere:
                kind = "sphere"
            elif i < scene.n_sphere + scene.n_box:
                kind = "box"
            else:
                kind = "quad"
            print(f"  {which} winner prim {i} kind={kind}")
        # CPU oracle for this ray
        with jax.default_device(jax.devices("cpu")[0]):
            ct, ci = map(np.asarray, jax.jit(
                lambda a, b, c: ip.intersect_solids_pallas(
                    scene, a, b, c, sort=False, interpret=True))(
                ro[ln:ln + 1], rd[ln:ln + 1], rt[ln:ln + 1]))
        print(f"  cpu oracle: t={ct[0]!r} i={ci[0]}")


if __name__ == "__main__":
    main()
