"""Scaling envelope: prims -> Msamples/s on the production path
(VERDICT round 2 item 9).

Two ladders at the same 400x400@100spp config (16M camera samples):
  * the real scenes (cornell 13, book1 485, next-week 1409) - production
    numbers, shading costs included;
  * synthetic lambertian-sphere fields (N = 64..10009, same camera and sky
    as book1, zero textures/images) - isolates how the O(N)-per-ray dense
    sweep scales, for the ARCHITECTURE envelope note on where O(log N)
    (BVH) would win.

Timing: warm render, then min of 3 with a host readback (PERFLOG:
block_until_ready through the tunnel returns early; only a readback
proves completion).
"""
import sys, time
sys.path.insert(0, "/root/repo")
from tpu_ray.utils.cache import enable_compilation_cache
enable_compilation_cache()
import numpy as np
import jax
from tpu_ray.models.scenes import SCENES, random_scene_camera, SKY
from tpu_ray.models import objects as ob
from tpu_ray.models.compile import build_scene
from tpu_ray.renderer import render, resolve_engine, resolve_mode, \
    clear_auto_checkpoints

W, H, SPP = 400, 400, 100
MS = W * H * SPP / 1e6


def synth(n: int):
    """Ground + (n-1) small lambertian spheres on a grid around the book1
    camera's field of view."""
    side = int(np.ceil(np.sqrt(n - 1)))
    rng = np.random.default_rng(7)
    objs = [ob.Sphere((0, -1000, 0), 1000, ob.Lambertian((0.5, 0.5, 0.5)))]
    k = 0
    for i in range(side):
        for j in range(side):
            if k >= n - 1:
                break
            x = -11 + 22 * (i + 0.5) / side
            z = -11 + 22 * (j + 0.5) / side
            alb = tuple(rng.random(3) * rng.random(3))
            objs.append(ob.Sphere((x, 0.2, z), 0.2, ob.Lambertian(alb)))
            k += 1
    return build_scene(objs, background=SKY, t_min=1e-3)


def bench_one(label, scene, camera):
    engine = resolve_engine(scene, "auto")
    mode = resolve_mode(scene, "auto", spp=SPP)
    kw = dict(spp=SPP, max_depth=50, seed=1024)
    render(scene, camera, W, H, **kw)          # warm
    clear_auto_checkpoints()
    ts = []
    for _ in range(3):
        clear_auto_checkpoints()
        t0 = time.perf_counter()
        img = render(scene, camera, W, H, **kw)
        np.asarray(img).sum()
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"{label:22s} prims={scene.n_prims:6d} mode={mode:5s} "
          f"engine={engine:6s} wall={t:7.3f}s  {MS / t:8.2f} Msamples/s",
          flush=True)
    return t


print(f"config: {W}x{H}@{SPP}spp = {MS:.0f} M camera samples", flush=True)
for name in ["cornell", "book1-final", "next-week-final"]:
    spec = SCENES[name]
    kw = dict(seed=1024)
    scene = spec.build(**kw)
    bench_one(name, scene, spec.camera(W, H))

for n in [64, 256, 1024, 3409, 10009]:
    scene = synth(n)
    bench_one(f"synth-{n}", scene, random_scene_camera(W, H))
