"""Command-line renderer.

The reference hard-codes every setting in ``app/Main.hs:9-46`` (500x500,
1000 spp, depth 50, seed 1024, scene chosen by editing the source; PPM P3 on
stdout, progress on stderr).  This CLI exposes the same defaults as real
flags, keeps the PPM-on-stdout contract, and adds PNG output, multi-chip
meshes and checkpoint/resume.
"""
from __future__ import annotations

import argparse
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="tpu-ray",
        description="TPU-native wavefront path tracer (RTIOW trilogy scenes)",
    )
    p.add_argument("--scene", default="cornell",
                   help="scene name (see --list-scenes); default matches app/Main.hs:40-41")
    p.add_argument("--list-scenes", action="store_true")
    p.add_argument("--width", type=int, default=500)
    p.add_argument("--height", type=int, default=500)
    p.add_argument("--spp", type=int, default=1000, help="samples per pixel")
    p.add_argument("--max-depth", type=int, default=50)
    p.add_argument("--seed", type=int, default=1024)
    p.add_argument("--out", default="-",
                   help="output path: .png/.ppm tone-mapped, .pfm/.hdr "
                        "linear radiance floats; '-' = PPM on stdout")
    p.add_argument("--earthmap", default=None, help="path to earth texture image")
    p.add_argument("--rays-per-wave", type=int, default=1 << 20)
    p.add_argument("--samples-per-wave", type=int, default=64,
                   help="max samples per slot per wave (smaller = finer "
                        "progress/checkpoint granularity; larger = fewer "
                        "inter-wave straggler tails - one wave for the "
                        "whole render measured 6.5-8.3%% faster on the "
                        "1000-spp Cornell configs, PERFLOG 'Single-wave "
                        "schedule'; executables are shared across values)")
    p.add_argument("--devices", type=int, default=0,
                   help="shard sample waves over N devices (0 = single device)")
    p.add_argument("--checkpoint", default=None, help="checkpoint .npz path")
    p.add_argument("--checkpoint-every", type=int, default=0,
                   help="save the accumulator every N waves")
    p.add_argument("--time", action="store_true", help="print wall time to stderr")
    p.add_argument("--platform", default=None, choices=("cpu", "tpu", "gpu"),
                   help="force a JAX backend (some TPU plugins ignore JAX_PLATFORMS)")
    p.add_argument("--engine", default="auto", choices=("auto", "xla", "mxu", "pallas", "mega"),
                   help="solid-primitive intersect engine")
    p.add_argument("--shade", default="auto", choices=("auto", "on", "off"),
                   help="fused Pallas shading kernel (record+texture+scatter "
                        "in one launch, ops/shade_pallas.py); auto = on for "
                        "supported scenes on TPU")
    p.add_argument("--mode", default="auto",
                   choices=("auto", "pool", "queue", "wave"),
                   help="integrator: regenerating ray pool, work-queue "
                        "frontier, or plain wavefront; auto picks queue for "
                        ">512-prim single-device renders (measured crossover, "
                        "renderer.QUEUE_MIN_PRIMS) and pool otherwise")
    p.add_argument("--estimator", default="fixed", choices=("fixed", "reference"),
                   help="'reference' reproduces the reference's exact estimator "
                        "quirks (Unhittable light mixture for no-light scenes, "
                        "isotropic cos/pi medium weighting) instead of the "
                        "documented fixes in ops/scatter.py")
    p.add_argument("--sampler", default="uniform",
                   choices=("uniform", "sobol", "sobol-b0"),
                   help="image-plane sample generator: 'uniform' is the "
                        "reference's per-sample jitter (the default, for "
                        "reference parity); 'sobol' stratifies each pixel's "
                        "samples with a scrambled (0,2)-sequence "
                        "(core/qmc.py) - same cost, 1.05-1.3x lower MSE, "
                        "recommended for production renders at >= 64 spp; "
                        "'sobol-b0' extends it to first-bounce scatter "
                        "draws (wins on lights-free scenes)")
    p.add_argument("--rr-depth", type=int, default=0, metavar="N",
                   help="Russian-roulette path termination after N bounces "
                        "(0 = off, the reference's semantics; unbiased - a "
                        "path survives each further bounce with p = its "
                        "throughput, weighted by 1/p - but not "
                        "sample-for-sample comparable to rr-depth 0)")
    p.add_argument("--adaptive", type=float, default=0.0, metavar="TOL",
                   help="per-pixel adaptive sampling: stop each pixel once "
                        "the standard error of its tone-mapped value is "
                        "below TOL (try 0.01); --spp becomes the per-pixel "
                        "budget cap.  A different quality contract than the "
                        "reference's fixed spp (tpu_ray/adaptive.py); "
                        "single-device only")
    p.add_argument("--aov", default=None, metavar="LIST",
                   help="render first-hit feature buffers instead of the "
                        "beauty pass: comma list from albedo,normal,depth,"
                        "coverage, or 'all' (tpu_ray/aov.py - albedo+normal "
                        "are the standard denoiser inputs).  Each buffer is "
                        "written to <out stem>.<name>.png; with --out *.pfm, "
                        "raw float buffers (signed normals, +inf depth "
                        "misses) are written instead.  Requires --out. "
                        "Use a small --spp (e.g. 16): AOVs are first-hit "
                        "features, not a Monte-Carlo integral")
    p.add_argument("--bvh", action="store_true",
                   help="intersect via BVH traversal instead of brute force")
    p.add_argument("--denoise", action="store_true",
                   help="cross-bilateral denoise of the beauty pass guided "
                        "by the first-hit AOVs (tpu_ray/denoise.py - the "
                        "OIDN-style post-process; biased like every "
                        "practical denoiser, so never the default). Renders "
                        "the albedo/normal/depth guides at <=16 spp on top "
                        "of the beauty pass")
    p.add_argument("--denoise-radius", type=int, default=3, metavar="R",
                   help="denoiser window radius (window is (2R+1)^2)")
    p.add_argument("--progressive", action="store_true",
                   help="emit output as it renders (reference parity: "
                        "app/Main.hs:62 streams each finished row, so a "
                        "crashed run keeps everything rendered so far). "
                        "With --out -: stream PPM rows the moment they are "
                        "final (band-tiled renders finish top-to-bottom). "
                        "With --out PATH: atomically rewrite PATH with the "
                        "current estimate after every wave/chunk/band")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="write a jax.profiler trace to DIR")
    p.add_argument("--serve", action="store_true",
                   help="run as a long-lived render server: JSONL requests "
                        "on stdin, responses on stdout (utils/server.py); "
                        "renders after the first reuse the live backend and "
                        "compiled executables instead of re-paying warmup")
    p.add_argument("--supervise", type=int, default=0, metavar="N",
                   help="run the render in a child process and retry up to N "
                        "times if the TPU runtime crashes; long renders "
                        "auto-checkpoint, so each retry resumes mid-render "
                        "(the reference keeps finished rows by streaming "
                        "stdout, app/Main.hs:62 - this keeps finished waves)")
    return p


def _supervised(args, argv) -> int:
    """Re-exec the same render in child processes until one succeeds.

    A crashed child leaves its auto checkpoint behind (renderer.py keys it
    by the exact render config), so the next identical attempt resumes
    instead of restarting.  Output contracts hold: a child writes the
    PPM/PNG only after a successful render, so a crash emits nothing.
    """
    import subprocess

    child_argv = [a for a in (argv if argv is not None else sys.argv[1:])]
    # strip --supervise[=N] and its value so the child renders inline
    out = []
    skip = False
    for a in child_argv:
        if skip:
            skip = False
            continue
        if a == "--supervise":
            skip = True
            continue
        if a.startswith("--supervise="):
            continue
        out.append(a)
    for attempt in range(args.supervise + 1):
        if attempt:
            print(f"[supervise] retry {attempt}/{args.supervise} "
                  "(resuming from auto checkpoint if one was written)",
                  file=sys.stderr)
        rc = subprocess.call([sys.executable, "-m", "tpu_ray"] + out)
        if rc == 0:
            return 0
    print(f"[supervise] giving up after {args.supervise + 1} attempts",
          file=sys.stderr)
    return 1


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    if args.supervise > 0 and not args.list_scenes:
        return _supervised(args, argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from .cache import enable_compilation_cache

    enable_compilation_cache()

    if args.serve:
        from .server import serve

        return serve()

    from ..core import film
    from ..models.scenes import SCENES
    from ..renderer import render
    from .assets import load_earth_image

    if args.list_scenes:
        for name, spec in SCENES.items():
            print(f"{name:20s} {spec.description}")
        return 0
    if args.scene not in SCENES:
        print(f"unknown scene {args.scene!r}; try --list-scenes", file=sys.stderr)
        return 2
    if args.spp < 1 or args.width < 1 or args.height < 1 or args.max_depth < 0:
        print("--spp/--width/--height must be >= 1 and --max-depth >= 0",
              file=sys.stderr)
        return 2

    if args.shade != "auto":
        from .. import integrator

        integrator.FUSED_SHADING = args.shade

    spec = SCENES[args.scene]
    earth = load_earth_image(args.earthmap)
    scene = spec.build(seed=args.seed, earth=earth)
    if args.estimator == "reference":
        scene = scene.replace(strict=True)
    camera = spec.camera(args.width, args.height)
    if args.sampler != "uniform":
        camera = camera.replace(sampler=args.sampler)

    if args.aov:
        from ..aov import AOV_NAMES, aov_images, render_aovs
        from ..renderer import resolve_engine

        names = AOV_NAMES if args.aov == "all" else tuple(
            n.strip() for n in args.aov.split(",") if n.strip())
        bad = [n for n in names if n not in AOV_NAMES]
        if bad:
            print(f"unknown AOV(s) {bad}; choose from {list(AOV_NAMES)}",
                  file=sys.stderr)
            return 2
        if args.out == "-":
            print("--aov writes one PNG per buffer; pass --out PATH",
                  file=sys.stderr)
            return 2
        # announce dropped flags (same convention as resolve_mode's
        # demotion messages): render_aovs is a single-device first-hit
        # pass with no mesh/BVH/checkpoint/adaptive machinery
        ignored = [flag for flag, on in (
            ("--devices", args.devices),
            ("--bvh", args.bvh),
            ("--checkpoint", args.checkpoint),
            ("--checkpoint-every", args.checkpoint_every),
            ("--adaptive", args.adaptive),
            ("--mode", args.mode != "auto"),
            ("--rr-depth", args.rr_depth),
        ) if on]
        if ignored:
            print(f"[aov] ignoring {', '.join(ignored)}: AOV passes are "
                  "single-device first-hit sweeps (band-tiled under the "
                  "beauty pass's lane caps)", file=sys.stderr)
        import numpy as np

        engine = resolve_engine(scene, args.engine)
        if engine not in ("xla", "pallas"):
            engine = "xla"
        t_start = time.perf_counter()
        aovs = render_aovs(scene, camera, args.width, args.height,
                           spp=args.spp, seed=args.seed, engine=engine)
        stem = args.out
        if stem.lower().endswith(".pfm"):
            # RAW float buffers (albedo linear, normal signed components,
            # depth with +inf misses, coverage fraction) - the lossless
            # denoiser/compositing interchange; PNG path quantizes
            stem = stem[:-4]
            for n in names:
                a = np.asarray(aovs[n], np.float32)
                if a.ndim == 2:
                    a = np.repeat(a[..., None], 3, axis=-1)
                film.write_pfm(a, f"{stem}.{n}.pfm")
                print(f"wrote {stem}.{n}.pfm", file=sys.stderr)
        else:
            imgs = aov_images(aovs)
            for suffix in (".png", ".ppm", ".hdr"):
                if stem.lower().endswith(suffix):
                    stem = stem[: -len(suffix)]
            for n in names:
                rgb8 = (np.clip(imgs[n], 0.0, 1.0) * 255.999).astype(np.uint8)
                film.write_png(rgb8, f"{stem}.{n}.png")
                print(f"wrote {stem}.{n}.png", file=sys.stderr)
        if args.time:
            print(f"aov wall time: {time.perf_counter() - t_start:.3f}s",
                  file=sys.stderr)
        print("Done.", file=sys.stderr)
        return 0

    mesh = None
    if args.devices:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh(args.devices)

    from .profiling import profile_trace

    prog = None
    if args.progressive:
        if args.adaptive:
            print("[progressive] ignoring --progressive: adaptive renders "
                  "have no fixed wave schedule", file=sys.stderr)
        else:
            prog = film.ProgressiveOutput(args.out, args.width, args.height)

    t_start = time.perf_counter()
    with profile_trace(args.profile):
        img = render(
            scene, camera, args.width, args.height, args.spp,
            max_depth=args.max_depth, seed=args.seed,
            rays_per_wave=args.rays_per_wave,
            samples_per_wave=args.samples_per_wave, mesh=mesh, progress=True,
            engine=args.engine, bvh=args.bvh, mode=args.mode,
            checkpoint_path=args.checkpoint, checkpoint_every=args.checkpoint_every,
            rr_depth=args.rr_depth, adaptive=args.adaptive,
            on_partial=prog.update if prog else None,
        )
    elapsed = time.perf_counter() - t_start
    if args.denoise:
        import numpy as np

        from ..aov import render_aovs
        from ..denoise import denoise as _denoise
        from ..renderer import resolve_engine

        aov_engine = resolve_engine(scene, args.engine)
        if aov_engine not in ("xla", "pallas"):
            aov_engine = "xla"
        aovs = render_aovs(scene, camera, args.width, args.height,
                           spp=min(args.spp, 16), seed=args.seed,
                           engine=aov_engine)
        img = np.asarray(_denoise(img, aovs["albedo"], aovs["normal"],
                                  aovs["depth"],
                                  radius=args.denoise_radius))
        print("denoised (cross-bilateral, AOV-guided, "
              f"r={args.denoise_radius})", file=sys.stderr)
    if prog is not None:
        prog.finish(img)
    else:
        film.write_image(img, None if args.out == "-" else args.out)
    if args.time:
        print(f"render wall time: {elapsed:.3f}s", file=sys.stderr)
    print("Done.", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
