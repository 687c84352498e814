"""Headline benchmark: book-1 final scene, 600x400 @ 100 spp, seed 1024.

The reference renders this exact config in 617.61 s wall-clock on 2 CPU
cores (README.md:9-15, perflogs.org:4-13; see BASELINE.md).  Prints ONE JSON
line on stdout; diagnostics go to stderr.

Extra configs (Cornell 1000 spp, two-spheres) can be benchmarked with
--config; the headline stays book1 so vs_baseline is apples-to-apples.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

BASELINES = {
    # wall-clock seconds of the reference (BASELINE.md)
    "book1": 617.61,       # 600x400 @ 100 spp, 2 cores
    "two-spheres": 45.43,  # 600x400 @ 100 spp, -N2, random-1.2
    "cornell": None,       # image published, no time given
    "cornell-smoke": None,  # image published, no time given
    "next-week": 6874.0,   # 1h54m34s at 400x400 (4 threads)
}

CONFIGS = {
    "book1": dict(scene="book1-final", width=600, height=400, spp=100),
    "two-spheres": dict(scene="two-spheres", width=600, height=400, spp=100),
    "cornell": dict(scene="cornell", width=500, height=500, spp=1000),
    "cornell-smoke": dict(scene="cornell-smoke", width=500, height=500,
                          spp=1000),
    "next-week": dict(scene="next-week-final", width=400, height=400, spp=100),
}


def run(config: str, rays_per_wave: int, out: str | None,
        engine: str = "auto", bvh: bool = False, resume: bool = False,
        rr_depth: int = 0) -> dict:
    from tpu_ray.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from tpu_ray.models.scenes import SCENES
    from tpu_ray.renderer import render
    from tpu_ray.core import film

    cfg = CONFIGS[config]
    spec = SCENES[cfg["scene"]]
    t0 = time.perf_counter()
    scene = spec.build(seed=1024)
    camera = spec.camera(cfg["width"], cfg["height"])
    print(f"[bench] scene build: {time.perf_counter() - t0:.2f}s "
          f"({scene.n_prims} prims)", file=sys.stderr)

    kwargs = dict(
        max_depth=50, seed=1024, rays_per_wave=rays_per_wave,
        engine=engine, bvh=bvh, rr_depth=rr_depth,
    )
    # warmup: compile with the exact wave shapes of the timed run
    from tpu_ray.renderer import plan_pool, resolve_engine, resolve_mode

    mode = resolve_mode(scene, "auto", bvh=bvh, engine=engine)
    t0 = time.perf_counter()
    if mode == "queue":
        # queue executables are keyed by the film-plane shape (P*chunk_spp)
        # and the drain ladder, so the only warmup that compiles the timed
        # run's shapes is a full-config render
        render(scene, camera, cfg["width"], cfg["height"], spp=cfg["spp"],
               **kwargs)
        print(f"[bench] warmup (full {cfg['spp']} spp queue render, incl. "
              f"compile): {time.perf_counter() - t0:.2f}s", file=sys.stderr)
    else:
        k_pool, _, _ = plan_pool(
            scene, cfg["width"], cfg["height"], cfg["spp"], rays_per_wave,
            engine=resolve_engine(scene, engine))
        # one sample per slot: the per-wave sample count is traced, so this
        # compiles the exact executable the timed run reuses
        render(scene, camera, cfg["width"], cfg["height"], spp=k_pool, **kwargs)
        print(f"[bench] warmup ({k_pool} spp, incl. compile): "
              f"{time.perf_counter() - t0:.2f}s", file=sys.stderr)

    from tpu_ray.renderer import clear_auto_checkpoints

    if not resume:
        clear_auto_checkpoints()  # a timed attempt must render from scratch
    t0 = time.perf_counter()
    try:
        img = render(scene, camera, cfg["width"], cfg["height"],
                     spp=cfg["spp"], **kwargs)
    except Exception as e:
        if not resume:
            raise
        # crash-resilient mode: report the time spent so the parent can sum
        # it; the auto checkpoint lets the next attempt resume mid-render
        print(json.dumps({
            "partial": True,
            "elapsed": round(time.perf_counter() - t0, 3),
            "error": type(e).__name__,
        }))
        raise
    elapsed = time.perf_counter() - t0
    msamples = cfg["width"] * cfg["height"] * cfg["spp"] / 1e6
    print(f"[bench] {config}: {elapsed:.3f}s "
          f"({msamples / elapsed:.2f} Msamples/s) on {jax.devices()[0]}",
          file=sys.stderr)
    if out:
        film.write_image(img, out)

    baseline = BASELINES[config]
    return {
        "metric": f"{config}_{cfg['width']}x{cfg['height']}_{cfg['spp']}spp_wall_s",
        "value": round(elapsed, 3),
        "unit": "s",
        "vs_baseline": round(baseline / elapsed, 2) if baseline else None,
        "engine": engine,
        "bvh": bvh,
        **({"rr_depth": rr_depth} if rr_depth else {}),
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="book1", choices=sorted(CONFIGS))
    p.add_argument("--rays-per-wave", type=int, default=1 << 20)
    p.add_argument("--out", default=None, help="optionally save the image")
    p.add_argument("--engine", default="auto", choices=("auto", "xla", "mxu", "pallas", "mega"))
    p.add_argument("--bvh", action="store_true")
    p.add_argument("--rr-depth", type=int, default=0,
                   help="Russian-roulette start depth (0 = off; an rr run "
                        "is a different estimator - never the headline)")
    p.add_argument("--child", action="store_true",
                   help="run the measurement in-process (internal)")
    p.add_argument("--attempts", type=int, default=3)
    p.add_argument("--suite", default="next-week,cornell",
                   help="comma-separated extra configs appended to the "
                        "headline JSON under 'suite' (best-effort: failures "
                        "never lose the headline); '' disables")
    p.add_argument("--resume", action="store_true",
                   help="let attempts resume each other's auto checkpoints; "
                        "the reported value is the SUM of render time across "
                        "attempts (for configs that crash the remote worker)")
    args = p.parse_args(argv)

    if args.child:
        result = run(args.config, args.rays_per_wave, args.out,
                     engine=args.engine, bvh=args.bvh, resume=args.resume,
                     rr_depth=args.rr_depth)
        print(json.dumps(result))
        return 0

    # The remote TPU worker occasionally crashes under sustained load
    # ("TPU worker process crashed or restarted"); a fresh process recovers.
    # Run the measurement in a child and retry so one flake doesn't lose the
    # round's benchmark.
    import os
    import subprocess

    child_args = [sys.executable, os.path.abspath(__file__), "--child",
                  "--config", args.config, "--engine", args.engine,
                  "--rays-per-wave", str(args.rays_per_wave)]
    if args.rr_depth:
        child_args += ["--rr-depth", str(args.rr_depth)]
    if args.bvh:
        child_args += ["--bvh"]
    if args.resume:
        child_args += ["--resume"]
        from tpu_ray.renderer import clear_auto_checkpoints

        clear_auto_checkpoints()  # attempts resume EACH OTHER, not old runs
    if args.out:
        child_args += ["--out", args.out]
    last_err = ""
    partial_s = 0.0
    crashes = 0
    for attempt in range(args.attempts):
        r = subprocess.run(child_args, capture_output=True, text=True)
        sys.stderr.write(r.stderr)
        lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
        parsed = [json.loads(ln) for ln in lines]
        done = next((p_ for p_ in parsed if "metric" in p_), None)
        if r.returncode == 0 and done:
            if partial_s:
                done["value"] = round(done["value"] + partial_s, 3)
                done["crashes"] = crashes
                base = BASELINES[args.config]
                done["vs_baseline"] = (
                    round(base / done["value"], 2) if base else None
                )
            # best-effort extra configs: the VERDICT noted a book1-only
            # bench hides the big-scene numbers from the driver record
            suite = {}
            for extra in filter(None, args.suite.split(",")):
                if extra == args.config or extra not in CONFIGS:
                    continue
                ex_args = [sys.executable, os.path.abspath(__file__),
                           "--child", "--config", extra,
                           "--engine", args.engine,
                           "--rays-per-wave", str(args.rays_per_wave)]
                try:
                    rr = subprocess.run(ex_args, capture_output=True,
                                        text=True, timeout=1800)
                    sys.stderr.write(rr.stderr)
                    ln = [l for l in rr.stdout.splitlines()
                          if l.startswith("{")]
                    if rr.returncode == 0 and ln:
                        d = json.loads(ln[-1])
                        suite[extra] = {"value": d["value"],
                                        "vs_baseline": d["vs_baseline"]}
                except Exception as e:  # never lose the headline
                    print(f"[bench] suite config {extra} failed: {e}",
                          file=sys.stderr)
            if suite:
                done["suite"] = suite
            print(json.dumps(done))
            return 0
        partial_s += sum(p_.get("elapsed", 0.0) for p_ in parsed
                         if p_.get("partial"))
        crashes += 1
        last_err = (r.stdout + r.stderr)[-500:]
        print(f"[bench] attempt {attempt + 1} failed; retrying in 30s",
              file=sys.stderr)
        time.sleep(30)
    print(f"[bench] all attempts failed: {last_err}", file=sys.stderr)
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
