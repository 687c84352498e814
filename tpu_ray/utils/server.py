"""Long-lived render server: JSONL requests on stdin, responses on stdout.

The dominant cost of a *process* is warmup - backend init, tracing, and
(cold) remote TPU compilation; the render itself is 0.5-6 s (PERFLOG.md).
The reference has no serving story at all (one process = one image,
app/Main.hs:26-63).  ``python -m tpu_ray --serve`` keeps one process
resident so every render after the first reuses the live backend, the
in-process jit executables, and the built scene pytrees.

Protocol (one JSON object per line):

    request:  {"scene": "cornell", "width": 500, "height": 500, "spp": 1000,
               "out": "/tmp/c.png", "id": 7, ...}
    response: {"id": 7, "ok": true, "out": "/tmp/c.png", "wall_s": 3.8}

Any CLI render flag is accepted as a key (max_depth, seed, engine, mode,
sampler, estimator, rr_depth, adaptive, devices, rays_per_wave,
samples_per_wave, denoise, denoise_radius).  ``out`` is required (the response channel is stdout, so
images always go to files).  Control requests: {"cmd": "ping"} -> liveness
probe, {"cmd": "warm", "scene": ..., ...} -> compile a config's executables
without writing an image, {"cmd": "stats"} -> cached scenes + request and
compile-cache counters, {"cmd": "quit"} -> clean exit.  Malformed or
failing requests answer {"ok": false, "error": ...} and never kill the
server.  Progress/diagnostics stay on stderr.
"""
from __future__ import annotations

import json
import sys
import time

_RENDER_KEYS = (
    "spp", "max_depth", "seed", "rays_per_wave", "samples_per_wave",
    "engine", "mode", "rr_depth", "adaptive", "bvh",
)

_DEFAULTS = dict(
    width=500, height=500, spp=1000, max_depth=50, seed=1024,
    rays_per_wave=1 << 20, samples_per_wave=64, engine="auto", mode="auto",
    sampler="uniform", estimator="fixed", rr_depth=0, adaptive=0.0,
    bvh=False, devices=0, denoise=False, denoise_radius=3,
)


class RenderServer:
    """Caches built scenes by (name, seed, estimator, earthmap); executables
    are cached by jax's in-process jit cache underneath."""

    def __init__(self):
        self._scenes = {}
        self._earth = {}
        self._renders = 0
        self._warms = 0

    def _get_scene(self, name, seed, estimator, earthmap):
        from ..models.scenes import SCENES
        from .assets import load_earth_image

        if name not in SCENES:
            raise ValueError(f"unknown scene {name!r}")
        key = (name, seed, estimator, earthmap)
        if key not in self._scenes:
            if earthmap not in self._earth:
                self._earth[earthmap] = load_earth_image(earthmap)
            scene = SCENES[name].build(seed=seed, earth=self._earth[earthmap])
            if estimator == "reference":
                scene = scene.replace(strict=True)
            self._scenes[key] = scene
        return self._scenes[key]

    def handle(self, req: dict) -> dict:
        """One request -> one response dict (never raises)."""
        rid = req.get("id")
        try:
            resp = self._dispatch(req)
        except Exception as e:  # a bad request must not kill the server
            resp = {"ok": False, "error": f"{type(e).__name__}: {e}"}
        if rid is not None:
            resp["id"] = rid
        return resp

    def _dispatch(self, req: dict) -> dict:
        cmd = req.get("cmd", "render")
        if cmd == "ping":
            return {"ok": True, "pong": True}
        if cmd == "quit":
            return {"ok": True, "quit": True}
        if cmd == "stats":
            from .cache import cache_stats

            return {"ok": True,
                    "cached_scenes": [list(k) for k in self._scenes],
                    "renders": self._renders, "warms": self._warms,
                    "compile_cache": cache_stats()}
        if cmd not in ("render", "warm"):
            raise ValueError(f"unknown cmd {cmd!r}")

        cfg = dict(_DEFAULTS)
        unknown = set(req) - set(_DEFAULTS) - {
            "cmd", "id", "scene", "out", "earthmap"}
        if unknown:
            raise ValueError(f"unknown keys {sorted(unknown)}")
        cfg.update({k: req[k] for k in _DEFAULTS if k in req})
        if "scene" not in req:
            raise ValueError("missing 'scene'")
        out = req.get("out")
        if cmd == "render" and not out:
            raise ValueError("missing 'out' (images go to files; "
                             "stdout is the response channel)")

        from ..core import film
        from ..renderer import render
        from ..models.scenes import SCENES

        scene = self._get_scene(req["scene"], cfg["seed"], cfg["estimator"],
                                req.get("earthmap"))
        camera = SCENES[req["scene"]].camera(cfg["width"], cfg["height"])
        if cfg["sampler"] != "uniform":
            camera = camera.replace(sampler=cfg["sampler"])
        mesh = None
        if cfg["devices"]:
            from ..parallel.mesh import make_mesh

            mesh = make_mesh(cfg["devices"])

        kw = {k: cfg[k] for k in _RENDER_KEYS}
        if cmd == "warm":
            # compile the exact executables the full render would use
            # (bench.warmup's logic; ADVICE r3: warming spp=1 compiled a
            # k_pool=1 executable while the real render's k_pool could
            # differ, so the first render still paid full compilation).
            # Pool-mode shapes are keyed by k_pool (the per-wave sample
            # count is traced), so one sample per pool slot compiles the
            # real executable; queue-mode shapes are keyed by the full
            # film plane, so only the full-spp render warms them.
            from ..renderer import plan_pool, resolve_engine, resolve_mode

            mode = resolve_mode(scene, cfg["mode"], mesh=mesh,
                                bvh=cfg["bvh"], engine=cfg["engine"],
                                spp=kw["spp"])
            if mode != "queue":
                k_pool, _, _ = plan_pool(
                    scene, cfg["width"], cfg["height"], kw["spp"],
                    cfg["rays_per_wave"], cfg["samples_per_wave"],
                    engine=resolve_engine(scene, cfg["engine"]))
                kw["spp"] = k_pool
        t0 = time.perf_counter()
        img = render(scene, camera, cfg["width"], cfg["height"], mesh=mesh,
                     progress=False, **kw)
        wall = time.perf_counter() - t0
        resp = {"ok": True, "wall_s": round(wall, 4),
                "width": cfg["width"], "height": cfg["height"]}
        if cmd == "warm":
            resp["warmed"] = True
            self._warms += 1
        else:
            if cfg["denoise"]:
                # the CLI's --denoise composition: first-hit AOV pass +
                # AOV-guided cross-bilateral filter (tpu_ray/denoise.py)
                import numpy as np

                from ..aov import render_aovs
                from ..denoise import denoise as _denoise
                from ..renderer import resolve_engine

                aov_engine = resolve_engine(scene, cfg["engine"])
                if aov_engine not in ("xla", "pallas"):
                    aov_engine = "xla"
                aovs = render_aovs(scene, camera, cfg["width"],
                                   cfg["height"], spp=min(kw["spp"], 16),
                                   seed=cfg["seed"], engine=aov_engine)
                img = np.asarray(_denoise(
                    img, aovs["albedo"], aovs["normal"], aovs["depth"],
                    radius=cfg["denoise_radius"]))
                resp["denoised"] = True
            film.write_image(img, out)
            resp["out"] = out
            self._renders += 1
        return resp


def serve(stdin=None, stdout=None) -> int:
    """Run the request loop until EOF or {"cmd": "quit"}."""
    stdin = stdin or sys.stdin
    stdout = stdout or sys.stdout
    srv = RenderServer()
    print("[serve] ready (one JSON request per line; "
          '{"cmd": "quit"} exits)', file=sys.stderr)
    print(json.dumps({"ok": True, "ready": True}), file=stdout, flush=True)
    for line in stdin:
        line = line.strip()
        if not line:
            continue
        try:
            req = json.loads(line)
            if not isinstance(req, dict):
                raise ValueError("request must be a JSON object")
        except ValueError as e:
            print(json.dumps({"ok": False, "error": f"bad request: {e}"}),
                  file=stdout, flush=True)
            continue
        resp = srv.handle(req)
        print(json.dumps(resp), file=stdout, flush=True)
        if resp.get("quit"):
            return 0
    return 0
