"""Bridson Poisson-disk (blue-noise) sample positions.

The reference ships a complete Bridson sampler for jittering sample
positions within a pixel but never calls it (``_poissonRandomUVs``,
src/Lib.hs:1373-1486, k=30, r = sqrt(2)/sqrt(n)).  ``poisson_disk(n, seed)``
is the working equivalent: >= n blue-noise points in the unit square,
exposed as a standalone utility (the renderer's default jitter is the
per-sample counter hash; like the reference, nothing routes through the
Poisson pattern yet).
"""
from __future__ import annotations

import numpy as np

K_CANDIDATES = 30  # candidates per active point, as the reference uses


def poisson_disk(n: int, seed: int = 0) -> np.ndarray:
    """Maximal Poisson-disk point set in [0, 1)^2 with radius sqrt(2)/sqrt(n).

    Bridson's algorithm with a background grid of cell size 1/sqrt(n)
    (the reference uses a = 1/sqrt(n), r = sqrt(2) * a, src/Lib.hs:1400-1402).
    Note the radius geometrically admits only ~n/2 points, so the returned
    count is below ``n`` - a property the reference's (never-called) sampler
    shares.
    """
    rng = np.random.default_rng(seed)
    a = 1.0 / np.sqrt(max(n, 1))
    r = np.sqrt(2.0) * a
    r2 = r * r
    cell = a
    gw = int(np.ceil(1.0 / cell))
    grid = -np.ones((gw, gw), np.int64)

    points = [rng.random(2)]
    gx, gy = (points[0] // cell).astype(int)
    grid[min(gx, gw - 1), min(gy, gw - 1)] = 0
    active = [0]

    def fits(p):
        cx, cy = int(p[0] / cell), int(p[1] / cell)
        x0, x1 = max(cx - 2, 0), min(cx + 3, gw)
        y0, y1 = max(cy - 2, 0), min(cy + 3, gw)
        for i in range(x0, x1):
            for j in range(y0, y1):
                q = grid[i, j]
                if q >= 0:
                    d = points[q] - p
                    if d[0] * d[0] + d[1] * d[1] < r2:
                        return False
        return True

    while active:
        idx = active[-1]
        base = points[idx]
        for _ in range(K_CANDIDATES):
            rho = rng.uniform(r, 2.0 * r)
            theta = rng.uniform(0.0, 2.0 * np.pi)
            p = base + rho * np.array([np.cos(theta), np.sin(theta)])
            if 0.0 <= p[0] < 1.0 and 0.0 <= p[1] < 1.0 and fits(p):
                grid[int(p[0] / cell), int(p[1] / cell)] = len(points)
                active.append(len(points))
                points.append(p)
                break
        else:
            active.pop()

    return np.asarray(points, np.float32)
