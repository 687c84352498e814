"""Film: tone mapping and image output.

Reproduces the reference color pipeline exactly (src/Lib.hs:287-297):
linear RGB -> gamma-2 (sqrt) -> clamp to [0, 0.999] -> floor(256 x) -> uint8,
and the P3 PPM writer (src/Lib.hs:299-305, app/Main.hs:59-62): header on
stdout, rows of space-separated triples, one image row per line.
"""
from __future__ import annotations

import sys

import numpy as np

__all__ = ["to_rgb8", "write_ppm", "ppm_string", "write_png", "write_image"]


def to_rgb8(img) -> np.ndarray:
    """Tone-map a linear (H, W, 3) float image to uint8.

    Matches ``scaleColor`` (reference: src/Lib.hs:287-288):
    floor(256 * clamp(sqrt(x), 0, 0.999)).  NaNs map to 0 rather than the
    reference's undefined Word8 floor of NaN.
    """
    x = np.asarray(img, np.float64)
    x = np.nan_to_num(x, nan=0.0, posinf=1.0, neginf=0.0)
    x = np.sqrt(np.maximum(x, 0.0))
    x = np.clip(x, 0.0, 0.999)
    return np.floor(256.0 * x).astype(np.uint8)


def ppm_string(rgb8: np.ndarray) -> str:
    """P3 PPM text for a (H, W, 3) uint8 image (reference: app/Main.hs:59-62).

    Uses the native C++ encoder when available (tpu_ray.native); Python
    fallback otherwise.
    """
    h, w, _ = rgb8.shape
    header = f"P3\n{w} {h}\n255\n"
    try:
        from ..native import ppm_body

        body = ppm_body(rgb8)
        if body is not None:
            return header + body
    except Exception:
        pass
    flat = rgb8.reshape(h, w * 3)
    return header + "\n".join(" ".join(map(str, row)) for row in flat) + "\n"


def write_ppm(rgb8: np.ndarray, fp=None) -> None:
    """Stream a P3 PPM to ``fp`` (default stdout), like the reference CLI."""
    out = fp if fp is not None else sys.stdout
    out.write(ppm_string(rgb8))


def write_png(rgb8: np.ndarray, path: str) -> None:
    from PIL import Image

    Image.fromarray(rgb8, "RGB").save(path)


def write_image(img, path: str | None) -> None:
    """Tone-map and write; ``None``/``-`` -> PPM on stdout, else by extension."""
    rgb8 = to_rgb8(img)
    if path is None or path == "-":
        write_ppm(rgb8)
    elif path.endswith(".ppm"):
        with open(path, "w") as f:
            write_ppm(rgb8, f)
    else:
        write_png(rgb8, path)
