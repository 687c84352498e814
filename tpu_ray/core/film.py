"""Film: tone mapping and image output.

Reproduces the reference color pipeline exactly (src/Lib.hs:287-297):
linear RGB -> gamma-2 (sqrt) -> clamp to [0, 0.999] -> floor(256 x) -> uint8,
and the P3 PPM writer (src/Lib.hs:299-305, app/Main.hs:59-62): header on
stdout, rows of space-separated triples, one image row per line.
"""
from __future__ import annotations

import sys

import numpy as np

__all__ = ["to_rgb8", "write_ppm", "ppm_string", "ppm_body_rows",
           "write_png", "write_pfm", "write_hdr", "write_image",
           "ProgressiveOutput"]


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
    return f"P3\n{w} {h}\n255\n" + ppm_body_rows(rgb8)


def write_ppm(rgb8: np.ndarray, fp=None) -> None:
    """Stream a P3 PPM to ``fp`` (default stdout), like the reference CLI."""
    out = fp if fp is not None else sys.stdout
    out.write(ppm_string(rgb8))


def ppm_body_rows(rgb8: np.ndarray) -> str:
    """P3 body text (no header) for a (H, W, 3) uint8 row block."""
    try:
        from ..native import ppm_body

        body = ppm_body(np.ascontiguousarray(rgb8))
        if body is not None:
            return body
    except Exception:
        pass
    h, w, _ = rgb8.shape
    if h == 0:
        return ""
    flat = rgb8.reshape(h, w * 3)
    return "\n".join(" ".join(map(str, row)) for row in flat) + "\n"


class ProgressiveOutput:
    """Progressive render output (reference: app/Main.hs:62 streams each
    finished row to stdout as it is computed, so a crashed run keeps
    everything rendered so far in the output file).

    Two modes, chosen by ``path``:

    - ``None``/``'-'``: stream P3 PPM rows to stdout the moment they are
      FINAL (all spp accumulated) - top-to-bottom, matching the
      reference's row order.  Rows that never finalize early (unbanded
      renders) are emitted by :meth:`finish`.
    - a file path: atomically rewrite the file with the CURRENT estimate
      on every update, so the image can be watched as it converges and a
      crash keeps the latest partial frame.

    Feed it to ``render(on_partial=po.update)`` and call
    ``po.finish(final_img)`` afterwards.
    """

    def __init__(self, path: str | None, width: int, height: int, fp=None):
        self.path = None if path in (None, "-") else path
        self.w, self.h = width, height
        self.fp = fp
        self.rows_emitted = 0
        self._header_done = False

    def _stream_rows(self, img, rows_final: int) -> None:
        out = self.fp if self.fp is not None else sys.stdout
        if not self._header_done:
            out.write(f"P3\n{self.w} {self.h}\n255\n")
            self._header_done = True
        if rows_final > self.rows_emitted:
            rgb8 = to_rgb8(img[self.rows_emitted:rows_final])
            out.write(ppm_body_rows(rgb8))
            self.rows_emitted = rows_final
        out.flush()

    def update(self, img, rows_final: int) -> None:
        if self.path is None:
            self._stream_rows(img, rows_final)
            return
        tmp = self.path + ".tmp"
        # dispatch on the DESTINATION's extension (the tmp name ends in
        # .tmp): .pfm/.hdr keep the linear radiance like write_image -
        # ADVICE r4: these used to get PNG bytes under a float extension
        if self.path.endswith(".pfm"):
            write_pfm(img, tmp)
        elif self.path.endswith(".hdr"):
            write_hdr(img, tmp)
        elif self.path.endswith(".ppm"):
            with open(tmp, "w") as f:
                write_ppm(to_rgb8(img), f)
        else:
            from PIL import Image

            Image.fromarray(to_rgb8(img), "RGB").save(tmp, format="PNG")
        import os

        os.replace(tmp, self.path)  # readers never see a torn image

    def finish(self, img) -> None:
        """Write whatever the progressive updates have not yet emitted."""
        if self.path is None:
            self._stream_rows(img, self.h)
        else:
            self.update(img, self.h)


def write_png(rgb8: np.ndarray, path: str) -> None:
    from PIL import Image

    Image.fromarray(rgb8, "RGB").save(path)


def write_pfm(img, path: str) -> None:
    """Portable FloatMap: the UNTONEMAPPED linear radiance, f32.

    The reference can only emit quantized PPM; production pipelines want
    the linear signal for compositing/denoising/regrading.  PFM is the
    simplest interchange float format (header + raw scanlines, bottom-up
    rows by convention; negative scale = little-endian).
    """
    a = np.asarray(img, np.float32)
    h, w, _ = a.shape
    with open(path, "wb") as f:
        f.write(b"PF\n%d %d\n-1.0\n" % (w, h))
        f.write(np.ascontiguousarray(a[::-1]).tobytes())


def write_hdr(img, path: str) -> None:
    """Radiance RGBE (.hdr): shared-exponent 8:8:8:8 of the linear
    radiance - 4 bytes/pixel HDR, readable by every compositing tool.

    Flat (uncompressed) scanlines; mantissas floor-quantized from
    frexp's [0.5, 1) normalization per the format's definition.
    """
    a = np.asarray(img, np.float64)
    a = np.nan_to_num(a, nan=0.0, posinf=1e30, neginf=0.0)
    # ceiling keeps frexp's exponent <= 100, so E = exp+128 can never
    # wrap the uint8 (ADVICE r4: a finite ~3.4e38 gave exp 128 -> E 0,
    # decoding the brightest pixel to black)
    a = np.clip(a, 0.0, 1e30)
    h, w, _ = a.shape
    m = a.max(axis=-1)
    mant, exp = np.frexp(m)  # m = mant * 2^exp, mant in [0.5, 1)
    scale = np.where(m > 1e-32, np.ldexp(256.0, -exp), 0.0)
    rgbe = np.zeros((h, w, 4), np.uint8)
    rgbe[..., :3] = np.minimum(a * scale[..., None], 255.0).astype(np.uint8)
    rgbe[..., 3] = np.where(m > 1e-32, exp + 128, 0).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(b"-Y %d +X %d\n" % (h, w))
        f.write(rgbe.tobytes())


def write_image(img, path: str | None) -> None:
    """Tone-map and write; ``None``/``-`` -> PPM on stdout, else by
    extension (.ppm/.png tone-mapped; .pfm/.hdr keep linear radiance)."""
    if path is not None and path.endswith(".pfm"):
        return write_pfm(img, path)
    if path is not None and path.endswith(".hdr"):
        return write_hdr(img, path)
    rgb8 = to_rgb8(img)
    if path is None or path == "-":
        write_ppm(rgb8)
    elif path.endswith(".ppm"):
        with open(path, "w") as f:
            write_ppm(rgb8, f)
    else:
        write_png(rgb8, path)
