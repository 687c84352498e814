"""Native (C++) host-side runtime components, loaded via ctypes.

Compiled on demand with g++ into the package directory; every entry point
has a pure-Python fallback so the framework works without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "native.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "libtpuray.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", _SRC, "-o", _LIB],
                check=True, capture_output=True, timeout=120,
            )
        lib = ctypes.CDLL(_LIB)
        lib.ppm_encode_body.restype = ctypes.c_long
        lib.ppm_encode_body.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_long, ctypes.c_void_p,
        ]
        lib.bvh_build.restype = ctypes.c_long
        lib.bvh_build.argtypes = [ctypes.c_void_p, ctypes.c_long, ctypes.c_long] \
            + [ctypes.c_void_p] * 7
        _lib = lib
    except Exception as e:  # pragma: no cover - toolchain missing
        print(f"tpu_ray.native: falling back to Python ({e})", file=sys.stderr)
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def ppm_body(rgb8: np.ndarray) -> Optional[str]:
    """P3 body text for (H, W, 3) uint8, or None if the lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    rgb8 = np.ascontiguousarray(rgb8, np.uint8)
    h, w, _ = rgb8.shape
    out = ctypes.create_string_buffer(h * w * 12 + 16)
    n = lib.ppm_encode_body(
        rgb8.ctypes.data_as(ctypes.c_void_p), h, w, out,
    )
    return out.raw[:n].decode("ascii")


def bvh_build_native(boxes: np.ndarray, leaf_size: int = 4):
    """Flat BVH arrays from (N, 2, 3) AABBs, or None if unavailable.

    Returns (node_min, node_max, child_l, child_r, first, count, order)
    trimmed to the real node count - same layout as tpu_ray.ops.bvh.
    """
    lib = _load()
    if lib is None:
        return None
    boxes = np.ascontiguousarray(boxes.reshape(-1, 6), np.float32)
    n = boxes.shape[0]
    cap = max(2 * n, 2)
    node_min = np.empty((cap, 3), np.float32)
    node_max = np.empty((cap, 3), np.float32)
    child_l = np.empty(cap, np.int32)
    child_r = np.empty(cap, np.int32)
    first = np.empty(cap, np.int32)
    count = np.empty(cap, np.int32)
    order = np.empty(max(n, 1), np.int32)
    m = lib.bvh_build(
        boxes.ctypes.data_as(ctypes.c_void_p), n, leaf_size,
        node_min.ctypes.data_as(ctypes.c_void_p),
        node_max.ctypes.data_as(ctypes.c_void_p),
        child_l.ctypes.data_as(ctypes.c_void_p),
        child_r.ctypes.data_as(ctypes.c_void_p),
        first.ctypes.data_as(ctypes.c_void_p),
        count.ctypes.data_as(ctypes.c_void_p),
        order.ctypes.data_as(ctypes.c_void_p),
    )
    return (node_min[:m], node_max[:m], child_l[:m], child_r[:m],
            first[:m], count[:m], order)
