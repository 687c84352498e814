"""Scrambled (0,2)-sequence sampling for the image plane.

The reference jitters each camera sample uniformly within its pixel
(uniformRandomUVs, src/Lib.hs:1352-1371); our default sampler keeps that
estimator (core/rng.hash_uniforms2 columns 0-1).  This module adds an
opt-in low-discrepancy upgrade: the first two dimensions of the Sobol'
sequence - the van der Corput radical inverse and Sobol' direction-2 -
form a (0,2)-sequence in base 2, so every prefix of 2^k samples places
exactly one point in every elementary interval of area 2^-k.  Per-pixel
XOR (digit) scrambling decorrelates neighboring pixels while preserving
that stratification (Kollig & Keller, "Efficient Multidimensional
Sampling", EG 2002).

Everything here is straight-line uint32 bit math on arrays, so the same
functions run in jitted XLA *and inside Pallas kernel bodies* (the fused
pool-step and megakernel regens call them on loaded tiles).  The
sequence index must be the *plain* global sample index - XORing salt
into the index (as the hash path does) would permute sample order and
break prefix stratification; salt goes into the scrambles instead.

Selected per render via ``Camera.sampler`` ("uniform" | "sobol"), a
static pytree field, so every jit cache key picks it up automatically.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

GOLD = np.uint32(0x9E3779B9)
_MIX1 = np.uint32(0x85EBCA6B)
_MIX2 = np.uint32(0xC2B2AE35)

# Direction numbers for Sobol' dimension 2 (primitive polynomial x+1,
# m_k = 1): v_0 = 2^31, v_{k+1} = v_k ^ (v_k >> 1).  Precomputed in
# Python so the generator is 32 unrolled XOR-select steps, no gathers.
_SOBOL2_V = []
_v = 1 << 31
for _ in range(32):
    _SOBOL2_V.append(np.uint32(_v))
    _v ^= _v >> 1
del _v


def _fmix(x: jnp.ndarray) -> jnp.ndarray:
    """murmur3 finalizer (core/rng._murmur3_fmix, restated so kernels can
    import one module)."""
    x = x ^ (x >> 16)
    x = x * _MIX1
    x = x ^ (x >> 13)
    x = x * _MIX2
    x = x ^ (x >> 16)
    return x


def bitrev32(x: jnp.ndarray) -> jnp.ndarray:
    """Reverse the bits of a uint32: the base-2 radical inverse
    (van der Corput) of the integer sample index, as a 0.32 fixed-point
    fraction."""
    x = ((x & np.uint32(0x55555555)) << 1) | ((x >> 1) & np.uint32(0x55555555))
    x = ((x & np.uint32(0x33333333)) << 2) | ((x >> 2) & np.uint32(0x33333333))
    x = ((x & np.uint32(0x0F0F0F0F)) << 4) | ((x >> 4) & np.uint32(0x0F0F0F0F))
    x = ((x & np.uint32(0x00FF00FF)) << 8) | ((x >> 8) & np.uint32(0x00FF00FF))
    return (x << 16) | (x >> 16)


def sobol2_bits(i: jnp.ndarray) -> jnp.ndarray:
    """Sobol' dimension-2 value of index ``i`` as 0.32 fixed point.

    The classic generator: XOR together the direction numbers selected
    by the set bits of ``i``.  Unrolled over the 32 static direction
    constants - branch-free, gather-free, Pallas-safe.
    """
    i = i.astype(jnp.uint32)
    r = jnp.zeros_like(i)
    for k, v in enumerate(_SOBOL2_V):
        bit = (i >> np.uint32(k)) & np.uint32(1)
        r = r ^ (bit * v)
    return r


def pixel_uniforms(slot: jnp.ndarray, sidx: jnp.ndarray, salt) -> tuple:
    """Scrambled (0,2)-Sobol pixel-jitter pair for (slot, sample index).

    ``slot`` is the global pixel/slot id (uint32), ``sidx`` the PLAIN
    global sample index (uint32; do not fold salt into it - see module
    note), ``salt`` the render-level camera salt.  Returns two f32
    arrays in [0, 1).  The XOR scrambles are keyed per slot (and salted)
    so pixels are mutually decorrelated; scrambling preserves the
    elementary-interval stratification of each pixel's sample prefix.

    Quantization to 24 mantissa bits matches core/rng.hash_uniforms'
    convention (values on a 2^-24 grid, never 1.0).
    """
    slot = slot.astype(jnp.uint32)
    sidx = sidx.astype(jnp.uint32)
    salt = jnp.asarray(salt, jnp.uint32)
    sx = _fmix(slot + GOLD) ^ (salt * _MIX1)
    sy = _fmix(sx ^ _MIX2)
    x = bitrev32(sidx) ^ sx
    y = sobol2_bits(sidx) ^ sy
    scale = jnp.float32(1.0 / (1 << 24))
    # Mosaic has no uint32->f32 cast; the shifted value is < 2^24, so the
    # int32 hop is exact (same trick as ops/megakernel._hash_col)
    return ((x >> np.uint32(8)).astype(jnp.int32).astype(jnp.float32) * scale,
            (y >> np.uint32(8)).astype(jnp.int32).astype(jnp.float32) * scale)
