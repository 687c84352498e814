"""Owen-scrambled Sobol' sampling for the 5D camera sample.

The reference jitters each camera sample uniformly within its pixel
(uniformRandomUVs, src/Lib.hs:1352-1371); our default sampler keeps that
estimator (core/rng.hash_uniforms2 columns 0-1).  This module adds an
opt-in low-discrepancy upgrade: the first two dimensions of the Sobol'
sequence - the van der Corput radical inverse and Sobol' direction-2 -
form a (0,2)-sequence in base 2, so every prefix of 2^k samples places
exactly one point in every elementary interval of area 2^-k; Sobol'
dims 3-5 (Joe-Kuo direction numbers) extend the stratification to the
lens disk and shutter time.  Per-pixel hash-based OWEN scrambling
(Burley, JCGT 2020) randomizes each pixel's digit tree while preserving
every elementary-interval stratification - unlike the plain XOR
scrambling of Kollig & Keller 2002, which only translates the point set
and keeps its rigid structure.  Measured vs uniform jitter (CPU, 8-seed
mean MSE): two-spheres 24x24@16spp 8.5e-4 -> 8.1e-4, cornell 12x12@64spp
1.48e-2 -> 1.15e-2.

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


def _sobol_dirs(s: int, a: int, m_init: list[int]) -> list[np.uint32]:
    """32 direction numbers from a degree-``s`` primitive polynomial.

    ``a`` packs the middle coefficients (Joe & Kuo's convention: bit s-2
    is a_1, ..., bit 0 is a_{s-1}); ``m_init`` are the first ``s`` odd
    initial values.  Recurrence (Joe & Kuo 2008, eq. 1):
    m_k = 2 a_1 m_{k-1} ^ 2^2 a_2 m_{k-2} ^ ... ^ 2^s m_{k-s} ^ m_{k-s}.
    """
    m = list(m_init)
    for k in range(s, 32):
        mk = (1 << s) * m[k - s] ^ m[k - s]
        for j in range(1, s):
            if (a >> (s - 1 - j)) & 1:
                mk ^= (1 << j) * m[k - j]
        m.append(mk)
    for k, mk in enumerate(m):
        assert mk % 2 == 1 and mk < (1 << (k + 1)), (k, mk)
    return [np.uint32(mk << (31 - k)) for k, mk in enumerate(m)]


# Joe & Kuo (new-joe-kuo-6.21201) dimensions 3-5: the lens-disk (r, phi)
# and shutter-time draws of the camera regen.  Together with dims 1-2 on
# the image plane, the full 5D camera sample of every pixel is one
# scrambled Sobol' point - the stratification extends across defocus and
# motion blur, not just pixel area (VERDICT round 2 item 7).
_SOBOL3_V = _sobol_dirs(2, 1, [1, 3])
_SOBOL4_V = _sobol_dirs(3, 1, [1, 3, 1])
_SOBOL5_V = _sobol_dirs(3, 2, [1, 1, 1])

# Dimensions 6-10: the FIRST-BOUNCE scatter draws of the ``sobol-b0``
# probe sampler (ops/scatter.py column layout): the light/cosine mixture
# coin (col 0), the quad-light uv pair (cols 2-3) and the cosine-
# hemisphere pair (cols 6-7).  Deeper bounces keep the hash stream -
# path decorrelation washes out low-discrepancy structure past the first
# vertex, and 10 joint dims is where Sobol' 2D projections start to
# degrade anyway.
_SOBOL6_V = _sobol_dirs(4, 1, [1, 1, 3, 3])
_SOBOL7_V = _sobol_dirs(4, 4, [1, 3, 5, 13])
_SOBOL8_V = _sobol_dirs(5, 2, [1, 1, 5, 5, 17])
_SOBOL9_V = _sobol_dirs(5, 4, [1, 1, 5, 5, 5])
_SOBOL10_V = _sobol_dirs(5, 7, [1, 1, 7, 11, 19])


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


def sobol_bits(i: jnp.ndarray, dirs) -> jnp.ndarray:
    """Sobol' value of index ``i`` as 0.32 fixed point for one dimension.

    The classic generator: XOR together the direction numbers selected
    by the set bits of ``i``.  Unrolled over the 32 static direction
    constants - branch-free, gather-free, Pallas-safe.
    """
    i = i.astype(jnp.uint32)
    r = jnp.zeros_like(i)
    for k, v in enumerate(dirs):
        bit = (i >> np.uint32(k)) & np.uint32(1)
        r = r ^ (bit * v)
    return r


def sobol2_bits(i: jnp.ndarray) -> jnp.ndarray:
    """Sobol' dimension-2 value of index ``i`` as 0.32 fixed point."""
    return sobol_bits(i, _SOBOL2_V)


def owen_scramble(v: jnp.ndarray, seed: jnp.ndarray) -> jnp.ndarray:
    """Hash-based Owen (nested uniform) scramble of a 0.32 fixed-point
    Sobol' value (Burley, "Practical Hash-Based Owen Scrambling", JCGT
    2020, Laine-Karras construction).

    Operating on the BIT-REVERSED value, each multiply/xor step only
    propagates information toward higher bits, i.e. each original digit
    is permuted by a hash of the digits ABOVE it - exactly Owen's nested
    scrambling.  (Any two scrambles of one base sequence keep O(1)
    pairwise correlation - they share the digit tree - but Owen
    randomizes the within-pixel structure a plain XOR translate cannot.)
    Straight-line uint32 math: Pallas-safe (multiplies wrap mod 2^32).
    """
    x = bitrev32(v)
    x = x ^ (x * np.uint32(0x3D20ADEA))
    x = x + seed
    x = x * ((seed >> np.uint32(16)) | np.uint32(1))
    x = x ^ (x * np.uint32(0x05526C56))
    x = x ^ (x * np.uint32(0x53A22864))
    return bitrev32(x)


def pixel_uniforms(slot: jnp.ndarray, sidx: jnp.ndarray, salt) -> tuple:
    """Owen-scrambled (0,2)-Sobol pixel-jitter pair for (slot, sample
    index).

    ``slot`` is the global pixel/slot id (uint32), ``sidx`` the PLAIN
    global sample index (uint32; do not fold salt into it - see module
    note), ``salt`` the render-level camera salt.  Returns two f32
    arrays in [0, 1).  The Owen scrambles are keyed per slot (and salted)
    so pixels are mutually decorrelated; nested scrambling preserves the
    elementary-interval stratification of each pixel's sample prefix.

    Quantization to 24 mantissa bits matches core/rng.hash_uniforms'
    convention (values on a 2^-24 grid, never 1.0).
    """
    slot = slot.astype(jnp.uint32)
    sidx = sidx.astype(jnp.uint32)
    salt = jnp.asarray(salt, jnp.uint32)
    sx = _fmix(slot + GOLD) ^ (salt * _MIX1)
    sy = _fmix(sx ^ _MIX2)
    x = owen_scramble(bitrev32(sidx), sx)
    y = owen_scramble(sobol2_bits(sidx), sy)
    scale = jnp.float32(1.0 / (1 << 24))
    # Mosaic has no uint32->f32 cast; the shifted value is < 2^24, so the
    # int32 hop is exact (same trick as ops/megakernel._hash_col)
    return ((x >> np.uint32(8)).astype(jnp.int32).astype(jnp.float32) * scale,
            (y >> np.uint32(8)).astype(jnp.int32).astype(jnp.float32) * scale)


def lens_time_uniforms(slot: jnp.ndarray, sidx: jnp.ndarray, salt) -> tuple:
    """Owen-scrambled Sobol' dims 3-5 for (slot, sample index): the
    lens-disk radius/angle and shutter-time draws of the camera regen.

    Same contract as :func:`pixel_uniforms` (plain global sample index,
    per-slot salted Owen scrambles, 24-bit quantization); the seed chain
    continues from pixel_uniforms' so all five camera dims carry
    independent scrambles of one Sobol' point.
    """
    slot = slot.astype(jnp.uint32)
    sidx = sidx.astype(jnp.uint32)
    salt = jnp.asarray(salt, jnp.uint32)
    sx = _fmix(slot + GOLD) ^ (salt * _MIX1)
    sy = _fmix(sx ^ _MIX2)
    sr = _fmix(sy + GOLD)
    sp = _fmix(sr ^ _MIX1)
    st = _fmix(sp + _MIX2)
    r = owen_scramble(sobol_bits(sidx, _SOBOL3_V), sr)
    p = owen_scramble(sobol_bits(sidx, _SOBOL4_V), sp)
    t = owen_scramble(sobol_bits(sidx, _SOBOL5_V), st)
    scale = jnp.float32(1.0 / (1 << 24))
    to_f = lambda v: (v >> np.uint32(8)).astype(jnp.int32).astype(
        jnp.float32) * scale
    return to_f(r), to_f(p), to_f(t)


def bounce0_uniforms(slot: jnp.ndarray, sidx: jnp.ndarray, salt) -> tuple:
    """Owen-scrambled Sobol' dims 6-10 for (slot, sample index): the
    first-bounce scatter draws of the ``sobol-b0`` probe sampler.

    Returns five f32 arrays in [0, 1).  The consumer (integrator.
    _queue_body) keeps the mixture COIN hashed (a QMC coin measurably
    hurts - PERFLOG "Bounce-dim QMC"), so element 0 (dim 6) goes unused
    there and the quad-light uv pair takes elements 1-2 (dims 7-8), the
    cosine-hemisphere pair elements 3-4 (dims 9-10) - ops/scatter.py
    columns (2, 3, 6, 7).  Same contract as :func:`pixel_uniforms`; the
    scramble-seed chain continues from :func:`lens_time_uniforms`' so
    all ten dims carry independent scrambles of one Sobol' point.
    """
    slot = slot.astype(jnp.uint32)
    sidx = sidx.astype(jnp.uint32)
    salt = jnp.asarray(salt, jnp.uint32)
    s = _fmix(slot + GOLD) ^ (salt * _MIX1)
    for _ in range(4):  # advance past the five camera-dim seeds
        s = _fmix(s + GOLD)
    seeds = []
    for _ in range(5):
        s = _fmix(s ^ _MIX2)
        seeds.append(s)
    dirs = (_SOBOL6_V, _SOBOL7_V, _SOBOL8_V, _SOBOL9_V, _SOBOL10_V)
    scale = jnp.float32(1.0 / (1 << 24))
    return tuple(
        (owen_scramble(sobol_bits(sidx, d), sd) >> np.uint32(8))
        .astype(jnp.int32).astype(jnp.float32) * scale
        for d, sd in zip(dirs, seeds))
