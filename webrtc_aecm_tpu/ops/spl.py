"""Fixed-point SPL primitives, re-built as vectorized JAX ops.

This is the TPU-native equivalent of the reference's fixed-point signal
processing library (reference: aecm/signal_processing_library.{h,cc},
aecm/spl_inl.h).  Every op here is elementwise / reduction-style jnp code
on int32 / uint32 arrays, designed to reproduce the exact C integer
semantics (two's-complement wrap, arithmetic shifts of negatives,
truncating division) so that downstream Q-domain arithmetic is
bit-faithful to the reference.

Conventions:
  * "w16" values are stored as int32 constrained to [-32768, 32767];
    `to_w16` applies the C `(int16_t)` wrap-around cast.
  * "u32"/"w32" values use jnp.uint32 / jnp.int32 respectively; JAX
    integer arithmetic wraps modulo 2^32, matching the hardware behavior
    the reference relies on.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

I32 = jnp.int32
U32 = jnp.uint32

WORD16_MAX = 32767
WORD16_MIN = -32768
WORD32_MAX = 0x7FFFFFFF
WORD32_MIN = -0x80000000


def i32(x):
    return jnp.asarray(x, dtype=I32)


def u32(x):
    return jnp.asarray(x, dtype=U32)


def to_w16(x):
    """C `(int16_t)` cast: keep low 16 bits, sign-extend (wrap-around)."""
    x = jnp.asarray(x)
    if x.dtype == U32:
        x = x.astype(I32)
    return ((x.astype(I32) + 0x8000) & 0xFFFF) - 0x8000


def sat_w16(x):
    """WebRtcSpl_SatW32ToW16 (spl_inl.h:59-68): clamp int32 to int16 range."""
    return jnp.clip(x.astype(I32), WORD16_MIN, WORD16_MAX)


def add_sat_w16(a, b):
    """WebRtcSpl_AddSatW16 (spl_inl.h:84-86)."""
    return sat_w16(a.astype(I32) + b.astype(I32))


def add_sat_w32(a, b):
    """WebRtcSpl_AddSatW32 (spl_inl.h:70-82): saturating int32 addition."""
    a = a.astype(I32)
    b = b.astype(I32)
    s = (a.astype(U32) + b.astype(U32)).astype(I32)
    overflow = ((a < 0) == (b < 0)) & ((a < 0) != (s < 0))
    sat = jnp.where(s < 0, I32(WORD32_MAX), I32(WORD32_MIN))
    return jnp.where(overflow, sat, s)


def clz32(x):
    """WebRtcSpl_CountLeadingZeros32 (spl_inl.h:40-47): leading zeros of u32.

    `lax.clz` is a single native op on every backend we run (XLA CPU/TPU
    and Mosaic inside Pallas kernels — probed on v5e); the smear+popcount
    chain it replaces was 11 VPU ops, paid at (65, B) several times per
    block in update_channel/energies.  clz(0) = 32 on both paths."""
    return jax.lax.clz(x.astype(U32)).astype(I32)


def norm_w32(a):
    """WebRtcSpl_NormW32 (spl_inl.h:96-98): left-shift headroom of int32."""
    a = a.astype(I32)
    masked = jnp.where(a < 0, ~a, a)
    return jnp.where(a == 0, I32(0), clz32(masked.astype(U32)) - 1)


def norm_u32(a):
    """WebRtcSpl_NormU32 (spl_inl.h:102-104)."""
    a = a.astype(U32)
    return jnp.where(a == 0, I32(0), clz32(a))


def norm_w16(a):
    """WebRtcSpl_NormW16 (spl_inl.h:108-111)."""
    a32 = a.astype(I32)
    masked = jnp.where(a32 < 0, ~a32, a32)
    return jnp.where(a32 == 0, I32(0), clz32(masked.astype(U32)) - 17)


def shift_w32(x, c):
    """WEBRTC_SPL_SHIFT_W32 (signal_processing_library.h:130).

    Positive c => left shift (via multiply, wrapping), negative => arithmetic
    right shift.  Works on int32 or uint32 inputs, preserving dtype semantics.

    Data-dependent shift counts are masked `& 31`, reproducing the x86-64
    variable-shift behavior the reference binary exhibits on the (dead or
    masked-off) lanes where the C code's count would exceed 31; all live
    reference paths use counts in [0, 31].
    """
    x = jnp.asarray(x)
    c = jnp.asarray(c, dtype=I32)
    cpos = (jnp.maximum(c, 0) & 31).astype(U32)
    cneg = (jnp.maximum(-c, 0) & 31)
    if x.dtype == U32:
        left = x * (U32(1) << cpos)
        right = x >> cneg.astype(U32)
    else:
        x = x.astype(I32)
        left = (x.astype(U32) << cpos).astype(I32)
        right = x >> cneg
    return jnp.where(c >= 0, left, right)


def shl_u32(x, c):
    """uint32 left shift with x86 `& 31` count masking (wrapping)."""
    return x.astype(U32) << (jnp.asarray(c, I32) & 31).astype(U32)


def shr_u32(x, c):
    """uint32 logical right shift with x86 `& 31` count masking."""
    return x.astype(U32) >> (jnp.asarray(c, I32) & 31).astype(U32)


def sar_i32(x, c):
    """int32 arithmetic right shift with x86 `& 31` count masking."""
    return x.astype(I32) >> (jnp.asarray(c, I32) & 31)


def shl_i32(x, c):
    """int32 left shift (wrapping) with x86 `& 31` count masking."""
    return (x.astype(U32) << (jnp.asarray(c, I32) & 31).astype(U32)).astype(I32)


def mul_i64_shift_right(x, mult: int, shift: int):
    """(int64(x) * mult) >> shift without 64-bit arithmetic.

    Exact when (mult << shift's discarded bits) decompose cleanly:
    x = q*2^shift + r (arithmetic split), result = q*mult + (r*mult >> shift),
    valid when mult * 2^shift fits int32-per-part — used for the echoFilt
    IIR (aecm_core_c.cc:524-525: (int64{diff} * 50) >> 8).
    """
    assert 0 < mult < (1 << 15) and 0 <= shift < 31
    x = x.astype(I32)
    q = x >> shift
    r = x & ((1 << shift) - 1)
    return q * mult + ((r * mult) >> shift)


def div_trunc(num, den):
    """C integer division: truncation toward zero (num/den, den != 0)."""
    num = num.astype(I32)
    den = den.astype(I32)
    q = num // den  # floor division
    r = num - q * den
    # Floor and trunc differ when remainder non-zero and signs differ.
    adjust = (r != 0) & ((num < 0) != (den < 0))
    return jnp.where(adjust, q + 1, q)


def _u32_to_f32(x):
    """Exact-as-possible uint32 -> float32 (one rounding, <= 2^-24 rel):
    hi/lo 16-bit halves convert exactly; the one add rounds.  Avoids
    uitofp, which Mosaic does not lower for the full uint32 range."""
    x = x.astype(U32)
    hi = (x >> U32(16)).astype(I32).astype(jnp.float32)
    lo = (x & U32(0xFFFF)).astype(I32).astype(jnp.float32)
    return hi * jnp.float32(65536.0) + lo


def _div_u32_u16_core(num, den):
    """floor(num / den) exactly, num uint32 (full range), den uint16 >= 1.

    TPU has no vector integer divide (a lowered `//` costs dozens of ops
    and dominated the kernel's update_channel/Wiener stages); this is an
    f32 estimate plus exact integer refinement, in the style of
    sqrt_floor.  Error budget (generous — holds even if the f32 divide is
    only ~4-ulp faithful, as a reciprocal+Newton lowering may be):

      q0 = trunc(f32(num) / f32(den)): rel err <= ~6*2^-24 (one convert
           rounding + a few-ulp divide) + 1 truncation ->
           |q0 - q| <= 2^32 * 6 * 2^-24 + 1 < 1538.
      r0 = num - q0*den exactly (mod-2^32 int arithmetic; |r0| <=
           1538*65535 + 65534 < 2^31 so its int32 reading is exact).
      q1 = q0 + trunc(f32(r0) / f32(den)): f32(r0) abs err <= |r0|*2^-24
           <= 6.1; divide/round rel err on a <=1539 quotient is < 0.01;
           -> |q1 - q| <= 6.1/den + 1.02 + trunc(1) < 9.
      r1 = num - q1*den (|r1| <= 10*65535, exact in f32), one more
           refinement -> |q2 - q| <= 10*2^-24*... + trunc rounding <= 1,
           pinned exactly by one correction step in each direction.

    Verified against `//` over structured edge cases and random inputs
    (tests/test_spl.py::test_div_fast_exact).
    """
    num = num.astype(U32)
    # den == 1 bypasses the core: its quotient (= num) can exceed int32,
    # overflowing the f32 -> i32 conversions below.  With den >= 2 every
    # intermediate q estimate stays within int32 (q <= 2^31 - 1 + 1538).
    den2 = jnp.maximum(den.astype(I32), I32(2))
    den_f = den2.astype(jnp.float32)                  # exact: den < 2^24
    recip = jnp.float32(1.0) / den_f

    # Clamp below 2^31 before the f32->i32 convert: at den=2 the true
    # quotient reaches 2^31 - 1 and the estimate's f32 neighbor is 2^31,
    # whose conversion is implementation-defined.  The clamp costs at most
    # 127 extra initial error — absorbed by the refinement budget.  (Later
    # estimates may wrap int32 by <= 9; all remainder arithmetic is mod
    # 2^32 so congruence keeps the refinement exact.)
    q0f = jnp.minimum(_u32_to_f32(num) * recip, jnp.float32(2147483520.0))
    q = q0f.astype(I32)                               # trunc toward zero
    # two exact-remainder refinements (all int arithmetic wraps mod 2^32)
    for _ in range(2):
        r = (num - q.astype(U32) * den2.astype(U32)).astype(I32)
        q = q + (r.astype(jnp.float32) * recip).astype(I32)
    # final +/-1 correction (see error budget)
    r = (num - q.astype(U32) * den2.astype(U32)).astype(I32)
    q = jnp.where(r < 0, q - 1, q)
    r = jnp.where(r < 0, r + den2, r)
    q = jnp.where(r >= den2, q + 1, q)
    return jnp.where(den.astype(I32) == 1, num, q.astype(U32))


def div_w32_w16(num, den):
    """WebRtcSpl_DivW32W16 (signal_processing_library.cc:116-123):
    trunc(num/den) for int32 num, int16-range den; WORD32_MAX on den==0.

    Sign-factored over the unsigned fast core (|num| <= 2^31 fits uint32,
    |den| <= 32768 fits uint16).  trunc(num/den) = sign * floor(|num|/|den|).
    """
    num = num.astype(I32)
    den = den.astype(I32)
    safe = jnp.where(den == 0, I32(1), den)
    neg = (num < 0) != (safe < 0)
    q = _div_u32_u16_core(jnp.abs(num).astype(U32),
                          jnp.abs(safe).astype(U32)).astype(I32)
    q = jnp.where(neg, -q, q)
    return jnp.where(den == 0, I32(WORD32_MAX), q)


def div_u32_u16(num, den):
    """WebRtcSpl_DivU32U16 (signal_processing_library.cc:107-114)."""
    num = num.astype(U32)
    den = den.astype(U32)
    safe = jnp.where(den == 0, U32(1), den)
    return jnp.where(den == 0, U32(0xFFFFFFFF),
                     _div_u32_u16_core(num, safe))


def sqrt_floor(value):
    """WebRtcSpl_SqrtFloor (signal_processing_library.cc:84-105):
    floor(sqrt(value)) for value >= 0, and 0 for negative values (the
    reference's comparisons all fail on negatives, leaving root 0).

    f32 sqrt + exact integer correction instead of the reference's 16-step
    successive approximation: ~7 elementwise ops instead of ~100.  Exact
    over the full int32 domain: through convert + sqrt the f32 estimate
    carries < 0.01 absolute error at the max root 46340 (2 ulp sqrt +
    2^-24 convert), so truncation lands within +/-1 of the true floor and
    one uint32-square comparison in each direction pins it ((r+1) <= 46341,
    so the squares fit in uint32).  Verified exhaustively over all 2^31
    non-negative inputs against the 16-step implementation on both the
    TPU and CPU backends (tools/verify_sqrt.py).
    """
    v = jnp.maximum(value.astype(I32), 0)
    vu = v.astype(U32)
    r = jnp.sqrt(v.astype(jnp.float32)).astype(I32)
    ru = r.astype(U32)
    r = jnp.where((ru + U32(1)) * (ru + U32(1)) <= vu, r + 1, r)
    ru = r.astype(U32)
    r = jnp.where(ru * ru > vu, r - 1, r)
    return r


def max_abs_value_w16(vector):
    """WebRtcSpl_MaxAbsValueW16C (signal_processing_library.cc:154-174).

    abs(-32768) participates as 32768 but the return value is clamped to
    32767.  Reduces over the last axis.
    """
    absolute = jnp.abs(vector.astype(I32))
    return jnp.minimum(jnp.max(absolute, axis=-1), I32(WORD16_MAX))


# --- LCG random generator (signal_processing_library.cc:126-147) ------------
#
# seed' = (seed * 69069 + 1) mod 2^31;  RandU returns (int16)(seed' >> 16).
# The reference draws PART_LEN values sequentially per block; we use the
# affine closure of the LCG so all N draws come out of one vectorized op:
#   seed_n = (A_n * seed_0 + C_n) mod 2^31, with A_n = 69069^n, and
#   C_n = (69069^n - 1) / (69069 - 1)  (precomputed mod 2^32; truncating the
# intermediate products to 32 bits is exact for mod-2^31 results).

_LCG_A = 69069
_LCG_MASK = 0x7FFFFFFF


def _lcg_tables(n):
    import numpy as np
    a_pow = []
    c_acc = []
    a, c = 1, 0
    for _ in range(n):
        a = (a * _LCG_A) & 0xFFFFFFFF
        c = (c * _LCG_A + 1) & 0xFFFFFFFF
        a_pow.append(a)
        c_acc.append(c)
    # Cache as numpy so the cache never captures a tracer; jnp conversion
    # happens per-trace at the use site (folds to a constant).
    return (np.array(a_pow, dtype=np.uint32), np.array(c_acc, dtype=np.uint32))


_LCG_TABLE_CACHE = {}


def rand_u_array(seed, n):
    """WebRtcSpl_RandUArray: n sequential RandU draws, vectorized.

    Args:
      seed: uint32 scalar (state), already masked to 31 bits.
      n: static int, number of draws.
    Returns:
      (values, new_seed): values int32 in [0, 32767] of shape (n,) —
      these are the (int16)(seed >> 16) outputs — and the updated seed.
    """
    if n not in _LCG_TABLE_CACHE:
        _LCG_TABLE_CACHE[n] = _lcg_tables(n)
    a_np, c_np = _LCG_TABLE_CACHE[n]
    a_pow = jnp.asarray(a_np)
    c_acc = jnp.asarray(c_np)
    seed = seed.astype(U32)
    seeds = (a_pow * seed + c_acc) & U32(_LCG_MASK)
    values = (seeds >> U32(16)).astype(I32)
    return values, seeds[-1]


def rand_u(seed):
    """Single WebRtcSpl_RandU draw."""
    new_seed = (seed.astype(U32) * U32(_LCG_A) + U32(1)) & U32(_LCG_MASK)
    return (new_seed >> U32(16)).astype(I32), new_seed
