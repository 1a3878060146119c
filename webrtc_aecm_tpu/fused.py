"""Fused lane-major AECM: the whole per-chunk core path as ONE TPU kernel.

The serving step's cost on TPU is dominated not by DSP arithmetic but by
graph structure: every stage boundary, scan carry, and masked-state select
round-trips the ~25 KB/stream core state through HBM (docs/PERFORMANCE.md).
This module re-implements the core path (aecm_core.cc:501-572 frame layer +
aecm_core_c.cc:368-711 block chain + the delay estimator) in a *lane-major*
layout — every state leaf shaped (rows, n_streams) with streams on VPU
lanes — and runs an entire 10 ms chunk (1-2 frames, up to 2 blocks each)
inside a single `pallas_call`, with state resident in VMEM.

Two execution paths share ONE implementation:
  * pure path: `frames_step()` is plain jnp code on lane-major arrays —
    runs under jit on any backend (this is also the CPU test target, kept
    bit-exact against webrtc_aecm_tpu.core via tests/test_fused.py);
  * kernel path: the same `frames_step()` body executes inside a Pallas
    kernel (state refs loaded to values once, stored once), grid over
    128-lane stream tiles.

The control layer (jitter ring via ops/pallas_ring, startup machine,
EstBufDelay — echo_control_mobile.cc) stays outside in XLA: it is scalar
work plus ring data movement that already runs through dedicated kernels.

Bit-exactness contract: identical outputs and state to the reference XLA
path (and hence to the C oracle) for every input; enforced by
tests/test_fused.py (CPU) and tools/check_fused_parity.py (TPU).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from . import control
from . import core as core_mod
from . import defines as D
from . import delay_estimator as de
from . import tables
from .ops import fft as fft_mod
from .ops import ring_buffer as rbuf
from .ops import spl

I32 = jnp.int32
U32 = jnp.uint32
F32 = jnp.float32

import os as _os
LANE_TILE = int(_os.environ.get("AECM_FUSED_LANE_TILE", "512"))
# Max streams per kernel program (multiple of the 128 VPU lane width).
# 512 measured best at B=1024 on v5e: larger tiles amortize per-program
# overhead and widen vector ops; VMEM residency (~25 KB/stream, doubled
# for in+out) bounds it.  _pick_tile shrinks to divide the batch.


def _pick_tile(b: int) -> int:
    """Largest multiple of 128 that divides b, capped at LANE_TILE;
    0 if b is not a multiple of 128 (caller falls back to the pure path)."""
    t = min(LANE_TILE, b)
    while t >= 128:
        if b % t == 0:
            return t
        t -= 128
    return 0


# ---------------------------------------------------------------------------
# Static tables, packed for kernel input (kernels cannot capture constants)
# ---------------------------------------------------------------------------

class Tables(NamedTuple):
    """All constant tables the core path needs: (rows, 1) columns that
    broadcast against (rows, B) lane-major data, plus int8 row-permutation
    matrices applied on the MXU (see _perm_apply)."""
    win128: jnp.ndarray        # (128, 1) sqrt-Hanning analysis window
    fwr_rows: jnp.ndarray      # (7*128, 1) per-stage PER-ROW twiddles wr
    fws_rows: jnp.ndarray      # (7*128, 1) per-stage per-row twiddles ws
    perm_fwd: jnp.ndarray      # (128, 128) int8 bit-reversal permutation
    perm_ifft_re: jnp.ndarray  # (128, 65) int8 conj-extend + bit-reverse
    perm_ifft_im: jnp.ndarray  # (128, 65) int8, tail rows negated
    cos360: jnp.ndarray        # (360, 1) Q13 cosine table (CNG)
    sin360: jnp.ndarray        # (360, 1) Q13 sine table (CNG)
    lcg_a: jnp.ndarray         # (64, 1) uint32 LCG A powers
    lcg_c: jnp.ndarray         # (64, 1) uint32 LCG C accumulants


def _bitrev7(i: int) -> int:
    return int(f"{i:07b}"[::-1], 2)


@functools.lru_cache(maxsize=None)
def _tables_np():
    h = np.asarray(tables.SQRT_HANNING, np.int32)          # (65,)
    win128 = np.concatenate([h[:D.PART_LEN], h[D.PART_LEN:0:-1]])
    # Per-row twiddles: row i of stage s uses twiddle index i mod 2^s
    # (both butterfly halves share it — see _complex_fft_128).
    fwr = np.zeros((7, 128), np.int32)
    fws = np.zeros((7, 128), np.int32)
    for s in range(7):
        l = 1 << s
        fwr[s] = np.asarray(fft_mod._STAGE_WR[s], np.int32)[
            np.arange(128) % l]
        fws[s] = np.asarray(fft_mod._STAGE_WS[s], np.int32)[
            np.arange(128) % l]
    # Permutation matrices (entries in {-1, 0, 1}): forward = 7-bit
    # bit-reversal; inverse = conjugate-symmetric extension of the 65-bin
    # CCS half-spectrum fused with the bit-reversal (real_fft.c:74-102).
    p_fwd = np.zeros((128, 128), np.int8)
    p_re = np.zeros((128, 65), np.int8)
    p_im = np.zeros((128, 65), np.int8)
    for i in range(128):
        j = _bitrev7(i)
        p_fwd[i, j] = 1
        src = j if j <= 64 else 128 - j
        p_re[i, src] = 1
        p_im[i, src] = 1 if j <= 64 else -1
    cos = np.asarray(tables.COS_TABLE_360, np.int32)
    sin = np.asarray(tables.SIN_TABLE_360, np.int32)
    a_np, c_np = spl._lcg_tables(D.PART_LEN)
    return (win128.astype(np.int32), fwr.reshape(-1), fws.reshape(-1),
            p_fwd, p_re, p_im, cos, sin, a_np, c_np)


def make_tables() -> Tables:
    (win128, fwr, fws, p_fwd, p_re, p_im, cos, sin, a_np,
     c_np) = _tables_np()
    col = lambda x, dt: jnp.asarray(x, dt)[:, None]
    return Tables(win128=col(win128, I32), fwr_rows=col(fwr, I32),
                  fws_rows=col(fws, I32),
                  perm_fwd=jnp.asarray(p_fwd),
                  perm_ifft_re=jnp.asarray(p_re),
                  perm_ifft_im=jnp.asarray(p_im),
                  cos360=col(cos, I32),
                  sin360=col(sin, I32), lcg_a=col(a_np, U32),
                  lcg_c=col(c_np, U32))


# ---------------------------------------------------------------------------
# Layout conversion: batch-leading pytree <-> lane-major pytree
# ---------------------------------------------------------------------------

FAR_HIST_ROWS = 40
# Fused-layout far history: each 65-bin block packs into 40 int32 rows —
# bin f in the low 16 bits of row f, bin f+40 in the high 16 bits (bins
# 65..79 are zero padding).  Two wins over the naive (100*65, B) uint16
# layout (measured ~0.15 ms/chunk of the kernel): 40 rows start every
# block on an (8-sublane int32) tile boundary, so shifts and the
# (100, 40, B) view are relayout-free; and the aligned-fetch masked
# reduction runs over half the rows with no uint16->int32 widening pass
# (Mosaic only reduces 32-bit types).


def _pack_far_block(xfa_rows):
    """(80, B) int32 bin rows (values in [0, 65535]) -> (40, B) packed."""
    lo = xfa_rows[:FAR_HIST_ROWS].astype(U32)
    hi = xfa_rows[FAR_HIST_ROWS:].astype(U32)
    return (lo | (hi << U32(16))).astype(I32)


def _unpack_far_block(packed):
    """(..., 40, B) packed int32 -> (..., 80, B) bin rows int32."""
    v = packed.astype(U32)
    lo = (v & U32(0xFFFF)).astype(I32)
    hi = (v >> U32(16)).astype(I32)
    return jnp.concatenate([lo, hi], axis=-2)


def to_fused_core(core_b):
    """Batched CoreState (leaves (B, ...)) -> lane-major (rows, B) leaves.

    Scalars (B,) -> (1, B); vectors (B, L) -> (L, B); far_history
    (B, 100, 65) uint16 -> bit-packed (100*FAR_HIST_ROWS, B) int32.  Same
    CoreState container, different layout.
    """
    fh = jnp.pad(core_b.far_history.astype(jnp.uint32),
                 ((0, 0), (0, 0), (0, 2 * FAR_HIST_ROWS - D.PART_LEN1)))
    packed = (fh[:, :, :FAR_HIST_ROWS]
              | (fh[:, :, FAR_HIST_ROWS:] << 16)).astype(jnp.int32)
    core_b = core_b._replace(far_history=packed)

    def conv(x):
        if x.ndim == 1:
            return x[None, :]
        if x.ndim == 2:
            return x.T
        b = x.shape[0]
        return x.reshape(b, -1).T
    return jax.tree_util.tree_map(conv, core_b)


def from_fused_core(core_f, template=None):
    """Inverse of to_fused_core; template supplies original trailing shapes
    (defaults to a fresh CoreState)."""
    if template is None:
        template = core_mod.create_core(8000)
    template = template._replace(far_history=jnp.zeros(
        (D.MAX_DELAY, FAR_HIST_ROWS), jnp.int32))

    def conv(x, t):
        if t.ndim == 0:
            return x[0]
        if t.ndim == 1:
            return x.T
        return x.T.reshape((x.shape[1],) + t.shape)
    core_b = jax.tree_util.tree_map(conv, core_f, template)
    v = core_b.far_history.astype(jnp.uint32)
    bins = jnp.concatenate([(v & 0xFFFF), (v >> 16)], axis=-1)
    return core_b._replace(
        far_history=bins[:, :, :D.PART_LEN1].astype(jnp.uint16))


# ---------------------------------------------------------------------------
# Lane-major helpers (rows on sublanes, streams on lanes)
# ---------------------------------------------------------------------------

def _row(x, i):
    """x[..., i] of the row-major layout: one (1, B) row."""
    return x[i:i + 1]


def _set_row(x, i, v):
    """x.at[..., i].set(v) as static concatenation (v: (1, B))."""
    if i == 0:
        return jnp.concatenate([v, x[1:]], axis=0)
    if i == x.shape[0] - 1:
        return jnp.concatenate([x[:i], v], axis=0)
    return jnp.concatenate([x[:i], v, x[i + 1:]], axis=0)


def _shift_in(x, v):
    """jnp.roll(x, 1, axis)[0] = v — history shift register, newest first."""
    return jnp.concatenate([v, x[:-1]], axis=0)


def _sum0(x, dtype=None):
    return jnp.sum(x, axis=0, keepdims=True, dtype=dtype)


def _sum0_u32(x):
    """uint32 row sum via int32 (Mosaic has no unsigned reductions; two's-
    complement wraparound addition is bit-identical)."""
    return jnp.sum(x.astype(U32).astype(I32), axis=0,
                   keepdims=True).astype(U32)


def _max_abs_w16_0(x):
    """spl.max_abs_value_w16 over the row axis."""
    return jnp.minimum(jnp.max(jnp.abs(x.astype(I32)), axis=0,
                               keepdims=True), I32(spl.WORD16_MAX))


def _iota_col(n, dtype=I32):
    return jax.lax.broadcasted_iota(dtype, (n, 1), 0)


def _select_row_at(values, index):
    """values[index] with a traced per-lane (1, B) index: one-hot masked sum
    (no per-lane gathers on TPU).  values: (L, B), index: (1, B)."""
    oh = _iota_col(values.shape[0]) == index
    return _sum0(jnp.where(oh, values, jnp.zeros((), values.dtype)))


# ---------------------------------------------------------------------------
# FFT pair, lane-major in-kernel form (same arithmetic as ops/fft.py
# _complex_*_bmaj, restructured for Mosaic: row permutations as exact int8
# MXU matmuls, butterflies as static sublane rolls + iota masks — no
# reshapes/transposes, which relayout (128, B) data every stage)
# ---------------------------------------------------------------------------

def _perm_apply(p, x):
    """y = p @ x exactly: p int8 with entries in {-1, 0, 1}, x int32 rows in
    int16 range.  x splits into three int8 planes (x = h·2^14 + m·2^7 + l,
    two's-complement exact) so each product stays in int8 and the MXU
    accumulates in int32 — bit-exact, unlike f32 matmuls (bf16 MXU trap,
    docs/PERFORMANCE.md rule 3)."""
    lo = (x & 127).astype(jnp.int8)
    mid = ((x >> 7) & 127).astype(jnp.int8)
    hi = (x >> 14).astype(jnp.int8)
    dot = lambda a: jax.lax.dot_general(
        p, a, (((1,), (0,)), ((), ())), preferred_element_type=I32)
    return dot(lo) + (dot(mid) << 7) + (dot(hi) << 14)


def _butterfly_inputs(fr, fi, s: int):
    """Stage-s butterfly operands via ±2^s static sublane rolls.

    Row i pairs with row i ^ 2^s; rows with bit s clear are the 'a' half,
    set are the 'b' half; both use twiddle index (i mod 2^s), so the
    per-row twiddle tables in Tables apply uniformly."""
    l = 1 << s
    is_a = (_iota_col(128) & l) == 0
    ar = jnp.where(is_a, fr, jnp.roll(fr, l, axis=0))
    ai = jnp.where(is_a, fi, jnp.roll(fi, l, axis=0))
    br = jnp.where(is_a, jnp.roll(fr, -l, axis=0), fr)
    bi = jnp.where(is_a, jnp.roll(fi, -l, axis=0), fi)
    return is_a, ar, ai, br, bi


def _complex_fft_128(fr, fi, t: Tables):
    """ops/fft.py _complex_fft_bmaj, order 7 mode 1."""
    from .defines import CFFTSFT, CFFTRND, CFFTRND2
    for s in range(7):
        wr = t.fwr_rows[s * 128:(s + 1) * 128]
        wi = -t.fws_rows[s * 128:(s + 1) * 128]
        is_a, ar, ai, br, bi = _butterfly_inputs(fr, fi, s)
        tr = (wr * br - wi * bi + CFFTRND) >> (15 - CFFTSFT)
        ti = (wr * bi + wi * br + CFFTRND) >> (15 - CFFTSFT)
        qr = (ar.astype(U32) << U32(CFFTSFT)).astype(I32)
        qi = (ai.astype(U32) << U32(CFFTSFT)).astype(I32)
        sgn = jnp.where(is_a, I32(1), I32(-1))
        fr = spl.to_w16((qr + sgn * tr + CFFTRND2) >> (1 + CFFTSFT))
        fi = spl.to_w16((qi + sgn * ti + CFFTRND2) >> (1 + CFFTSFT))
    return fr, fi


def _complex_ifft_128(fr, fi, t: Tables):
    """ops/fft.py _complex_ifft_bmaj, order 7 mode 1; scale: (1, B)."""
    from .defines import CIFFTSFT, CIFFTRND
    scale = jnp.zeros((1, fr.shape[-1]), dtype=I32)
    for s in range(7):
        maxabs = jnp.minimum(
            jnp.maximum(jnp.max(jnp.abs(fr), axis=0, keepdims=True),
                        jnp.max(jnp.abs(fi), axis=0, keepdims=True)),
            I32(32767))
        shift = ((maxabs > 13573).astype(I32)
                 + (maxabs > 27146).astype(I32))      # (1, B)
        scale = scale + shift
        rnd = (I32(8192).astype(U32) << shift.astype(U32)).astype(I32)

        wr = t.fwr_rows[s * 128:(s + 1) * 128]
        wi = t.fws_rows[s * 128:(s + 1) * 128]
        is_a, ar, ai, br, bi = _butterfly_inputs(fr, fi, s)
        tr = (wr * br - wi * bi + CIFFTRND) >> (15 - CIFFTSFT)
        ti = (wr * bi + wi * br + CIFFTRND) >> (15 - CIFFTSFT)
        qr = (ar.astype(U32) << U32(CIFFTSFT)).astype(I32)
        qi = (ai.astype(U32) << U32(CIFFTSFT)).astype(I32)
        sgn = jnp.where(is_a, I32(1), I32(-1))
        fr = spl.to_w16((qr + sgn * tr + rnd) >> (shift + CIFFTSFT))
        fi = spl.to_w16((qi + sgn * ti + rnd) >> (shift + CIFFTSFT))
    return fr, fi, scale


def _real_forward_fft(x128, t: Tables):
    """real_forward_fft, lane-major: (128, B) -> (65, B) re/im."""
    fr = _perm_apply(t.perm_fwd, x128.astype(I32))
    fi = jnp.zeros_like(fr)
    fr, fi = _complex_fft_128(fr, fi, t)
    return fr[:65], fi[:65]


def _real_inverse_fft(re, im, t: Tables):
    """real_inverse_fft, lane-major: (65, B) -> ((128, B), scale (1, B)).

    The conjugate-symmetric extension of the 65-bin CCS half-spectrum
    (real_fft.c:74-102) and the bit-reversal fuse into one fixed row
    permutation; the im tail's negation rides in the matrix as -1 entries
    (the post-hoc to_w16 reproduces the reference's int16 wrap of -(-32768))."""
    fr = _perm_apply(t.perm_ifft_re, re.astype(I32))
    fi = spl.to_w16(_perm_apply(t.perm_ifft_im, im.astype(I32)))
    fr, fi, scale = _complex_ifft_128(fr, fi, t)
    return fr, scale


# ---------------------------------------------------------------------------
# Delay estimator, lane-major port (mirrors delay_estimator.py; any
# history size and any lookahead capacity, taken from the array shapes —
# AECM itself always uses lookahead capacity 0, but reconfigured states
# built with max_lookahead > 0 serve in the same kernel.)
# ---------------------------------------------------------------------------

def _binary_spectrum_fix_f(spectrum, mean_spectrum, q_domain, initialized):
    """delay_estimator.binary_spectrum_fix, (65, B) rows / (1, B) scalars."""
    band = _iota_col(D.PART_LEN1)
    in_band = (band >= D.BAND_FIRST) & (band <= D.BAND_LAST)
    shift = 15 - q_domain.astype(I32)                      # (1, B)
    spectrum_q15 = (spectrum.astype(U32) << shift.astype(U32)).astype(I32)

    init_thresh = jnp.where(in_band & (spectrum > 0), spectrum_q15 >> 1,
                            mean_spectrum)
    any_nonzero = jnp.any(in_band & (spectrum > 0), axis=0, keepdims=True)
    do_init = initialized == 0
    mean_spectrum = jnp.where(do_init, init_thresh, mean_spectrum)
    initialized = jnp.where(do_init & any_nonzero, I32(1), initialized)

    updated = de.mean_estimator_fix(spectrum_q15, 6, mean_spectrum)
    mean_spectrum = jnp.where(in_band, updated, mean_spectrum)
    bit_on = in_band & (spectrum_q15 > mean_spectrum)
    weights = jnp.where(
        bit_on,
        U32(1) << jnp.clip(band - D.BAND_FIRST, 0, None).astype(U32),
        U32(0))
    bits = _sum0_u32(weights)                               # (1, B)
    return bits, mean_spectrum, initialized


def _add_far_spectrum_fix_f(farend: de.FarendState, spectrum, far_q):
    """delay_estimator.add_far_spectrum_fix, lane-major."""
    bits, mean, inited = _binary_spectrum_fix_f(
        spectrum, farend.mean_spectrum, far_q, farend.spectrum_initialized)
    history = _shift_in(farend.binary_history, bits)
    counts = _shift_in(farend.bit_counts,
                       jax.lax.population_count(bits).astype(I32))
    return de.FarendState(history, counts, mean, inited)


def _argmin0(v):
    """First index of the minimum along rows (int32-safe argmin)."""
    mn = jnp.min(v, axis=0, keepdims=True)
    iota = jax.lax.broadcasted_iota(I32, v.shape, 0)
    idx = jnp.min(jnp.where(v == mn, iota, I32(2 ** 30)), axis=0,
                  keepdims=True)
    return mn, idx


def _process_binary_spectrum_f(near: de.NearState, farend: de.FarendState,
                               bits):
    """delay_estimator.process_binary_spectrum, lane-major.  Lookahead
    capacity > 1 (delay_estimator.py:431-436, mirroring
    delay_estimator.cc:536-543) keeps the near binary history as a
    shift register and compares the row at the runtime per-stream
    lookahead — a one-hot masked row select."""
    history_size = near.bit_counts.shape[0]
    la_cap = near.binary_history.shape[0]
    if la_cap > 1:
        hist = _shift_in(near.binary_history, bits)
        near = near._replace(binary_history=hist)
        sel = jnp.clip(near.lookahead, 0, la_cap - 1)
        binary_near = _sum0_u32(
            jnp.where(_iota_col(la_cap) == sel, hist, U32(0)))
    else:
        near = near._replace(binary_history=bits)
        binary_near = bits

    bit_counts = jax.lax.population_count(
        binary_near ^ farend.binary_history).astype(I32)   # (100, B)

    bit_count_q9 = bit_counts << 9
    shifts = D.SHIFTS_AT_ZERO - ((D.SHIFTS_LINEAR_SLOPE * farend.bit_counts)
                                 >> 4)
    mean_main = near.mean_bit_counts[:history_size]
    updated_mean = de.mean_estimator_fix(bit_count_q9, shifts, mean_main)
    mean_main = jnp.where(farend.bit_counts > 0, updated_mean, mean_main)
    mean_bit_counts = jnp.concatenate(
        [mean_main, near.mean_bit_counts[history_size:]], axis=0)

    value_best, candidate_delay = _argmin0(mean_main)
    candidate_delay = jnp.where(value_best < D.MAX_BITCOUNTS_Q9,
                                candidate_delay, I32(-1))
    value_best = jnp.minimum(value_best, I32(D.MAX_BITCOUNTS_Q9))
    value_worst = jnp.maximum(jnp.max(mean_main, axis=0, keepdims=True),
                              I32(0))
    valley_depth = value_worst - value_best

    threshold = jnp.maximum(value_best + D.PROBABILITY_OFFSET,
                            I32(D.PROBABILITY_LOWER_LIMIT))
    update_min_prob = ((near.minimum_probability > D.PROBABILITY_LOWER_LIMIT)
                       & (valley_depth > D.PROBABILITY_MIN_SPREAD)
                       & (near.minimum_probability > threshold))
    minimum_probability = jnp.where(update_min_prob, threshold,
                                    near.minimum_probability)
    last_delay_probability = near.last_delay_probability + 1

    valid_candidate = ((valley_depth > D.PROBABILITY_OFFSET)
                       & ((value_best < minimum_probability)
                          | (value_best < last_delay_probability)))

    non_stationary_farend = jnp.any(farend.bit_counts > 0, axis=0,
                                    keepdims=True)

    near = near._replace(bit_counts=bit_counts,
                         mean_bit_counts=mean_bit_counts,
                         minimum_probability=minimum_probability,
                         last_delay_probability=last_delay_probability)

    # --- UpdateRobustValidationStatistics (masked per-field, as in the
    # reference: only applied when the farend is non-stationary) ---
    valley_f = valley_depth.astype(F32) * F32(D.Q14_SCALING)
    max_hits_for_slow_change = jnp.where(
        candidate_delay < near.last_delay,
        I32(D.MAX_HITS_WHEN_POSSIBLY_NON_CAUSAL),
        I32(D.MAX_HITS_WHEN_POSSIBLY_CAUSAL))
    new_candidate = candidate_delay != near.last_candidate_delay
    cand_hits_upd = jnp.where(new_candidate, I32(0), near.candidate_hits) + 1

    i101 = _iota_col(history_size + 1)
    is_cand = i101 == candidate_delay
    hist_upd = jnp.where(
        is_cand, jnp.minimum(near.histogram + valley_f, F32(D.HISTOGRAM_MAX)),
        near.histogram)
    decrease_in_last_set = jnp.where(
        cand_hits_upd < max_hits_for_slow_change,
        (_select_row_at(near.mean_bit_counts, near.compare_delay)
         - value_best).astype(F32) * F32(D.Q14_SCALING),
        valley_f)
    in_range = i101 < history_size
    is_in_last_set = ((i101 >= near.last_delay - 2)
                      & (i101 <= near.last_delay + 1)
                      & (i101 != candidate_delay))
    is_in_candidate_set = ((i101 >= candidate_delay - 2)
                           & (i101 <= candidate_delay + 1))
    dec = (decrease_in_last_set * is_in_last_set.astype(F32)
           + valley_f * (~is_in_last_set
                         & ~is_in_candidate_set).astype(F32))
    hist_upd = jnp.where(in_range, jnp.maximum(hist_upd - dec, F32(0.0)),
                         hist_upd)

    near = near._replace(
        histogram=jnp.where(non_stationary_farend, hist_upd, near.histogram),
        candidate_hits=jnp.where(non_stationary_farend, cand_hits_upd,
                                 near.candidate_hits),
        last_candidate_delay=jnp.where(non_stationary_farend,
                                       candidate_delay,
                                       near.last_candidate_delay))

    # --- histogram-based + robust validation (runtime toggle) ---
    hist_cand = _select_row_at(near.histogram, candidate_delay)
    delay_difference = (candidate_delay - near.last_delay).astype(F32)
    allowed = near.allowed_offset.astype(F32)
    fraction = jnp.where(
        delay_difference > allowed,
        jnp.maximum(1.0 - D.FRACTION_SLOPE * (delay_difference - allowed),
                    F32(D.MIN_FRACTION_WHEN_POSSIBLY_CAUSAL)),
        jnp.where(delay_difference < 0,
                  jnp.minimum(D.MIN_FRACTION_WHEN_POSSIBLY_NON_CAUSAL
                              - D.FRACTION_SLOPE * delay_difference,
                              F32(1.0)),
                  F32(1.0)))
    h_threshold = _select_row_at(near.histogram, near.compare_delay) * fraction
    h_threshold = jnp.maximum(h_threshold, F32(D.MIN_HISTOGRAM_THRESHOLD))
    is_histogram_valid = ((hist_cand >= h_threshold)
                          & (near.candidate_hits > D.MIN_REQUIRED_HITS))
    is_robust = (near.last_delay < 0) & (valid_candidate | is_histogram_valid)
    is_robust = is_robust | (valid_candidate & is_histogram_valid)
    is_robust = is_robust | (is_histogram_valid
                             & (hist_cand > near.last_delay_histogram))
    # logical blend, not select_n: Mosaic cannot select between i1 vectors
    use_rv = near.robust_validation_enabled != 0
    valid_candidate = ((use_rv & is_robust)
                       | (~use_rv & valid_candidate))

    do_update = non_stationary_farend & valid_candidate
    changed = do_update & (candidate_delay != near.last_delay)

    last_delay_histogram = jnp.where(
        changed, jnp.minimum(hist_cand, F32(D.LAST_HISTOGRAM_MAX)),
        near.last_delay_histogram)
    histogram = jnp.where(
        (i101 == near.compare_delay) & changed
        & (hist_cand < near.histogram),
        hist_cand, near.histogram)

    last_delay = jnp.where(do_update, candidate_delay, near.last_delay)
    last_delay_probability = jnp.where(
        do_update & (value_best < near.last_delay_probability),
        value_best, near.last_delay_probability)
    compare_delay = jnp.where(do_update, last_delay, near.compare_delay)

    near = near._replace(
        histogram=histogram,
        last_delay=last_delay,
        last_delay_probability=last_delay_probability,
        compare_delay=compare_delay,
        last_delay_histogram=last_delay_histogram)
    return near, last_delay


def _process_fix_f(near: de.NearState, farend: de.FarendState,
                   near_spectrum, near_q):
    """delay_estimator.process_fix, lane-major."""
    bits, mean, inited = _binary_spectrum_fix_f(
        near_spectrum, near.mean_spectrum, near_q,
        near.spectrum_initialized)
    near = near._replace(mean_spectrum=mean, spectrum_initialized=inited)
    return _process_binary_spectrum_f(near, farend, bits)


# ---------------------------------------------------------------------------
# Core block path, lane-major port (mirrors core.py function by function;
# the CNG RNG/phase lookup is hoisted OUT — see make_fused_chunk_step)
# ---------------------------------------------------------------------------

def _push_far_pending(ctx, far_spectrum, far_q):
    """Deferred core.update_far_history: instead of shifting the 4000-row
    history every slot (a full VMEM pass per slot gated by another
    whole-leaf per-slot select), new blocks accumulate in a pending list
    and merge into the history ONCE per frames_step (_far_merge_deferred).
    Slot activity is monotone, so an active slot s always has exactly s
    pending predecessors; inactive slots push garbage rows that the
    n_act-keyed merge never selects."""
    b = far_spectrum.shape[-1]
    pad = jnp.zeros((2 * FAR_HIST_ROWS - D.PART_LEN1, b), I32)
    ctx["pending"].append(_pack_far_block(
        jnp.concatenate([far_spectrum, pad], axis=0)))
    ctx["pending_q"].append(far_q)


def _aligned_farend_deferred(ctx, delay):
    """core.aligned_farend against the deferred view: delay d in this
    slot (s pending predecessors + this slot's own block) resolves to
    pending[s - d] for d <= s, else to OLD history block d - s - 1.  The
    old-history fetch is the usual one-hot masked sum over the 100 packed
    blocks; the pending overrides are s+1 row selects.

    Two storage orders for the old history: newest-first (legacy,
    ctx["head0"] is None) or circular (block written when the global head
    was p lives at row-group p; "idx_old blocks before the newest old
    block" is row-group (head0 - 1 - idx_old) mod 100).  The circular
    order makes the history append a tiny uniform dynamic_update_slice
    OUTSIDE the kernel instead of a whole-array merge inside it."""
    hist_p, q_old = ctx["hist"], ctx["q"]
    pending, pending_q = ctx["pending"], ctx["pending_q"]
    s = len(pending) - 1
    b = hist_p.shape[-1]
    hist = hist_p.reshape(D.MAX_DELAY, FAR_HIST_ROWS, b)
    idx_old = delay - (s + 1)
    head0 = ctx.get("head0")
    if head0 is None:
        in_old = delay < D.MAX_DELAY     # delays 100..100+s must NOT
        tgt = idx_old
    else:
        in_old = (delay < D.MAX_DELAY) & (idx_old >= 0)
        # (head0 - 1 - idx_old) mod 100 without an integer-division mod:
        # head0 in [0, 100), idx_old masked >= 0, so one conditional
        # subtract suffices (out-of-range garbage for idx_old < 0 never
        # matches because in_old gates the one-hot).
        tgt = head0 + (D.MAX_DELAY - 1) - idx_old
        tgt = jnp.where(tgt >= D.MAX_DELAY, tgt - D.MAX_DELAY, tgt)
    oh = ((jax.lax.broadcasted_iota(I32, (D.MAX_DELAY, 1, 1), 0)
           == tgt.reshape(1, 1, b)) & in_old.reshape(1, 1, b))
    packed = jnp.sum(jnp.where(oh, hist, 0), axis=0)
    far_q = _sum0(jnp.where(
        (_iota_col(D.MAX_DELAY) == tgt) & in_old, q_old, 0))
    for j in range(s + 1):
        hit = delay == j
        packed = jnp.where(hit, pending[s - j], packed)
        far_q = jnp.where(hit, pending_q[s - j], far_q)
    xfa = _unpack_far_block(packed)[:D.PART_LEN1]
    return xfa, far_q


def _far_merge_deferred(hist, pending, n_act, rows: int):
    """Merge S pending blocks into the (M*rows, B) newest-first history:
    lanes with n_act = m get [pending[m-1] .. pending[0], old[:M-m]].
    One concat + S whole-width selects over statically-shifted views of
    the padded array, instead of a shift + whole-leaf select per slot."""
    S = len(pending)
    total_rows = hist.shape[0]
    padded = jnp.concatenate(list(reversed(pending)) + [hist], axis=0)
    out = padded[S * rows:S * rows + total_rows]
    for m in range(1, S + 1):
        out = jnp.where(n_act == m,
                        padded[(S - m) * rows:(S - m) * rows + total_rows],
                        out)
    return out


def _calc_energies_f(core, far_spectrum, far_q, near_ener):
    """core.calc_energies, lane-major."""
    near_log = core_mod.log_of_energy_in_q8(near_ener, core.dfa_noisy_q)
    near_log_energy = _shift_in(core.near_log_energy, near_log)

    echo_est = core.channel_stored * far_spectrum
    tmp_far = _sum0_u32(far_spectrum)
    tmp_adapt = _sum0_u32(core.channel_adapt16 * far_spectrum)
    tmp_stored = _sum0_u32(echo_est)

    far_log_energy = core_mod.log_of_energy_in_q8(tmp_far, far_q)
    adapt_log = core_mod.log_of_energy_in_q8(
        tmp_adapt, D.RESOLUTION_CHANNEL16 + far_q)
    stored_log = core_mod.log_of_energy_in_q8(
        tmp_stored, D.RESOLUTION_CHANNEL16 + far_q)
    echo_adapt_log_energy = _shift_in(core.echo_adapt_log_energy, adapt_log)
    echo_stored_log_energy = _shift_in(core.echo_stored_log_energy,
                                       stored_log)

    in_startup = core.startup_state == 0
    increase_max_shifts = jnp.where(in_startup, I32(2), I32(4))
    decrease_max_shifts = I32(11)
    increase_min_shifts = jnp.where(in_startup, I32(8), I32(11))
    decrease_min_shifts = jnp.where(in_startup, I32(2), I32(3))

    active = far_log_energy > D.FAR_ENERGY_MIN
    new_min = core_mod.asym_filt(core.far_energy_min, far_log_energy,
                                 increase_min_shifts, decrease_min_shifts)
    new_max = core_mod.asym_filt(core.far_energy_max, far_log_energy,
                                 increase_max_shifts, decrease_max_shifts)
    far_energy_min = jnp.where(active, new_min, core.far_energy_min)
    far_energy_max = jnp.where(active, new_max, core.far_energy_max)
    far_energy_max_min = jnp.where(active, far_energy_max - far_energy_min,
                                   core.far_energy_max_min)

    tmp16 = spl.to_w16(2560 - far_energy_min)
    tmp16 = jnp.where(tmp16 > 0,
                      spl.to_w16((tmp16 * D.FAR_ENERGY_VAD_REGION) >> 9),
                      I32(0))
    tmp16 = spl.to_w16(tmp16 + D.FAR_ENERGY_VAD_REGION)

    vad_halted = in_startup | (core.vad_update_count > 1024)
    tracked_vad = core.far_energy_vad + (
        (far_log_energy + tmp16 - core.far_energy_vad) >> 6)
    track = core.far_energy_vad > far_log_energy
    far_energy_vad = jnp.where(
        active,
        jnp.where(vad_halted, far_energy_min + tmp16,
                  jnp.where(track, tracked_vad, core.far_energy_vad)),
        core.far_energy_vad)
    vad_update_count = jnp.where(
        active & ~vad_halted,
        jnp.where(track, I32(0), spl.to_w16(core.vad_update_count + 1)),
        core.vad_update_count)
    far_energy_mse = jnp.where(active, far_energy_vad + (1 << 8),
                               core.far_energy_mse)

    above = far_log_energy > far_energy_vad
    dynamic = in_startup | (far_energy_max_min > D.FAR_ENERGY_DIFF)
    current_vad_value = jnp.where(
        above, jnp.where(dynamic, I32(1), core.current_vad_value), I32(0))

    first_fire = (current_vad_value != 0) & (core.first_vad != 0)
    too_hot = _row(echo_adapt_log_energy, 0) > _row(near_log_energy, 0)
    scale_down = first_fire & too_hot
    channel_adapt16 = jnp.where(scale_down, core.channel_adapt16 >> 3,
                                core.channel_adapt16)
    echo_adapt_log_energy = _set_row(
        echo_adapt_log_energy, 0,
        jnp.where(scale_down, _row(echo_adapt_log_energy, 0) - (3 << 8),
                  _row(echo_adapt_log_energy, 0)))
    first_vad = jnp.where(first_fire & ~too_hot, I32(0), core.first_vad)

    core = core._replace(
        near_log_energy=near_log_energy,
        far_log_energy=far_log_energy,
        echo_adapt_log_energy=echo_adapt_log_energy,
        echo_stored_log_energy=echo_stored_log_energy,
        far_energy_min=far_energy_min,
        far_energy_max=far_energy_max,
        far_energy_max_min=far_energy_max_min,
        far_energy_vad=far_energy_vad,
        far_energy_mse=far_energy_mse,
        vad_update_count=vad_update_count,
        current_vad_value=current_vad_value,
        channel_adapt16=channel_adapt16,
        first_vad=first_vad,
    )
    return core, echo_est


def _update_channel_f(core, far_spectrum, far_q, dfa, mu, echo_est):
    """core.update_channel, lane-major ((65, B) rows, (1, B) scalars)."""
    ch32 = core.channel_adapt32
    zeros_ch = spl.norm_u32(ch32.astype(U32))
    zeros_far = spl.norm_u32(far_spectrum.astype(U32))
    safe_mul = zeros_ch + zeros_far > 31
    shift_ch_far = jnp.where(safe_mul, I32(0), 32 - zeros_ch - zeros_far)
    prod_safe = ch32.astype(U32) * far_spectrum.astype(U32)
    shifted_ch = jnp.where(shift_ch_far >= 32, I32(0),
                           spl.sar_i32(ch32, shift_ch_far))
    prod_shifted = shifted_ch.astype(U32) * far_spectrum.astype(U32)
    tmp_u32_no1 = jnp.where(safe_mul, prod_safe, prod_shifted)

    zeros_num = spl.norm_u32(tmp_u32_no1)
    zeros_dfa = jnp.where(dfa != 0, spl.norm_u32(dfa.astype(U32)), I32(32))
    tmp16_no1 = (zeros_dfa - 2 + core.dfa_noisy_q - D.RESOLUTION_CHANNEL32
                 - far_q + shift_ch_far)
    use_dfa_domain = zeros_num > tmp16_no1 + 1
    xfa_q = jnp.where(use_dfa_domain, tmp16_no1, zeros_num - 2)
    dfa_q = jnp.where(use_dfa_domain, zeros_dfa - 2,
                      D.RESOLUTION_CHANNEL32 + far_q - core.dfa_noisy_q
                      - shift_ch_far + (zeros_num - 2))

    tmp_u32_no1 = spl.shift_w32(tmp_u32_no1, xfa_q)
    tmp_u32_no2 = spl.shift_w32(dfa.astype(U32), dfa_q)
    tmp32_no1 = (tmp_u32_no2.astype(I32) - tmp_u32_no1.astype(I32))
    zeros_num = spl.norm_w32(tmp32_no1)

    do_update = ((tmp32_no1 != 0)
                 & (far_spectrum > spl.shl_i32(I32(D.CHANNEL_VAD), far_q)))

    safe_mul2 = zeros_num + zeros_far > 31
    pos = tmp32_no1 > 0
    prod2_safe = jnp.where(
        pos, (tmp32_no1.astype(U32) * far_spectrum.astype(U32)).astype(I32),
        -((-tmp32_no1).astype(U32) * far_spectrum.astype(U32)).astype(I32))
    shift_num = jnp.where(safe_mul2, I32(0), 32 - (zeros_num + zeros_far))
    prod2_shift = jnp.where(
        pos, spl.sar_i32(tmp32_no1, shift_num) * far_spectrum,
        -(spl.sar_i32(-tmp32_no1, shift_num) * far_spectrum))
    tmp32_no2 = jnp.where(safe_mul2, prod2_safe, prod2_shift)

    tmp32_no2 = spl.div_w32_w16(tmp32_no2, _iota_col(D.PART_LEN1) + 1)
    shift2_res_chan = (shift_num + shift_ch_far - xfa_q - mu
                       - ((30 - zeros_far) << 1))
    overflow = spl.norm_w32(tmp32_no2) < shift2_res_chan
    tmp32_no2 = jnp.where(overflow, I32(D.WORD32_MAX),
                          spl.shift_w32(tmp32_no2, shift2_res_chan))

    new_ch32 = jnp.maximum(spl.add_sat_w32(ch32, tmp32_no2), I32(0))
    apply = (mu != 0) & do_update
    channel_adapt32 = jnp.where(apply, new_ch32, ch32)
    channel_adapt16 = jnp.where(apply, channel_adapt32 >> 16,
                                core.channel_adapt16)
    core = core._replace(channel_adapt32=channel_adapt32,
                         channel_adapt16=channel_adapt16)

    # --- store/restore arbitration ---
    startup_store = (core.startup_state == 0) & (core.current_vad_value != 0)

    mse_channel_count = jnp.where(
        core.far_log_energy < core.far_energy_mse, I32(0),
        core.mse_channel_count + 1)
    evaluate = mse_channel_count >= (D.MIN_MSE_COUNT + 10)

    mse_stored = _sum0(jnp.abs(
        core.echo_stored_log_energy[:D.MIN_MSE_COUNT]
        - core.near_log_energy[:D.MIN_MSE_COUNT]))
    mse_adapt = _sum0(jnp.abs(
        core.echo_adapt_log_energy[:D.MIN_MSE_COUNT]
        - core.near_log_energy[:D.MIN_MSE_COUNT]))

    do_reset = evaluate & (
        (spl.shl_i32(mse_stored, D.MSE_RESOLUTION)
         < D.MIN_MSE_DIFF * mse_adapt)
        & (spl.shl_i32(core.mse_stored_old, D.MSE_RESOLUTION)
           < D.MIN_MSE_DIFF * core.mse_adapt_old))
    do_store = evaluate & ~do_reset & (
        (D.MIN_MSE_DIFF * mse_stored > spl.shl_i32(mse_adapt,
                                                   D.MSE_RESOLUTION))
        & (mse_adapt < core.mse_threshold)
        & (core.mse_adapt_old < core.mse_threshold))

    fresh = core.mse_threshold == D.WORD32_MAX
    scaled_threshold = spl.div_trunc(core.mse_threshold * 5, I32(8))
    bumped = core.mse_threshold + (
        ((mse_adapt - scaled_threshold) * 205) >> 8)
    new_threshold = jnp.where(fresh, mse_adapt + core.mse_adapt_old, bumped)
    mse_threshold = jnp.where(do_store & ~startup_store, new_threshold,
                              core.mse_threshold)

    store_now = startup_store | (~startup_store & do_store)
    stored_ch = core.channel_adapt16
    stored_echo_est = stored_ch * far_spectrum
    reset_ch16, reset_ch32 = (core.channel_stored,
                              spl.shl_i32(core.channel_stored, 16))

    channel_stored = jnp.where(store_now, stored_ch, core.channel_stored)
    echo_est = jnp.where(store_now, stored_echo_est, echo_est)
    reset_now = ~startup_store & do_reset
    channel_adapt16 = jnp.where(reset_now, reset_ch16, core.channel_adapt16)
    channel_adapt32 = jnp.where(reset_now, reset_ch32, core.channel_adapt32)

    core = core._replace(
        channel_stored=channel_stored,
        channel_adapt16=channel_adapt16,
        channel_adapt32=channel_adapt32,
        mse_threshold=mse_threshold,
        mse_channel_count=jnp.where(
            startup_store, core.mse_channel_count,
            jnp.where(evaluate, I32(0), mse_channel_count)),
        mse_stored_old=jnp.where(~startup_store & evaluate, mse_stored,
                                 core.mse_stored_old),
        mse_adapt_old=jnp.where(~startup_store & evaluate, mse_adapt,
                                core.mse_adapt_old),
    )
    return core, echo_est


def _calc_suppression_gain_f(core):
    """core.calc_suppression_gain, lane-major ((1, B) scalars)."""
    tmp16 = (_row(core.near_log_energy, 0)
             - _row(core.echo_stored_log_energy, 0) - D.ENERGY_DEV_OFFSET)
    d_e = spl.to_w16(jnp.abs(spl.to_w16(tmp16)))

    low = d_e < D.SUPGAIN_EPC_DT
    num_low = core.sup_gain_err_param_diff_ab * d_e + (D.SUPGAIN_EPC_DT >> 1)
    gain_low = core.sup_gain_err_param_a - spl.to_w16(
        spl.div_w32_w16(num_low, I32(D.SUPGAIN_EPC_DT)))
    num_high = (core.sup_gain_err_param_diff_bd * (D.ENERGY_DEV_TOL - d_e)
                + ((D.ENERGY_DEV_TOL - D.SUPGAIN_EPC_DT) >> 1))
    gain_high = core.sup_gain_err_param_d + spl.to_w16(
        spl.div_w32_w16(num_high, I32(D.ENERGY_DEV_TOL - D.SUPGAIN_EPC_DT)))
    sup_gain = jnp.where(d_e < D.ENERGY_DEV_TOL,
                         jnp.where(low, gain_low, gain_high),
                         core.sup_gain_err_param_d)
    sup_gain = jnp.where(core.current_vad_value == 0, I32(0), sup_gain)

    target = jnp.maximum(sup_gain, core.sup_gain_old)
    new_sup = spl.to_w16(core.sup_gain
                         + spl.to_w16((target - core.sup_gain) >> 4))
    core = core._replace(sup_gain=new_sup, sup_gain_old=sup_gain)
    return core, new_sup


def _time_to_frequency_domain_f(time_signal, t: Tables,
                                abs_approx: bool = False):
    """core.time_to_frequency_domain, lane-major ((128, B) in)."""
    max_abs = _max_abs_w16_0(time_signal)
    scaling = spl.norm_w16(max_abs)                        # (1, B)
    scaled = spl.to_w16(spl.shl_i32(time_signal, scaling))
    windowed = spl.to_w16((scaled * t.win128) >> 14)
    re, im = _real_forward_fft(windowed, t)
    im = jnp.concatenate([spl.to_w16(-im[:D.PART_LEN]),
                          im[D.PART_LEN:]], axis=0)
    z = jnp.zeros_like(_row(im, 0))
    im = _set_row(_set_row(im, 0, z), D.PART_LEN, z)

    abs_re = jnp.abs(re)
    abs_im = jnp.abs(im)
    if abs_approx:
        max_v = jnp.maximum(abs_re, abs_im)
        min_v = jnp.minimum(abs_re, abs_im)
        alpha = jnp.where((max_v >> 2) > min_v, I32(32584),
                          jnp.where((max_v >> 1) > min_v, I32(30879),
                                    I32(26951)))
        beta = jnp.where((max_v >> 2) > min_v, I32(4249),
                         jnp.where((max_v >> 1) > min_v, I32(11072),
                                   I32(18927)))
        mag_interior = (spl.to_w16((max_v * alpha) >> 15) & 0xFFFF) + (
            spl.to_w16((min_v * beta) >> 15) & 0xFFFF)
        mag_interior = mag_interior & 0xFFFF
    else:
        sq = spl.add_sat_w32(abs_re * abs_re, abs_im * abs_im)
        mag_interior = spl.sqrt_floor(sq)
    mag = jnp.where(re == 0, abs_im,
                    jnp.where(im == 0, abs_re, mag_interior))
    mag = _set_row(mag, 0, _row(abs_re, 0))
    mag = _set_row(mag, D.PART_LEN, _row(abs_re, D.PART_LEN))
    mag_sum = _sum0_u32(mag)
    return scaling, (re, im), mag, mag_sum


def _inverse_fft_and_window_f(core, efw_re, efw_im, has_clean: bool,
                              t: Tables):
    """core.inverse_fft_and_window, lane-major."""
    ifft_out, out_cfft = _real_inverse_fft(efw_re, spl.to_w16(-efw_im), t)
    shift = out_cfft - core.dfa_clean_q

    first = spl.to_w16(
        (ifft_out[:D.PART_LEN] * t.win128[:D.PART_LEN] + 8192) >> 14)
    tmp_a = spl.shift_w32(first, shift)
    output = spl.sat_w16(tmp_a + core.out_buf)

    second = (ifft_out[D.PART_LEN:] * t.win128[D.PART_LEN:]) >> 14
    out_buf = spl.sat_w16(spl.shift_w32(second, shift))

    x_buf = jnp.concatenate([core.x_buf[D.PART_LEN:],
                             core.x_buf[D.PART_LEN:]], axis=0)
    d_noisy = jnp.concatenate([core.d_buf_noisy[D.PART_LEN:],
                               core.d_buf_noisy[D.PART_LEN:]], axis=0)
    core = core._replace(x_buf=x_buf, d_buf_noisy=d_noisy, out_buf=out_buf)
    if has_clean:
        d_clean = jnp.concatenate([core.d_buf_clean[D.PART_LEN:],
                                   core.d_buf_clean[D.PART_LEN:]], axis=0)
        core = core._replace(d_buf_clean=d_clean)
    return core, output


def _comfort_noise_f(core, dfa, efw_re, efw_im, lam, phase_v):
    """core.comfort_noise, lane-major; phase_v (64, B) int32 packs this
    block's phase table values (Q13 cos in the low 16 bits, sin in the
    high 16) for the RNG draws, computed OUTSIDE the kernel (the seed
    chain is state known before the kernel runs; the table gather uses
    the proven int8-MXU lookup in XLA).  The seed state update also
    happens outside."""
    cos_v = spl.to_w16(phase_v)          # sign-extend low 16
    sin_v = phase_v >> 16                # arithmetic: sign-correct
    shift_noise = D.NOISE_EST_Q_DOMAIN - core.dfa_clean_q
    fast = core.noise_est_ctr < 100
    noise_est_ctr = jnp.where(fast, core.noise_est_ctr + 1,
                              core.noise_est_ctr)
    min_track_shift = jnp.where(fast, I32(6), I32(9))

    noise = core.noise_est
    too_low = core.noise_est_too_low_ctr
    too_high = core.noise_est_too_high_ctr
    out_lshift = spl.shl_i32(dfa, shift_noise)

    below = out_lshift < noise
    small = noise < spl.shl_i32(I32(1), min_track_shift)
    th_inc = too_high + 1
    dec_small = th_inc >= D.NOISE_EST_INC_COUNT
    noise_b_small = jnp.where(dec_small, noise - 1, noise)
    th_small = jnp.where(dec_small, I32(0), th_inc)
    noise_b_big = noise - spl.sar_i32(noise - out_lshift, min_track_shift)
    noise_below = jnp.where(small, noise_b_small, noise_b_big)
    too_high_below = jnp.where(small, th_small, too_high)
    big1 = (noise >> 19) > 0
    big2 = (noise >> 11) > 0
    noise_a1 = (noise >> 11) * 2049
    noise_a2 = (noise * 2049) >> 11
    tl_inc = too_low + 1
    inc_small = tl_inc >= D.NOISE_EST_INC_COUNT
    noise_a3 = jnp.where(inc_small, noise + (noise >> 9) + 1, noise)
    tl_small = jnp.where(inc_small, I32(0), tl_inc)
    noise_above = jnp.where(big1, noise_a1, jnp.where(big2, noise_a2,
                                                      noise_a3))
    too_low_above = jnp.where(big1 | big2, too_low, tl_small)

    noise = jnp.where(below, noise_below, noise_above)
    too_low = jnp.where(below, I32(0), too_low_above)
    too_high = jnp.where(below, too_high_below, I32(0))

    tmp32 = spl.sar_i32(noise, shift_noise)
    clip = tmp32 > 32767
    tmp32 = jnp.where(clip, I32(32767), tmp32)
    noise = jnp.where(clip, spl.shl_i32(tmp32, shift_noise), noise)
    noise_rshift16 = spl.to_w16(
        ((D.ONE_Q14 - lam) * spl.to_w16(tmp32)) >> 14)

    amp = noise_rshift16[1:]
    z = jnp.zeros_like(amp[:1])
    u_real = jnp.concatenate([z, spl.to_w16((amp * cos_v) >> 13)], axis=0)
    u_imag = jnp.concatenate([z, spl.to_w16((-amp * sin_v) >> 13)], axis=0)
    u_imag = _set_row(u_imag, D.PART_LEN, jnp.zeros_like(z))

    efw_re = spl.add_sat_w16(efw_re, u_real)
    efw_im = spl.add_sat_w16(efw_im, u_imag)

    core = core._replace(noise_est=noise, noise_est_too_low_ctr=too_low,
                         noise_est_too_high_ctr=too_high,
                         noise_est_ctr=noise_est_ctr)
    return core, efw_re, efw_im


def _calc_step_size_f(core):
    """core.calc_step_size, lane-major."""
    tmp32 = (core.far_log_energy - core.far_energy_min) * D.MU_DIFF
    ratio = spl.to_w16(spl.div_w32_w16(tmp32, core.far_energy_max_min))
    mu_dyn = jnp.maximum(D.MU_MIN - 1 - ratio, I32(D.MU_MAX))
    mu = jnp.where(core.far_energy_min >= core.far_energy_max,
                   I32(D.MU_MIN), mu_dyn)
    mu = jnp.where(core.startup_state > 0, mu, I32(D.MU_MAX))
    return jnp.where(core.current_vad_value == 0, I32(0), mu)


def _process_block_f(core, t: Tables, farend, nearend_noisy, nearend_clean,
                     phase_v, mult: int, has_clean: bool,
                     abs_approx: bool, far_ctx=None):
    """core.process_block, lane-major; blocks are (64, B).  The RNG seed
    row passes through untouched (advanced outside the kernel), and the
    far-history update is deferred through far_ctx (pending-list push +
    old-history fetch; frames_step merges once at the end)."""
    startup_state = jnp.where(
        core.startup_state < 2,
        (core.tot_count >= D.CONV_LEN).astype(I32)
        + (core.tot_count >= D.CONV_LEN2).astype(I32),
        core.startup_state)
    core = core._replace(startup_state=startup_state)

    core = core._replace(
        x_buf=jnp.concatenate([core.x_buf[:D.PART_LEN], farend], axis=0),
        d_buf_noisy=jnp.concatenate([core.d_buf_noisy[:D.PART_LEN],
                                     nearend_noisy], axis=0))
    if has_clean:
        core = core._replace(
            d_buf_clean=jnp.concatenate([core.d_buf_clean[:D.PART_LEN],
                                         nearend_clean], axis=0))

    far_q, _, xfa, xfa_sum = _time_to_frequency_domain_f(core.x_buf, t,
                                                         abs_approx)
    zeros_d_noisy, dfw, dfa_noisy, dfa_noisy_sum = (
        _time_to_frequency_domain_f(core.d_buf_noisy, t, abs_approx))
    core = core._replace(dfa_noisy_q_old=core.dfa_noisy_q,
                         dfa_noisy_q=zeros_d_noisy)

    if has_clean:
        zeros_d_clean, dfw, dfa_clean, dfa_clean_sum = (
            _time_to_frequency_domain_f(core.d_buf_clean, t, abs_approx))
        core = core._replace(dfa_clean_q_old=core.dfa_clean_q,
                             dfa_clean_q=zeros_d_clean)
        ptr_dfa_clean = dfa_clean
    else:
        core = core._replace(dfa_clean_q_old=core.dfa_noisy_q_old,
                             dfa_clean_q=core.dfa_noisy_q)
        ptr_dfa_clean = dfa_noisy

    _push_far_pending(far_ctx, xfa, far_q)
    core = core._replace(
        de_farend=_add_far_spectrum_fix_f(core.de_farend, xfa, far_q))
    de_near, delay = _process_fix_f(core.de_near, core.de_farend,
                                    dfa_noisy, zeros_d_noisy)
    core = core._replace(de_near=de_near)
    delay = jnp.where(delay == -2, I32(0), delay)
    delay = jnp.where(core.fixed_delay >= 0, core.fixed_delay, delay)

    far_spectrum, far_q_aligned = _aligned_farend_deferred(far_ctx, delay)
    zeros_x_buf = far_q_aligned

    core, echo_est = _calc_energies_f(core, far_spectrum, zeros_x_buf,
                                      dfa_noisy_sum)
    mu = _calc_step_size_f(core)
    core = core._replace(tot_count=core.tot_count + 1)
    core, echo_est = _update_channel_f(core, far_spectrum, zeros_x_buf,
                                       dfa_noisy, mu, echo_est)
    core, sup_gain = _calc_suppression_gain_f(core)

    # --- Wiener filter hnl ---
    diff = echo_est - core.echo_filt
    echo_filt = core.echo_filt + spl.mul_i64_shift_right(diff, 50, 8)

    zeros32 = spl.norm_w32(echo_filt) + 1
    zeros16 = spl.norm_w16(sup_gain) + 1
    safe = zeros32 + zeros16 > 16
    gained_safe = echo_filt.astype(U32) * sup_gain.astype(U32)
    tmp16_no1 = 17 - zeros32 - zeros16
    res_diff_safe = (14 - D.RESOLUTION_CHANNEL16 - D.RESOLUTION_SUPGAIN
                     + core.dfa_clean_q - zeros_x_buf)
    res_diff_unsafe = (14 + tmp16_no1 - D.RESOLUTION_CHANNEL16
                       - D.RESOLUTION_SUPGAIN + core.dfa_clean_q
                       - zeros_x_buf)
    gained_a = echo_filt.astype(U32) * spl.sar_i32(sup_gain,
                                                   tmp16_no1).astype(U32)
    gained_b = (spl.sar_i32(echo_filt, tmp16_no1) * sup_gain).astype(U32)
    gained_unsafe = jnp.where(zeros32 > tmp16_no1, gained_a, gained_b)
    echo_est_gained = jnp.where(safe, gained_safe, gained_unsafe)
    resolution_diff = jnp.where(safe, res_diff_safe, res_diff_unsafe)

    zeros16n = spl.norm_w16(core.near_filt)
    dq_diff = core.dfa_clean_q - core.dfa_clean_q_old
    cramped = (zeros16n < dq_diff) & (core.near_filt != 0)
    t1_a = spl.to_w16(spl.shl_i32(core.near_filt, zeros16n))
    qdd_a = zeros16n - dq_diff
    t2_a = spl.sar_i32(ptr_dfa_clean, -qdd_a)
    t1_b = spl.to_w16(jnp.where(dq_diff < 0,
                                spl.sar_i32(core.near_filt, -dq_diff),
                                spl.shl_i32(core.near_filt, dq_diff)))
    t2_b = spl.to_w16(ptr_dfa_clean)
    tmp16no1 = jnp.where(cramped, t1_a, t1_b)
    q_domain_diff = jnp.where(cramped, qdd_a, I32(0))
    tmp16no2 = jnp.where(cramped, t2_a, t2_b)

    t32 = tmp16no2 - tmp16no1
    tmp16no2 = spl.to_w16(spl.to_w16(t32 >> 4) + tmp16no1)
    zeros16n2 = spl.norm_w16(tmp16no2)
    sat_near = ((tmp16no2 & 1) != 0) & (-q_domain_diff > zeros16n2)
    near_filt = jnp.where(
        sat_near, I32(D.WORD16_MAX),
        jnp.where(q_domain_diff < 0,
                  spl.to_w16(spl.shl_i32(tmp16no2, -q_domain_diff)),
                  spl.sar_i32(tmp16no2, q_domain_diff)))

    rounded = echo_est_gained + (spl.sar_i32(near_filt, 1)).astype(U32)
    ratio = spl.div_u32_u16(rounded, (near_filt & 0xFFFF).astype(U32))
    tmp32no1 = spl.shift_w32(ratio, resolution_diff).astype(I32)
    hnl_core = jnp.clip(D.ONE_Q14 - tmp32no1, 0, None)
    hnl = jnp.where(tmp32no1 > D.ONE_Q14, I32(0),
                    jnp.where(tmp32no1 < 0, I32(D.ONE_Q14), hnl_core))
    hnl = jnp.where(echo_est_gained == 0, I32(D.ONE_Q14),
                    jnp.where(near_filt == 0, I32(0), hnl))
    num_pos_coef = _sum0((hnl != 0).astype(I32))

    core = core._replace(echo_filt=echo_filt, near_filt=near_filt)

    if mult == 2:
        hnl = spl.to_w16((hnl * hnl) >> 14)
        k_min, k_max = 4, 24
        avg = jnp.sum(hnl[k_min:k_max + 1], axis=0, keepdims=True)
        avg = spl.div_trunc(avg, I32(k_max - k_min + 1))
        upper = _iota_col(D.PART_LEN1) >= k_max
        hnl = jnp.where(upper & (hnl > avg), avg, hnl)

    nlp_hnl = jnp.where(hnl < D.NLP_COMP_LOW, I32(0),
                        jnp.where(hnl > D.NLP_COMP_HIGH, I32(D.ONE_Q14),
                                  hnl))
    nlp_gain = jnp.where(num_pos_coef < 3, I32(0), I32(D.ONE_Q14))
    nlp_hnl = jnp.where((nlp_hnl == D.ONE_Q14) & (nlp_gain == D.ONE_Q14),
                        I32(D.ONE_Q14),
                        spl.to_w16((nlp_hnl * nlp_gain) >> 14))
    hnl = jnp.where(core.nlp_flag != 0, nlp_hnl, hnl)

    dfw_re, dfw_im = dfw
    efw_re = spl.to_w16((dfw_re * hnl + 8192) >> 14)
    efw_im = spl.to_w16((dfw_im * hnl + 8192) >> 14)

    cng_core, cng_re, cng_im = _comfort_noise_f(core, ptr_dfa_clean,
                                                efw_re, efw_im, hnl,
                                                phase_v)
    use_cng = core.cng_mode != 0
    core = core._replace(**{
        f: jnp.where(use_cng, getattr(cng_core, f), getattr(core, f))
        for f in ("noise_est", "noise_est_too_low_ctr",
                  "noise_est_too_high_ctr", "noise_est_ctr")})
    efw_re = jnp.where(use_cng, cng_re, efw_re)
    efw_im = jnp.where(use_cng, cng_im, efw_im)

    core, output = _inverse_fft_and_window_f(core, efw_re, efw_im,
                                             has_clean, t)
    return core, output


def _place_at_fill_f(carry, payload, fill):
    """core._place_at_fill, lane-major: carry (64, B), payload (P, B),
    fill (1, B) in {0,16,32,48} -> (P + 64, B)."""
    pad = jnp.zeros((D.PART_LEN,) + payload.shape[1:], payload.dtype)
    cands = [
        jnp.concatenate([payload, pad], axis=0),
        jnp.concatenate([carry[:16], payload, pad[:48]], axis=0),
        jnp.concatenate([carry[:32], payload, pad[:32]], axis=0),
        jnp.concatenate([carry[:48], payload, pad[:16]], axis=0),
    ]
    sel = fill >> 4
    out = jnp.zeros_like(cands[0])
    for k in range(4):
        out = out + jnp.where(sel == k, cands[k], 0)
    return out


def _where_tree(mask, new, old):
    """Per-lane select over a state pytree.  Leaves the slot left
    untouched (same object in and out of _replace) skip their select —
    select(p, x, x) is not simplified away by the Mosaic lowering, and
    the big untouched leaves (e.g. the 4000-row far history once its
    update is deferred) otherwise cost a full VMEM pass per slot."""
    return jax.tree_util.tree_map(
        lambda a, b: b if a is b else jnp.where(mask, a, b), new, old)


def _n_slots_for(n_frames: int) -> int:
    """Max live 64-sample blocks over an n_frames-frame span: the carry
    fill is always < 64, so consumed blocks = (fill0 + 80*n) // 64 at most
    this (fill0 <= 48)."""
    return (n_frames * D.FRAME_LEN + 48) // D.PART_LEN


def _select_slot(outs, idx):
    """outs[idx] with a per-lane (1, B) index over the static slot list."""
    sel = jnp.zeros_like(outs[0])
    for s, o in enumerate(outs):
        sel = jnp.where(idx == s, o, sel)
    return sel


def _suffix_frames(payload, k, n_frames: int, frames_per_chunk: int):
    """Front-align the last k frames of payload ((n*80, B)): out[j] =
    payload[(n-k)*80 + j], zeros beyond.  k (1, B) counts active frames
    and is always a multiple of frames_per_chunk (the frames of one 10 ms
    chunk share their startup decision), so only those shifts are
    candidates."""
    F = D.FRAME_LEN
    out = jnp.zeros_like(payload)
    for kk in range(frames_per_chunk, n_frames + 1, frames_per_chunk):
        if kk == n_frames:
            cand = payload
        else:
            cand = jnp.concatenate(
                [payload[(n_frames - kk) * F:],
                 jnp.zeros(((n_frames - kk) * F,) + payload.shape[1:],
                           payload.dtype)], axis=0)
        out = jnp.where(k == kk, cand, out)
    return out


def _emit_frame_f(core, produced, two_blocks, run_mask):
    """The 80-sample output assembly of core.process_frame (out_carry /
    out_fill / first-frame zero-stuff / out_tail), lane-major.  `produced`
    is (128, B): this frame's block outputs, second half zeroed when the
    frame produced one block."""
    o = core.out_fill
    n_blocks = 1 + two_blocks.astype(I32)
    work_out = _place_at_fill_f(core.out_carry, produced, o)

    avail = o + n_blocks * D.PART_LEN
    stuff = jnp.maximum(I32(0), D.FRAME_LEN - avail)
    stuffed = stuff > 0
    out = jnp.where(
        stuffed,
        jnp.concatenate([core.out_tail, work_out[:64]], axis=0),
        work_out[:D.FRAME_LEN])
    new_carry = jnp.where(stuffed, work_out[64:64 + D.PART_LEN],
                          work_out[D.FRAME_LEN:D.FRAME_LEN + D.PART_LEN])

    def gated2(new, old):
        return jnp.where(run_mask, new, old)

    core = core._replace(out_carry=gated2(new_carry, core.out_carry),
                         out_fill=gated2(avail + stuff - D.FRAME_LEN,
                                         core.out_fill),
                         out_tail=gated2(out[-16:], core.out_tail))
    return core, out


def frames_step(core, t: Tables, far_frames, noisy_frames, clean_frames,
                phase_all, run_rows, mult: int, n_frames: int,
                has_clean: bool, abs_approx: bool = False,
                frames_per_chunk: int = 1, far_head=None):
    """The full n_frames-frame core path, lane-major, as a slot-major
    block schedule over the concatenated sample stream.

    A span of n frames adds n*80 samples on top of the carry fill
    f0 ∈ {0,16,32,48}; blocks are consumed greedily (aecm_core.cc:527),
    so block s is ALWAYS samples [64s, 64s+64) of the stream
    carry+payload, and exactly (f0 + 80k) // 64 blocks are live (k =
    active frames).  Static stream windows replace per-frame masked
    slots: e.g. a 4-frame 8 kHz span runs 5 slots (1.25 blocks/frame
    exactly) instead of 8, and a 2-frame 16 kHz chunk runs 3 (2.5 avg).

    far/noisy/clean_frames: (n_frames*80, B); phase_all:
    (n_slots*64, B) per-SLOT packed CNG phase rows (cos low 16 / sin
    high 16); run_rows: (n_frames, B)
    bool, non-decreasing along the frame axis (startup only ever ends)
    and constant within each frames_per_chunk group (one 10 ms chunk
    shares its startup decision).  Bit-exact with the frame-major XLA
    path — the slots compute the same blocks in the same order, and the
    carry/emit updates follow identical rules (tests/test_fused.py).
    Runs identically as plain jnp (CPU/testing) and inside the Pallas
    kernel (TPU).
    """
    F, P = D.FRAME_LEN, D.PART_LEN
    n = n_frames
    n_slots = _n_slots_for(n)
    assert phase_all.shape[0] == n_slots * P, (phase_all.shape, n_slots)
    fill0 = core.frame_fill                         # (1, B)
    k = _sum0(run_rows.astype(I32))                 # (1, B) active frames
    run_last = run_rows[n - 1:n]                    # (1, B): k > 0

    # full sample stream: carry + the active frames' samples, then zero
    # padding out to the last carry window (64*(n_slots+1) rows)
    pad_rows = P * (n_slots + 1) - (n * F + P)

    def stream(carry, payload):
        eff = _suffix_frames(payload, k, n, frames_per_chunk)
        placed = _place_at_fill_f(carry, eff, fill0)
        if pad_rows:
            placed = jnp.concatenate(
                [placed, jnp.zeros((pad_rows,) + placed.shape[1:],
                                   placed.dtype)], axis=0)
        return placed

    full_far = stream(core.in_carry_far, far_frames)
    full_noi = stream(core.in_carry_noisy, noisy_frames)
    full_cl = (stream(core.in_carry_clean, clean_frames)
               if has_clean else None)

    total = fill0 + F * k                           # valid stream samples
    far_ctx = {"hist": core.far_history, "q": core.far_q_domains,
               "pending": [], "pending_q": [], "head0": far_head}
    outs = []
    for s in range(n_slots):
        act = total >= P * (s + 1)
        new_core, out_b = _process_block_f(
            core, t,
            full_far[s * P:(s + 1) * P], full_noi[s * P:(s + 1) * P],
            full_cl[s * P:(s + 1) * P] if has_clean else None,
            phase_all[s * P:(s + 1) * P],
            mult, has_clean, abs_approx, far_ctx)
        core = _where_tree(act, new_core, core)
        outs.append(jnp.where(act, out_b, 0))

    if far_head is None:
        # deferred far-history merge: one pass instead of a shift + whole-
        # leaf select per slot (n_act = active slots; monotone activity)
        n_act = total >> 6                          # (1, B)
        core = core._replace(
            far_history=_far_merge_deferred(
                core.far_history, far_ctx["pending"], n_act, FAR_HIST_ROWS),
            far_q_domains=_far_merge_deferred(
                core.far_q_domains, far_ctx["pending_q"], n_act, 1))
    else:
        # circular mode: the history leaves pass through UNTOUCHED (the
        # kernel never writes them back to HBM); the pending blocks ride
        # out as extra outputs and the caller appends them with one
        # uniform dynamic_update_slice at the global head.
        pend_hist = jnp.concatenate(far_ctx["pending"], axis=0)
        pend_q = jnp.concatenate(far_ctx["pending_q"], axis=0)

    # in-carry update: rows [64, 128) of the last active frame's work
    # window = stream rows [64*(b_last+1), +64) — reproduces the XLA
    # path's carry contents bit-for-bit, including the ignored residue
    # beyond the fill (compared by the state-equality tests)
    b_last_p1 = ((fill0 + F * jnp.maximum(k - 1, 0)) >> 6) + 1

    def carry_from(full, old):
        sel = jnp.zeros_like(old)
        for w in range(1, n_slots + 1):
            sel = jnp.where(b_last_p1 == w, full[w * P:(w + 1) * P], sel)
        return jnp.where(run_last, sel, old)

    core = core._replace(
        in_carry_far=carry_from(full_far, core.in_carry_far),
        in_carry_noisy=carry_from(full_noi, core.in_carry_noisy),
        frame_fill=(fill0 + 16 * k) & 63)
    if has_clean:
        core = core._replace(
            in_carry_clean=carry_from(full_cl, core.in_carry_clean))

    # per-frame output attribution + the 80-sample emit machinery, in
    # frame order (blocks never read the out-carry state, so slot-major
    # block processing before frame-major emission is safe)
    out_frames = []
    for f in range(n):
        run_f = run_rows[f:f + 1]
        j_f = jnp.maximum(k - (n - f), 0)       # index among active frames
        two_f = (((fill0 + 16 * j_f) & 63) >= 48) & run_f
        b_f = (fill0 + F * j_f) >> 6            # first block of frame f
        first = _select_slot(outs, b_f)
        second = jnp.where(two_f, _select_slot(outs, b_f + 1),
                           jnp.zeros_like(first))
        core, out_f = _emit_frame_f(
            core, jnp.concatenate([first, second], axis=0), two_f, run_f)
        out_frames.append(out_f)
    out_all = jnp.concatenate(out_frames, axis=0)
    if far_head is not None:
        return core, out_all, pend_hist, pend_q
    return core, out_all


# ---------------------------------------------------------------------------
# Control layer (batch-leading, mirrors control.py) + the chunk driver
# ---------------------------------------------------------------------------

class CtrlState(NamedTuple):
    """AecmState minus core (echo_control_mobile.cc:42-79), batch-leading."""
    farend_buf: rbuf.RingBuffer        # batched leaves: data (B, 4000), ...
    farend_old: jnp.ndarray            # (B, 2, 80)
    ec_startup: jnp.ndarray            # (B,) scalars...
    check_buff_size: jnp.ndarray
    check_buf_size_ctr: jnp.ndarray
    counter: jnp.ndarray
    sum: jnp.ndarray
    first_val: jnp.ndarray
    buf_size_start: jnp.ndarray
    ms_in_sndcard_buf: jnp.ndarray
    filt_delay: jnp.ndarray
    time_for_delay_change: jnp.ndarray
    known_delay: jnp.ndarray
    last_delay_diff: jnp.ndarray
    delay_change: jnp.ndarray
    echo_mode: jnp.ndarray


class FusedState(NamedTuple):
    """Batched AECM state in the fused layout: control fields batch-leading,
    core fields lane-major (rows, n_streams)."""
    ctrl: CtrlState
    core: core_mod.CoreState           # lane-major leaves


def to_fused_state(state_b) -> FusedState:
    """Batched control.AecmState -> FusedState."""
    ctrl = CtrlState(**{f: getattr(state_b, f) for f in CtrlState._fields})
    return FusedState(ctrl=ctrl, core=to_fused_core(state_b.core))


def from_fused_state(fstate: FusedState) -> control.AecmState:
    core_b = from_fused_core(fstate.core)
    return control.AecmState(core=core_b,
                             **fstate.ctrl._asdict())


def create_fused(n_streams: int, sample_rate: int = 8000, cng_mode: int = 1,
                 echo_mode: int = 3) -> FusedState:
    from .parallel import batch as pbatch
    return to_fused_state(pbatch.create_batch(n_streams, sample_rate,
                                              cng_mode, echo_mode))


def _delay_comp_ctrl(ctrl: CtrlState, mult: int) -> CtrlState:
    """control._delay_comp on the batched CtrlState (shared field-level
    implementation — elementwise, so it batches as-is)."""
    return control._delay_comp(ctrl, mult)


def _ring_write_gather(data, wpos, values, n_write, rpos, n_read: int):
    """One ring pass per chunk: wrapped write then a wrapped gather of the
    post-write data.

    On TPU this is ONE fused Pallas kernel (ops/pallas_ring.ring_pass_tpu)
    with the ring updated in place: one ring traversal, no lax.cond, no
    full-ring XLA copies.  (The round-2 design — an XLA uniform-write fast
    path guarded by lax.cond with a Pallas fallback, plus a separate
    gather kernel — measured 0.155 ms/chunk at B=1024 in context, almost
    all of it cond copies and write glue; the fused kernel measures
    ~0.03 ms and costs the same for uniform and divergent positions.)"""
    from .ops.pallas_ring import STREAM_TILE
    import os
    b, cap = data.shape
    cnt = values.shape[-1]
    vals16 = values.astype(data.dtype)
    use_pallas = (jax.default_backend() == "tpu"
                  and not os.environ.get("AECM_DISABLE_PALLAS")
                  and b % STREAM_TILE == 0)

    if use_pallas and cnt == n_read:
        from .ops.pallas_ring import ring_pass_tpu
        new_data, gathered = ring_pass_tpu(
            data, wpos, values, n_write, rpos, n_read)
        return new_data, gathered.astype(I32)
    if use_pallas:
        from .ops.pallas_ring import ring_gather_tpu, ring_write_tpu
        new_data = ring_write_tpu(data, wpos, vals16, n_write)
        gathered = ring_gather_tpu(new_data, rpos, n_read)
        return new_data, gathered.astype(I32)

    # Fallback: the ring_buffer module's own batched write/read data ops
    # (custom_vmap rules — lax on CPU), so wrap semantics live in ONE place.
    new_data = jax.vmap(rbuf._contig_write)(data, wpos, vals16, n_write)
    gathered = jax.vmap(
        lambda d, p: rbuf._contig_read(d, p, n_read))(new_data, rpos)
    return new_data, gathered.astype(I32)


def _ring_write_gather_multi(data, wpos, values, n_write, rpos,
                             n_read: int):
    """cps stacked ring passes in one kernel (write chunk c, gather chunk
    c, in order): wpos/n_write/rpos (cps, B), values (B, cps*n_read).
    On TPU this is ONE Pallas kernel streaming the ring through VMEM once
    per super-step instead of once per chunk (ops/pallas_ring.
    ring_multi_pass_tpu); elsewhere it loops the single-chunk pass, so
    wrap semantics live in one place.  Returns (new_data, gathered
    (B, cps*n_read) int32)."""
    from .ops.pallas_ring import STREAM_TILE
    import os
    b = data.shape[0]
    cps = wpos.shape[0]
    use_pallas = (jax.default_backend() == "tpu"
                  and not os.environ.get("AECM_DISABLE_PALLAS")
                  and b % STREAM_TILE == 0)
    if use_pallas:
        from .ops.pallas_ring import ring_multi_pass_tpu
        new_data, gathered = ring_multi_pass_tpu(
            data, wpos, values, n_write, rpos, n_read)
        return new_data, gathered.astype(I32)
    outs = []
    for c in range(cps):
        data, g = _ring_write_gather(
            data, wpos[c], values[:, c * n_read:(c + 1) * n_read],
            n_write[c], rpos[c], n_read)
        outs.append(g)
    return data, jnp.concatenate(outs, axis=1)


def _startup_ctrl(ctrl: CtrlState, n_blocks_10ms: int, mult: int):
    """control._startup_machine on the batched CtrlState (shared
    implementation)."""
    return control._startup_machine(ctrl, n_blocks_10ms, mult)


def _est_buf_delay_ctrl(ctrl: CtrlState, mult: int) -> CtrlState:
    """control._est_buf_delay on the batched CtrlState (shared
    implementation)."""
    return control._est_buf_delay(ctrl, mult)


def _precompute_cng_phases(core_f, run_rows, n_frames: int):
    """Advance the CNG LCG chain and do the phase-table lookups in XLA,
    before the kernel runs.  The chain is gated exactly like the in-graph
    reference: seed advances 64 draws per ACTIVE block slot when cngMode
    is on (core.comfort_noise + process_block's use_cng select), where
    slot activity mirrors frames_step's stream schedule — slot s is live
    iff fill0 + 80*k >= 64*(s+1) (k = active frames per run_rows).
    Returns phase_all (n_slots*64, B) lane-major int32 with the Q13 cos
    value packed in the low 16 bits and sin in the high 16 (halves the
    kernel-input DMA and the XLA-side output materialization vs two
    separate rows), plus the new seed row (1, B).

    Slot activity is monotone (slot s live implies s-1 live), so an
    ACTIVE slot s always draws from the seed advanced exactly 64*s times:
    the whole chain is ONE affine-closure op over n_slots*64 draw counts
    (the per-slot loop cost ~0.05 ms/chunk of glue at B=1024).  Inactive
    slots' rows come out different from a literally-chained computation
    (their seed would have stopped advancing) but frames_step discards
    them via its slot masks, and the stored seed advances 64*n_act draws
    — bit-identical state.  Masking the seed to 31 bits only at the end
    is exact: with an odd LCG multiplier a bit-31 discrepancy can never
    propagate below bit 31 (2^31*a ≡ 2^31 mod 2^32), the same identity
    spl.rand_u_array relies on.  All slot lookups batch into ONE int8-MXU
    table contraction (the lookup dominated the driver at ~0.36 ms/chunk
    when done per-slot)."""
    n_slots = _n_slots_for(n_frames)
    a_np, c_np = spl._lcg_tables(n_slots * D.PART_LEN)
    a_col = jnp.asarray(a_np)[:, None]             # (n_slots*64, 1) uint32
    c_col = jnp.asarray(c_np)[:, None]

    seed = core_f.seed                             # (1, B) uint32
    cng = core_f.cng_mode != 0
    k = _sum0(run_rows.astype(I32))                # (1, B)
    total = core_f.frame_fill + D.FRAME_LEN * k
    n_act = total >> 6                             # (1, B) active slots

    seeds_all = (a_col * seed + c_col) & U32(spl._LCG_MASK)
    rand_w16 = (seeds_all >> U32(16)).astype(I32)  # (n_slots*64, B)
    idx_all = (359 * rand_w16) >> 15
    cos_all, sin_all = core_mod._phase_table_lookup(idx_all)
    phase_all = (cos_all & 0xFFFF) | (sin_all << 16)

    new_seed = seed
    for v in range(1, n_slots + 1):
        sel = cng & (n_act >= v)
        new_seed = jnp.where(
            sel, seeds_all[v * D.PART_LEN - 1:v * D.PART_LEN], new_seed)
    return phase_all, new_seed


def _frames_kernel_call(core_f, t: Tables, far_lm, noisy_lm, clean_lm,
                        phase_all, run_rows, mult: int,
                        n_frames: int, has_clean: bool, abs_approx: bool,
                        frames_per_chunk: int = 1, far_head=None):
    """Run frames_step inside one pallas_call, grid over 128-lane tiles.

    With far_head (circular far history, (1, B)): the two history leaves
    are INPUT-ONLY — the kernel never writes their ~16 KB/stream back to
    HBM — and the pending far blocks come out as two small extra outputs
    for the caller's dynamic_update_slice append."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = far_lm.shape[-1]
    lane_tile = _pick_tile(b)
    assert lane_tile, f"batch {b} not a multiple of 128"
    leaves, treedef = jax.tree_util.tree_flatten(core_f)
    t_leaves = list(t)
    circular = far_head is not None
    if circular:
        # flat-leaf indices of the two read-only history leaves (by field
        # position — object identity is unreliable under tracing CSE)
        ro_idx, pos = set(), 0
        for name, val in core_f._asdict().items():
            nl = len(jax.tree_util.tree_leaves(val))
            if name in ("far_history", "far_q_domains"):
                assert nl == 1
                ro_idx.add(pos)
            pos += nl
        # input-leaf k -> position among the kernel's state OUTPUTS
        # (history leaves are skipped: read-only in circular mode)
        out_pos, w = [], 0
        for k in range(len(leaves)):
            out_pos.append(None if k in ro_idx else w)
            w += out_pos[-1] is not None
        n_state_out = w
        n_slots = _n_slots_for(n_frames)
    else:
        out_pos = list(range(len(leaves)))
        n_state_out = len(leaves)

    data_in = [far_lm, noisy_lm] + ([clean_lm] if has_clean else []) + [
        phase_all, run_rows.astype(I32)] + (
        [far_head] if circular else [])
    n_tables = len(t_leaves)
    n_data = len(data_in)

    def kernel(*refs):
        t_refs = refs[:n_tables]
        d_refs = refs[n_tables:n_tables + n_data]
        s_refs = refs[n_tables + n_data:
                      n_tables + n_data + len(leaves)]
        out_ref = refs[n_tables + n_data + len(leaves)]
        so_refs = refs[n_tables + n_data + len(leaves) + 1:]

        tt = Tables(*[r[:] for r in t_refs])
        dd = [r[:] for r in d_refs]
        core_vals = jax.tree_util.tree_unflatten(
            treedef, [r[:] for r in s_refs])
        far_v, noisy_v = dd[0], dd[1]
        clean_v = dd[2] if has_clean else None
        ci = 3 if has_clean else 2
        phase_v, run_v = dd[ci], dd[ci + 1]
        head_v = dd[ci + 2] if circular else None

        res = frames_step(core_vals, tt, far_v, noisy_v, clean_v,
                          phase_v, run_v != 0, mult,
                          n_frames, has_clean, abs_approx,
                          frames_per_chunk, far_head=head_v)
        if circular:
            core_out, out, pend_hist, pend_q = res
        else:
            core_out, out = res
        out_ref[:] = out
        new_leaves = jax.tree_util.tree_leaves(core_out)
        for k, v in enumerate(new_leaves):
            if out_pos[k] is not None:
                so_refs[out_pos[k]][:] = v
        if circular:
            so_refs[n_state_out][:] = pend_hist
            so_refs[n_state_out + 1][:] = pend_q

    def tile_spec(x):
        return pl.BlockSpec((x.shape[0], lane_tile),
                            lambda i: (0, i), memory_space=pltpu.VMEM)

    def table_spec(x):
        return pl.BlockSpec(x.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = ([table_spec(x) for x in t_leaves]
                + [tile_spec(x) for x in data_in]
                + [tile_spec(x) for x in leaves])
    out_len_rows = n_frames * D.FRAME_LEN
    state_out = [x for k, x in enumerate(leaves) if out_pos[k] is not None]
    out_shapes = ([jax.ShapeDtypeStruct((out_len_rows, b), I32)]
                  + [jax.ShapeDtypeStruct(x.shape, x.dtype)
                     for x in state_out])
    out_specs = ([pl.BlockSpec((out_len_rows, lane_tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM)]
                 + [tile_spec(x) for x in state_out])
    if circular:
        out_shapes += [
            jax.ShapeDtypeStruct((n_slots * FAR_HIST_ROWS, b), I32),
            jax.ShapeDtypeStruct((n_slots, b), I32)]
        out_specs += [
            pl.BlockSpec((n_slots * FAR_HIST_ROWS, lane_tile),
                         lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_slots, lane_tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM)]
    aliases = {n_tables + n_data + k: 1 + out_pos[k]
               for k in range(len(leaves)) if out_pos[k] is not None}

    res = pl.pallas_call(
        kernel,
        grid=(b // lane_tile,),
        out_shape=out_shapes,
        in_specs=in_specs,
        out_specs=out_specs,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            # ~25 KB/stream of state double-buffered in+out busts the
            # default 16 MB scoped-VMEM budget; v5e has 128 MB.
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*(t_leaves + data_in + leaves))
    out = res[0]
    state_new = list(res[1:1 + n_state_out])
    core_out = jax.tree_util.tree_unflatten(
        treedef, [leaves[k] if out_pos[k] is None else state_new[out_pos[k]]
                  for k in range(len(leaves))])
    if circular:
        return core_out, out, res[1 + n_state_out], res[2 + n_state_out]
    return core_out, out


def make_fused_chunk_step(sample_rate: int, has_clean: bool = False,
                          use_kernel: Optional[bool] = None,
                          abs_approx: bool = False,
                          lane_major_io: bool = False,
                          chunks_per_step: int = 1,
                          circular_far: bool = False):
    """One serving step of `chunks_per_step` × 10 ms on FusedState.

    Drop-in equivalent of parallel.batch.make_chunk_step, bit-exact with
    it (tests/test_fused.py, tools/check_fused_parity.py); the core path
    runs as a single Pallas kernel on TPU (use_kernel=None: auto — kernel
    when the default backend is TPU, pure jnp otherwise).  Dual-input
    (nearend_clean) serving runs in the same kernel (the reference
    computes the clean FFT inside the same hot loop,
    aecm_core_c.cc:442-463).

    chunks_per_step > 1 fuses several 10 ms chunks into ONE kernel call
    (the offline driver uses this: a 4-chunk 8 kHz span is exactly 5
    blocks — no masked-slot waste) while the control layer still runs its
    exact per-chunk sequence; bit-identical for any value.

    Step signature: (state, far, noisy[, clean], ms) -> (state, out,
    warn).  far is (B, chunks_per_step*out_len); noisy/clean/out are the
    same batch-leading shape, or (rows, B) lane-major when lane_major_io
    (the offline driver hoists the layout transposes out of its scan).
    ms is a scalar, (B,), or (chunks_per_step, B).  warn is (B,) for
    chunks_per_step == 1, else (chunks_per_step, B).

    circular_far (offline-driver mode, run_streams_fused only): the far
    history is stored CIRCULARLY with a global head the caller threads
    through — step signature becomes (state, head, far, noisy[, clean],
    ms) -> (state, head', out, warn).  Requires an exact-block schedule
    (chunks_per_step*out_len a multiple of PART_LEN, block count dividing
    MAX_DELAY) so every fully-running stream produces the same block
    count per step; streams that start mid-step are suffix-aligned into
    the head window (gap-before-first-block = zeros = the reference's
    zero-initialized history).  Bit-exact with the default mode.
    """
    mult = sample_rate // 8000
    out_len = min(160, sample_rate // 100)
    fpc = out_len // D.FRAME_LEN          # frames per 10 ms chunk
    n_blocks_10ms = fpc // mult
    est_idx = 0 if sample_rate == 8000 else 1
    cps = chunks_per_step
    n_frames = fpc * cps
    if circular_far:
        if (n_frames * D.FRAME_LEN) % D.PART_LEN:
            raise ValueError(
                "circular_far needs an exact-block schedule "
                f"({n_frames} frames = {n_frames * D.FRAME_LEN} samples "
                f"is not a multiple of {D.PART_LEN})")
        s_blocks = (n_frames * D.FRAME_LEN) // D.PART_LEN
        if D.MAX_DELAY % s_blocks:
            raise ValueError(
                f"circular_far needs the per-step block count "
                f"({s_blocks}) to divide MAX_DELAY ({D.MAX_DELAY})")

    def ctrl_chunk_ptr(ctrl: CtrlState, ms_c):
        """The exact per-10 ms control sequence (echo_control_mobile.cc),
        POINTER phase: delay comp, jitter-ring write pointer, sndcard
        clamp, startup machine, per-frame availability + EstBufDelay,
        underrun replay, startup-field merge — all pointer math in XLA.
        The ring DATA pass is deferred: all chunks of a super-step share
        ONE multi-chunk Pallas pass (the ring used to stream through VMEM
        once per chunk; now once per step).  Returns (ctrl, (write_pos,
        n_write, read_pos), haves, run, in_startup, warn)."""
        # --- BufferFarend: delay comp + write POINTER math; the ring data
        # pass itself is deferred and fused with the frame reads into one
        # streaming kernel (three full-ring passes/chunk were the dominant
        # driver cost) ---
        comped = _delay_comp_ctrl(ctrl, mult)
        enabled = ctrl.ec_startup == 0
        ctrl = ctrl._replace(
            farend_buf=ctrl.farend_buf._replace(
                read_pos=jnp.where(enabled, comped.farend_buf.read_pos,
                                   ctrl.farend_buf.read_pos),
                rw_wrap=jnp.where(enabled, comped.farend_buf.rw_wrap,
                                  ctrl.farend_buf.rw_wrap)),
            delay_change=jnp.where(enabled, comped.delay_change,
                                   ctrl.delay_change))
        fb = ctrl.farend_buf
        cap = fb.capacity
        free = rbuf.available_write(fb)
        n_write = jnp.minimum(free, I32(out_len))
        margin = cap - fb.write_pos
        wrapped = n_write > margin
        write_pos0 = fb.write_pos
        ctrl = ctrl._replace(farend_buf=fb._replace(
            write_pos=jnp.where(wrapped, n_write - margin,
                                fb.write_pos + n_write),
            rw_wrap=jnp.where(wrapped, I32(rbuf.DIFF_WRAP), fb.rw_wrap)))

        warn = jnp.where((ms_c < 0) | (ms_c > 500),
                         I32(D.AECM_BAD_PARAMETER_WARNING), I32(0))
        ms = jnp.clip(ms_c, 0, 500) + 10
        ctrl = ctrl._replace(ms_in_sndcard_buf=ms)

        in_startup = ctrl.ec_startup != 0
        run = ~in_startup                              # (B,)
        started = _startup_ctrl(ctrl, n_blocks_10ms, mult)

        # --- enabled branch: frame availability + delay governance
        # (pointer-only; run-gated) ---
        read_pos0 = ctrl.farend_buf.read_pos
        haves = []
        for i in range(fpc):
            filled = (rbuf.available_read(ctrl.farend_buf)
                      // D.FRAME_LEN).astype(I32)
            have_data = (filled > 0) & run
            haves.append(have_data)
            ctrl = ctrl._replace(farend_buf=rbuf.move_read_ptr(
                ctrl.farend_buf,
                jnp.where(have_data, I32(D.FRAME_LEN), I32(0))))
            if i == est_idx:
                est = _est_buf_delay_ctrl(ctrl, mult)
                est_on = run
                ctrl = ctrl._replace(
                    farend_buf=ctrl.farend_buf._replace(
                        read_pos=jnp.where(est_on,
                                           est.farend_buf.read_pos,
                                           ctrl.farend_buf.read_pos),
                        rw_wrap=jnp.where(est_on, est.farend_buf.rw_wrap,
                                          ctrl.farend_buf.rw_wrap)),
                    **{f: jnp.where(est_on, getattr(est, f),
                                    getattr(ctrl, f))
                       for f in ("filt_delay", "time_for_delay_change",
                                 "known_delay", "last_delay_diff")})

        # --- startup-owned fields merge from `started` (takes effect
        # before the NEXT chunk's control; the core kernel reads nothing
        # from ctrl, so merging here ≡ the reference's per-call order) ---
        ctrl = ctrl._replace(
            farend_buf=ctrl.farend_buf._replace(
                read_pos=jnp.where(in_startup, started.farend_buf.read_pos,
                                   ctrl.farend_buf.read_pos),
                rw_wrap=jnp.where(in_startup, started.farend_buf.rw_wrap,
                                  ctrl.farend_buf.rw_wrap)),
            **{f: jnp.where(in_startup, getattr(started, f),
                            getattr(ctrl, f))
               for f in ("ec_startup", "check_buff_size",
                         "check_buf_size_ctr", "counter", "sum",
                         "first_val", "buf_size_start")})
        return (ctrl, (write_pos0, n_write, read_pos0), haves, run,
                in_startup, warn)

    def _step_impl(state: FusedState, far, noisy, clean, ms_in, head=None):
        kernel_on = use_kernel
        if kernel_on is None:
            kernel_on = jax.default_backend() == "tpu"
        b = state.ctrl.ec_startup.shape[0]
        if kernel_on and _pick_tile(b) == 0:
            kernel_on = False          # batch not tileable: pure path
        t = make_tables()

        ctrl, core_f = state.ctrl, state.core
        far_b = jnp.asarray(far, I32)
        ms_all = jnp.broadcast_to(jnp.asarray(ms_in, I32), (cps, b))

        # --- pointer phase: the exact per-chunk control sequence, data
        # pass deferred (positions collected for one multi-chunk kernel) ---
        ring_data0 = ctrl.farend_buf.data
        ptrs, haves_l, run_l, startup_l, warns = [], [], [], [], []
        for c in range(cps):
            ctrl, ptr_c, haves_c, run_c, in_st_c, warn_c = ctrl_chunk_ptr(
                ctrl, ms_all[c])
            ptrs.append(ptr_c)
            haves_l.append(haves_c)
            run_l.append(run_c)
            startup_l.append(in_st_c)
            warns.append(warn_c)

        # --- ONE ring data pass for all cps chunks: write chunk c's far
        # samples, gather chunk c's frame window, in per-chunk order
        # (chunk c's gather sees writes 0..c exactly like the per-chunk
        # sequence it replaces) ---
        new_ring, gathered = _ring_write_gather_multi(
            ring_data0,
            jnp.stack([p[0] for p in ptrs]), far_b,
            jnp.stack([p[1] for p in ptrs]),
            jnp.stack([p[2] for p in ptrs]), out_len)
        ctrl = ctrl._replace(
            farend_buf=ctrl.farend_buf._replace(data=new_ring))

        # --- frame assembly + underrun replay (haves[i+1] implies
        # haves[i], so frame i's source is gathered[c, i*80:]) ---
        frames_far = []
        farend_old = ctrl.farend_old
        for c in range(cps):
            run_c, haves_c = run_l[c], haves_l[c]
            for i in range(fpc):
                old_i = farend_old[:, i, :]
                farend_i = jnp.where(
                    haves_c[i][:, None],
                    gathered[:, c * out_len + i * D.FRAME_LEN:
                             c * out_len + (i + 1) * D.FRAME_LEN], old_i)
                farend_old = farend_old.at[:, i, :].set(
                    jnp.where(run_c[:, None], farend_i, old_i))
                frames_far.append(farend_i)
        ctrl = ctrl._replace(farend_old=farend_old)
        run_rows = jnp.stack(
            [r for r in run_l for _ in range(fpc)], axis=0)  # (n_frames, B)

        # --- CNG RNG chain + phase lookups, hoisted pre-kernel ---
        phase_all, new_seed = _precompute_cng_phases(
            core_f, run_rows, n_frames)
        core_f = core_f._replace(seed=new_seed)

        far_lm = jnp.concatenate(
            [jnp.asarray(f, I32).T for f in frames_far], axis=0)

        def to_lm(x):
            xb = jnp.asarray(x, I32)
            return xb.reshape(-1, n_frames, D.FRAME_LEN
                              ).transpose(1, 2, 0).reshape(
                n_frames * D.FRAME_LEN, -1)

        if lane_major_io:
            noisy_lm = jnp.asarray(noisy, I32)
            clean_lm = jnp.asarray(clean, I32) if has_clean else None
        else:
            noisy_lm = to_lm(noisy)
            clean_lm = to_lm(clean) if has_clean else None

        fill0 = core_f.frame_fill          # (1, B), pre-kernel
        head_row = (jnp.broadcast_to(jnp.asarray(head, I32), (1, b))
                    if circular_far else None)

        if kernel_on:
            res = _frames_kernel_call(
                core_f, t, far_lm, noisy_lm, clean_lm, phase_all,
                run_rows, mult, n_frames, has_clean, abs_approx, fpc,
                far_head=head_row)
        else:
            res = frames_step(
                core_f, t, far_lm, noisy_lm, clean_lm, phase_all,
                run_rows, mult, n_frames, has_clean, abs_approx, fpc,
                far_head=head_row)

        if circular_far:
            core_f, out_lm, pend_hist, pend_q = res
            # Suffix-align streams that started mid-step: their n_act < S
            # pending blocks shift to the END of the head window so their
            # timeline stays consecutive backwards from the head (rows
            # left uncovered = zeros = the reference's initial history).
            # INVARIANT (one-shot activation): this alignment assumes a
            # stream with n_act < S has NO prior history (run flips 0->1
            # exactly once, at AECM init, and never back — the control
            # machine has no de-activation path).  A stream that ran a
            # partial step *after* already accumulating history would get
            # zero blocks spliced between its new and old blocks.  Any
            # future control-path change that can pause a started stream
            # must also rework this merge.
            S = s_blocks
            k_act = _sum0(run_rows.astype(I32))
            n_act = (fill0 + D.FRAME_LEN * k_act) >> 6       # (1, B)
            rot = S - n_act
            ph, pq = pend_hist, pend_q
            for r in range(1, S + 1):
                zh = jnp.zeros((r * FAR_HIST_ROWS, b), I32)
                cand_h = jnp.concatenate(
                    [zh, pend_hist[:(S - r) * FAR_HIST_ROWS]], axis=0)
                cand_q = jnp.concatenate(
                    [jnp.zeros((r, b), I32), pend_q[:S - r]], axis=0)
                ph = jnp.where(rot == r, cand_h, ph)
                pq = jnp.where(rot == r, cand_q, pq)
            head_s = jnp.asarray(head, I32)
            core_f = core_f._replace(
                far_history=jax.lax.dynamic_update_slice(
                    core_f.far_history, ph, (head_s * FAR_HIST_ROWS, 0)),
                far_q_domains=jax.lax.dynamic_update_slice(
                    core_f.far_q_domains, pq, (head_s, 0)))
            head_next = head_s + S
            head_next = jnp.where(head_next >= D.MAX_DELAY,
                                  head_next - D.MAX_DELAY, head_next)
        else:
            core_f, out_lm = res

        # --- per-chunk startup passthrough (the reference passes the
        # clean input through when provided, echo_control_mobile.cc:289) ---
        pass_lm = clean_lm if has_clean else noisy_lm
        rows = [jnp.where(startup_l[c][None, :],
                          pass_lm[c * out_len:(c + 1) * out_len],
                          out_lm[c * out_len:(c + 1) * out_len])
                for c in range(cps)]
        out_lm = jnp.concatenate(rows, axis=0) if cps > 1 else rows[0]
        if lane_major_io:
            out = out_lm
        else:
            out = out_lm.reshape(n_frames, D.FRAME_LEN, -1
                                 ).transpose(2, 0, 1).reshape(
                -1, n_frames * D.FRAME_LEN)
        warn = warns[0] if cps == 1 else jnp.stack(warns, axis=0)
        new_state = FusedState(ctrl=ctrl, core=core_f)
        if circular_far:
            return new_state, head_next, out, warn
        return new_state, out, warn

    if circular_far:
        if has_clean:
            def step(state, head, far, noisy, clean, ms_in_sndcard_buf):
                return _step_impl(state, far, noisy, clean,
                                  ms_in_sndcard_buf, head=head)
        else:
            def step(state, head, far, noisy, ms_in_sndcard_buf):
                return _step_impl(state, far, noisy, None,
                                  ms_in_sndcard_buf, head=head)
    elif has_clean:
        def step(state, far, noisy, clean, ms_in_sndcard_buf):
            return _step_impl(state, far, noisy, clean, ms_in_sndcard_buf)
    else:
        def step(state, far, noisy, ms_in_sndcard_buf):
            return _step_impl(state, far, noisy, None, ms_in_sndcard_buf)
    return step


def _to_circular_far(core_f):
    """Newest-first far history -> circular order at head 0 (a block-
    granular flip: head 0 means the next write lands at row-group 0, so
    the newest existing block sits at row-group MAX_DELAY-1)."""
    b = core_f.far_history.shape[-1]
    h3 = core_f.far_history.reshape(D.MAX_DELAY, FAR_HIST_ROWS, b)
    return core_f._replace(
        far_history=jnp.flip(h3, axis=0).reshape(-1, b),
        far_q_domains=jnp.flip(core_f.far_q_domains, axis=0))


def _from_circular_far(core_f, head):
    """Circular order at `head` -> newest-first: nf[d] =
    circ[(head - 1 - d) mod MAX_DELAY] = flip(roll(circ, -head))."""
    b = core_f.far_history.shape[-1]
    h3 = core_f.far_history.reshape(D.MAX_DELAY, FAR_HIST_ROWS, b)
    h3 = jnp.flip(jnp.roll(h3, D.MAX_DELAY - head, axis=0), axis=0)
    q = jnp.flip(jnp.roll(core_f.far_q_domains, D.MAX_DELAY - head,
                          axis=0), axis=0)
    return core_f._replace(far_history=h3.reshape(-1, b), far_q_domains=q)


def run_streams_fused(state: FusedState, far, near, sample_rate: int,
                      ms_in_sndcard_buf=40,
                      use_kernel: Optional[bool] = None,
                      clean=None,
                      chunks_per_step: Optional[int] = None):
    """parallel.batch.run_streams on the fused path: whole signals in one
    jittable lax.scan, the core path as one Pallas kernel per scan step.
    far/near[/clean]: (n_streams, n_samples); returns (state, out).

    chunks_per_step: how many 10 ms chunks each scan step fuses into one
    kernel (default 4 @ 8 kHz — a 4-chunk span is exactly 5 blocks, no
    masked-slot waste — and 2 @ 16 kHz = exactly 5 blocks).  Bit-identical
    for any value: the control layer always runs its exact per-chunk
    sequence.  A non-dividing tail of chunks runs as one final smaller
    step."""
    chunk = min(160, sample_rate // 100)
    far = jnp.asarray(far, I32)
    near = jnp.asarray(near, I32)
    has_clean = clean is not None
    if has_clean:
        clean = jnp.asarray(clean, I32)
    n_streams, n_samples = near.shape
    n_chunks = n_samples // chunk
    if chunks_per_step is None:
        chunks_per_step = 4 if sample_rate == 8000 else 2
    cps = max(1, min(chunks_per_step, n_chunks))
    n_super, rem = divmod(n_chunks, cps)

    ms = jnp.asarray(ms_in_sndcard_buf, I32)
    if ms.ndim == 0 or (ms.ndim == 1 and ms.shape[0] == n_streams):
        ms_t = jnp.broadcast_to(ms, (n_chunks, n_streams))
    elif ms.ndim == 1:
        ms_t = jnp.broadcast_to(ms[:, None], (n_chunks, n_streams))
    else:
        ms_t = ms

    def seg_tm(x, lo, hi, c):   # chunks [lo, hi) grouped by c, batch-major
        return x[:, lo * chunk:hi * chunk].reshape(
            n_streams, (hi - lo) // c, c * chunk).transpose(1, 0, 2)

    def seg_lm(x, lo, hi, c):   # same, lane-major: ONE transpose
        return x[:, lo * chunk:hi * chunk].T.reshape(
            (hi - lo) // c, c * chunk, n_streams)

    def run_span(st, lo, hi, c):
        # circular far history whenever the span's schedule is exact-block
        # (the serving defaults are: 2 chunks @ 16 kHz / 4 @ 8 kHz = 5
        # blocks): the kernel stops carrying the ~16 KB/stream history
        # through every step — see make_fused_chunk_step(circular_far=...)
        circ = ((c * chunk) % D.PART_LEN == 0
                and D.MAX_DELAY % ((c * chunk) // D.PART_LEN) == 0)
        stepc = make_fused_chunk_step(sample_rate, has_clean=has_clean,
                                      use_kernel=use_kernel,
                                      lane_major_io=True,
                                      chunks_per_step=c,
                                      circular_far=circ)
        xs = [seg_tm(far, lo, hi, c), seg_lm(near, lo, hi, c)]
        if has_clean:
            xs.append(seg_lm(clean, lo, hi, c))
        xs.append(ms_t[lo:hi].reshape((hi - lo) // c, c, n_streams))

        if circ:
            st = st._replace(core=_to_circular_far(st.core))

            def scan_fn_c(carry, x):
                s, h = carry
                if has_clean:
                    f, d, cl, m = x
                    s, h, out, _ = stepc(s, h, f, d, cl, m)
                else:
                    f, d, m = x
                    s, h, out, _ = stepc(s, h, f, d, m)
                return (s, h), out

            (st, head), outs = jax.lax.scan(
                scan_fn_c, (st, jnp.asarray(0, I32)), tuple(xs))
            st = st._replace(core=_from_circular_far(st.core, head))
            return st, outs.reshape((hi - lo) * chunk, n_streams)

        def scan_fn(s, x):
            if has_clean:
                f, d, cl, m = x
                s, out, _ = stepc(s, f, d, cl, m)
            else:
                f, d, m = x
                s, out, _ = stepc(s, f, d, m)
            return s, out

        st, outs = jax.lax.scan(scan_fn, st, tuple(xs))
        return st, outs.reshape((hi - lo) * chunk, n_streams)

    state, out_main = run_span(state, 0, n_super * cps, cps)
    parts = [out_main]
    if rem:
        state, out_rem = run_span(state, n_super * cps, n_chunks, rem)
        parts.append(out_rem)
    out = jnp.concatenate(parts, axis=0).T if rem else out_main.T
    return state, out
