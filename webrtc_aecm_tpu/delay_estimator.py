"""Binary-spectrum delay estimator as fixed-shape JAX state.

TPU-native rebuild of the reference delay estimator pair
(reference: aecm/delay_estimator.{h,cc}, aecm/delay_estimator_wrapper.{h,cc}).

The C version keeps malloc'd histories behind opaque handles and scans them
with scalar loops; here every history is a fixed-shape array in a pytree and
the per-block work is a handful of vectorized ops:

  * the O(history) XOR+popcount match (delay_estimator.cc:67-77) is one
    `lax.population_count` over the (MAX_DELAY,) lane axis;
  * the smoothed mean update, valley search, and histogram update are
    elementwise ops + argmin/argmax reductions;
  * every data-dependent branch becomes a `jnp.where` select, so a single
    jitted step covers all control paths and batches under `vmap`.

Both the fixed-point (Q-domain uint16 spectra) and float entry points of the
wrapper are provided (delay_estimator_wrapper.cc:233-501).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import defines as D
from .ops import spl

I32 = jnp.int32
U32 = jnp.uint32
F32 = jnp.float32


# ---------------------------------------------------------------------------
# State pytrees
# ---------------------------------------------------------------------------

class FarendState(NamedTuple):
    """Far-end half (delay_estimator.h:30-38 + wrapper mean spectrum)."""
    binary_history: jnp.ndarray      # (history,) uint32
    bit_counts: jnp.ndarray          # (history,) int32 — far_bit_counts
    mean_spectrum: jnp.ndarray       # (spectrum_size,) int32 (Q15) or f32
    spectrum_initialized: jnp.ndarray  # int32 scalar bool


class NearState(NamedTuple):
    """Near-end half (delay_estimator.h:40-63 + wrapper mean spectrum)."""
    mean_spectrum: jnp.ndarray       # (spectrum_size,) int32 (Q15) or f32
    spectrum_initialized: jnp.ndarray
    binary_history: jnp.ndarray      # (lookahead+1,) uint32
    bit_counts: jnp.ndarray          # (history,) int32
    mean_bit_counts: jnp.ndarray     # (history+1,) int32 Q9 (+1 dummy slot)
    histogram: jnp.ndarray           # (history+1,) float32
    minimum_probability: jnp.ndarray   # int32 Q9
    last_delay_probability: jnp.ndarray  # int32 Q9
    last_delay: jnp.ndarray          # int32 (-2 before first valid estimate)
    last_candidate_delay: jnp.ndarray  # int32
    compare_delay: jnp.ndarray       # int32
    candidate_hits: jnp.ndarray      # int32
    last_delay_histogram: jnp.ndarray  # float32
    allowed_offset: jnp.ndarray      # int32
    lookahead: jnp.ndarray           # int32 (runtime, <= static history dim)
    robust_validation_enabled: jnp.ndarray  # int32 bool (runtime toggle)


def create_farend(history_size: int = D.MAX_DELAY,
                  spectrum_size: int = D.PART_LEN1,
                  float_spectrum: bool = False) -> FarendState:
    """WebRtc_CreateDelayEstimatorFarend + Init (delay_estimator_wrapper.cc:173-225)."""
    mean_dtype = F32 if float_spectrum else I32
    return FarendState(
        binary_history=jnp.zeros((history_size,), dtype=U32),
        bit_counts=jnp.zeros((history_size,), dtype=I32),
        mean_spectrum=jnp.zeros((spectrum_size,), dtype=mean_dtype),
        spectrum_initialized=I32(0),
    )


def create_near(history_size: int = D.MAX_DELAY,
                spectrum_size: int = D.PART_LEN1,
                max_lookahead: int = 0,
                float_spectrum: bool = False,
                robust_validation: bool = False) -> NearState:
    """WebRtc_CreateDelayEstimator + Init (delay_estimator_wrapper.cc:306-355,
    delay_estimator.cc:408-504).  robust_validation seeds the runtime
    toggle (disabled by default, delay_estimator.cc:475)."""
    mean_dtype = F32 if float_spectrum else I32
    return NearState(
        mean_spectrum=jnp.zeros((spectrum_size,), dtype=mean_dtype),
        spectrum_initialized=I32(0),
        binary_history=jnp.zeros((max_lookahead + 1,), dtype=U32),
        bit_counts=jnp.zeros((history_size,), dtype=I32),
        mean_bit_counts=jnp.full((history_size + 1,), 20 << 9, dtype=I32),
        histogram=jnp.zeros((history_size + 1,), dtype=F32),
        minimum_probability=I32(D.MAX_BITCOUNTS_Q9),
        last_delay_probability=I32(D.MAX_BITCOUNTS_Q9),
        last_delay=I32(-2),
        last_candidate_delay=I32(-2),
        compare_delay=I32(history_size),
        candidate_hits=I32(0),
        last_delay_histogram=F32(0.0),
        allowed_offset=I32(0),
        lookahead=I32(max_lookahead),
        robust_validation_enabled=I32(1 if robust_validation else 0),
    )


# ---------------------------------------------------------------------------
# Runtime reconfiguration + soft resets (wrapper config surface,
# delay_estimator_wrapper.cc:227-445)
# ---------------------------------------------------------------------------

def soft_reset_farend(state: FarendState, delay_shift) -> FarendState:
    """WebRtc_SoftResetDelayEstimatorFarend (delay_estimator_wrapper.cc:227,
    delay_estimator.cc:336-367): shift far histories by delay_shift blocks
    and zero-pad; delay_shift may be a traced int32."""
    history_size = state.binary_history.shape[-1]
    shift = jnp.asarray(delay_shift, I32)
    idx = jnp.arange(history_size, dtype=I32) - shift
    valid = (idx >= 0) & (idx < history_size)
    idx = jnp.clip(idx, 0, history_size - 1)

    def shifted(a):
        return jnp.where(valid, a[..., idx], jnp.zeros((), a.dtype))

    return state._replace(binary_history=shifted(state.binary_history),
                          bit_counts=shifted(state.bit_counts))


def soft_reset_near(state: NearState, delay_shift):
    """WebRtc_SoftResetDelayEstimator (delay_estimator_wrapper.cc:357,
    delay_estimator.cc:506-519): absorb delay_shift into the lookahead,
    clamped to [0, near_history_size-1].  Returns (state, applied_shift)
    where applied_shift = old_lookahead - new_lookahead."""
    near_history_size = state.binary_history.shape[-1]
    old = state.lookahead
    new = jnp.clip(old - jnp.asarray(delay_shift, I32), 0,
                   near_history_size - 1)
    return state._replace(lookahead=new), old - new


def set_lookahead(state: NearState, lookahead):
    """WebRtc_set_lookahead (delay_estimator_wrapper.cc:386-397).
    Returns (state, result) with result == new lookahead, or -1 (state
    unchanged) if out of [0, near_history_size-1]."""
    near_history_size = state.binary_history.shape[-1]
    la = jnp.asarray(lookahead, I32)
    valid = (la >= 0) & (la <= near_history_size - 1)
    return (state._replace(lookahead=jnp.where(valid, la, state.lookahead)),
            jnp.where(valid, la, I32(-1)))


def lookahead(state: NearState):
    """WebRtc_lookahead (delay_estimator_wrapper.cc:399-404)."""
    return state.lookahead


def set_allowed_offset(state: NearState, allowed_offset):
    """WebRtc_set_allowed_offset (delay_estimator_wrapper.cc:405-413)."""
    off = jnp.asarray(allowed_offset, I32)
    valid = off >= 0
    return (state._replace(
        allowed_offset=jnp.where(valid, off, state.allowed_offset)),
        jnp.where(valid, I32(0), I32(-1)))


def get_allowed_offset(state: NearState):
    """WebRtc_get_allowed_offset (delay_estimator_wrapper.cc:415-422)."""
    return state.allowed_offset


def enable_robust_validation(state: NearState, enable):
    """WebRtc_enable_robust_validation (delay_estimator_wrapper.cc:424-437):
    runtime per-instance toggle, exactly like the reference (the C flag is
    plain instance state, togglable between Process calls)."""
    en = jnp.asarray(enable, I32)
    valid = (en >= 0) & (en <= 1)
    return (state._replace(robust_validation_enabled=jnp.where(
        valid, en, state.robust_validation_enabled)),
        jnp.where(valid, I32(0), I32(-1)))


def is_robust_validation_enabled(state: NearState):
    """WebRtc_is_robust_validation_enabled (delay_estimator_wrapper.cc:439-445)."""
    return state.robust_validation_enabled


def set_history_size(near: NearState, farend: FarendState,
                     history_size: int):
    """WebRtc_set_history_size (delay_estimator_wrapper.cc:363-377) +
    WebRtc_AllocateHistoryBufferMemory / AllocateFarendBufferMemory
    (delay_estimator.cc:445-494, 305-328).

    history_size is an array dimension, so this is a static (trace-time)
    reconfiguration — the TPU analog of the reference's realloc.  realloc
    semantics are preserved: shrinking keeps the prefix (including the old
    mean/histogram values that land in the new dummy slot), expansion
    zero-fills from the OLD history_size onward — the reference memsets
    [old, new) and leaves the new dummy slot uninitialized
    (delay_estimator.cc:478-488); we define it as 0.

    Returns (near, farend) with resized histories.
    """
    if history_size <= 1:
        raise ValueError("history_size must be > 1 "
                         "(delay_estimator_wrapper.cc:366)")
    old = near.bit_counts.shape[-1]

    def resize(a, new_n, keep=None):
        kept = a[..., :new_n] if keep is None else a[..., :min(keep, new_n)]
        pad_n = new_n - kept.shape[-1]
        if pad_n <= 0:
            return kept
        pad = jnp.zeros(kept.shape[:-1] + (pad_n,), a.dtype)
        return jnp.concatenate([kept, pad], axis=-1)

    farend = farend._replace(
        binary_history=resize(farend.binary_history, history_size),
        bit_counts=resize(farend.bit_counts, history_size))
    # The +1 dummy slot: on expansion the C zero-fills from index `old`
    # (overwriting the old dummy); on shrink realloc keeps the prefix.
    grow = history_size > old
    near = near._replace(
        bit_counts=resize(near.bit_counts, history_size),
        mean_bit_counts=resize(near.mean_bit_counts, history_size + 1,
                               keep=old if grow else history_size + 1),
        histogram=resize(near.histogram, history_size + 1,
                         keep=old if grow else history_size + 1))
    return near, farend


def history_size(near: NearState, farend: FarendState) -> int:
    """WebRtc_history_size (delay_estimator_wrapper.cc:379-384): -1 when
    the near/far history sizes mismatch."""
    n = near.bit_counts.shape[-1]
    f = farend.binary_history.shape[-1]
    return n if n == f else -1


# ---------------------------------------------------------------------------
# Spectrum -> binary spectrum (wrapper layer)
# ---------------------------------------------------------------------------

def mean_estimator_fix(new_value, factor, mean_value):
    """WebRtc_MeanEstimatorFix (delay_estimator.cc:690-702)."""
    diff = new_value.astype(I32) - mean_value.astype(I32)
    step = jnp.where(diff < 0, -((-diff) >> factor), diff >> factor)
    return mean_value + step


def binary_spectrum_fix(spectrum, mean_spectrum, q_domain, initialized):
    """BinarySpectrumFix (delay_estimator_wrapper.cc:92-125).

    Args:
      spectrum: (..., 65) int32 of uint16-range magnitudes, Q(q_domain).
      mean_spectrum: (..., 65) int32 threshold state (Q15).
      q_domain: int32 scalar (or batch) <= 15.
      initialized: int32 scalar bool.
    Returns: (bits uint32, new_mean_spectrum, new_initialized)
    """
    band = jnp.arange(spectrum.shape[-1], dtype=I32)
    in_band = (band >= D.BAND_FIRST) & (band <= D.BAND_LAST)
    shift = (15 - jnp.asarray(q_domain, I32))
    spectrum_q15 = (spectrum.astype(U32) << shift.astype(U32)).astype(I32)

    # Lazy threshold init: seed at half the first non-zero spectrum.
    init_thresh = jnp.where(in_band & (spectrum > 0), spectrum_q15 >> 1,
                            mean_spectrum)
    any_nonzero = jnp.any(in_band & (spectrum > 0), axis=-1)
    do_init = initialized == 0
    mean_spectrum = jnp.where(do_init, init_thresh, mean_spectrum)
    initialized = jnp.where(do_init & any_nonzero, I32(1), initialized)

    updated = mean_estimator_fix(spectrum_q15, 6, mean_spectrum)
    mean_spectrum = jnp.where(in_band, updated, mean_spectrum)
    bit_on = in_band & (spectrum_q15 > mean_spectrum)
    weights = jnp.where(
        bit_on, U32(1) << (band - D.BAND_FIRST).clip(0).astype(U32), U32(0))
    bits = jnp.sum(weights, axis=-1, dtype=U32)
    return bits, mean_spectrum, initialized


def binary_spectrum_float(spectrum, mean_spectrum, initialized):
    """BinarySpectrumFloat (delay_estimator_wrapper.cc:127-155)."""
    band = jnp.arange(spectrum.shape[-1], dtype=I32)
    in_band = (band >= D.BAND_FIRST) & (band <= D.BAND_LAST)
    scale = F32(1.0 / 64.0)

    init_thresh = jnp.where(in_band & (spectrum > 0), spectrum * F32(0.5),
                            mean_spectrum)
    any_nonzero = jnp.any(in_band & (spectrum > 0), axis=-1)
    do_init = initialized == 0
    mean_spectrum = jnp.where(do_init, init_thresh, mean_spectrum)
    initialized = jnp.where(do_init & any_nonzero, I32(1), initialized)

    updated = mean_spectrum + (spectrum - mean_spectrum) * scale
    mean_spectrum = jnp.where(in_band, updated, mean_spectrum)
    bit_on = in_band & (spectrum > mean_spectrum)
    weights = jnp.where(
        bit_on, U32(1) << (band - D.BAND_FIRST).clip(0).astype(U32), U32(0))
    bits = jnp.sum(weights, axis=-1, dtype=U32)
    return bits, mean_spectrum, initialized


def add_far_spectrum_fix(state: FarendState, spectrum, far_q) -> FarendState:
    """WebRtc_AddFarSpectrumFix (delay_estimator_wrapper.cc:233-262) +
    WebRtc_AddBinaryFarSpectrum (delay_estimator.cc:369-382)."""
    bits, mean, inited = binary_spectrum_fix(
        spectrum, state.mean_spectrum, far_q, state.spectrum_initialized)
    history = jnp.roll(state.binary_history, 1, axis=-1).at[0].set(bits)
    counts = jnp.roll(state.bit_counts, 1, axis=-1).at[0].set(
        jax.lax.population_count(bits).astype(I32))
    return FarendState(history, counts, mean, inited)


def add_far_spectrum_float(state: FarendState, spectrum) -> FarendState:
    """WebRtc_AddFarSpectrumFloat (delay_estimator_wrapper.cc:264-288)."""
    bits, mean, inited = binary_spectrum_float(
        spectrum, state.mean_spectrum, state.spectrum_initialized)
    history = jnp.roll(state.binary_history, 1, axis=-1).at[0].set(bits)
    counts = jnp.roll(state.bit_counts, 1, axis=-1).at[0].set(
        jax.lax.population_count(bits).astype(I32))
    return FarendState(history, counts, mean, inited)


# ---------------------------------------------------------------------------
# Binary core (delay_estimator.cc:521-663)
# ---------------------------------------------------------------------------

def _update_robust_validation_statistics(state: NearState, candidate_delay,
                                         valley_depth_q14, valley_level_q14):
    """UpdateRobustValidationStatistics (delay_estimator.cc:96-154).

    All single-slot histogram updates are one-hot masked selects, not
    scatters — per-stream dynamic-index scatters lower serially on TPU
    (CLAUDE.md perf rule #1)."""
    history_size = state.bit_counts.shape[-1]
    valley_depth = valley_depth_q14.astype(F32) * F32(D.Q14_SCALING)
    max_hits_for_slow_change = jnp.where(
        candidate_delay < state.last_delay,
        I32(D.MAX_HITS_WHEN_POSSIBLY_NON_CAUSAL),
        I32(D.MAX_HITS_WHEN_POSSIBLY_CAUSAL))

    new_candidate = candidate_delay != state.last_candidate_delay
    candidate_hits = jnp.where(new_candidate, I32(0), state.candidate_hits) + 1
    last_candidate_delay = candidate_delay

    i = jnp.arange(history_size + 1, dtype=I32)
    is_cand = i == candidate_delay
    histogram = jnp.where(
        is_cand,
        jnp.minimum(state.histogram + valley_depth, F32(D.HISTOGRAM_MAX)),
        state.histogram)

    decrease_in_last_set = jnp.where(
        candidate_hits < max_hits_for_slow_change,
        (_select_at(state.mean_bit_counts, state.compare_delay)
         - valley_level_q14).astype(F32) * F32(D.Q14_SCALING),
        valley_depth)

    in_range = i < history_size  # C loop covers [0, history_size)
    is_in_last_set = ((i >= state.last_delay - 2) & (i <= state.last_delay + 1)
                      & (i != candidate_delay))
    is_in_candidate_set = ((i >= candidate_delay - 2)
                           & (i <= candidate_delay + 1))
    dec = (decrease_in_last_set * is_in_last_set.astype(F32)
           + valley_depth * (~is_in_last_set & ~is_in_candidate_set).astype(F32))
    histogram = jnp.where(in_range, jnp.maximum(histogram - dec, F32(0.0)),
                          histogram)
    return state._replace(histogram=histogram, candidate_hits=candidate_hits,
                          last_candidate_delay=last_candidate_delay)


def _select_at(values, index):
    """values[index] as a one-hot masked sum — per-stream scalar gathers
    lower serially on TPU under vmap (CLAUDE.md perf rule #1); this stays
    a vectorized lane reduction."""
    i = jnp.arange(values.shape[-1], dtype=I32)
    return jnp.sum(jnp.where(i == index, values, jnp.zeros((), values.dtype)),
                   axis=-1)


def _histogram_based_validation(state: NearState, candidate_delay,
                                hist_at_candidate):
    """HistogramBasedValidation (delay_estimator.cc:178-223)."""
    delay_difference = (candidate_delay - state.last_delay).astype(F32)
    allowed = state.allowed_offset.astype(F32)

    fraction = jnp.where(
        delay_difference > allowed,
        jnp.maximum(1.0 - D.FRACTION_SLOPE * (delay_difference - allowed),
                    F32(D.MIN_FRACTION_WHEN_POSSIBLY_CAUSAL)),
        jnp.where(delay_difference < 0,
                  jnp.minimum(D.MIN_FRACTION_WHEN_POSSIBLY_NON_CAUSAL
                              - D.FRACTION_SLOPE * delay_difference, F32(1.0)),
                  F32(1.0)))
    threshold = _select_at(state.histogram, state.compare_delay) * fraction
    threshold = jnp.maximum(threshold, F32(D.MIN_HISTOGRAM_THRESHOLD))
    return ((hist_at_candidate >= threshold)
            & (state.candidate_hits > D.MIN_REQUIRED_HITS))


def _robust_validation(state: NearState, hist_at_candidate,
                       is_instantaneous_valid, is_histogram_valid):
    """RobustValidation (delay_estimator.cc:242-266)."""
    is_robust = (state.last_delay < 0) & (is_instantaneous_valid
                                          | is_histogram_valid)
    is_robust = is_robust | (is_instantaneous_valid & is_histogram_valid)
    is_robust = is_robust | (
        is_histogram_valid
        & (hist_at_candidate > state.last_delay_histogram))
    return is_robust


def process_binary_spectrum(state: NearState, farend: FarendState,
                            binary_near_spectrum):
    """WebRtc_ProcessBinarySpectrum (delay_estimator.cc:521-663).

    Robust validation is a runtime per-instance toggle carried in
    `state.robust_validation_enabled` (WebRtc_enable_robust_validation,
    delay_estimator_wrapper.cc:424-437); AECM keeps it off
    (aecm_core.cc:225).  Both validation paths are computed and selected —
    the histogram check is a handful of gathers, so tracing both costs
    nothing measurable and keeps the toggle per-stream under vmap.
    Returns: (new_state, last_delay int32).
    """
    history_size = state.bit_counts.shape[-1]
    near_history_size = state.binary_history.shape[-1]

    if near_history_size > 1:
        near_history = jnp.roll(state.binary_history, 1, axis=-1)
        near_history = near_history.at[0].set(binary_near_spectrum)
        binary_near_spectrum = near_history[
            jnp.clip(state.lookahead, 0, near_history_size - 1)]
        state = state._replace(binary_history=near_history)
    else:
        state = state._replace(
            binary_history=state.binary_history.at[0].set(binary_near_spectrum))

    # Bit-count comparison against the whole far history: one popcount op.
    bit_counts = jax.lax.population_count(
        binary_near_spectrum ^ farend.binary_history).astype(I32)

    # Smooth into mean_bit_counts where the far end has content.
    bit_count_q9 = bit_counts << 9
    shifts = D.SHIFTS_AT_ZERO - ((D.SHIFTS_LINEAR_SLOPE * farend.bit_counts)
                                 >> 4)
    mean_main = state.mean_bit_counts[:history_size]
    updated_mean = mean_estimator_fix(bit_count_q9, shifts, mean_main)
    mean_main = jnp.where(farend.bit_counts > 0, updated_mean, mean_main)
    mean_bit_counts = state.mean_bit_counts.at[:history_size].set(mean_main)

    # Valley search. The C loop takes the FIRST strict minimum/maximum and
    # leaves candidate_delay at -1 only if no entry beats kMaxBitCountsQ9.
    value_best = jnp.min(mean_main, axis=-1)
    candidate_delay = jnp.where(
        value_best < D.MAX_BITCOUNTS_Q9,
        jnp.argmin(mean_main, axis=-1).astype(I32), I32(-1))
    value_best = jnp.minimum(value_best, I32(D.MAX_BITCOUNTS_Q9))
    value_worst = jnp.maximum(jnp.max(mean_main, axis=-1), I32(0))
    valley_depth = value_worst - value_best

    # Adaptive minimum probability.
    threshold = jnp.maximum(value_best + D.PROBABILITY_OFFSET,
                            I32(D.PROBABILITY_LOWER_LIMIT))
    update_min_prob = ((state.minimum_probability > D.PROBABILITY_LOWER_LIMIT)
                       & (valley_depth > D.PROBABILITY_MIN_SPREAD)
                       & (state.minimum_probability > threshold))
    minimum_probability = jnp.where(update_min_prob, threshold,
                                    state.minimum_probability)

    last_delay_probability = state.last_delay_probability + 1

    valid_candidate = ((valley_depth > D.PROBABILITY_OFFSET)
                       & ((value_best < minimum_probability)
                          | (value_best < last_delay_probability)))

    non_stationary_farend = jnp.any(farend.bit_counts > 0, axis=-1)

    state = state._replace(bit_counts=bit_counts,
                           mean_bit_counts=mean_bit_counts,
                           minimum_probability=minimum_probability,
                           last_delay_probability=last_delay_probability)

    # Robust-validation statistics always track when farend is active.
    updated_stats = _update_robust_validation_statistics(
        state, candidate_delay, valley_depth, value_best)
    state = jax.tree_util.tree_map(
        lambda new, old: jnp.where(non_stationary_farend, new, old),
        updated_stats, state)

    hist_cand = _select_at(state.histogram, candidate_delay)
    is_histogram_valid = _histogram_based_validation(state, candidate_delay,
                                                     hist_cand)
    robust_valid = _robust_validation(
        state, hist_cand, valid_candidate, is_histogram_valid)
    valid_candidate = jnp.where(state.robust_validation_enabled != 0,
                                robust_valid, valid_candidate)

    do_update = non_stationary_farend & valid_candidate
    changed = do_update & (candidate_delay != state.last_delay)

    last_delay_histogram = jnp.where(
        changed, jnp.minimum(hist_cand, F32(D.LAST_HISTOGRAM_MAX)),
        state.last_delay_histogram)
    i = jnp.arange(history_size + 1, dtype=I32)
    histogram = jnp.where(
        (i == state.compare_delay) & changed
        & (hist_cand < state.histogram),
        hist_cand, state.histogram)

    last_delay = jnp.where(do_update, candidate_delay, state.last_delay)
    # state.last_delay_probability is already the ++'d value here.
    last_delay_probability = jnp.where(
        do_update & (value_best < state.last_delay_probability),
        value_best, state.last_delay_probability)
    compare_delay = jnp.where(do_update, last_delay, state.compare_delay)

    state = state._replace(
        histogram=histogram,
        last_delay=last_delay,
        last_delay_probability=last_delay_probability,
        compare_delay=compare_delay,
        last_delay_histogram=last_delay_histogram)
    return state, last_delay


def process_fix(state: NearState, farend: FarendState, near_spectrum,
                near_q):
    """WebRtc_DelayEstimatorProcessFix (delay_estimator_wrapper.cc:447-476)."""
    bits, mean, inited = binary_spectrum_fix(
        near_spectrum, state.mean_spectrum, near_q,
        state.spectrum_initialized)
    state = state._replace(mean_spectrum=mean, spectrum_initialized=inited)
    return process_binary_spectrum(state, farend, bits)


def process_float(state: NearState, farend: FarendState, near_spectrum):
    """WebRtc_DelayEstimatorProcessFloat (delay_estimator_wrapper.cc:478-501)."""
    bits, mean, inited = binary_spectrum_float(
        near_spectrum, state.mean_spectrum, state.spectrum_initialized)
    state = state._replace(mean_spectrum=mean, spectrum_initialized=inited)
    return process_binary_spectrum(state, farend, bits)


def last_delay_quality(state: NearState):
    """WebRtc_binary_last_delay_quality (delay_estimator.cc:671-688);
    branches on the runtime robust-validation toggle like the reference."""
    robust_q = (_select_at(state.histogram, state.compare_delay)
                / F32(D.HISTOGRAM_MAX))
    plain_q = jnp.maximum(
        (D.MAX_BITCOUNTS_Q9 - state.last_delay_probability).astype(F32)
        / F32(D.MAX_BITCOUNTS_Q9), F32(0.0))
    return jnp.where(state.robust_validation_enabled != 0, robust_q, plain_q)
