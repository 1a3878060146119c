"""Public control layer: buffering, startup governance, configuration.

TPU-native rebuild of the reference echo-control-mobile layer
(reference: aecm/echo_control_mobile.{h,cc}).

The C layer is an opaque-handle API around a far-end jitter ring, a
sound-card-stability startup state machine, and buffer-delay governance.
Here it is a pure-functional state pytree (`AecmState`) with
`buffer_farend(state, frame) -> state` and
`process(state, near, clean?, ms) -> (state, out, warn)` as single jitted
steps.  Every branch of the startup machine is a scalar select, so the whole
call — startup or enabled — is one traced graph that batches under `vmap`
and shards with `jax.sharding` across chips.

Host-side argument validation (NULL/size/init checks,
echo_control_mobile.cc:195-278) lives in api.py at the Python boundary;
everything data-dependent (clamping, startup, delay governance) is in-graph
so a jitted step never faults.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import core as core_mod
from . import defines as D
from .ops import ring_buffer as rbuf, spl

I32 = jnp.int32
F32 = jnp.float32


class AecmState(NamedTuple):
    """AecMobile (echo_control_mobile.cc:42-79) as a pytree."""
    core: core_mod.CoreState
    farend_buf: rbuf.RingBuffer        # 4000-sample jitter ring
    farend_old: jnp.ndarray            # (2, FRAME_LEN) underrun replay frames
    # startup / buffer-size governance
    ec_startup: jnp.ndarray
    check_buff_size: jnp.ndarray
    check_buf_size_ctr: jnp.ndarray
    counter: jnp.ndarray
    sum: jnp.ndarray
    first_val: jnp.ndarray
    buf_size_start: jnp.ndarray
    # delay governance
    ms_in_sndcard_buf: jnp.ndarray
    filt_delay: jnp.ndarray
    time_for_delay_change: jnp.ndarray
    known_delay: jnp.ndarray
    last_delay_diff: jnp.ndarray
    delay_change: jnp.ndarray
    echo_mode: jnp.ndarray


# echoMode 0-4 -> suppression-gain parameter rows
# (echo_control_mobile.cc:431-476): shifts of the SUPGAIN_* constants.
def _supgain_table():
    rows = []
    for mode in range(5):
        shift = {0: -3, 1: -2, 2: -1, 3: 0, 4: 1}[mode]

        def s(v):
            return v << shift if shift >= 0 else v >> -shift

        a = s(D.SUPGAIN_ERROR_PARAM_A)
        b = s(D.SUPGAIN_ERROR_PARAM_B)
        d = s(D.SUPGAIN_ERROR_PARAM_D)
        default = s(D.SUPGAIN_DEFAULT)
        rows.append([default, a, d, a - b, b - d])
    return jnp.asarray(np.array(rows, dtype=np.int32))


_SUPGAIN_TABLE = _supgain_table()


def create(sample_rate: int = 8000) -> AecmState:
    """WebRtcAecm_Create + WebRtcAecm_Init (echo_control_mobile.cc:89-191).

    sample_rate is static; the default config {cngMode=on, echoMode=3}
    (echo_control_mobile.cc:183-184) is applied.
    """
    state = AecmState(
        core=core_mod.create_core(sample_rate),
        # int16 storage: raw PCM fits, and the 4000-sample jitter ring is
        # the largest per-stream buffer — 16-bit halves its HBM traffic.
        farend_buf=rbuf.create(D.BUF_SIZE_SAMP, jnp.int16),
        farend_old=jnp.zeros((2, D.FRAME_LEN), I32),
        ec_startup=I32(1),
        check_buff_size=I32(1),
        check_buf_size_ctr=I32(0),
        counter=I32(0),
        sum=I32(0),
        first_val=I32(0),
        buf_size_start=I32(0),
        ms_in_sndcard_buf=I32(0),
        filt_delay=I32(0),
        time_for_delay_change=I32(0),
        known_delay=I32(0),
        last_delay_diff=I32(0),
        delay_change=I32(1),
        echo_mode=I32(3),
    )
    return set_config(state, cng_mode=1, echo_mode=3)


def set_config(state: AecmState, cng_mode, echo_mode) -> AecmState:
    """WebRtcAecm_set_config (echo_control_mobile.cc:410-479).

    cng_mode/echo_mode are data (traced), so reconfiguration does not
    recompile the step.
    """
    echo_mode = jnp.asarray(echo_mode, I32)
    row = _SUPGAIN_TABLE[jnp.clip(echo_mode, 0, 4)]
    core = state.core._replace(
        cng_mode=jnp.asarray(cng_mode, I32),
        sup_gain=row[0],
        sup_gain_old=row[0],
        sup_gain_err_param_a=row[1],
        sup_gain_err_param_d=row[2],
        sup_gain_err_param_diff_ab=row[3],
        sup_gain_err_param_diff_bd=row[4],
    )
    return state._replace(core=core, echo_mode=echo_mode)


def get_echo_path(state: AecmState):
    """WebRtcAecm_GetEchoPath (echo_control_mobile.cc:506-528)."""
    return state.core.channel_stored


def init_echo_path(state: AecmState, echo_path) -> AecmState:
    """WebRtcAecm_InitEchoPath (echo_control_mobile.cc:481-504)."""
    return state._replace(core=core_mod.init_echo_path(state.core, echo_path))


def _delay_comp(state: AecmState, mult: int) -> AecmState:
    """WebRtcAecm_DelayComp (echo_control_mobile.cc:575-594)."""
    n_samp_far = rbuf.available_read(state.farend_buf)
    n_samp_sndcard = state.ms_in_sndcard_buf * D.SAMP_MS_NB * mult
    delay_new = n_samp_sndcard - n_samp_far
    stuff = delay_new > (D.FAR_BUF_LEN - D.FRAME_LEN * mult)
    n_samp_add = jnp.maximum((n_samp_sndcard >> 1) - n_samp_far,
                             I32(D.FRAME_LEN))
    n_samp_add = jnp.minimum(n_samp_add, I32(10 * D.FRAME_LEN))
    farend_buf = rbuf.move_read_ptr(
        state.farend_buf, jnp.where(stuff, -n_samp_add, I32(0)))
    delay_change = jnp.where(stuff, I32(1), state.delay_change)
    return state._replace(farend_buf=farend_buf, delay_change=delay_change)


def buffer_farend(state: AecmState, farend, mult: int = 1) -> AecmState:
    """WebRtcAecm_BufferFarend (echo_control_mobile.cc:215-234).

    farend: (80,) or (160,) int32 samples (static length).
    """
    comped = _delay_comp(state, mult)
    # _delay_comp only moves the read pointer and the delay_change flag;
    # select just those (a whole-state select would copy far_history etc.).
    enabled = state.ec_startup == 0
    state = state._replace(
        farend_buf=jax.tree_util.tree_map(
            lambda a, b: jnp.where(enabled, a, b),
            comped.farend_buf, state.farend_buf),
        delay_change=jnp.where(enabled, comped.delay_change,
                               state.delay_change))
    return state._replace(farend_buf=rbuf.write(state.farend_buf, farend))


def _est_buf_delay(state: AecmState, mult: int) -> AecmState:
    """WebRtcAecm_EstBufDelay (echo_control_mobile.cc:534-573)."""
    n_samp_far = rbuf.available_read(state.farend_buf)
    n_samp_sndcard = state.ms_in_sndcard_buf * D.SAMP_MS_NB * mult
    delay_new = n_samp_sndcard - n_samp_far

    shortfall = delay_new < D.FRAME_LEN
    farend_buf = rbuf.move_read_ptr(
        state.farend_buf, jnp.where(shortfall, I32(D.FRAME_LEN), I32(0)))
    delay_new = jnp.where(shortfall, delay_new + D.FRAME_LEN, delay_new)

    filt_delay = jnp.maximum(
        I32(0), spl.div_trunc(8 * state.filt_delay + 2 * delay_new, I32(10)))

    diff = filt_delay - state.known_delay
    inc_hi = jnp.where(state.last_delay_diff < 96, I32(0),
                       state.time_for_delay_change + 1)
    inc_lo = jnp.where(state.last_delay_diff > 224, I32(0),
                       state.time_for_delay_change + 1)
    time_for_delay_change = jnp.where(
        diff > 224, inc_hi,
        jnp.where((diff < 96) & (state.known_delay > 0), inc_lo, I32(0)))

    known_delay = jnp.where(time_for_delay_change > 25,
                            jnp.maximum(filt_delay - 160, I32(0)),
                            state.known_delay)
    return state._replace(farend_buf=farend_buf, filt_delay=filt_delay,
                          time_for_delay_change=time_for_delay_change,
                          known_delay=known_delay, last_delay_diff=diff)


def _startup_machine(state, n_blocks_10ms: int, mult: int):
    """The ECstartup governance (echo_control_mobile.cc:285-355): wait for
    the reported sound-card buffer to stabilize, size the jitter buffer,
    align the read pointer, and enable cancellation.

    Operates only on the control fields (works on any state container with
    them — `process`'s AecmState and the fused engine's CtrlState share
    this single implementation).  Elementwise, so it runs per-stream
    batched as-is."""
    filled = (rbuf.available_read(state.farend_buf)
              // D.FRAME_LEN).astype(I32)

    def check_size(state):
        ctr = state.check_buf_size_ctr + 1
        first_val = jnp.where(state.counter == 0, state.ms_in_sndcard_buf,
                              state.first_val)
        acc = jnp.where(state.counter == 0, I32(0), state.sum)
        thresh = jnp.maximum(
            F32(0.2) * state.ms_in_sndcard_buf.astype(F32),
            F32(D.SAMP_MS_NB))
        stable = (jnp.abs(first_val - state.ms_in_sndcard_buf
                          ).astype(F32) < thresh)
        acc = jnp.where(stable, acc + state.ms_in_sndcard_buf, acc)
        counter = jnp.where(stable, state.counter + 1, I32(0))

        # enough stable frames -> size from the average
        done_avg = counter * n_blocks_10ms >= 6
        size_avg = jnp.minimum(
            spl.div_trunc(3 * acc * mult, counter * 40),
            I32(D.BUF_SIZE_FRAMES))
        # hard timeout (~0.5 s) -> size from the instantaneous value
        done_timeout = ctr * n_blocks_10ms > 50
        size_timeout = jnp.minimum(
            spl.div_trunc(3 * state.ms_in_sndcard_buf * mult, I32(40)),
            I32(D.BUF_SIZE_FRAMES))

        buf_size_start = jnp.where(
            done_timeout, size_timeout,
            jnp.where(done_avg, size_avg, state.buf_size_start))
        check_buff_size = jnp.where(done_avg | done_timeout, I32(0),
                                    I32(1))
        return state._replace(
            check_buf_size_ctr=ctr, first_val=first_val, sum=acc,
            counter=counter, buf_size_start=buf_size_start,
            check_buff_size=check_buff_size)

    checked = check_size(state)
    checking = state.check_buff_size != 0
    state = state._replace(**{
        f: jnp.where(checking, getattr(checked, f), getattr(state, f))
        for f in ("check_buf_size_ctr", "first_val", "sum", "counter",
                  "buf_size_start", "check_buff_size")})

    # buffer sizing settled -> align and enable
    settled = state.check_buff_size == 0
    enable_eq = settled & (filled == state.buf_size_start)
    enable_gt = settled & (filled > state.buf_size_start)
    avail = rbuf.available_read(state.farend_buf)
    farend_buf = rbuf.move_read_ptr(
        state.farend_buf,
        jnp.where(enable_gt,
                  avail - state.buf_size_start * D.FRAME_LEN, I32(0)))
    ec_startup = jnp.where(enable_eq | enable_gt, I32(0),
                           state.ec_startup)
    return state._replace(farend_buf=farend_buf, ec_startup=ec_startup)


def process(state: AecmState, nearend_noisy, nearend_clean, out_len: int,
            ms_in_sndcard_buf, sample_rate: int,
            opts: core_mod.Options = core_mod.DEFAULT_OPTIONS):
    """WebRtcAecm_Process (echo_control_mobile.cc:236-408).

    Args:
      nearend_noisy: (out_len,) int32 samples; out_len in {80, 160} (static).
      nearend_clean: optional (out_len,) int32 or None (static presence).
      ms_in_sndcard_buf: int32 scalar, clamped in-graph to [0, 500] + 10.
      sample_rate: static 8000/16000.
      opts: static core Options (abs_approx/robust_validation/debug).
    Returns (state, out (out_len,), warning int32); with opts.debug also a
    debug-taps dict of shape (n_frames, 2 blocks, ...) per entry (taps
    reflect the enabled branch even while startup passthrough is active).
    """
    mult = sample_rate // 8000
    n_frames = out_len // D.FRAME_LEN
    n_blocks_10ms = n_frames // mult
    has_clean = nearend_clean is not None

    ms = jnp.asarray(ms_in_sndcard_buf, I32)
    warn = jnp.where((ms < 0) | (ms > 500),
                     I32(D.AECM_BAD_PARAMETER_WARNING), I32(0))
    ms = jnp.clip(ms, 0, 500) + 10
    state = state._replace(ms_in_sndcard_buf=ms)

    # ---------------- startup branch ----------------
    def startup(state: AecmState):
        out = nearend_clean if has_clean else nearend_noisy
        state = _startup_machine(state, n_blocks_10ms, mult)
        return state, jnp.asarray(out, I32)

    # ---------------- enabled branch ----------------
    def enabled(state: AecmState, run_mask):
        # Scanned (not unrolled) over the 1-2 frames of the call so the
        # heavy frame body is traced and compiled exactly once.
        #
        # run_mask (= not in startup) gates every state mutation INSIDE the
        # branch, so the caller uses this branch's state verbatim — no
        # whole-state startup/enabled select at the end.  Most of the gating
        # is free: it folds into `where` masks the dataflow already has
        # (block `active`, `have_data`, `est_on`).
        est_idx = 0 if sample_rate == 8000 else 1
        noisy_frames = jnp.reshape(jnp.asarray(nearend_noisy, I32),
                                   (n_frames, D.FRAME_LEN))
        clean_frames = (jnp.reshape(jnp.asarray(nearend_clean, I32),
                                    (n_frames, D.FRAME_LEN))
                        if has_clean else noisy_frames)
        frame_ids = jnp.arange(n_frames, dtype=I32)

        def body(state: AecmState, xs):
            i, noisy_f, clean_f = xs
            filled = (rbuf.available_read(state.farend_buf)
                      // D.FRAME_LEN).astype(I32)
            have_data = (filled > 0) & run_mask
            frame, read_buf = rbuf.read(state.farend_buf, D.FRAME_LEN)
            # rbuf.read only moves pointers; data passes through untouched.
            farend_buf = state.farend_buf._replace(
                read_pos=jnp.where(have_data, read_buf.read_pos,
                                   state.farend_buf.read_pos),
                rw_wrap=jnp.where(have_data, read_buf.rw_wrap,
                                  state.farend_buf.rw_wrap))
            row_sel = (jnp.arange(2, dtype=I32) == i)[:, None]
            old_i = jnp.sum(jnp.where(row_sel, state.farend_old, 0), axis=0)
            farend = jnp.where(have_data, frame, old_i)
            farend_old = jnp.where(row_sel & run_mask, farend[None, :],
                                   state.farend_old)
            state = state._replace(farend_buf=farend_buf,
                                   farend_old=farend_old)

            # _est_buf_delay touches only the jitter-ring pointers and the
            # delay-governance scalars; select just those fields.
            est = _est_buf_delay(state, mult)
            est_on = (i == est_idx) & run_mask
            state = state._replace(
                farend_buf=state.farend_buf._replace(
                    read_pos=jnp.where(est_on, est.farend_buf.read_pos,
                                       state.farend_buf.read_pos),
                    rw_wrap=jnp.where(est_on, est.farend_buf.rw_wrap,
                                      state.farend_buf.rw_wrap)),
                **{f: jnp.where(est_on, getattr(est, f), getattr(state, f))
                   for f in ("filt_delay", "time_for_delay_change",
                             "known_delay", "last_delay_diff")})

            # NOTE: the reference extraction never forwards the control-layer
            # knownDelay into the core (the pre-refactor call is commented
            # out, echo_control_mobile.cc:390-391); the core's knownDelay
            # stays 0 and alignment is done by the binary delay estimator.
            res = core_mod.process_frame(
                state.core, farend, noisy_f,
                clean_f if has_clean else None, mult=mult, opts=opts,
                run_mask=run_mask)
            if opts.debug:
                core, out_frame, taps = res
                return state._replace(core=core), (out_frame, taps)
            core, out_frame = res
            return state._replace(core=core), out_frame

        state, ys = jax.lax.scan(
            body, state, (frame_ids, noisy_frames, clean_frames),
            unroll=n_frames)
        if opts.debug:
            outs, taps = ys
            return state, jnp.reshape(outs, (out_len,)), taps
        return state, jnp.reshape(ys, (out_len,))

    in_startup = state.ec_startup != 0
    started, started_out = startup(state)
    res = enabled(state, ~in_startup)
    ran, ran_out = res[0], res[1]
    out = jnp.where(in_startup, started_out, ran_out)
    # The enabled branch is self-gated by run_mask, so `ran` is already
    # correct for both regimes except the fields ONLY startup() writes:
    # the buffer-sizing scalars, ec_startup, and the jitter-ring pointers
    # (ring data is untouched by both branches within process()).
    state = ran._replace(
        farend_buf=ran.farend_buf._replace(
            read_pos=jnp.where(in_startup, started.farend_buf.read_pos,
                               ran.farend_buf.read_pos),
            rw_wrap=jnp.where(in_startup, started.farend_buf.rw_wrap,
                              ran.farend_buf.rw_wrap)),
        **{f: jnp.where(in_startup, getattr(started, f), getattr(ran, f))
           for f in ("ec_startup", "check_buff_size", "check_buf_size_ctr",
                     "counter", "sum", "first_val", "buf_size_start")})
    if opts.debug:
        return state, out, warn, res[2]
    return state, out, warn
