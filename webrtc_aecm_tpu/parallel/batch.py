"""Batched AECM: N independent streams as one pytree with a stream axis.

The reference serves one stream per `AecMobile` instance
(echo_control_mobile.cc:42-79); here N instances are one `AecmState` whose
every leaf carries a leading `(n_streams,)` axis.  All three public
operations (`buffer_farend`, `process`, `set_config`) are `vmap`s of the
single-stream functional layer — bit-exactness per stream is preserved by
construction, and the batched step is a single XLA graph that tiles the
65-bin frequency axis and the stream axis onto VPU lanes.

`run_streams` is the offline/throughput path: the whole signal is processed
by one `lax.scan` over 10 ms chunks (time is inherently sequential per
stream, SURVEY.md §7 'Hard parts' #3), keeping the entire call on-device
with zero host round trips per frame.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .. import control
from .. import defines as D

I32 = jnp.int32


def create_batch(n_streams: int, sample_rate: int = 8000,
                 cng_mode: int = 1, echo_mode: int = 3) -> control.AecmState:
    """N freshly Create+Init'ed instances as one batched state pytree.

    All streams start identical (the reference's Create+Init is
    deterministic, aecm_core.cc:179-473), so the batch is a broadcast —
    no N-fold init cost.
    """
    one = control.set_config(control.create(sample_rate), cng_mode, echo_mode)
    return jax.tree_util.tree_map(
        lambda leaf: jnp.broadcast_to(
            leaf, (n_streams,) + jnp.shape(leaf)), one)


def set_config_batch(state: control.AecmState, cng_mode,
                     echo_mode) -> control.AecmState:
    """Per-stream WebRtcAecm_set_config; cng_mode/echo_mode may be scalars
    (applied to all streams) or (n_streams,) arrays."""
    n = jax.tree_util.tree_leaves(state)[0].shape[0]
    cng = jnp.broadcast_to(jnp.asarray(cng_mode, I32), (n,))
    mode = jnp.broadcast_to(jnp.asarray(echo_mode, I32), (n,))
    return jax.vmap(control.set_config)(state, cng, mode)


def buffer_farend_batch(state: control.AecmState, farend,
                        mult: int = 1) -> control.AecmState:
    """vmap of WebRtcAecm_BufferFarend; farend: (n_streams, 80|160)."""
    return jax.vmap(lambda s, f: control.buffer_farend(s, f, mult))(
        state, jnp.asarray(farend, I32))


def process_batch(state: control.AecmState, nearend_noisy, nearend_clean,
                  out_len: int, ms_in_sndcard_buf, sample_rate: int):
    """vmap of WebRtcAecm_Process.

    nearend_noisy/clean: (n_streams, out_len); ms_in_sndcard_buf: scalar or
    (n_streams,).  Returns (state, out (n_streams, out_len), warn (n_streams,)).
    """
    n = jax.tree_util.tree_leaves(state)[0].shape[0]
    ms = jnp.broadcast_to(jnp.asarray(ms_in_sndcard_buf, I32), (n,))
    noisy = jnp.asarray(nearend_noisy, I32)
    if nearend_clean is None:
        fn = jax.vmap(lambda s, d, m: control.process(
            s, d, None, out_len, m, sample_rate))
        return fn(state, noisy, ms)
    fn = jax.vmap(lambda s, d, c, m: control.process(
        s, d, c, out_len, m, sample_rate))
    return fn(state, noisy, jnp.asarray(nearend_clean, I32), ms)


def make_chunk_step(sample_rate: int, has_clean: bool = False):
    """One 10 ms serving step for a batch: BufferFarend then Process.

    This is the flagship real-time entry point (the per-chunk loop of the
    reference demo, main.cc:124-141, batched): jit it once, call it every
    10 ms with (state, far, near[, clean], ms).
    """
    mult = sample_rate // 8000
    out_len = min(160, sample_rate // 100)

    if has_clean:
        def step(state, far, noisy, clean, ms):
            state = buffer_farend_batch(state, far, mult)
            return process_batch(state, noisy, clean, out_len, ms,
                                 sample_rate)
    else:
        def step(state, far, noisy, ms):
            state = buffer_farend_batch(state, far, mult)
            return process_batch(state, noisy, None, out_len, ms,
                                 sample_rate)
    return step


def run_streams(state: control.AecmState, far, near, sample_rate: int,
                ms_in_sndcard_buf=40, clean=None
                ) -> Tuple[control.AecmState, jnp.ndarray]:
    """Process whole signals for a batch of streams in one jittable call.

    Args:
      far/near: (n_streams, n_samples) int PCM; n_samples must be a multiple
        of the 10 ms chunk (80 @ 8 kHz, 160 @ 16 kHz).
      ms_in_sndcard_buf: scalar, (n_streams,), (n_chunks,), or
        (n_chunks, n_streams) reported sound-card delay.
      clean: optional (n_streams, n_samples) clean nearend.
    Returns (final_state, out (n_streams, n_samples)).
    """
    chunk = min(160, sample_rate // 100)
    far = jnp.asarray(far, I32)
    near = jnp.asarray(near, I32)
    n_streams, n_samples = near.shape
    n_chunks = n_samples // chunk

    def to_time_major(x):  # (B, T) -> (n_chunks, B, chunk)
        return x[:, :n_chunks * chunk].reshape(
            n_streams, n_chunks, chunk).transpose(1, 0, 2)

    far_t = to_time_major(far)
    near_t = to_time_major(near)
    ms = jnp.asarray(ms_in_sndcard_buf, I32)
    if ms.ndim == 0 or (ms.ndim == 1 and ms.shape[0] == n_streams):
        ms_t = jnp.broadcast_to(ms, (n_chunks, n_streams))
    elif ms.ndim == 1:  # (n_chunks,)
        ms_t = jnp.broadcast_to(ms[:, None], (n_chunks, n_streams))
    else:
        ms_t = ms

    has_clean = clean is not None
    step = make_chunk_step(sample_rate, has_clean)

    if has_clean:
        clean_t = to_time_major(jnp.asarray(clean, I32))

        def body(state, xs):
            f, d, c, m = xs
            state, out, _ = step(state, f, d, c, m)
            return state, out

        state, outs = jax.lax.scan(body, state,
                                   (far_t, near_t, clean_t, ms_t))
    else:
        def body(state, xs):
            f, d, m = xs
            state, out, _ = step(state, f, d, m)
            return state, out

        state, outs = jax.lax.scan(body, state, (far_t, near_t, ms_t))

    out = outs.transpose(1, 0, 2).reshape(n_streams, n_chunks * chunk)
    return state, out
