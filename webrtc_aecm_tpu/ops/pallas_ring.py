"""Pallas TPU kernels for batched ring-buffer data movement.

The jitter ring is (B, 4000) int32 with per-stream read/write positions.
XLA lowers vmapped dynamic-slice gathers and roll+mask writes at ~3% of
HBM bandwidth (~1.3 ms per op at B=1024 — the single largest cost in the
serving step).  These kernels stream (S, C) tiles through VMEM and handle
the per-stream offsets with `pltpu.roll` (dynamic circular lane shift),
running at near memory bandwidth.

Used via `custom_vmap` batched rules in ops.ring_buffer: the unbatched
(single-stream) path keeps the lax implementation; the batched TPU path
dispatches here (reference semantics identical; see tests/test_ring_buffer
and the golden e2e suite).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32

STREAM_TILE = 8  # sublane tile: streams per program


def _padded_width(C: int, n: int) -> int:
    """Lane width for the doubled row: dynamic_rotate requires a multiple
    of 128 lanes; C+n columns suffice (pos <= C, so pos+n <= C+n: reads and
    writes in doubled coordinates never wrap)."""
    return ((C + n + 127) // 128) * 128


def _gather_kernel(n: int, C: int, pos_ref, data_ref, out_ref, scratch):
    # NOTE: an unaligned lane concat feeding tpu.dynamic_rotate miscompiles
    # (verified vs interpret mode); assembling the doubled row through a
    # VMEM scratch ref sidesteps it.  Compute is int32 in VMEM regardless
    # of the (possibly int16) storage dtype — HBM traffic is what matters.
    i = pl.program_id(0)
    scratch[:, :C] = data_ref[:].astype(I32)
    scratch[:, C:C + n] = data_ref[:, :n].astype(I32)
    P = _padded_width(C, n)
    for s in range(STREAM_TILE):
        p = pos_ref[i * STREAM_TILE + s]
        # Roll left by p so elements [p, p+n) land at lanes [0, n).
        # NEGATIVE dynamic shifts miscompile at non-power-of-two widths
        # (tpu.dynamic_rotate lands off by W - 2^k; verified empirically),
        # so express the left roll as a positive right roll by (P - p) % P.
        shift = jax.lax.rem(P - p, P)
        rolled = pltpu.roll(scratch[s, :].reshape(1, P), shift, axis=1)
        out_ref[s, :] = rolled[0, :n].astype(out_ref.dtype)


def ring_gather_tpu(data, pos, n: int):
    """data: (B, C) int32, pos: (B,) int32 in [0, C] -> (B, n) wrapped read."""
    B, C = data.shape
    assert B % STREAM_TILE == 0
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // STREAM_TILE,),
        in_specs=[
            pl.BlockSpec((STREAM_TILE, C), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((STREAM_TILE, n), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((STREAM_TILE, _padded_width(C, n)), jnp.int32)],
    )
    return pl.pallas_call(
        functools.partial(_gather_kernel, n, C),
        out_shape=jax.ShapeDtypeStruct((B, n), data.dtype),
        grid_spec=grid_spec,
    )(pos.astype(I32), data)


def _fine_window(n: int) -> int:
    """Aligned-window width for the narrow gather: covers n lanes at any
    intra-128 offset (n + 127 lanes), rounded up to a 128 multiple."""
    return ((n + 127 + 127) // 128) * 128


def _pass_width(C: int, n: int) -> int:
    """Scratch lane width for the fused pass: doubled region [C, C+n)
    at its natural (unaligned) static offset, plus room for an aligned
    _fine_window() dynamic slice starting as high as aligned(C)."""
    W = _fine_window(n)
    return max(((C + n + 127) // 128) * 128, (C // 128) * 128 + W)


def _pass_kernel(n: int, C: int, T: int, wpos_ref, nw_ref, rpos_ref,
                 data_ref, vals_ref, out_ref, gath_ref, scratch):
    """Fused wrapped write + post-write wrapped gather in ONE pass.

    Write positions are uniform across streams in the serving steady
    state (every stream writes the same (count, position) per chunk; they
    only diverge when some stream's ring clamps a partial write), so the
    write is ONE block-level aligned read-modify-write in doubled
    coordinates — vectorized over the whole stream tile, ~free — with a
    per-stream @pl.when fixup that rebuilds a divergent stream's row from
    the still-intact input block (roll + mask, as _write_kernel).  The
    gather offsets genuinely differ per stream (per-stream delays), so
    the gather is per-stream, but on a narrow 128-aligned dynamic window
    (W = _fine_window lanes) instead of a full-ring-width roll.  Replaces
    the round-2 lax.cond(XLA-uniform-write) + separate gather kernel
    (0.155 ms/chunk in context at B=1024; this kernel ~0.06)."""
    i = pl.program_id(0)
    P = _pass_width(C, n)
    W = _fine_window(n)
    laneW = jax.lax.broadcasted_iota(I32, (1, W), 1)
    lane2 = jax.lax.broadcasted_iota(I32, (1, P), 1)
    lanen = laneW[:, :n]
    scratch[:, :C] = data_ref[:].astype(I32)
    scratch[:, C:C + n] = data_ref[:, :n].astype(I32)
    if P > C + n:
        scratch[:, C + n:] = jnp.zeros((T, P - C - n), I32)

    # --- uniform block write at stream 0's (position, count) ---
    p0 = wpos_ref[0]
    w0 = nw_ref[0]
    p1a = pl.multiple_of((p0 // 128) * 128, 128)
    d1 = p0 - p1a
    vblk = jnp.concatenate(
        [vals_ref[:].astype(I32), jnp.zeros((T, W - n), I32)], axis=1)
    placed = pltpu.roll(vblk, d1, axis=1)
    win = scratch[:, pl.ds(p1a, W)]
    scratch[:, pl.ds(p1a, W)] = jnp.where(
        (laneW >= d1) & (laneW < d1 + w0), placed, win)
    # fold the wrapped tail onto the head, and mirror the (possibly
    # head-written) region back into [C, C+n) for the gather
    spill0 = p0 + w0 - C
    head = jnp.where(lanen < spill0, scratch[:, C:C + n], scratch[:, :n])
    scratch[:, :n] = head
    scratch[:, C:C + n] = head

    for s in range(T):
        g = i * T + s
        p = wpos_ref[g]
        w = nw_ref[g]

        @pl.when((p != p0) | (w != w0))
        def _divergent_fixup():
            # rebuild this stream's row from the untouched input block
            vrow = jnp.concatenate(
                [vals_ref[s, :].reshape(1, n).astype(I32),
                 jnp.zeros((1, P - n), I32)], axis=1)
            placed2 = pltpu.roll(vrow, p, axis=1)
            mask2 = (lane2 >= p) & (lane2 < p + w)
            row = data_ref[s, :].reshape(1, C).astype(I32)
            new_row = jnp.where(mask2[:, :C], placed2[:, :C], row)
            head_s = jnp.where(mask2[:, C:C + n], placed2[:, C:C + n],
                               new_row[:, :n])
            scratch[s, :n] = head_s[0]
            scratch[s, n:C] = new_row[0, n:]
            scratch[s, C:C + n] = head_s[0]

    out_ref[:, :] = scratch[:, :C].astype(out_ref.dtype)
    for s in range(T):
        r = rpos_ref[i * T + s]
        r1a = pl.multiple_of((r // 128) * 128, 128)
        d = r - r1a
        gwin = scratch[s, pl.ds(r1a, W)].reshape(1, W)
        rolled = pltpu.roll(gwin, jax.lax.rem(W - d, W), axis=1)
        gath_ref[s, :] = rolled[0, :n].astype(gath_ref.dtype)


def ring_pass_tpu(data, wpos, values, n_write, rpos, n_read: int):
    """Write values[:n_write] at wpos into each (B, C) row, then gather
    n_read lanes at rpos from the POST-WRITE row — one fused kernel, data
    updated in place (input_output_aliases).  Requires n_read == values
    width (the serving step's case).  Returns (new_data, gathered)."""
    import os
    B, C = data.shape
    n = values.shape[-1]
    assert n == n_read, (n, n_read)
    T = int(os.environ.get("AECM_RING_PASS_TILE", "16"))
    if B % T != 0:
        T = STREAM_TILE
    assert B % T == 0
    alias = not os.environ.get("AECM_RING_PASS_NOALIAS")
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B // T,),
        in_specs=[
            pl.BlockSpec((T, C), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, n), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((T, C), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, n), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((T, _pass_width(C, n)), jnp.int32)],
    )
    return pl.pallas_call(
        functools.partial(_pass_kernel, n, C, T),
        out_shape=[jax.ShapeDtypeStruct((B, C), data.dtype),
                   jax.ShapeDtypeStruct((B, n), data.dtype)],
        grid_spec=grid_spec,
        **(dict(input_output_aliases={3: 0}) if alias else {}),
    )(wpos.astype(I32), n_write.astype(I32), rpos.astype(I32), data,
      values.astype(I32))


def _multi_pass_kernel(n: int, C: int, T: int, cps: int, wpos_ref, nw_ref,
                       rpos_ref, data_ref, vals_ref, out_ref, gath_ref,
                       scratch):
    """cps consecutive (write chunk c, gather chunk c) ring passes in ONE
    kernel: the ring streams through VMEM once instead of cps times.

    Ordering matches the per-chunk serving sequence exactly: chunk c's
    gather sees writes 0..c and nothing later.  The uniform fast path and
    the divergent @pl.when fixup follow _pass_kernel, with one change
    forced by multi-chunk: a divergent stream's row can no longer be
    rebuilt from data_ref alone (earlier chunks' writes are in scratch,
    and the uniform write of the CURRENT chunk has already corrupted the
    row), so the fixup REPLAYS all writes 0..c for that stream from the
    pristine data_ref row — c+1 roll+mask passes, paid only by clamped
    streams in the rare divergent case.

    Scalar refs are (cps*B,) flattened [c*B + stream]; vals is
    (B, cps*n) with chunk c's samples in columns [c*n, (c+1)*n); gathered
    likewise."""
    i = pl.program_id(0)
    P = _pass_width(C, n)
    W = _fine_window(n)
    Btot = wpos_ref.shape[0] // cps
    laneW = jax.lax.broadcasted_iota(I32, (1, W), 1)
    lane2 = jax.lax.broadcasted_iota(I32, (1, P), 1)
    lanen = laneW[:, :n]
    scratch[:, :C] = data_ref[:].astype(I32)
    scratch[:, C:C + n] = data_ref[:, :n].astype(I32)
    if P > C + n:
        scratch[:, C + n:] = jnp.zeros((T, P - C - n), I32)

    for c in range(cps):
        # --- uniform block write at stream 0's (position, count) ---
        p0 = wpos_ref[c * Btot]
        w0 = nw_ref[c * Btot]
        p1a = pl.multiple_of((p0 // 128) * 128, 128)
        d1 = p0 - p1a
        vblk = jnp.concatenate(
            [vals_ref[:, c * n:(c + 1) * n].astype(I32),
             jnp.zeros((T, W - n), I32)], axis=1)
        placed = pltpu.roll(vblk, d1, axis=1)
        win = scratch[:, pl.ds(p1a, W)]
        scratch[:, pl.ds(p1a, W)] = jnp.where(
            (laneW >= d1) & (laneW < d1 + w0), placed, win)
        spill0 = p0 + w0 - C
        head = jnp.where(lanen < spill0, scratch[:, C:C + n],
                         scratch[:, :n])
        scratch[:, :n] = head
        scratch[:, C:C + n] = head

        for s in range(T):
            g = i * T + s
            p = wpos_ref[c * Btot + g]
            w = nw_ref[c * Btot + g]

            @pl.when((p != p0) | (w != w0))
            def _divergent_fixup():
                # replay writes 0..c for this stream from the pristine row
                row = data_ref[s, :].reshape(1, C).astype(I32)
                for j in range(c + 1):
                    pj = wpos_ref[j * Btot + g]
                    wj = nw_ref[j * Btot + g]
                    vrow = jnp.concatenate(
                        [vals_ref[s, j * n:(j + 1) * n
                                  ].reshape(1, n).astype(I32),
                         jnp.zeros((1, P - n), I32)], axis=1)
                    placed2 = pltpu.roll(vrow, pj, axis=1)
                    mask2 = (lane2 >= pj) & (lane2 < pj + wj)
                    new_row = jnp.where(mask2[:, :C], placed2[:, :C], row)
                    head_s = jnp.where(mask2[:, C:C + n],
                                       placed2[:, C:C + n],
                                       new_row[:, :n])
                    row = jnp.concatenate([head_s, new_row[:, n:]], axis=1)
                scratch[s, :C] = row[0]
                scratch[s, C:C + n] = row[0, :n]

        # --- chunk c gathers (see writes 0..c).  The store is a FULL
        # gstride-wide row at a 128-aligned offset: storing an n-wide
        # slice at the unaligned offset c*n miscompiles (wrong lanes for
        # every chunk c >= 1 — measured on v5e), the same family as the
        # dynamic_rotate alignment traps above.  Lanes [n, gstride) carry
        # rolled garbage; the wrapper slices them off outside. ---
        gstride = (n + 127) // 128 * 128
        for s in range(T):
            r = rpos_ref[c * Btot + i * T + s]
            r1a = pl.multiple_of((r // 128) * 128, 128)
            d = r - r1a
            gwin = scratch[s, pl.ds(r1a, W)].reshape(1, W)
            rolled = pltpu.roll(gwin, jax.lax.rem(W - d, W), axis=1)
            gath_ref[s, c * gstride:(c + 1) * gstride] = rolled[
                0, :gstride].astype(gath_ref.dtype)

    out_ref[:, :] = scratch[:, :C].astype(out_ref.dtype)


def ring_multi_pass_tpu(data, wpos, values, n_write, rpos, n_read: int):
    """cps stacked ring passes (write then gather per chunk) in one fused
    kernel — see _multi_pass_kernel.  wpos/n_write/rpos: (cps, B); values:
    (B, cps*n); returns (new_data, gathered (B, cps*n)).  cps == 1 is
    exactly ring_pass_tpu's semantics."""
    import os
    B, C = data.shape
    cps = wpos.shape[0]
    n = values.shape[-1] // cps
    assert n == n_read, (n, n_read)
    if cps == 1:
        return ring_pass_tpu(data, wpos[0], values, n_write[0], rpos[0],
                             n_read)
    gstride = (n + 127) // 128 * 128   # aligned per-chunk gather stride
    T = int(os.environ.get("AECM_RING_PASS_TILE", "16"))
    if B % T != 0:
        T = STREAM_TILE
    assert B % T == 0
    alias = not os.environ.get("AECM_RING_PASS_NOALIAS")
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B // T,),
        in_specs=[
            pl.BlockSpec((T, C), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, cps * n), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((T, C), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, cps * gstride), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((T, _pass_width(C, n)), jnp.int32)],
    )
    new_data, gath_pad = pl.pallas_call(
        functools.partial(_multi_pass_kernel, n, C, T, cps),
        out_shape=[jax.ShapeDtypeStruct((B, C), data.dtype),
                   jax.ShapeDtypeStruct((B, cps * gstride), data.dtype)],
        grid_spec=grid_spec,
        **(dict(input_output_aliases={3: 0}) if alias else {}),
    )(wpos.reshape(-1).astype(I32), n_write.reshape(-1).astype(I32),
      rpos.reshape(-1).astype(I32), data, values.astype(I32))
    gathered = gath_pad.reshape(B, cps, gstride)[:, :, :n].reshape(
        B, cps * n)
    return new_data, gathered


def _write_kernel(n: int, C: int, pos_ref, nw_ref, data_ref, vals_ref,
                  out_ref, scratch):
    i = pl.program_id(0)
    P = _padded_width(C, n)
    lane2 = jax.lax.broadcasted_iota(I32, (1, P), 1)
    scratch[:, :n] = vals_ref[:].astype(I32)
    scratch[:, n:] = jnp.zeros((STREAM_TILE, P - n), I32)
    for s in range(STREAM_TILE):
        g = i * STREAM_TILE + s
        p = pos_ref[g]
        w = nw_ref[g]
        # place vals at [p, p+w) in doubled coordinates (no wrap: p+n <= P)
        placed2 = pltpu.roll(scratch[s, :].reshape(1, P), p, axis=1)
        mask2 = (lane2 >= p) & (lane2 < p + w)
        row = data_ref[s, :].reshape(1, C).astype(I32)
        new_row = jnp.where(mask2[:, :C], placed2[:, :C], row)
        # fold the wrapped region [C, C+n) back onto the head [0, n)
        head = jnp.where(mask2[:, C:C + n], placed2[:, C:C + n],
                         new_row[:, :n])
        out_ref[s, :n] = head[0].astype(out_ref.dtype)
        out_ref[s, n:] = new_row[0, n:].astype(out_ref.dtype)


def ring_write_tpu(data, pos, values, n_write):
    """Wrapped masked write of values[:n_write] at pos into (B, C) rows."""
    B, C = data.shape
    n = values.shape[-1]
    assert B % STREAM_TILE == 0
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B // STREAM_TILE,),
        in_specs=[
            pl.BlockSpec((STREAM_TILE, C), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((STREAM_TILE, n), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((STREAM_TILE, C), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((STREAM_TILE, _padded_width(C, n)), jnp.int32)],
    )
    return pl.pallas_call(
        functools.partial(_write_kernel, n, C),
        out_shape=jax.ShapeDtypeStruct((B, C), data.dtype),
        grid_spec=grid_spec,
    )(pos.astype(I32), n_write.astype(I32), data,
      values.astype(I32))
