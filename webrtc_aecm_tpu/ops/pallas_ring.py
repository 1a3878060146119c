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
