"""Functional fixed-shape ring buffer.

TPU-native rebuild of the reference byte ring buffer
(reference: aecm/ring_buffer.{h,c}).  The C version is a mutable struct of
(data, read_pos, write_pos, rw_wrap) with memcpy-based wrap handling; here
it is an immutable pytree updated with modular gathers/scatters so the whole
thing lives inside a jitted step and batches freely under `vmap`.

Semantics replicated exactly, including:
  * partial writes clamped to free space (ring_buffer.c:153-155),
  * reads clamped to available data (ring_buffer.c:31-33),
  * negative `move_read_ptr` = buffer stuffing, clamped to free space
    (ring_buffer.c:176-211) — used by the control layer for delay comp,
  * the SAME_WRAP/DIFF_WRAP tracking, including the C quirk that a
    read_pos/write_pos may come to rest exactly at `capacity` without
    wrapping (ring_buffer.c:196).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

I32 = jnp.int32

SAME_WRAP = 0
DIFF_WRAP = 1


def _use_pallas(axis_size: int, data) -> bool:
    """Batched ring data movement goes through the Pallas kernels on TPU;
    the lax path remains for CPU tests, odd batch sizes, or nested maps."""
    import os
    if os.environ.get("AECM_DISABLE_PALLAS"):
        return False
    from .pallas_ring import STREAM_TILE
    return (jax.default_backend() == "tpu" and data.ndim == 2
            and axis_size % STREAM_TILE == 0)


@jax.custom_batching.custom_vmap
def _contig_write(data, pos, values, n_write):
    """Write values[:n_write] at [pos, pos+n_write) mod C — scatter-free.

    TPU lowers vmapped scatters to serial per-index loops (measured ~10x
    slower than gathers).  Single-stream path: dynamic roll of the
    (static-width) value vector plus an elementwise select.  Batched path
    (custom_vmap rule below): Pallas tile kernel at memory bandwidth.
    """
    cap = data.shape[-1]
    count = values.shape[-1]
    padded = jnp.concatenate(
        [values.astype(data.dtype),
         jnp.zeros((cap - count,), data.dtype)], axis=-1)
    rolled = jnp.roll(padded, pos, axis=-1)
    offset = (jnp.arange(cap, dtype=I32) - pos) % cap
    return jnp.where(offset < n_write, rolled, data)


@_contig_write.def_vmap
def _contig_write_vmap(axis_size, in_batched, data, pos, values, n_write):
    def bc(x, batched):
        return x if batched else jnp.broadcast_to(
            x, (axis_size,) + jnp.shape(x))
    data = bc(data, in_batched[0])
    pos = bc(pos, in_batched[1])
    values = bc(values, in_batched[2])
    n_write = bc(n_write, in_batched[3])
    if _use_pallas(axis_size, data):
        from .pallas_ring import ring_write_tpu
        out = ring_write_tpu(data, pos, values, n_write).astype(data.dtype)
    else:
        cap = data.shape[-1]
        count = values.shape[-1]
        padded = jnp.concatenate(
            [values.astype(data.dtype),
             jnp.zeros(values.shape[:-1] + (cap - count,), data.dtype)],
            axis=-1)
        rolled = jax.vmap(lambda v, p: jnp.roll(v, p, axis=-1))(padded, pos)
        offset = (jnp.arange(cap, dtype=I32)[None, :] - pos[:, None]) % cap
        out = jnp.where(offset < n_write[:, None], rolled, data)
    return out, True


def _contig_read(data, pos, count: int):
    """Read `count` (static) values at [pos, pos+count) mod C."""
    return _contig_read_fn(count)(data, pos)


@functools.lru_cache(maxsize=None)
def _contig_read_fn(count: int):
    @jax.custom_batching.custom_vmap
    def read(data, pos):
        doubled = jnp.concatenate([data, data[..., :count]], axis=-1)
        return jax.lax.dynamic_slice_in_dim(doubled, pos, count, axis=-1)

    @read.def_vmap
    def _read_vmap(axis_size, in_batched, data, pos):
        if not in_batched[0]:
            data = jnp.broadcast_to(data, (axis_size,) + data.shape)
        if not in_batched[1]:
            pos = jnp.broadcast_to(pos, (axis_size,))
        if _use_pallas(axis_size, data):
            from .pallas_ring import ring_gather_tpu
            out = ring_gather_tpu(data, pos, count).astype(data.dtype)
        else:
            doubled = jnp.concatenate([data, data[..., :count]], axis=-1)
            out = jax.vmap(
                lambda d, p: jax.lax.dynamic_slice_in_dim(d, p, count,
                                                          axis=-1)
            )(doubled, pos)
        return out, True

    return read


class RingBuffer(NamedTuple):
    data: jnp.ndarray       # (capacity,) int32
    read_pos: jnp.ndarray   # int32 scalar
    write_pos: jnp.ndarray  # int32 scalar
    rw_wrap: jnp.ndarray    # int32 scalar, SAME_WRAP / DIFF_WRAP

    @property
    def capacity(self) -> int:
        return self.data.shape[-1]


def create(capacity: int, dtype=I32) -> RingBuffer:
    """WebRtc_CreateBuffer + WebRtc_InitBuffer (ring_buffer.c:53-85)."""
    return RingBuffer(
        data=jnp.zeros((capacity,), dtype=dtype),
        read_pos=I32(0),
        write_pos=I32(0),
        rw_wrap=I32(SAME_WRAP),
    )


def init(rb: RingBuffer) -> RingBuffer:
    return create(rb.capacity, rb.data.dtype)


def available_read(rb: RingBuffer):
    """WebRtc_available_read (ring_buffer.c:213-223)."""
    cap = rb.capacity
    same = rb.write_pos - rb.read_pos
    diff = cap - rb.read_pos + rb.write_pos
    return jnp.where(rb.rw_wrap == SAME_WRAP, same, diff)


def available_write(rb: RingBuffer):
    """WebRtc_available_write (ring_buffer.c:225-231)."""
    return rb.capacity - available_read(rb)


def write(rb: RingBuffer, values) -> RingBuffer:
    """WebRtc_WriteBuffer (ring_buffer.c:142-174); len(values) is static."""
    count = values.shape[-1]
    cap = rb.capacity
    free = available_write(rb)
    n_write = jnp.minimum(free, I32(count))
    margin = cap - rb.write_pos
    wrapped = n_write > margin
    data = _contig_write(rb.data, rb.write_pos, values, n_write)
    new_wp = jnp.where(wrapped, n_write - margin, rb.write_pos + n_write)
    new_wrap = jnp.where(wrapped, I32(DIFF_WRAP), rb.rw_wrap)
    return rb._replace(data=data, write_pos=new_wp, rw_wrap=new_wrap)


def move_read_ptr(rb: RingBuffer, element_count) -> RingBuffer:
    """WebRtc_MoveReadPtr (ring_buffer.c:176-211); count may be negative."""
    cap = rb.capacity
    free = available_write(rb)
    readable = available_read(rb)
    ec = jnp.minimum(jnp.asarray(element_count, dtype=I32), readable)
    ec = jnp.maximum(ec, -free)
    read_pos = rb.read_pos + ec
    over = read_pos > cap
    under = read_pos < 0
    read_pos = jnp.where(over, read_pos - cap, read_pos)
    read_pos = jnp.where(under, read_pos + cap, read_pos)
    rw_wrap = jnp.where(over, I32(SAME_WRAP), rb.rw_wrap)
    rw_wrap = jnp.where(under, I32(DIFF_WRAP), rw_wrap)
    return rb._replace(read_pos=read_pos, rw_wrap=rw_wrap)


def read(rb: RingBuffer, count: int):
    """WebRtc_ReadBuffer (ring_buffer.c:97-140); `count` is static.

    Returns (values, new_rb).  Elements beyond the actually-readable count
    are zeroed (the C API leaves them unspecified; AECM always checks
    availability first so this never differs in-flow).
    """
    readable = available_read(rb)
    n_read = jnp.minimum(readable, I32(count))
    mask = jnp.arange(count, dtype=I32) < n_read
    values = jnp.where(mask, _contig_read(rb.data, rb.read_pos, count),
                       0).astype(I32)
    return values, move_read_ptr(rb, n_read)
