"""Golden tests: functional ring buffer vs the C reference, including
negative MoveReadPtr (buffer stuffing) and wrap-state tracking."""
import ctypes as ct

import numpy as np
import jax.numpy as jnp

from webrtc_aecm_tpu.ops import ring_buffer as rbuf
from .oracle import get_oracle


class RefRing:
    def __init__(self, o, capacity):
        self.o = o
        self.h = o.lib.WebRtc_CreateBuffer(capacity, 2)
        o.lib.WebRtc_InitBuffer(self.h)

    def write(self, vals):
        arr = np.ascontiguousarray(vals, np.int16)
        return self.o.lib.WebRtc_WriteBuffer(
            self.h, arr.ctypes.data_as(ct.c_void_p), len(arr))

    def read(self, n):
        out = np.zeros(n, np.int16)
        got = self.o.lib.WebRtc_ReadBuffer(
            self.h, None, out.ctypes.data_as(ct.c_void_p), n)
        return out, got

    def move(self, n):
        return self.o.lib.WebRtc_MoveReadPtr(self.h, n)

    def available_read(self):
        return self.o.lib.WebRtc_available_read(self.h)


def test_ring_buffer_random_ops_match_reference():
    import jax
    o = get_oracle()
    rng = np.random.default_rng(5)
    cap = 57
    sizes = (1, 7, 13, 29)  # few fixed sizes so jitted ops cache
    ref = RefRing(o, cap)
    ours = rbuf.create(cap)
    jwrite = jax.jit(rbuf.write)
    jread = jax.jit(rbuf.read, static_argnums=1)
    jmove = jax.jit(rbuf.move_read_ptr)
    for step in range(400):
        op = rng.integers(0, 3)
        if op == 0:
            n = sizes[rng.integers(0, len(sizes))]
            vals = rng.integers(-32768, 32768, n).astype(np.int16)
            ref.write(vals)
            ours = jwrite(ours, jnp.asarray(vals, jnp.int32))
        elif op == 1:
            n = sizes[rng.integers(0, len(sizes))]
            ref_out, ref_got = ref.read(n)
            vals, ours = jread(ours, n)
            np.testing.assert_array_equal(
                np.asarray(vals)[:ref_got], ref_out[:ref_got],
                err_msg=f"step {step}")
        else:
            n = int(rng.integers(-40, 40))
            ref.move(n)
            ours = jmove(ours, n)
        assert int(rbuf.available_read(ours)) == ref.available_read(), (
            f"step {step}")


def test_negative_move_read_ptr_exposes_zeros_then_old_data():
    """Stuffing: read pointer moves back over zero-initialized space."""
    ours = rbuf.create(16)
    ours = rbuf.write(ours, jnp.arange(4, dtype=jnp.int32) + 1)
    ours = rbuf.move_read_ptr(ours, -4)  # stuff 4 elements
    assert int(rbuf.available_read(ours)) == 8
    vals, ours = rbuf.read(ours, 8)
    np.testing.assert_array_equal(np.asarray(vals),
                                  np.array([0, 0, 0, 0, 1, 2, 3, 4]))


def test_write_clamped_to_free_space():
    ours = rbuf.create(8)
    ours = rbuf.write(ours, jnp.arange(6, dtype=jnp.int32))
    ours = rbuf.write(ours, jnp.arange(6, dtype=jnp.int32) + 10)
    assert int(rbuf.available_read(ours)) == 8
    vals, _ = rbuf.read(ours, 8)
    np.testing.assert_array_equal(
        np.asarray(vals), np.array([0, 1, 2, 3, 4, 5, 10, 11]))
