"""Golden tests: complex FFT both modes, all orders 3..10; real FFT pairs
for every order — the non-AECM reference FFT surface (complex_fft.c mode 0
:257-291/:400-438; generic orders up to kMaxFFTOrder=10, real_fft.h:18-20).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from webrtc_aecm_tpu.ops import fft
from .oracle import get_oracle


def _interleave(fr, fi):
    buf = np.zeros(2 * fr.size, np.int16)
    buf[0::2] = fr
    buf[1::2] = fi
    return buf


@pytest.mark.parametrize("order", range(3, 11))
@pytest.mark.parametrize("mode", [0, 1])
def test_complex_fft_matches_reference(order, mode):
    o = get_oracle()
    rng = np.random.default_rng(100 + order * 2 + mode)
    n = 1 << order
    for _ in range(4):
        fr = rng.integers(-8000, 8000, n).astype(np.int16)
        fi = rng.integers(-8000, 8000, n).astype(np.int16)
        # C flow: bit-reverse then FFT, in place on interleaved int16.
        ref = o.complex_fft(_interleave(fr, fi), stages=order, mode=mode)
        perm = fft._bit_reverse_perm(order)
        our_r, our_i = fft.complex_fft(
            jnp.asarray(fr.astype(np.int32))[perm],
            jnp.asarray(fi.astype(np.int32))[perm], order=order, mode=mode)
        np.testing.assert_array_equal(np.asarray(our_r), ref[0::2])
        np.testing.assert_array_equal(np.asarray(our_i), ref[1::2])


@pytest.mark.parametrize("order", range(3, 11))
@pytest.mark.parametrize("mode", [0, 1])
def test_complex_ifft_matches_reference(order, mode):
    o = get_oracle()
    rng = np.random.default_rng(200 + order * 2 + mode)
    n = 1 << order
    # Mix of small and near-saturating inputs to exercise the
    # data-dependent per-stage scaling thresholds (13573 / 27146).
    for amp in (300, 14000, 30000):
        fr = rng.integers(-amp, amp, n).astype(np.int16)
        fi = rng.integers(-amp, amp, n).astype(np.int16)
        ref, ref_scale = o.complex_ifft(_interleave(fr, fi), stages=order,
                                        mode=mode)
        perm = fft._bit_reverse_perm(order)
        our_r, our_i, our_scale = fft.complex_ifft(
            jnp.asarray(fr.astype(np.int32))[perm],
            jnp.asarray(fi.astype(np.int32))[perm], order=order, mode=mode)
        np.testing.assert_array_equal(np.asarray(our_r), ref[0::2])
        np.testing.assert_array_equal(np.asarray(our_i), ref[1::2])
        assert int(our_scale) == ref_scale


@pytest.mark.parametrize("order", range(4, 11))
def test_real_fft_pair_matches_reference(order):
    o = get_oracle()
    rng = np.random.default_rng(300 + order)
    fwd, inv = fft.make_real_fft(order)
    n = 1 << order
    for amp in (2000, 20000):
        x = rng.integers(-amp, amp, n).astype(np.int16)
        ref_ccs, _ = o.real_forward_fft(x, order=order)
        re, im = jax.jit(fwd)(jnp.asarray(x, jnp.int32))
        np.testing.assert_array_equal(np.asarray(re), ref_ccs[:, 0])
        np.testing.assert_array_equal(np.asarray(im), ref_ccs[:, 1])

        ccs = rng.integers(-amp, amp, n + 2).astype(np.int16)
        ref_out, ref_scale = o.real_inverse_fft(ccs, order=order)
        out, scale = jax.jit(inv)(
            jnp.asarray(ccs[0::2].astype(np.int32)),
            jnp.asarray(ccs[1::2].astype(np.int32)))
        np.testing.assert_array_equal(np.asarray(out), ref_out)
        assert int(scale) == ref_scale


@pytest.mark.parametrize("order", [5, 9])
def test_real_fft_generic_vmap_matches_loop(order):
    """The batched-major custom_vmap rules must agree with the primal for
    every order, not just the AECM order-7 pair."""
    rng = np.random.default_rng(400 + order)
    fwd, inv = fft.make_real_fft(order)
    n = 1 << order
    xs = rng.integers(-20000, 20000, (8, n)).astype(np.int32)
    re_b, im_b = jax.jit(jax.vmap(fwd))(jnp.asarray(xs))
    for i in range(8):
        re, im = fwd(jnp.asarray(xs[i]))
        np.testing.assert_array_equal(np.asarray(re_b[i]), np.asarray(re))
        np.testing.assert_array_equal(np.asarray(im_b[i]), np.asarray(im))

    res = rng.integers(-20000, 20000, (8, n // 2 + 1)).astype(np.int32)
    ims = rng.integers(-20000, 20000, (8, n // 2 + 1)).astype(np.int32)
    out_b, sc_b = jax.jit(jax.vmap(inv))(jnp.asarray(res), jnp.asarray(ims))
    for i in range(8):
        out, sc = inv(jnp.asarray(res[i]), jnp.asarray(ims[i]))
        np.testing.assert_array_equal(np.asarray(out_b[i]), np.asarray(out))
        assert int(sc_b[i]) == int(sc)
