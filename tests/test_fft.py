"""Golden tests: bit-exact int16 FFT pair vs the compiled C reference,
including the data-dependent per-stage IFFT scaling (complex_fft.c:382-396).
"""
import numpy as np
import jax
import jax.numpy as jnp

from webrtc_aecm_tpu.ops import fft, spl
from .oracle import get_oracle


def _random_int16(rng, n, lo=-32768, hi=32768):
    return rng.integers(lo, hi, size=n).astype(np.int16)


def test_real_forward_fft_matches_reference():
    o = get_oracle()
    rng = np.random.default_rng(10)
    for trial in range(50):
        # Windowed inputs are <= Q14-scaled; test both small and full range.
        hi = 32768 if trial % 2 else 4096
        x = _random_int16(rng, 128, -hi, hi)
        ref, _ = o.real_forward_fft(x)
        re, im = fft.real_forward_fft(jnp.asarray(x, jnp.int32))
        np.testing.assert_array_equal(np.asarray(re), ref[:, 0],
                                      err_msg=f"trial {trial} real")
        np.testing.assert_array_equal(np.asarray(im), ref[:, 1],
                                      err_msg=f"trial {trial} imag")


def test_real_inverse_fft_matches_reference():
    o = get_oracle()
    rng = np.random.default_rng(11)
    for trial in range(50):
        hi = 32768 if trial % 2 else 1024
        ccs = _random_int16(rng, 130, -hi, hi)
        ref_out, ref_scale = o.real_inverse_fft(ccs)
        re = jnp.asarray(ccs[0::2].astype(np.int32))
        im = jnp.asarray(ccs[1::2].astype(np.int32))
        out, scale = fft.real_inverse_fft(re, im)
        assert int(scale) == ref_scale, f"trial {trial} scale"
        np.testing.assert_array_equal(np.asarray(out), ref_out,
                                      err_msg=f"trial {trial}")


def test_forward_fft_batched_equals_loop():
    rng = np.random.default_rng(12)
    xs = rng.integers(-32768, 32768, size=(16, 128)).astype(np.int32)
    re_b, im_b = fft.real_forward_fft(jnp.asarray(xs))
    for i in range(16):
        re, im = fft.real_forward_fft(jnp.asarray(xs[i]))
        np.testing.assert_array_equal(np.asarray(re_b[i]), np.asarray(re))
        np.testing.assert_array_equal(np.asarray(im_b[i]), np.asarray(im))


def test_inverse_fft_vmap_scaling_is_per_stream():
    """Each stream must get its own data-dependent IFFT scaling."""
    rng = np.random.default_rng(13)
    big = rng.integers(-32768, 32768, size=130).astype(np.int16)
    small = rng.integers(-256, 256, size=130).astype(np.int16)
    o = get_oracle()
    _, s_big = o.real_inverse_fft(big)
    _, s_small = o.real_inverse_fft(small)
    assert s_big != s_small  # the point of the test

    res = jnp.stack([jnp.asarray(big[0::2], jnp.int32),
                     jnp.asarray(small[0::2], jnp.int32)])
    ims = jnp.stack([jnp.asarray(big[1::2], jnp.int32),
                     jnp.asarray(small[1::2], jnp.int32)])
    out, scale = jax.vmap(fft.real_inverse_fft)(res, ims)
    assert int(scale[0]) == s_big
    assert int(scale[1]) == s_small


def test_real_inverse_fft_wraps_negated_int16_min():
    """im = -32768 (reachable via CNG saturation) must wrap to -32768 in
    the conjugate-symmetric tail, as the C int16 store does
    (real_fft.c:84-90) — regression for a review finding."""
    o = get_oracle()
    rng = np.random.default_rng(123)
    re = rng.integers(-2000, 2000, 65).astype(np.int32)
    im = rng.integers(-2000, 2000, 65).astype(np.int32)
    im[5] = -32768
    im[33] = -32768
    im[0] = 0
    im[64] = 0
    ccs = np.zeros(130, np.int16)
    ccs[0::2] = re.astype(np.int16)
    ccs[1::2] = im.astype(np.int16)
    ref_out, ref_scale = o.real_inverse_fft(ccs)

    ours_out, ours_scale = jax.jit(fft.real_inverse_fft)(
        jnp.asarray(re), jnp.asarray(im))
    assert int(ours_scale) == ref_scale
    np.testing.assert_array_equal(
        np.asarray(spl.to_w16(ours_out), np.int16), ref_out)
    # batched rule must agree too
    b_out, b_scale = jax.jit(jax.vmap(fft.real_inverse_fft))(
        jnp.asarray(re)[None], jnp.asarray(im)[None])
    np.testing.assert_array_equal(np.asarray(b_out[0]), np.asarray(ours_out))
