"""Golden tests: SPL fixed-point primitives vs the compiled C reference."""
import numpy as np
import jax.numpy as jnp

from webrtc_aecm_tpu.ops import spl
from .oracle import get_oracle


def test_sqrt_floor_matches_reference():
    o = get_oracle()
    rng = np.random.default_rng(0)
    vals = np.concatenate([
        np.array([0, 1, 2, 3, 4, 8, 15, 16, 0x7FFFFFFF, 2**30, 2**30 - 1]),
        rng.integers(0, 2**31, size=2000),
    ]).astype(np.int64)
    ours = np.asarray(spl.sqrt_floor(jnp.asarray(vals, jnp.int32)))
    theirs = np.array([o.sqrt_floor(int(v)) for v in vals])
    np.testing.assert_array_equal(ours, theirs)


def test_div_w32_w16_matches_reference():
    o = get_oracle()
    rng = np.random.default_rng(1)
    num = rng.integers(-2**31, 2**31, size=500).astype(np.int64)
    den = rng.integers(-32768, 32768, size=500).astype(np.int64)
    den[::50] = 0
    ours = np.asarray(spl.div_w32_w16(jnp.asarray(num, jnp.int32),
                                      jnp.asarray(den, jnp.int32)))
    theirs = np.array([o.lib.WebRtcSpl_DivW32W16(int(n), int(d))
                       for n, d in zip(num, den)])
    np.testing.assert_array_equal(ours, theirs)


def test_div_u32_u16_matches_reference():
    o = get_oracle()
    rng = np.random.default_rng(2)
    num = rng.integers(0, 2**32, size=500).astype(np.uint64)
    den = rng.integers(0, 2**16, size=500).astype(np.uint64)
    den[::50] = 0
    ours = np.asarray(spl.div_u32_u16(jnp.asarray(num, jnp.uint32),
                                      jnp.asarray(den, jnp.uint32)))
    theirs = np.array([o.lib.WebRtcSpl_DivU32U16(int(n), int(d))
                       for n, d in zip(num, den)], dtype=np.uint32)
    np.testing.assert_array_equal(ours, theirs)


def _ref_norm_w32(a):
    if a == 0:
        return 0
    x = ~a if a < 0 else a
    return _clz(np.uint32(x & 0xFFFFFFFF)) - 1


def _ref_norm_u32(a):
    return 0 if a == 0 else _clz(np.uint32(a))


def _clz(x):
    x = int(x)
    return 32 - x.bit_length()


def test_norms():
    rng = np.random.default_rng(3)
    vals = np.concatenate([
        np.array([0, 1, -1, 2**30, -2**31, 2**31 - 1, -2, 0x40000000]),
        rng.integers(-2**31, 2**31, size=2000),
    ]).astype(np.int64)
    ours32 = np.asarray(spl.norm_w32(jnp.asarray(vals, jnp.int32)))
    ref32 = np.array([_ref_norm_w32(int(v)) for v in vals])
    np.testing.assert_array_equal(ours32, ref32)

    uvals = rng.integers(0, 2**32, size=2000)
    oursu = np.asarray(spl.norm_u32(jnp.asarray(uvals, jnp.uint32)))
    refu = np.array([_ref_norm_u32(int(v)) for v in uvals])
    np.testing.assert_array_equal(oursu, refu)

    w16vals = np.concatenate([
        np.array([0, 1, -1, 32767, -32768]),
        rng.integers(-32768, 32768, size=500)]).astype(np.int64)
    ours16 = np.asarray(spl.norm_w16(jnp.asarray(w16vals, jnp.int32)))
    ref16 = []
    for v in w16vals:
        v = int(v)
        if v == 0:
            ref16.append(0)
        else:
            x = ~v if v < 0 else v
            ref16.append(_clz(np.uint32(x & 0xFFFFFFFF)) - 17)
    np.testing.assert_array_equal(ours16, np.array(ref16))


def test_rand_u_sequence_matches_reference():
    o = get_oracle()
    import ctypes as ct
    seed_ref = ct.c_uint32(666)
    ref_vals = [o.lib.WebRtcSpl_RandU(ct.byref(seed_ref)) for _ in range(300)]
    ours, new_seed = spl.rand_u_array(jnp.uint32(666), 300)
    np.testing.assert_array_equal(np.asarray(ours), np.array(ref_vals))
    assert int(new_seed) == seed_ref.value


def test_add_sat():
    cases = np.array([
        [2**31 - 1, 1], [-2**31, -1], [2**31 - 1, 2**31 - 1],
        [-2**31, -2**31], [5, 7], [-5, 7], [2**30, 2**30],
    ], dtype=np.int64)
    a = jnp.asarray(cases[:, 0], jnp.int32)
    b = jnp.asarray(cases[:, 1], jnp.int32)
    got = np.asarray(spl.add_sat_w32(a, b))
    exp = np.clip(cases[:, 0] + cases[:, 1], -2**31, 2**31 - 1)
    np.testing.assert_array_equal(got, exp)

    got16 = np.asarray(spl.add_sat_w16(jnp.int32(30000), jnp.int32(30000)))
    assert got16 == 32767


def test_to_w16_wraps():
    vals = jnp.asarray([32768, -32769, 65536, 40000, -40000, 123], jnp.int32)
    got = np.asarray(spl.to_w16(vals))
    exp = np.array([32768, -32769, 65536, 40000, -40000, 123],
                   dtype=np.int64).astype(np.int16)
    np.testing.assert_array_equal(got, exp)


def test_shift_w32():
    x = jnp.asarray([-256, 256, 7, -7], jnp.int32)
    c = jnp.asarray([-3, 3, 0, -1], jnp.int32)
    got = np.asarray(spl.shift_w32(x, c))
    np.testing.assert_array_equal(got, np.array([-32, 2048, 7, -4]))
