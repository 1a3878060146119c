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


def test_div_fast_exact():
    """The f32-refinement division core == true integer division over
    adversarial inputs: every 16-bit den crossed with quotient-boundary
    numerators (k*den - 1, k*den, k*den + 1 for extreme and random k),
    extreme numerators, plus a large random sweep.  Guards the exactness
    claim in spl._div_u32_u16_core's error budget."""
    rng = np.random.default_rng(7)
    dens = np.arange(1, 65536, dtype=np.uint64)
    n = len(dens)
    numerators = []
    denominators = []
    # quotient boundaries around random and extreme quotients
    for kind in range(6):
        if kind == 0:
            k = (2**32 - 1) // dens          # max quotient
        elif kind == 1:
            k = rng.integers(0, 2**31, n).astype(np.uint64) % (
                (2**32 - 1) // dens + 1)
        elif kind == 2:
            k = np.minimum((2**32 - 1) // dens, 1)
        elif kind == 3:
            k = np.minimum((2**32 - 1) // dens, 2**16 - 1)
        elif kind == 4:
            k = np.minimum((2**32 - 1) // dens, 2**24 + 1)
        else:
            k = ((2**32 - 1) // dens) // 2
        base = k * dens
        for off in (-1, 0, 1):
            v = base.astype(np.int64) + off
            ok = (v >= 0) & (v <= 2**32 - 1)
            numerators.append(v[ok].astype(np.uint64))
            denominators.append(dens[ok])
    # plain random sweep
    numerators.append(rng.integers(0, 2**32, 10**6).astype(np.uint64))
    denominators.append(rng.integers(1, 2**16, 10**6).astype(np.uint64))
    num = np.concatenate(numerators)
    den = np.concatenate(denominators)
    got = np.asarray(spl.div_u32_u16(jnp.asarray(num, jnp.uint32),
                                     jnp.asarray(den, jnp.uint32)),
                     dtype=np.uint64)
    np.testing.assert_array_equal(got, num // den)

    # signed wrapper: trunc-toward-zero across all sign combinations
    num_s = rng.integers(-2**31, 2**31, 10**5)
    den_s = rng.integers(-32768, 32768, 10**5)
    den_s[den_s == 0] = 1
    def trunc_div(n_, d_):      # exact C trunc division in int64
        return np.sign(n_) * np.sign(d_) * (np.abs(n_) // np.abs(d_))

    got_s = np.asarray(spl.div_w32_w16(jnp.asarray(num_s, jnp.int32),
                                       jnp.asarray(den_s, jnp.int32)),
                       dtype=np.int64)
    np.testing.assert_array_equal(got_s, trunc_div(num_s, den_s))
    # int32-min numerator edges
    edge_n = np.array([-2**31, -2**31, -2**31 + 1, 2**31 - 1], np.int64)
    edge_d = np.array([3, -32768, -1, 7], np.int64)
    got_e = np.asarray(spl.div_w32_w16(jnp.asarray(edge_n, jnp.int32),
                                       jnp.asarray(edge_d, jnp.int32)),
                       dtype=np.int64)
    np.testing.assert_array_equal(got_e, trunc_div(edge_n, edge_d))


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
