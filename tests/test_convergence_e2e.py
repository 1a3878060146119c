"""Golden e2e across the startup-convergence transitions.

The reference switches startupState 0 -> 1 at totCount == CONV_LEN (512
blocks) and 1 -> 2 at 2*CONV_LEN (aecm_core_c.cc:420-424); the dynamic
step size (aecm_core.cc:767-794), non-startup MSE store/reset arbitration
(aecm_core.cc:924-986), and non-startup asymmetric-filter shifts all only
engage after that boundary.  These tests run well past 2*CONV_LEN blocks
at both rates, CNG on and off, and require sample-exact output plus an
identical converged echo path.

Our side runs the flagship single-scan path (parallel.batch.run_streams)
so the whole multi-second call is one jitted lax.scan -- the same graph
the serving benchmark uses.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from webrtc_aecm_tpu import control
from webrtc_aecm_tpu.parallel import batch as pbatch
from .oracle import get_oracle, RefAecm
from .test_process_e2e import _make_echo_scene

# > 2*CONV_LEN = 1024 blocks with margin: 1400 blocks @ 8 kHz (11.2 s),
# 1750 blocks @ 16 kHz (7 s).
N_MS = {8000: 11200, 16000: 7000}

_jitted = {}


def _our_run(fs):
    if fs not in _jitted:
        _jitted[fs] = jax.jit(
            lambda s, f, d: pbatch.run_streams(s, f, d, fs, 40))
    return _jitted[fs]


def _run_config(fs, cng, echo_mode=3, seed=0, clean=False):
    rng = np.random.default_rng(seed)
    n_samples = N_MS[fs] * fs // 1000
    far, near = _make_echo_scene(rng, n_samples, 60 * fs // 1000, fs)
    clean_sig = None
    if clean:
        clean_sig = (0.9 * near + rng.normal(0, 80, near.shape)
                     ).clip(-32000, 32000).astype(np.int16)

    # C oracle, chunk by chunk.
    ref = RefAecm(get_oracle(), fs, cng_mode=cng, echo_mode=echo_mode)
    samples = min(160, fs // 100)
    ref_out = np.zeros(n_samples, np.int16)
    for i in range(n_samples // samples):
        sl = slice(i * samples, (i + 1) * samples)
        assert ref.buffer_farend(far[sl]) == 0
        r, ret = ref.process(near[sl],
                             None if clean_sig is None else clean_sig[sl],
                             40)
        assert ret == 0
        ref_out[sl] = r

    # Ours: one jitted scan over the whole call.
    state = pbatch.create_batch(1, fs, cng_mode=cng, echo_mode=echo_mode)
    if clean:
        state, out = jax.jit(
            lambda s, f, d, c: pbatch.run_streams(s, f, d, fs, 40,
                                                  clean=c))(
            state, jnp.asarray(far[None], jnp.int32),
            jnp.asarray(near[None], jnp.int32),
            jnp.asarray(clean_sig[None], jnp.int32))
    else:
        state, out = _our_run(fs)(state, jnp.asarray(far[None], jnp.int32),
                                  jnp.asarray(near[None], jnp.int32))
    our_out = np.asarray(out[0]).astype(np.int16)

    if not np.array_equal(our_out, ref_out):
        idx = np.nonzero(our_out != ref_out)[0]
        block = idx[0] // 64
        raise AssertionError(
            f"fs={fs} cng={cng}: first diff at sample {idx[0]} "
            f"(~block {block}, startup boundary at 512/1024 blocks): "
            f"ref={ref_out[idx[:8]]} ours={our_out[idx[:8]]} "
            f"({idx.size} diffs total)")

    # Converged echo path must match bit for bit.
    one = jax.tree_util.tree_map(lambda x: x[0], state)
    our_path = np.asarray(control.get_echo_path(one), np.int16)
    np.testing.assert_array_equal(our_path, ref.get_echo_path())


@pytest.mark.soak
@pytest.mark.parametrize("cng", [1, 0])
def test_convergence_8k(cng):
    _run_config(8000, cng, seed=10 + cng)


@pytest.mark.soak
@pytest.mark.parametrize("cng", [1, 0])
def test_convergence_16k(cng):
    _run_config(16000, cng, seed=20 + cng)


@pytest.mark.soak
def test_convergence_16k_dual_input():
    """Convergence-length dual-input run: the clean-domain Q bookkeeping
    (dfa_clean_q feeding the Wiener near_filt and the upper-band clamp)
    stays oracle-bit-exact past both CONV_LEN transitions."""
    _run_config(16000, cng=1, seed=31, clean=True)
