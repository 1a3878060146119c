"""Ablation round 3: block-internal stage costs in the full pipeline."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 30


def timeit_scan(step, init, args, n=ITERS, reps=3):
    import jax

    @jax.jit
    def run(carry):
        def body(c, _):
            s, out, w = step(c, *args)
            return s, None
        c, _ = jax.lax.scan(body, carry, None, length=n)
        return c

    t0 = time.monotonic()
    out = run(init)
    jax.block_until_ready(out)
    compile_s = time.monotonic() - t0
    best = 1e9
    for _ in range(reps):
        t0 = time.monotonic()
        out = run(init)
        jax.block_until_ready(out)
        best = min(best, time.monotonic() - t0)
    return best / n, compile_s


def main():
    import jax
    import jax.numpy as jnp
    from webrtc_aecm_tpu import core
    from webrtc_aecm_tpu import delay_estimator as de
    from webrtc_aecm_tpu.parallel import batch as pbatch

    B = int(os.environ.get("B", "1024"))
    I32 = jnp.int32
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} B={B} iters={ITERS}", flush=True)

    chunk16 = jnp.asarray(rng.integers(-3000, 3000, (B, 160)), I32)
    ms = jnp.full((B,), 40, I32)
    st16 = pbatch.create_batch(B, 16000)
    step = pbatch.make_chunk_step(16000)
    args = (chunk16, chunk16, ms)

    def measure(name):
        per, comp = timeit_scan(step, st16, args)
        print(f"{name:40s} {per * 1e3:8.3f} ms/chunk (compile {comp:5.1f}s)",
              flush=True)
        return per

    measure("baseline (full)")

    orig = de.process_fix, de.add_far_spectrum_fix
    de.process_fix = lambda s, f, ns, q, rv=False: (s, jnp.asarray(0, I32))
    de.add_far_spectrum_fix = lambda s, sp, q: s
    measure("- delay estimator")
    de.process_fix, de.add_far_spectrum_fix = orig

    o = core.comfort_noise
    core.comfort_noise = lambda s, dfa, r, i, l: (s, r, i)
    measure("- comfort noise (entire)")
    core.comfort_noise = o

    o = core.update_channel
    core.update_channel = lambda s, f, q, dfa, mu, e: (s, e)
    measure("- update_channel")
    core.update_channel = o

    o = core.calc_energies
    core.calc_energies = lambda s, f, q, n: (s, f * s.channel_stored)
    measure("- calc_energies")
    core.calc_energies = o

    o = core.inverse_fft_and_window
    core.inverse_fft_and_window = (
        lambda state, r, i, hc: (state, (r[..., :64] + i[..., :64]) & 0x7FFF))
    measure("- inverse FFT/OLA")
    core.inverse_fft_and_window = o

    o = core.update_far_history
    core.update_far_history = lambda s, sp, q: s
    measure("- far_history shift")
    core.update_far_history = o

    o = core.aligned_farend
    core.aligned_farend = lambda s, d: (s.far_history[0],
                                        s.far_q_domains[0])
    measure("- aligned_farend masked sum")
    core.aligned_farend = o

    o = core.calc_suppression_gain
    core.calc_suppression_gain = lambda s: (s, s.sup_gain)
    measure("- calc_suppression_gain")
    core.calc_suppression_gain = o

    o = core._phase_table_lookup
    core._phase_table_lookup = lambda idx: (idx & 0xFFF, idx & 0xFFF)
    measure("- CNG phase table lookup only")
    core._phase_table_lookup = o


if __name__ == "__main__":
    main()
