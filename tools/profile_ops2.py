"""Second-round amortized microbenchmarks after the data-movement rework."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 30


def timeit_scan(fn, init, n=ITERS, name="", reps=3):
    import jax

    @jax.jit
    def run(carry):
        def body(c, _):
            return fn(c), None
        c, _ = jax.lax.scan(body, carry, None, length=n)
        return c

    out = run(init)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.monotonic()
        out = run(init)
        jax.block_until_ready(out)
        best = min(best, time.monotonic() - t0)
    print(f"{name:48s} {best / n * 1e6:9.1f} us/iter", flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from webrtc_aecm_tpu import control, core
    from webrtc_aecm_tpu import delay_estimator as de
    from webrtc_aecm_tpu.parallel import batch as pbatch

    B = int(os.environ.get("B", "1024"))
    I32 = jnp.int32
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} B={B} iters={ITERS}")

    sig128 = jnp.asarray(rng.integers(-3000, 3000, (B, 128)), I32)
    spec = jnp.asarray(rng.integers(0, 4000, (B, 65)), I32)
    frame = jnp.asarray(rng.integers(-3000, 3000, (B, 80)), I32)
    chunk16 = jnp.asarray(rng.integers(-3000, 3000, (B, 160)), I32)
    ms = jnp.full((B,), 40, I32)

    # full 16k chunk step (buffer_farend + process)
    st16 = pbatch.create_batch(B, 16000)
    step = pbatch.make_chunk_step(16000)
    def full_chunk(s):
        s, out, w = step(s, chunk16, chunk16, ms)
        return s
    timeit_scan(full_chunk, st16, name="FULL chunk step 16k")

    # control.process 8k (1 frame) and buffer_farend alone
    st8 = pbatch.create_batch(B, 8000)
    def proc8(s):
        s, out, w = jax.vmap(
            lambda ss, d, m: control.process(ss, d, None, 80, m, 8000))(
                s, frame, ms)
        return s
    timeit_scan(proc8, st8, name="control.process 8k (1 frame)")

    def bf8(s):
        return jax.vmap(lambda ss, f: control.buffer_farend(ss, f, 1))(
            s, frame)
    timeit_scan(bf8, st8, name="control.buffer_farend 8k")

    # core.process_frame / process_block
    cst = jax.vmap(lambda _: core.create_core(8000))(jnp.arange(B))
    def pf(c):
        s, out = jax.vmap(
            lambda ss, f, d: core.process_frame(ss, f, d, None, 1))(
                c, frame, frame)
        return s
    timeit_scan(pf, cst, name="core.process_frame")

    def pb(c):
        s, out = jax.vmap(
            lambda ss, f, d: core.process_block(ss, f, d, None, 1))(
                c, sig128[:, :64], sig128[:, 64:])
        return s
    timeit_scan(pb, cst, name="core.process_block")

    # delay estimator full
    fe = jax.vmap(lambda _: de.create_farend())(jnp.arange(B))
    ne = jax.vmap(lambda _: de.create_near())(jnp.arange(B))
    q0 = jnp.zeros((B,), I32)
    def de_step(carry):
        fe_, ne_ = carry
        fe_ = jax.vmap(de.add_far_spectrum_fix)(fe_, spec, q0)
        ne_, d = jax.vmap(de.process_fix)(ne_, fe_, spec, q0)
        return (fe_, ne_)
    timeit_scan(de_step, (fe, ne), name="delay estimator step")

    # calc_energies / update_channel / supgain / comfort_noise
    nsum = jnp.sum(spec, axis=-1).astype(jnp.uint32)
    def ce(c):
        s, e = jax.vmap(core.calc_energies)(c, spec, q0, nsum)
        return s
    timeit_scan(ce, cst, name="core.calc_energies")

    mu = jnp.full((B,), 2, I32)
    est = spec * 100
    def uc(c):
        s, e = jax.vmap(core.update_channel)(c, spec, q0, spec, mu, est)
        return s
    timeit_scan(uc, cst, name="core.update_channel")

    lam = jnp.full((B, 65), 8000, I32)
    re65 = spec
    def cn(c):
        s, r, i = jax.vmap(core.comfort_noise)(c, spec, re65, re65, lam)
        return s
    timeit_scan(cn, cst, name="core.comfort_noise")

    # t2f (new layout)
    def t2f(x):
        q, (re, im), mag, s = jax.vmap(core.time_to_frequency_domain)(x)
        return jnp.concatenate(
            [re[..., :64] + mag[..., :64], im[..., :64]], axis=-1) & 0x3FFF
    timeit_scan(t2f, sig128, name="time_to_frequency_domain")

    # scatter-vs-onehot on (101,) histogram
    hist = jnp.zeros((B, 101), jnp.float32)
    idx = jnp.full((B,), 7, I32)
    def h_scatter(h):
        return jax.vmap(lambda hh, ii: hh.at[ii].add(1.0))(h, idx)
    timeit_scan(h_scatter, hist, name="(101,) scatter .at[i].add")

    def h_onehot(h):
        oh = (jnp.arange(101)[None, :] == idx[:, None])
        return h + oh.astype(jnp.float32)
    timeit_scan(h_onehot, hist, name="(101,) one-hot add")

    # int32 division throughput (65 bins)
    den = jnp.arange(1, 66, dtype=I32)[None, :]
    num = spec * 1000 + 7
    def idiv(x):
        return (x // den) & 0x7FFFFFFF
    timeit_scan(idiv, num, name="(B,65) int32 //")

    recip = None


if __name__ == "__main__":
    main()
