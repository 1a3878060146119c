"""Component-level TPU microbenchmarks: where does the stream-chunk time go?

Times each layer of the stack vmapped over B streams on the default backend.
Run on the real TPU (ambient JAX_PLATFORMS=axon).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, args, n=20, name=""):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.monotonic()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.monotonic() - t0) / n
    print(f"{name:40s} {dt * 1e3:9.3f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp
    from webrtc_aecm_tpu import control, core
    from webrtc_aecm_tpu import delay_estimator as de
    from webrtc_aecm_tpu.ops import fft, ring_buffer as rbuf
    from webrtc_aecm_tpu.parallel import batch as pbatch

    B = int(os.environ.get("B", "1024"))
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} B={B}")

    blk = jnp.asarray(rng.integers(-3000, 3000, (B, 64)), jnp.int32)
    frame = jnp.asarray(rng.integers(-3000, 3000, (B, 80)), jnp.int32)
    chunk16 = jnp.asarray(rng.integers(-3000, 3000, (B, 160)), jnp.int32)
    sig128 = jnp.asarray(rng.integers(-3000, 3000, (B, 128)), jnp.int32)
    spec = jnp.asarray(rng.integers(0, 4000, (B, 65)), jnp.int32)
    q = jnp.zeros((B,), jnp.int32)
    ms = jnp.full((B,), 40, jnp.int32)

    # full chunk step 16k
    st16 = pbatch.create_batch(B, 16000)
    step16 = jax.jit(pbatch.make_chunk_step(16000))
    timeit(step16, (st16, chunk16, chunk16, ms), name="chunk_step_16k (2 frames)")

    # control.process only (8k: 1 frame)
    st8 = pbatch.create_batch(B, 8000)
    proc8 = jax.jit(jax.vmap(
        lambda s, d, m: control.process(s, d, None, 80, m, 8000)))
    timeit(proc8, (st8, frame, ms), name="control.process 8k (1 frame)")

    bf8 = jax.jit(jax.vmap(lambda s, f: control.buffer_farend(s, f, 1)))
    timeit(bf8, (st8, frame), name="control.buffer_farend 8k")

    # core.process_frame
    cst = jax.vmap(lambda _: core.create_core(8000))(jnp.arange(B))
    pf = jax.jit(jax.vmap(
        lambda s, f, d: core.process_frame(s, f, d, None, 1)))
    timeit(pf, (cst, frame, frame), name="core.process_frame (<=2 blocks)")

    # core.process_block
    pb = jax.jit(jax.vmap(
        lambda s, f, d: core.process_block(s, f, d, None, 1)))
    timeit(pb, (cst, blk, blk), name="core.process_block")

    # FFT pair
    f_fwd = jax.jit(fft.real_forward_fft)
    timeit(f_fwd, (sig128,), name="real_forward_fft")
    re65 = jnp.asarray(rng.integers(-3000, 3000, (B, 65)), jnp.int32)
    f_inv = jax.jit(fft.real_inverse_fft)
    timeit(f_inv, (re65, re65), name="real_inverse_fft")

    # time_to_frequency_domain (fft + mag)
    t2f = jax.jit(jax.vmap(core.time_to_frequency_domain))
    timeit(t2f, (sig128,), name="time_to_frequency_domain")

    # delay estimator
    fe = jax.vmap(lambda _: de.create_farend())(jnp.arange(B))
    ne = jax.vmap(lambda _: de.create_near())(jnp.arange(B))
    add_far = jax.jit(jax.vmap(de.add_far_spectrum_fix))
    timeit(add_far, (fe, spec, q), name="de.add_far_spectrum_fix")
    proc_de = jax.jit(jax.vmap(de.process_fix))
    timeit(proc_de, (ne, fe, spec, q), name="de.process_fix")

    # energies + channel update + supgain
    ce = jax.jit(jax.vmap(
        lambda s, f, q_, n: core.calc_energies(s, f, q_, n)))
    nsum = jnp.sum(spec, axis=-1).astype(jnp.uint32)
    timeit(ce, (cst, spec, q, nsum), name="core.calc_energies")
    est = spec * 100
    uc = jax.jit(jax.vmap(
        lambda s, f, q_, d, m, e: core.update_channel(s, f, q_, d, m, e)))
    mu = jnp.full((B,), 2, jnp.int32)
    timeit(uc, (cst, spec, q, spec, mu, est), name="core.update_channel")

    # comfort noise
    cn = jax.jit(jax.vmap(
        lambda s, d, r, i, l: core.comfort_noise(s, d, r, i, l)))
    lam = jnp.full((B, 65), 8000, jnp.int32)
    timeit(cn, (cst, spec, re65, re65, lam), name="core.comfort_noise")

    # ring buffer ops at jitter-buffer size (4000)
    rb = jax.vmap(lambda _: rbuf.create(4000))(jnp.arange(B))
    w = jax.jit(jax.vmap(rbuf.write))
    timeit(w, (rb, frame), name="rbuf.write (cap 4000, n=80)")
    r = jax.jit(jax.vmap(lambda b: rbuf.read(b, 80)))
    timeit(r, (rb,), name="rbuf.read (cap 4000, n=80)")

    # far-history update + aligned fetch
    uh = jax.jit(jax.vmap(core.update_far_history))
    timeit(uh, (cst, spec, q), name="core.update_far_history")
    af = jax.jit(jax.vmap(core.aligned_farend))
    dly = jnp.full((B,), 5, jnp.int32)
    timeit(af, (cst, dly), name="core.aligned_farend")



if __name__ == "__main__":
    main()
