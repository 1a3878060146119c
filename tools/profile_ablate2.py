"""Ablation round 2: decompose the pipeline skeleton and CNG internals."""
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
    from webrtc_aecm_tpu import control, core
    from webrtc_aecm_tpu.ops import spl
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
        print(f"{name:46s} {per * 1e3:8.3f} ms/chunk (compile {comp:5.1f}s)",
              flush=True)
        return per

    measure("baseline (full)")

    # CNG with constant phase indices: the cos/sin table gathers become
    # loop-invariant (hoistable), isolating the cost of the dynamic gather
    # from the rest of the CNG arithmetic.
    orig_rand = spl.rand_u_array
    const_idx = jnp.arange(64, dtype=I32) * 3 % 32768

    def rand_const(seed, n):
        return jnp.broadcast_to(const_idx[:n], (n,)), seed

    spl.rand_u_array = rand_const
    measure("- CNG rand (const idx -> hoistable gather)")
    spl.rand_u_array = orig_rand

    # ---- skeleton decomposition: block stubbed ----
    orig_pb = core.process_block
    core.process_block = lambda s, f, d, c=None, mult=1, opts=None: (s, d)
    base_skel = measure("skeleton (block stubbed)")

    # skeleton minus the whole process_frame (carries included)
    orig_pf = core.process_frame
    core.process_frame = lambda s, f, d, c=None, mult=1, opts=None: (s, d)
    measure("skeleton - process_frame entirely")

    # and additionally without buffer_farend's jitter write
    orig_bf = control.buffer_farend
    control.buffer_farend = lambda s, f, m=1: s
    measure("skeleton - process_frame - buffer_farend")
    control.buffer_farend = orig_bf
    core.process_frame = orig_pf
    core.process_block = orig_pb

    # full pipeline minus jitter-ring data ops (positions only)
    from webrtc_aecm_tpu.ops import ring_buffer as rbuf
    orig_read, orig_write = rbuf.read, rbuf.write
    def fake_read(rb, count):
        vals = rb.data[..., :count]
        return vals, rbuf.move_read_ptr(rb, jnp.minimum(
            rbuf.available_read(rb), count))
    def fake_write(rb, values):
        count = values.shape[-1]
        n_write = jnp.minimum(rbuf.available_write(rb), count)
        cap = rb.capacity
        margin = cap - rb.write_pos
        wrapped = n_write > margin
        new_wp = jnp.where(wrapped, n_write - margin, rb.write_pos + n_write)
        new_wrap = jnp.where(wrapped, jnp.int32(rbuf.DIFF_WRAP), rb.rw_wrap)
        return rb._replace(write_pos=new_wp, rw_wrap=new_wrap)
    rbuf.read, rbuf.write = fake_read, fake_write
    measure("- jitter ring data movement")
    rbuf.read, rbuf.write = orig_read, orig_write

    # full pipeline minus FFT custom-vmap layout transposes: approximated by
    # stubbing window_and_fft entirely
    orig_wf = core.window_and_fft
    core.window_and_fft = lambda ts, sc: (ts[..., :65], ts[..., 63:])
    measure("- window_and_fft (both FFT dirs kept elsewhere)")
    core.window_and_fft = orig_wf


if __name__ == "__main__":
    main()
