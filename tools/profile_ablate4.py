"""Ablation round 4: decompose the control-layer skeleton floor."""
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
    from webrtc_aecm_tpu.ops import ring_buffer as rbuf
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
        print(f"{name:44s} {per * 1e3:8.3f} ms/chunk (compile {comp:5.1f}s)",
              flush=True)
        return per

    measure("baseline (full)")

    # stub process_block to isolate the skeleton
    orig_pb = core.process_block
    core.process_block = lambda s, f, d, c=None, mult=1, opts=None: (s, d)
    measure("skeleton (block stubbed)")

    # + skip the startup branch's buffer-size machinery entirely
    # (monkeypatch control.process? complex) — instead probe pieces:
    orig_ebd = control._est_buf_delay
    control._est_buf_delay = lambda s, m: s
    measure("skeleton - est_buf_delay")
    control._est_buf_delay = orig_ebd

    orig_read = rbuf.read
    rbuf.read = lambda rb, count: (rb.data[..., :count], rb)
    measure("skeleton - jitter reads (static stub)")
    rbuf.read = orig_read

    orig_dc = control._delay_comp
    control._delay_comp = lambda s, m: s
    measure("skeleton - delay_comp")
    control._delay_comp = orig_dc

    orig_w = rbuf.write
    rbuf.write = lambda rb, v: rb
    measure("skeleton - jitter write")
    rbuf.write = orig_w

    core.process_block = orig_pb


if __name__ == "__main__":
    main()
