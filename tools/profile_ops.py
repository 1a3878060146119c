"""Amortized true-cost microbenchmarks: each op iterated inside one jitted
lax.scan so remote-dispatch overhead is amortized away.

Also A/B-tests candidate lowering strategies for the hot data structures
(mod-index gather/scatter vs shift-register vs dynamic-slice) to drive the
ring-buffer re-architecture.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 50


def timeit_scan(fn, init, n=ITERS, name="", reps=3):
    """Time fn iterated n times inside one jit (scan with dummy xs)."""
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
    per = best / n
    print(f"{name:48s} {per * 1e6:9.1f} us/iter", flush=True)
    return per


def main():
    import jax
    import jax.numpy as jnp
    from webrtc_aecm_tpu import core
    from webrtc_aecm_tpu import delay_estimator as de
    from webrtc_aecm_tpu.ops import fft, ring_buffer as rbuf

    B = int(os.environ.get("B", "1024"))
    I32 = jnp.int32
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} B={B} iters={ITERS}")

    sig128 = jnp.asarray(rng.integers(-3000, 3000, (B, 128)), I32)
    spec = jnp.asarray(rng.integers(0, 4000, (B, 65)), I32)
    frame = jnp.asarray(rng.integers(-3000, 3000, (B, 80)), I32)

    # --- baseline: trivial elementwise op on (B,128)
    timeit_scan(lambda x: x + 1, sig128, name="elementwise add (B,128)")

    # --- FFT pair
    def fwd(x):
        re, im = fft.real_forward_fft(x)
        return jnp.concatenate([re, im[..., :63]], axis=-1) & 0x7FFF
    timeit_scan(fwd, sig128, name="real_forward_fft")

    def inv(x):
        out, scale = fft.real_inverse_fft(x[..., :65], x[..., 63:])
        return out & 0x7FFF
    timeit_scan(inv, sig128, name="real_inverse_fft")

    # --- t2f full
    def t2f(x):
        q, (re, im), mag, s = jax.vmap(core.time_to_frequency_domain)(x)
        return jnp.concatenate(
            [re[..., :64] + mag[..., :64], im[..., :64]], axis=-1) & 0x3FFF
    timeit_scan(t2f, sig128, name="time_to_frequency_domain")

    # --- process_block (the whole hot chain)
    cst = jax.vmap(lambda _: core.create_core(8000))(jnp.arange(B))
    def pb(c):
        s, out = jax.vmap(
            lambda s, f, d: core.process_block(s, f, d, None, 1))(
                c, sig128[:, :64], sig128[:, 64:])
        return s
    timeit_scan(pb, cst, name="core.process_block (full chain)")

    # --- process_frame (block + re-blocking rings)
    def pf(c):
        s, out = jax.vmap(
            lambda s, f, d: core.process_frame(s, f, d, None, 1))(
                c, frame, frame)
        return s
    timeit_scan(pf, cst, name="core.process_frame (rings + <=2 blocks)")

    # --- delay estimator full step
    fe = jax.vmap(lambda _: de.create_farend())(jnp.arange(B))
    ne = jax.vmap(lambda _: de.create_near())(jnp.arange(B))
    q0 = jnp.zeros((B,), I32)
    def de_step(carry):
        fe_, ne_ = carry
        fe_ = jax.vmap(de.add_far_spectrum_fix)(fe_, spec, q0)
        ne_, d = jax.vmap(de.process_fix)(ne_, fe_, spec, q0)
        return (fe_, ne_)
    timeit_scan(de_step, (fe, ne), name="delay estimator (add_far+process)")

    # --- far history: scatter-at-pos vs shift-register
    hist = jnp.zeros((B, 100, 65), I32)
    pos = jnp.zeros((B,), I32)
    def fh_scatter(carry):
        h, p = carry
        p = (p + 1) % 100
        h = jax.vmap(lambda hh, pp, s: hh.at[pp].set(s))(h, p, spec)
        return (h, p)
    timeit_scan(fh_scatter, (hist, pos), name="far_history scatter .at[pos].set")

    def fh_shift(h):
        return jnp.concatenate([spec[:, None, :], h[:, :-1, :]], axis=1)
    timeit_scan(fh_shift, hist, name="far_history shift-register concat")

    # one-row fetch at dynamic delay
    dly = jnp.full((B,), 7, I32)
    def fh_fetch(h):
        row = jax.vmap(lambda hh, d: hh[d])(h, dly)
        return h.at[:, 0, :].add(row)
    timeit_scan(fh_fetch, hist, name="far_history one-row dynamic fetch")

    # --- jitter ring (cap 4000): mod gather/scatter vs DUS-fold
    rb = jax.vmap(lambda _: rbuf.create(4000))(jnp.arange(B))
    def rb_wr(c):
        c = jax.vmap(rbuf.write)(c, frame)
        v, c = jax.vmap(lambda b: rbuf.read(b, 80))(c)
        return c
    timeit_scan(rb_wr, rb, name="rbuf write+read (cap 4000, mod-scatter)")

    data4000 = jnp.zeros((B, 4000), I32)
    wp = jnp.zeros((B,), I32)
    def dus_fold(carry):
        # write 160 at dynamic pos into a doubled buffer, then overlay the
        # wrapped head region back onto the front — no scatter anywhere.
        d, p = carry
        doubled = jnp.concatenate([d, d[:, :160]], axis=1)
        vals = jnp.broadcast_to(frame[0, :80], (B, 80))
        vals160 = jnp.concatenate([vals, vals], axis=1)
        doubled = jax.vmap(
            lambda dd, vv, pp: jax.lax.dynamic_update_slice(dd, vv, (pp,))
        )(doubled, vals160, p)
        idx = jnp.arange(4000)
        head = doubled[:, 4000:4160]
        base = doubled[:, :4000]
        wrap_n = jnp.clip(p + 160 - 4000, 0, 160)
        mask = idx[None, :] < wrap_n[:, None]
        merged = jnp.where(
            mask, jnp.pad(head, ((0, 0), (0, 4000 - 160)))[:, :4000], base)
        p = (p + 160) % 4000
        return (merged, p)
    timeit_scan(dus_fold, (data4000, wp),
                name="jitter write via DUS+fold (cap 4000)")

    def ds_read(carry):
        d, p = carry
        doubled = jnp.concatenate([d, d[:, :160]], axis=1)
        vals = jax.vmap(
            lambda dd, pp: jax.lax.dynamic_slice(dd, (pp,), (160,)))(
                doubled, p)
        p = (p + 160) % 4000
        return (d + 0 * vals.sum(), p)
    timeit_scan(ds_read, (data4000, wp),
                name="jitter read via dynamic_slice (cap 4000)")

    # --- frame ring (cap 144): mod ops vs DUS approach
    rb144 = jax.vmap(lambda _: rbuf.create(144))(jnp.arange(B))
    def rb144_cycle(c):
        c = jax.vmap(rbuf.write)(c, frame)
        v, c = jax.vmap(lambda b: rbuf.read(b, 64))(c)
        return c
    timeit_scan(rb144_cycle, rb144, name="frame ring write80+read64 (mod)")


if __name__ == "__main__":
    main()
