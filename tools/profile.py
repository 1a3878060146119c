"""Unified profiler for the serving pipeline.

Subcommands (run on the real TPU — ambient JAX_PLATFORMS=axon — unless
you explicitly want CPU numbers):

    python tools/profile.py components   # per-layer microbenchmarks (vmap B)
    python tools/profile.py ablate       # stage ablation on the REAL graph
    python tools/profile.py skeleton     # control-layer floor (block stubbed)

Env: B (batch size, default 1024), ITERS (scan length, default 30).

Methodology note (docs/PERFORMANCE.md): `components` times ops in
isolation, which MISLEADS for (B,65)-sized ops — XLA fuses them into
neighbors in the real graph.  Trust `ablate` (stub a stage inside the
full serving step, measure the delta) for optimization decisions.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B = int(os.environ.get("B", "1024"))
ITERS = int(os.environ.get("ITERS", "30"))


def timeit(fn, args, n=20, name=""):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.monotonic()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.monotonic() - t0) / n
    print(f"{name:44s} {dt * 1e3:9.3f} ms", flush=True)
    return dt


def timeit_scan(step, init, args, n=ITERS, reps=3):
    """Amortized per-chunk time of `step` scanned n times (real serving
    shape: state threads through, XLA fuses across the chunk)."""
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


def _serving_step():
    import jax.numpy as jnp
    from webrtc_aecm_tpu.parallel import batch as pbatch
    rng = np.random.default_rng(0)
    chunk16 = jnp.asarray(rng.integers(-3000, 3000, (B, 160)), jnp.int32)
    ms = jnp.full((B,), 40, jnp.int32)
    st16 = pbatch.create_batch(B, 16000)
    step = pbatch.make_chunk_step(16000)
    return step, st16, (chunk16, chunk16, ms)


def cmd_ablate():
    """Stub one stage at a time inside the full 16 kHz serving step; the
    delta vs baseline is that stage's true (fused) cost."""
    import jax
    import jax.numpy as jnp
    from webrtc_aecm_tpu import core
    from webrtc_aecm_tpu import delay_estimator as de

    I32 = jnp.int32
    step, st16, args = _serving_step()
    print(f"backend={jax.default_backend()} B={B} iters={ITERS}", flush=True)

    def measure(name):
        per, comp = timeit_scan(step, st16, args)
        print(f"{name:44s} {per * 1e3:8.3f} ms/chunk (compile {comp:5.1f}s)",
              flush=True)
        return per

    measure("baseline (full)")

    orig = de.process_fix, de.add_far_spectrum_fix
    de.process_fix = lambda s, f, ns, q: (s, jnp.asarray(0, I32))
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


def cmd_skeleton():
    """Control-layer floor: stub the whole block path, then peel the
    frame/jitter-buffer machinery piece by piece."""
    import jax
    from webrtc_aecm_tpu import control, core
    from webrtc_aecm_tpu.ops import ring_buffer as rbuf

    step, st16, args = _serving_step()
    print(f"backend={jax.default_backend()} B={B} iters={ITERS}", flush=True)

    def measure(name):
        per, comp = timeit_scan(step, st16, args)
        print(f"{name:44s} {per * 1e3:8.3f} ms/chunk (compile {comp:5.1f}s)",
              flush=True)
        return per

    measure("baseline (full)")

    orig_pb = core.process_block
    core.process_block = lambda s, f, d, c=None, mult=1, opts=None: (s, d)
    measure("skeleton (block stubbed)")

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


def cmd_components():
    """Isolated per-layer timings (see misleading-isolation caveat above)."""
    import jax
    import jax.numpy as jnp
    from webrtc_aecm_tpu import control, core
    from webrtc_aecm_tpu import delay_estimator as de
    from webrtc_aecm_tpu.ops import fft, ring_buffer as rbuf
    from webrtc_aecm_tpu.parallel import batch as pbatch

    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} B={B}")

    blk = jnp.asarray(rng.integers(-3000, 3000, (B, 64)), jnp.int32)
    frame = jnp.asarray(rng.integers(-3000, 3000, (B, 80)), jnp.int32)
    chunk16 = jnp.asarray(rng.integers(-3000, 3000, (B, 160)), jnp.int32)
    sig128 = jnp.asarray(rng.integers(-3000, 3000, (B, 128)), jnp.int32)
    spec = jnp.asarray(rng.integers(0, 4000, (B, 65)), jnp.int32)
    q = jnp.zeros((B,), jnp.int32)
    ms = jnp.full((B,), 40, jnp.int32)

    st16 = pbatch.create_batch(B, 16000)
    step16 = jax.jit(pbatch.make_chunk_step(16000))
    timeit(step16, (st16, chunk16, chunk16, ms),
           name="chunk_step_16k (2 frames)")

    st8 = pbatch.create_batch(B, 8000)
    proc8 = jax.jit(jax.vmap(
        lambda s, d, m: control.process(s, d, None, 80, m, 8000)))
    timeit(proc8, (st8, frame, ms), name="control.process 8k (1 frame)")

    bf8 = jax.jit(jax.vmap(lambda s, f: control.buffer_farend(s, f, 1)))
    timeit(bf8, (st8, frame), name="control.buffer_farend 8k")

    cst = jax.vmap(lambda _: core.create_core(8000))(jnp.arange(B))
    pf = jax.jit(jax.vmap(
        lambda s, f, d: core.process_frame(s, f, d, None, 1)))
    timeit(pf, (cst, frame, frame), name="core.process_frame (<=2 blocks)")

    pb = jax.jit(jax.vmap(
        lambda s, f, d: core.process_block(s, f, d, None, 1)))
    timeit(pb, (cst, blk, blk), name="core.process_block")

    f_fwd = jax.jit(fft.real_forward_fft)
    timeit(f_fwd, (sig128,), name="real_forward_fft")
    re65 = jnp.asarray(rng.integers(-3000, 3000, (B, 65)), jnp.int32)
    f_inv = jax.jit(fft.real_inverse_fft)
    timeit(f_inv, (re65, re65), name="real_inverse_fft")

    t2f = jax.jit(jax.vmap(core.time_to_frequency_domain))
    timeit(t2f, (sig128,), name="time_to_frequency_domain")

    fe = jax.vmap(lambda _: de.create_farend())(jnp.arange(B))
    ne = jax.vmap(lambda _: de.create_near())(jnp.arange(B))
    add_far = jax.jit(jax.vmap(de.add_far_spectrum_fix))
    timeit(add_far, (fe, spec, q), name="de.add_far_spectrum_fix")
    proc_de = jax.jit(jax.vmap(de.process_fix))
    timeit(proc_de, (ne, fe, spec, q), name="de.process_fix")

    ce = jax.jit(jax.vmap(
        lambda s, f, q_, n: core.calc_energies(s, f, q_, n)))
    nsum = jnp.sum(spec, axis=-1).astype(jnp.uint32)
    timeit(ce, (cst, spec, q, nsum), name="core.calc_energies")
    est = spec * 100
    uc = jax.jit(jax.vmap(
        lambda s, f, q_, d, m, e: core.update_channel(s, f, q_, d, m, e)))
    mu = jnp.full((B,), 2, jnp.int32)
    timeit(uc, (cst, spec, q, spec, mu, est), name="core.update_channel")

    cn = jax.jit(jax.vmap(
        lambda s, d, r, i, l: core.comfort_noise(s, d, r, i, l)))
    lam = jnp.full((B, 65), 8000, jnp.int32)
    timeit(cn, (cst, spec, re65, re65, lam), name="core.comfort_noise")

    rb = jax.vmap(lambda _: rbuf.create(4000))(jnp.arange(B))
    w = jax.jit(jax.vmap(rbuf.write))
    timeit(w, (rb, frame), name="rbuf.write (cap 4000, n=80)")
    r = jax.jit(jax.vmap(lambda b: rbuf.read(b, 80)))
    timeit(r, (rb,), name="rbuf.read (cap 4000, n=80)")

    uh = jax.jit(jax.vmap(core.update_far_history))
    timeit(uh, (cst, spec, q), name="core.update_far_history")
    af = jax.jit(jax.vmap(core.aligned_farend))
    dly = jnp.full((B,), 5, jnp.int32)
    timeit(af, (cst, dly), name="core.aligned_farend")


def cmd_fused():
    """Ablate the fused chunk KERNEL by stubbing stages (fused.py).

    Modes (argv[2] or all): full nofft nodelay noalign nohist nochan
    nocng noenerg noop.  Each stubs one stage inside the kernel body and
    reports per-chunk time of a kernel-only scan — the deltas locate
    kernel compute costs the way `ablate` does for the XLA graph.
    Run each mode in a FRESH process (module monkeypatching + jit caches).
    """
    import subprocess
    all_modes = ["full", "nofft", "nodelay", "noalign", "nohist",
                 "nochan", "nocng", "noenerg", "nodiv", "nowhere",
                 "noemit", "noop"]
    modes = [sys.argv[2]] if len(sys.argv) > 2 else all_modes
    if modes[0] == "_run":
        _fused_one(sys.argv[3])
        return
    for m in modes:
        subprocess.run([sys.executable, os.path.abspath(__file__),
                        "fused", "_run", m], check=False)


def _fused_one(mode: str):
    import jax
    import jax.numpy as jnp
    from webrtc_aecm_tpu import fused

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))

    if mode == "nofft":
        fused._real_forward_fft = lambda x128, t: (
            x128[:65] & 0x7FFF, (x128[:65] >> 1) & 0x7FFF)
        fused._real_inverse_fft = lambda re, im, t: (
            jnp.concatenate([re, re[:63]], axis=0), jnp.zeros_like(re[:1]))
    elif mode == "nodelay":
        fused._process_binary_spectrum_f = (
            lambda near, farend, bits:
            (near, jnp.zeros_like(near.last_delay)))
    elif mode == "noalign":
        fused._aligned_farend_deferred = lambda ctx, delay: (
            jnp.zeros((65, ctx["hist"].shape[-1]), jnp.int32) + 1,
            jnp.zeros((1, ctx["hist"].shape[-1]), jnp.int32))
    elif mode == "nohist":
        fused._far_merge_deferred = lambda hist, pending, n_act, rows: hist
    elif mode == "nochan":
        fused._update_channel_f = (
            lambda core, fs, fq, dfa, mu, ee: (core, ee))
    elif mode == "nocng":
        fused._comfort_noise_f = (
            lambda core, dfa, er, ei, lam, cv, sv: (core, er, ei))
    elif mode == "noenerg":
        fused._calc_energies_f = (
            lambda core, fs, fq, ne: (core, core.channel_stored * fs))
    elif mode == "nodiv":
        # Integer divisions have no TPU vector op; stub every SPL division
        # with shifts to measure the whole division budget in the kernel
        # (update_channel's per-bin /(i+1), the Wiener ratio, step size,
        # suppression gain).
        from webrtc_aecm_tpu.ops import spl
        spl.div_trunc = lambda num, den: num.astype(jnp.int32) >> 3
        spl.div_w32_w16 = lambda num, den: num.astype(jnp.int32) >> 3
        spl.div_u32_u16 = (
            lambda num, den: num.astype(jnp.uint32) >> jnp.uint32(3))
    elif mode == "nowhere":
        # Per-slot whole-state activity selects (the _where_tree cost).
        fused._where_tree = lambda mask, new, old: new
    elif mode == "noemit":
        # Frame-output attribution + 80-sample emit machinery.
        fused._emit_frame_f = (
            lambda core, produced, two_blocks, run_mask:
            (core, produced[:80]))
    elif mode == "noop":
        def frames_noop(core, t, far, noisy, clean, phase_all, run,
                        mult, n_frames, has_clean, abs_approx=False,
                        frames_per_chunk=1, far_head=None):
            return (core._replace(tot_count=core.tot_count + 1),
                    far[:n_frames * 80])
        fused.frames_step = frames_noop

    n_frames, n_chunks, mult = 2, 100, 2
    n_slots = fused._n_slots_for(n_frames)
    core_f = fused.create_fused(B, 16000).core
    t = fused.make_tables()
    rng = np.random.default_rng(0)
    mk = lambda r: jnp.asarray(
        rng.integers(-20000, 20000, (r, B)), jnp.int32)
    far_lm, noisy_lm = mk(n_frames * 80), mk(n_frames * 80)
    phase_all = mk(n_slots * 64)
    run_rows = jnp.ones((n_frames, B), bool)

    def scan_kernel(c0):
        def body(c, _):
            c, out = fused._frames_kernel_call(
                c, t, far_lm, noisy_lm, None, phase_all, run_rows,
                mult, n_frames, False, False, 2)
            return c, out[:1]
        return jax.lax.scan(body, c0, None, length=n_chunks)

    f = jax.jit(scan_kernel)
    r = jax.block_until_ready(f(core_f))
    t0 = time.monotonic()
    for _ in range(3):
        r = f(core_f)
    jax.block_until_ready(r)
    per_chunk = (time.monotonic() - t0) / 3 / n_chunks
    print(f"fused kernel [{mode:8s}] per chunk {per_chunk*1e3:7.3f} ms "
          f"-> {B * 0.01 / per_chunk:7.0f} streams@RT", flush=True)


def cmd_driver():
    """Ablate the fused serving DRIVER (the real bench graph): scan
    make_fused_chunk_step over superchunks and stub whole stages — the
    ring pass, the CNG precompute, the chunk kernel — to split the
    per-chunk wall time into kernel / ring / control+glue.

    Modes (argv[2] or all): full noring onepass oldring nocng
    nokernel.  Each runs in a fresh subprocess (monkeypatch + jit cache).
    Env: B (default 1024), RATE (16000), CPS (2), ITERS (50 super-steps).
    """
    import subprocess
    all_modes = ["full", "noring", "onepass", "oldring", "nocng",
                 "nokernel"]
    modes = [sys.argv[2]] if len(sys.argv) > 2 else all_modes
    if modes[0] == "_run":
        _driver_one(sys.argv[3])
        return
    for m in modes:
        subprocess.run([sys.executable, os.path.abspath(__file__),
                        "driver", "_run", m], check=False)


def _driver_one(mode: str):
    import jax
    import jax.numpy as jnp
    from webrtc_aecm_tpu import fused

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    I32 = jnp.int32
    rate = int(os.environ.get("RATE", "16000"))
    cps = int(os.environ.get("CPS", "2"))
    iters = int(os.environ.get("ITERS", "50"))
    chunk = min(160, rate // 100)

    if mode == "noring":
        fused._ring_write_gather_multi = (
            lambda data, wpos, values, nw, rpos, n:
            (data, values.astype(I32)))
    elif mode == "onepass":
        # the round-4 scheme: one fused ring pass PER CHUNK (vs the
        # multi-chunk single pass) — measures the multi-pass win
        def per_chunk(data, wpos, values, nw, rpos, n):
            outs = []
            for c in range(wpos.shape[0]):
                data, g = fused._ring_write_gather(
                    data, wpos[c], values[:, c * n:(c + 1) * n],
                    nw[c], rpos[c], n)
                outs.append(g)
            return data, jnp.concatenate(outs, axis=1)
        fused._ring_write_gather_multi = per_chunk
    elif mode == "oldring":
        # the round-2 scheme: separate per-stream write + gather kernels
        from webrtc_aecm_tpu.ops import pallas_ring as pr

        def separate(data, wpos, values, nw, rpos, n):
            vals16 = values.astype(data.dtype)
            new_data = pr.ring_write_tpu(data, wpos, vals16, nw)
            return new_data, pr.ring_gather_tpu(new_data, rpos, n).astype(I32)

        def per_chunk_sep(data, wpos, values, nw, rpos, n):
            outs = []
            for c in range(wpos.shape[0]):
                data, g = separate(
                    data, wpos[c], values[:, c * n:(c + 1) * n],
                    nw[c], rpos[c], n)
                outs.append(g)
            return data, jnp.concatenate(outs, axis=1)
        fused._ring_write_gather_multi = per_chunk_sep
    elif mode == "nocng":
        # keep shapes, drop the LCG/table work: stub the whole precompute
        fused._precompute_cng_phases = (
            lambda core_f, run_rows, n_frames: (
                jnp.zeros((fused._n_slots_for(n_frames) * 64,
                           core_f.seed.shape[-1]), I32),
                core_f.seed))
    elif mode == "nokernel":
        def kc_stub(core_f, t, far_lm, noisy_lm, clean_lm, cos_all, sin_all,
                    run_rows, mult, n_frames, has_clean, abs_approx,
                    frames_per_chunk=1, far_head=None):
            return (core_f._replace(tot_count=core_f.tot_count + 1),
                    noisy_lm[:n_frames * 80] & 0x7FFF)
        fused._frames_kernel_call = kc_stub

    state = fused.create_fused(B, rate)
    step = fused.make_fused_chunk_step(rate, lane_major_io=True,
                                       chunks_per_step=cps)
    rng = np.random.default_rng(0)
    far = jnp.asarray(rng.integers(-3000, 3000, (B, cps * chunk)), I32)
    noisy = jnp.asarray(rng.integers(-3000, 3000, (cps * chunk, B)), I32)
    ms = jnp.full((cps, B), 40, I32)

    @jax.jit
    def run(c0):
        def body(c, _):
            c, out, _w = step(c, far, noisy, ms)
            return c, out[:1]
        return jax.lax.scan(body, c0, None, length=iters)

    r = jax.block_until_ready(run(state))
    t0 = time.monotonic()
    for _ in range(3):
        r = run(state)
    jax.block_until_ready(r)
    per_chunk = (time.monotonic() - t0) / 3 / iters / cps
    print(f"fused driver [{mode:11s}] per 10ms chunk {per_chunk*1e3:7.3f} ms"
          f" -> {B * 0.01 / per_chunk:7.0f} streams@RT", flush=True)


V5E_HBM_GBPS = 819.0    # v5e peak HBM bandwidth (public spec: 819 GB/s)


def cmd_roofline():
    """HBM roofline for the fused chunk kernel: bytes the kernel must move
    per chunk (state in + state out + audio IO + broadcast tables) divided
    by its measured wall time, as a fraction of v5e peak HBM bandwidth.
    This quantifies how close 'near the bandwidth bound' actually is and
    bounds the remaining headroom of any pure-bandwidth optimization.

    Env: B (default 1024), RATE (16000|8000), CPS (chunks per step)."""
    import jax
    import jax.numpy as jnp
    from webrtc_aecm_tpu import fused

    rate = int(os.environ.get("RATE", "16000"))
    cps = int(os.environ.get("CPS", "1"))
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))

    chunk = min(160, rate // 100)
    fpc = chunk // 80
    n_frames = fpc * cps
    n_slots = fused._n_slots_for(n_frames)
    mult = rate // 8000
    core_f = fused.create_fused(B, rate).core
    t = fused.make_tables()
    rng = np.random.default_rng(0)
    mk = lambda r: jnp.asarray(
        rng.integers(-20000, 20000, (r, B)), jnp.int32)
    far_lm, noisy_lm = mk(n_frames * 80), mk(n_frames * 80)
    phase_all = mk(n_slots * 64)
    run_rows = jnp.ones((n_frames, B), bool)
    n_chunks = 100

    def scan_kernel(c0):
        def body(c, _):
            c, out = fused._frames_kernel_call(
                c, t, far_lm, noisy_lm, None, phase_all, run_rows,
                mult, n_frames, False, False, fpc)
            return c, out[:1]
        return jax.lax.scan(body, c0, None, length=n_chunks)

    f = jax.jit(scan_kernel)
    r = jax.block_until_ready(f(core_f))
    t0 = time.monotonic()
    for _ in range(3):
        r = f(core_f)
    jax.block_until_ready(r)
    per_step = (time.monotonic() - t0) / 3 / n_chunks

    nbytes = lambda tree: sum(
        x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(tree))
    state_b = nbytes(core_f)
    audio_in = nbytes([far_lm, noisy_lm, phase_all]) + run_rows.size * 4
    audio_out = n_frames * 80 * B * 4
    lane_tile = fused._pick_tile(B)
    table_b = nbytes(list(t)) * (B // lane_tile)   # re-read per grid program
    total = 2 * state_b + audio_in + audio_out + table_b
    gbps = total / per_step / 1e9
    print(f"fused kernel roofline @ {rate} Hz, B={B}, cps={cps} "
          f"(n_frames={n_frames}, {n_slots} slots):")
    print(f"  state/stream        {state_b / B:8.0f} B  (in + out)")
    print(f"  bytes/kernel-step   {total / 1e6:8.2f} MB "
          f"(state 2x{state_b / 1e6:.2f}, audio {audio_in / 1e6:.2f}+"
          f"{audio_out / 1e6:.2f}, tables {table_b / 1e6:.2f})")
    print(f"  measured            {per_step * 1e3:8.3f} ms/step "
          f"-> {gbps:6.1f} GB/s = {100 * gbps / V5E_HBM_GBPS:.1f}% of "
          f"v5e peak ({V5E_HBM_GBPS:.0f} GB/s)")
    print(f"  bandwidth-bound floor {total / V5E_HBM_GBPS / 1e6:6.3f} ms "
          f"-> headroom x{per_step * 1e9 * V5E_HBM_GBPS / total:4.2f} "
          f"if HBM-bound")


def main():
    cmds = {"components": cmd_components, "ablate": cmd_ablate,
            "skeleton": cmd_skeleton, "fused": cmd_fused,
            "roofline": cmd_roofline, "driver": cmd_driver}
    which = sys.argv[1] if len(sys.argv) > 1 else "ablate"
    if which not in cmds:
        print(f"usage: python tools/profile.py [{'|'.join(cmds)}]")
        sys.exit(2)
    cmds[which]()


if __name__ == "__main__":
    main()
