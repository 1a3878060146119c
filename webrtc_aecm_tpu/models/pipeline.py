"""AecmPipeline: the flagship batched streaming echo-cancellation model.

One object owns N concurrent AECM streams (the reference's "N instances",
echo_control_mobile.cc:89-99, as one sharded pytree) and exposes the two
serving shapes:

  * `step(far, near[, clean], ms)` — one 10 ms real-time step for all
    streams (jitted once; state lives on device, sharded over the mesh).
  * `run(far, near[, clean], ms)` — whole-signal offline processing via a
    single `lax.scan` (one device dispatch for the entire call).

Per-stream output is bit-exact with the single-stream API (and hence with
the C reference) by construction: both are `vmap`s of the same functional
step.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import control
from .. import fused as fused_mod
from ..parallel import batch as pbatch
from ..parallel import sharding as psharding

I32 = jnp.int32


class AecmPipeline:
    """Batched AECM serving pipeline.

    Args:
      n_streams: number of concurrent independent streams.
      sample_rate: 8000 or 16000 (static; selects frame layout + priors).
      cng_mode / echo_mode: runtime config, per AecmConfig
        (echo_control_mobile.h:32-35); scalars apply to all streams.
      mesh: optional `jax.sharding.Mesh`; when given, state and audio are
        sharded on the stream axis across its devices (n_streams must be
        divisible by the mesh size).
      engine: "fused" (the lane-major single-kernel serving path,
        webrtc_aecm_tpu/fused.py), "xla" (the vmapped reference path), or
        "auto" (fused on TPU, xla elsewhere).  Both engines are bit-exact
        with each other and the C reference — including dual-input
        (clean) serving, which the fused engine runs in the same kernel.
    """

    def __init__(self, n_streams: int, sample_rate: int = 16000,
                 cng_mode: int = 1, echo_mode: int = 3, mesh=None,
                 engine: str = "auto"):
        if sample_rate not in (8000, 16000):
            raise ValueError("sample_rate must be 8000 or 16000")
        if engine == "auto":
            engine = "fused" if jax.default_backend() == "tpu" else "xla"
        if engine not in ("fused", "xla"):
            raise ValueError("engine must be 'fused', 'xla', or 'auto'")
        self.n_streams = n_streams
        self.sample_rate = sample_rate
        self.chunk = min(160, sample_rate // 100)
        self.mesh = mesh
        self.engine = engine
        self._set_canonical(pbatch.create_batch(n_streams, sample_rate,
                                                cng_mode, echo_mode))
        self._step = {}
        self._run = {}

    # -- engine layout adapters ---------------------------------------------
    def _canonical(self):
        """The batch-leading AecmState view of the current state."""
        if self.engine == "fused":
            return fused_mod.from_fused_state(self.state)
        return self.state

    def _set_canonical(self, state) -> None:
        if self.engine == "fused":
            fstate = fused_mod.to_fused_state(state)
            if self.mesh is not None:
                fstate = psharding.shard_streams_fused(fstate, self.mesh)
            self.state = fstate
        else:
            if self.mesh is not None:
                state = psharding.shard_streams(state, self.mesh)
            self.state = state

    # -- config -------------------------------------------------------------
    def set_config(self, cng_mode, echo_mode) -> None:
        self._set_canonical(jax.jit(pbatch.set_config_batch)(
            self._canonical(), cng_mode, echo_mode))

    def get_echo_paths(self) -> np.ndarray:
        """(n_streams, 65) stored channels (WebRtcAecm_GetEchoPath, batched)."""
        return np.asarray(
            jax.vmap(control.get_echo_path)(self._canonical()),
            dtype=np.int16)

    def init_echo_paths(self, echo_paths) -> None:
        """Restore stored channels; echo_paths: (65,) or (n_streams, 65)."""
        ep = jnp.broadcast_to(jnp.asarray(echo_paths, I32),
                              (self.n_streams, 65))
        self._set_canonical(jax.jit(jax.vmap(control.init_echo_path))(
            self._canonical(), ep))

    # -- checkpoint / resume --------------------------------------------------
    def save(self, path: str) -> None:
        """Checkpoint the full serving state (all streams) to an .npz file.

        Generalizes the reference's echo-path snapshot
        (WebRtcAecm_GetEchoPath, echo_control_mobile.cc:481-532): the whole
        fixed-shape state pytree IS the checkpoint — delay histories, NLMS
        channel, noise floor, jitter ring, startup machine, everything.
        """
        flat, _ = jax.tree_util.tree_flatten_with_path(self._canonical())
        np.savez_compressed(
            path,
            __meta__=np.array([2, self.n_streams, self.sample_rate]),
            **{"s" + jax.tree_util.keystr(kp): np.asarray(x)
               for kp, x in flat})

    def load(self, path: str) -> None:
        """Resume from a checkpoint written by save(); shapes must match
        this pipeline's (n_streams, sample_rate)."""
        data = np.load(path)
        meta = data["__meta__"]
        if len(meta) != 3 or int(meta[0]) != 2:
            raise ValueError(
                "unrecognized checkpoint format (expected version-2 named "
                "leaves; positional version-1 checkpoints predate the "
                "current state layout and cannot be resumed)")
        _, n, rate = (int(v) for v in meta)
        if (n, rate) != (self.n_streams, self.sample_rate):
            raise ValueError(
                f"checkpoint is for {n} streams @ {rate} Hz, "
                f"pipeline is {self.n_streams} @ {self.sample_rate}")
        canonical = self._canonical()
        flat, treedef = jax.tree_util.tree_flatten_with_path(canonical)
        missing = ["s" + jax.tree_util.keystr(kp) for kp, _ in flat
                   if "s" + jax.tree_util.keystr(kp) not in data]
        if missing:
            raise ValueError(
                "checkpoint is missing state leaves (older state "
                f"layout?): {missing[:5]}")
        new_leaves = [
            jnp.asarray(data["s" + jax.tree_util.keystr(kp)]).astype(
                x.dtype)
            for kp, x in flat]
        self._set_canonical(
            jax.tree_util.tree_unflatten(treedef, new_leaves))

    def reset_streams(self, indices) -> None:
        """Re-Init selected streams in place (a caller hung up / a new call
        took the slot) without touching the other streams' state.

        Equivalent to WebRtcAecm_Init on those slots
        (echo_control_mobile.cc:142-191); the default config
        {cngMode=on, echoMode=3} is restored for them.
        """
        mask = np.zeros((self.n_streams,), bool)
        mask[np.asarray(indices)] = True
        mask_dev = jnp.asarray(mask)
        fresh = pbatch.create_batch(self.n_streams, self.sample_rate)

        @jax.jit
        def apply(cur, new, m):
            def sel(a, b):
                mm = m.reshape((self.n_streams,) + (1,) * (a.ndim - 1))
                return jnp.where(mm, a, b)
            return jax.tree_util.tree_map(sel, new, cur)

        self._set_canonical(apply(self._canonical(), fresh, mask_dev))

    # -- serving ------------------------------------------------------------
    def _get_step(self, has_clean: bool):
        key = (has_clean, self.engine)
        if key not in self._step:
            if self.engine == "fused":
                if self.mesh is not None:
                    self._step[key] = psharding.make_sharded_step_fused(
                        self.sample_rate, self.mesh, has_clean=has_clean)
                else:
                    self._step[key] = jax.jit(
                        fused_mod.make_fused_chunk_step(
                            self.sample_rate, has_clean=has_clean))
            elif self.mesh is not None:
                self._step[key] = psharding.make_sharded_step(
                    self.sample_rate, self.mesh, has_clean)
            else:
                self._step[key] = jax.jit(
                    pbatch.make_chunk_step(self.sample_rate, has_clean))
        return self._step[key]

    def step(self, far, near, clean=None, ms_in_sndcard_buf=40):
        """One 10 ms step: far/near (n_streams, chunk) → out (n_streams, chunk).

        Equivalent to BufferFarend + Process per stream
        (main.cc:124-141 demo loop, batched).
        """
        ms = jnp.broadcast_to(jnp.asarray(ms_in_sndcard_buf, I32),
                              (self.n_streams,))
        far = jnp.asarray(far, I32)
        near = jnp.asarray(near, I32)
        fn = self._get_step(clean is not None)
        if clean is not None:
            self.state, out, warn = fn(self.state, far, near,
                                       jnp.asarray(clean, I32), ms)
        else:
            self.state, out, warn = fn(self.state, far, near, ms)
        return out, warn

    def run(self, far, near, clean=None, ms_in_sndcard_buf=40):
        """Whole-signal processing: (n_streams, n_samples) → same shape.

        One jitted `lax.scan` over 10 ms chunks; trailing samples beyond a
        whole chunk are ignored (the reference demo does the same,
        main.cc:121-123).
        """
        has_clean = clean is not None
        rate = self.sample_rate
        ms = jnp.asarray(ms_in_sndcard_buf, I32)
        far = jnp.asarray(far, I32)
        near = jnp.asarray(near, I32)

        if self.engine == "fused":
            n_chunks = near.shape[-1] // self.chunk
            ms2 = self._normalize_ms(ms, n_chunks)
            key = ("fused", has_clean, self.mesh is not None)
            if key not in self._run:
                if has_clean:
                    run_fn = lambda s, f, d, c, m: \
                        fused_mod.run_streams_fused(s, f, d, rate, m,
                                                    clean=c)
                else:
                    run_fn = lambda s, f, d, m: \
                        fused_mod.run_streams_fused(s, f, d, rate, m)
                if self.mesh is not None:
                    from jax.sharding import PartitionSpec as P
                    st_spec = psharding.fused_state_spec()
                    sp = P(psharding.STREAM_AXIS)
                    audio_specs = (sp, sp, sp) if has_clean else (sp, sp)
                    run_fn = jax.shard_map(
                        run_fn,
                        mesh=self.mesh,
                        in_specs=(st_spec,) + audio_specs
                        + (P(None, psharding.STREAM_AXIS),),
                        out_specs=(st_spec, sp),
                        check_vma=False)
                self._run[key] = jax.jit(run_fn)
            if has_clean:
                self.state, out = self._run[key](
                    self.state, far, near, jnp.asarray(clean, I32), ms2)
            else:
                self.state, out = self._run[key](self.state, far, near,
                                                 ms2)
            return out

        if has_clean not in self._run:
            if has_clean:
                fn = lambda s, f, d, c, m: pbatch.run_streams(
                    s, f, d, rate, m, clean=c)
            else:
                fn = lambda s, f, d, m: pbatch.run_streams(s, f, d, rate, m)
            self._run[has_clean] = jax.jit(fn)

        if has_clean:
            self.state, out = self._run[has_clean](
                self.state, far, near, jnp.asarray(clean, I32), ms)
        else:
            self.state, out = self._run[has_clean](self.state, far, near, ms)
        return out

    def _normalize_ms(self, ms, n_chunks: int):
        """Broadcast any accepted ms form to (n_chunks, n_streams) so the
        sharded fused run uses one fixed PartitionSpec."""
        ms = jnp.asarray(ms, I32)
        if ms.ndim == 0 or (ms.ndim == 1 and ms.shape[0] == self.n_streams):
            return jnp.broadcast_to(ms, (n_chunks, self.n_streams))
        if ms.ndim == 1:
            return jnp.broadcast_to(ms[:, None], (n_chunks, self.n_streams))
        return ms
