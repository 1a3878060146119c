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
    """

    def __init__(self, n_streams: int, sample_rate: int = 16000,
                 cng_mode: int = 1, echo_mode: int = 3, mesh=None):
        if sample_rate not in (8000, 16000):
            raise ValueError("sample_rate must be 8000 or 16000")
        self.n_streams = n_streams
        self.sample_rate = sample_rate
        self.chunk = min(160, sample_rate // 100)
        self.mesh = mesh
        self.state = pbatch.create_batch(n_streams, sample_rate,
                                         cng_mode, echo_mode)
        if mesh is not None:
            self.state = psharding.shard_streams(self.state, mesh)
        self._step = {}
        self._run = {}

    # -- config -------------------------------------------------------------
    def set_config(self, cng_mode, echo_mode) -> None:
        self.state = jax.jit(pbatch.set_config_batch)(
            self.state, cng_mode, echo_mode)

    def get_echo_paths(self) -> np.ndarray:
        """(n_streams, 65) stored channels (WebRtcAecm_GetEchoPath, batched)."""
        return np.asarray(
            jax.vmap(control.get_echo_path)(self.state), dtype=np.int16)

    def init_echo_paths(self, echo_paths) -> None:
        """Restore stored channels; echo_paths: (65,) or (n_streams, 65)."""
        ep = jnp.broadcast_to(jnp.asarray(echo_paths, I32),
                              (self.n_streams, 65))
        self.state = jax.jit(jax.vmap(control.init_echo_path))(self.state, ep)

    # -- checkpoint / resume --------------------------------------------------
    def save(self, path: str) -> None:
        """Checkpoint the full serving state (all streams) to an .npz file.

        Generalizes the reference's echo-path snapshot
        (WebRtcAecm_GetEchoPath, echo_control_mobile.cc:481-532): the whole
        fixed-shape state pytree IS the checkpoint — delay histories, NLMS
        channel, noise floor, jitter ring, startup machine, everything.
        """
        leaves, treedef = jax.tree_util.tree_flatten(self.state)
        np.savez_compressed(
            path,
            __meta__=np.array([self.n_streams, self.sample_rate]),
            **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)})

    def load(self, path: str) -> None:
        """Resume from a checkpoint written by save(); shapes must match
        this pipeline's (n_streams, sample_rate)."""
        data = np.load(path)
        n, rate = data["__meta__"]
        if (int(n), int(rate)) != (self.n_streams, self.sample_rate):
            raise ValueError(
                f"checkpoint is for {int(n)} streams @ {int(rate)} Hz, "
                f"pipeline is {self.n_streams} @ {self.sample_rate}")
        leaves, treedef = jax.tree_util.tree_flatten(self.state)
        new_leaves = [jnp.asarray(data[f"leaf_{i}"]).astype(x.dtype)
                      for i, x in enumerate(leaves)]
        state = jax.tree_util.tree_unflatten(treedef, new_leaves)
        if self.mesh is not None:
            state = psharding.shard_streams(state, self.mesh)
        self.state = state

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

        self.state = apply(self.state, fresh, mask_dev)

    # -- serving ------------------------------------------------------------
    def _get_step(self, has_clean: bool):
        if has_clean not in self._step:
            if self.mesh is not None:
                self._step[has_clean] = psharding.make_sharded_step(
                    self.sample_rate, self.mesh, has_clean)
            else:
                self._step[has_clean] = jax.jit(
                    pbatch.make_chunk_step(self.sample_rate, has_clean))
        return self._step[has_clean]

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
        if has_clean not in self._run:
            rate = self.sample_rate
            if has_clean:
                fn = lambda s, f, d, c, m: pbatch.run_streams(
                    s, f, d, rate, m, clean=c)
            else:
                fn = lambda s, f, d, m: pbatch.run_streams(s, f, d, rate, m)
            self._run[has_clean] = jax.jit(fn)
        ms = jnp.asarray(ms_in_sndcard_buf, I32)
        far = jnp.asarray(far, I32)
        near = jnp.asarray(near, I32)
        if has_clean:
            self.state, out = self._run[has_clean](
                self.state, far, near, jnp.asarray(clean, I32), ms)
        else:
            self.state, out = self._run[has_clean](self.state, far, near, ms)
        return out
