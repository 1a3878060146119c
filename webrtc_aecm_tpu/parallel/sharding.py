"""Multi-chip sharding of the stream axis over a device mesh.

AECM streams are mathematically independent (SURVEY.md §2: the reference has
no inter-instance coupling of any kind), so multi-chip scaling is pure data
parallelism over the stream axis: a 1-D `jax.sharding.Mesh`, every state
leaf and every audio tensor sharded on its leading `(n_streams,)` dim with
`NamedSharding(P("streams"))`.  XLA then compiles the batched step with zero
collectives — ICI carries nothing during compute; only host↔device audio
I/O touches the interconnect.

This replaces the reference's (nonexistent) distribution story the TPU way:
no NCCL/MPI analog is needed because the math requires no reduction.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

STREAM_AXIS = "streams"


def make_mesh(devices: Optional[Sequence] = None,
              axis_name: str = STREAM_AXIS) -> Mesh:
    """A 1-D mesh over all (or the given) devices, named for the stream axis."""
    import numpy as np
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def stream_sharding(mesh: Mesh, axis_name: str = STREAM_AXIS
                    ) -> NamedSharding:
    """Shard the leading (stream) axis; everything else replicated."""
    return NamedSharding(mesh, P(axis_name))


def shard_streams(tree, mesh: Mesh, axis_name: str = STREAM_AXIS):
    """Place every leaf of a batched pytree with its stream axis sharded.

    Each leaf of a batched `AecmState` (and each audio tensor) has shape
    (n_streams, ...); n_streams must be divisible by the mesh size.
    """
    sh = stream_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def make_sharded_step(sample_rate: int, mesh: Mesh, has_clean: bool = False,
                      axis_name: str = STREAM_AXIS):
    """Jit the batched 10 ms step sharded over the stream axis.

    Uses `shard_map` (not GSPMD auto-partitioning): each device runs the
    whole step on its local slice of streams — correct by construction for
    an embarrassingly parallel batch, zero collectives, and it keeps the
    Pallas ring kernels valid (a pallas_call inside an auto-partitioned
    jit would be replicated or rejected; under shard_map it simply sees
    the local batch).

    Returns a compiled callable `step(state, far, noisy[, clean], ms)` →
    `(state, out, warn)` whose inputs and outputs are all sharded on the
    stream axis — state stays resident and sharded across chips between
    calls, so the only per-call transfer is the audio frames.
    """
    from .batch import make_chunk_step

    step = make_chunk_step(sample_rate, has_clean)
    spec = P(axis_name)
    n_args = 1 + (3 if has_clean else 2) + 1  # state + audio tensors + ms
    in_specs = tuple([spec] * n_args)  # pytree prefix: shard leading axis
    sharded = jax.shard_map(step, mesh=mesh, in_specs=in_specs,
                            out_specs=(spec, spec, spec), check_vma=False)
    return jax.jit(sharded)


def fused_state_spec(axis_name: str = STREAM_AXIS):
    """shard_map pytree-prefix spec for a FusedState: control leaves are
    batch-leading (B, ...) -> P(streams); core leaves are lane-major
    (rows, B) -> P(None, streams)."""
    from .. import fused
    return fused.FusedState(ctrl=P(axis_name), core=P(None, axis_name))


def shard_streams_fused(fstate, mesh: Mesh, axis_name: str = STREAM_AXIS):
    """Place a FusedState with its stream axis sharded (mixed layouts)."""
    from .. import fused
    ctrl = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P(axis_name))),
        fstate.ctrl)
    core = jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P(None, axis_name))),
        fstate.core)
    return fused.FusedState(ctrl=ctrl, core=core)


def make_sharded_step_fused(sample_rate: int, mesh: Mesh,
                            use_kernel=None, has_clean: bool = False,
                            axis_name: str = STREAM_AXIS):
    """The fused serving step (whole core path as one Pallas kernel per
    device) sharded over the stream axis — the production multi-chip
    configuration.  Same shard_map rationale as make_sharded_step; each
    device runs the fused kernel on its local stream tile.

    Returns `step(fstate, far, noisy[, clean], ms) -> (fstate, out,
    warn)`; audio is batch-leading (B, chunk), state is a FusedState."""
    from .. import fused

    step = fused.make_fused_chunk_step(sample_rate, has_clean=has_clean,
                                       use_kernel=use_kernel)
    spec = P(axis_name)
    st_spec = fused_state_spec(axis_name)
    n_audio = 3 if has_clean else 2
    sharded = jax.shard_map(
        step, mesh=mesh, in_specs=(st_spec,) + (spec,) * (n_audio + 1),
        out_specs=(st_spec, spec, spec), check_vma=False)
    return jax.jit(sharded)
