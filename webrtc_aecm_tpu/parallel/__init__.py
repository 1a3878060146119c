"""Batch and multi-chip parallelism for AECM stream serving.

The reference is strictly single-stream, single-threaded (ring_buffer.h:11
documents "no thread safety"); its deployment model is "one instance per
call".  The TPU framework makes that axis first-class: per-stream state is a
fixed-shape pytree, so N independent calls are one batched pytree with a
leading stream axis, processed by `vmap`-ed jitted steps and sharded across
chips with `jax.sharding` (SURVEY.md §2 'Parallelism & distributed
communication').  The math has zero inter-stream coupling, so scaling is
collective-free: ICI carries only placement, never allreduce.
"""
from .batch import (
    create_batch,
    set_config_batch,
    buffer_farend_batch,
    process_batch,
    make_chunk_step,
    run_streams,
)
from .sharding import (
    make_mesh,
    stream_sharding,
    shard_streams,
    make_sharded_step,
    fused_state_spec,
    shard_streams_fused,
    make_sharded_step_fused,
)

__all__ = [
    "create_batch", "set_config_batch", "buffer_farend_batch",
    "process_batch", "make_chunk_step", "run_streams",
    "make_mesh", "stream_sharding", "shard_streams", "make_sharded_step",
    "fused_state_spec", "shard_streams_fused", "make_sharded_step_fused",
]
