"""Exhaustive equivalence check for spl.sqrt_floor.

Compares the f32-sqrt + integer-correction implementation against the
reference 16-step successive approximation (the bit-exact oracle semantics,
signal_processing_library.cc:84-105) over EVERY non-negative int32 input,
in chunks, on the ambient backend.  Run once on the TPU and once with
JAX_PLATFORMS forced to cpu (tests/conftest.py style) after any change to
sqrt_floor.

    python tools/verify_sqrt.py            # ambient backend (TPU)
    AECM_CPU=1 python tools/verify_sqrt.py # CPU backend

Prints PASS/FAIL; exits non-zero on mismatch.
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

import jax

if os.environ.get("AECM_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from webrtc_aecm_tpu.ops import spl

I32 = jnp.int32
U32 = jnp.uint32


def sqrt_floor_reference(value):
    """The 16-step successive approximation (bit-for-bit the C loop)."""
    value = value.astype(I32)
    root = jnp.zeros_like(value)
    for n in range(15, -1, -1):
        try1 = root + (1 << n)
        shifted = (try1.astype(U32) << U32(n)).astype(I32)
        take = value >= shifted
        value = jnp.where(take, value - shifted, value)
        root = jnp.where(take, root | (2 << n), root)
    return root >> 1


@jax.jit
def check_chunk(start):
    v = (start + jnp.arange(CHUNK, dtype=U32)).astype(I32)
    return jnp.sum((spl.sqrt_floor(v) != sqrt_floor_reference(v))
                   .astype(I32))


CHUNK = 1 << 24


def main():
    print(f"backend={jax.default_backend()}  chunk={CHUNK}", flush=True)
    t0 = time.monotonic()
    bad = 0
    n_chunks = (1 << 31) // CHUNK
    for i in range(n_chunks):
        bad += int(check_chunk(jnp.asarray(i * CHUNK, U32)))
        if i % 16 == 15:
            print(f"  {i + 1}/{n_chunks} chunks, mismatches={bad}, "
                  f"{time.monotonic() - t0:.0f}s", flush=True)
        if bad:
            break
    # negative inputs: the reference loop returns 0
    neg = jnp.asarray([-1, -2, -32768, -(2 ** 31), -(2 ** 30)], I32)
    bad += int(jnp.sum((spl.sqrt_floor(neg)
                        != sqrt_floor_reference(neg)).astype(I32)))
    ok = bad == 0
    print(f"{'PASS' if ok else 'FAIL'}: {bad} mismatches over all 2^31 "
          f"non-negative inputs + negatives "
          f"({time.monotonic() - t0:.0f}s)", flush=True)
    # Record the run in PARITY.json so the committed tree carries proof
    # that the +/-1 f32-sqrt correction was exhaustively verified on this
    # backend (advisor round-4: the docstring claimed it, nothing proved it).
    import parity_artifact
    parity_artifact.record(
        f"sqrt_floor_exhaustive_{jax.default_backend()}", ok,
        [dict(inputs="all 2^31 non-negative + negatives", mismatches=bad)])
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
