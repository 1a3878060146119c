"""Shared writer for the per-round TPU parity-gate artifact.

The two TPU gates (tools/check_tpu_parity.py, tools/check_fused_parity.py)
record their result matrix here so each round's tree carries committed
EVIDENCE that the gates ran green on real hardware (the Mosaic miscompiles
they guard against do not reproduce on the CPU backend).  Each gate merges
its own section into PARITY.json at the repo root:

    {"<gate>": {"ok": true, "configs": [...], "commit": "...",
                "backend": "tpu", "when": "..."}}
"""
import json
import os
import subprocess
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PATH = os.path.join(REPO, "PARITY.json")


def record(gate: str, ok: bool, configs, **extra) -> None:
    try:
        # --dirty so the artifact pins the tree actually tested, not just
        # the last commit (advisor round-4: gates had run on a dirty tree
        # and the artifact silently pointed at the pre-change base).
        commit = subprocess.run(
            ["git", "-C", REPO, "describe", "--always", "--dirty"],
            capture_output=True, text=True).stdout.strip()
    except Exception:
        commit = "unknown"
    try:
        import jax
        backend = jax.default_backend()
    except Exception:
        backend = "unknown"
    data = {}
    if os.path.exists(PATH):
        try:
            with open(PATH) as f:
                data = json.load(f)
        except Exception:
            data = {}
    data[gate] = dict(ok=ok, configs=list(configs), commit=commit,
                      backend=backend,
                      when=time.strftime("%Y-%m-%d %H:%M:%S"), **extra)
    with open(PATH, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"recorded {gate}: ok={ok} -> {PATH}")
