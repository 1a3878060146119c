"""Exercise the driver's graft entry points exactly as the driver does.

The round-1 driver harness failed dryrun_multichip because the entry
trusted the ambient backend (MULTICHIP_r01.json); these tests pin the
contract: entry() compiles and runs, and dryrun_multichip(8) provisions
its own 8-virtual-CPU mesh and completes regardless of ambient state.
"""
import os
import subprocess
import sys

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    state, out, warn = jax.jit(fn)(*args)
    jax.block_until_ready((state, out, warn))
    assert out.shape == args[1].shape  # (n_streams, chunk)


def test_dryrun_multichip_in_process():
    # Under the test conftest the backend is already 8-virtual-CPU, so this
    # exercises the in-process path.
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_dryrun_multichip_from_latched_backend():
    """Even when the calling process latched an unusable backend (here: a
    1-device CPU), dryrun_multichip must still succeed via re-exec."""
    script = (
        "import sys; sys.path.insert(0, {repo!r})\n"
        "import os\n"
        "os.environ['XLA_FLAGS'] = ''\n"
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) == 1\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
        "print('subprocess-dryrun-ok')\n"
    ).format(repo=REPO)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    r = subprocess.run([sys.executable, "-c", script], env=env,
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-4000:]
    assert "subprocess-dryrun-ok" in r.stdout
