"""Driver-artifact regression tests for __graft_entry__.

Round-1's MULTICHIP artifact failed because dryrun_multichip let whatever
backend initialized first (the real TPU via the axon tunnel) win, instead of
forcing the virtual CPU mesh. These tests run the entry points the way the
driver does.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_subprocess_forces_cpu_mesh():
    """Exactly the driver's invocation: fresh process, no JAX_PLATFORMS,
    no XLA_FLAGS — dryrun_multichip must force the 8-device CPU mesh itself."""
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8); print('OK')"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=560)
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "OK" in proc.stdout


def test_dryrun_multichip_inprocess():
    """In-process (conftest already initialized the 8-device CPU backend):
    the RuntimeError from the late config update must be swallowed and the
    explicit cpu-device mesh used."""
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as g
        g.dryrun_multichip(4)
    finally:
        sys.path.remove(REPO)


def test_entry_compiles():
    import jax

    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as g
        fn, args = g.entry()
        fb, zb = jax.jit(fn)(*args)
        jax.block_until_ready((fb, zb))
        assert fb.shape == (4, 256, 256)
    finally:
        sys.path.remove(REPO)
