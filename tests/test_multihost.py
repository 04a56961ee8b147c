"""Multi-host execution artifact: 2-process jax.distributed dryrun.

parallel/mesh.py claims "the same code runs under jax.distributed with
a global mesh; each host feeds its addressable shard" — this test
executes that claim: two OS processes, gloo collectives, a global
8-device mesh, per-process shard feeding, per-process output-shard
equality against an unsharded reference (tools/multihost_dryrun.py).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

_TOOLS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools")
TOOL = os.path.join(_TOOLS, "multihost_dryrun.py")
STREAM_TOOL = os.path.join(_TOOLS, "multihost_stream.py")


@pytest.mark.slow
def test_two_process_distributed_dryrun():
    out = subprocess.run(
        [sys.executable, TOOL], capture_output=True, text=True,
        timeout=420,
        env={**os.environ, "XLA_FLAGS": ""},  # tool sets its own count
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "rank 0: OK" in out.stdout
    assert "rank 1: OK" in out.stdout
    assert "PASS" in out.stdout


@pytest.mark.slow
def test_two_process_streamed_banded_run():
    """File-to-file multi-host story: two jax.distributed processes
    each stream_run their own latitude band; rank 0 merges the band
    files and asserts BYTE-equality (every dataset + attrs) against a
    single-process run, including the staged rank/return derivation
    from the merged tables (tools/multihost_stream.py)."""
    out = subprocess.run(
        [sys.executable, STREAM_TOOL], capture_output=True, text=True,
        timeout=900,
        env={**os.environ, "XLA_FLAGS": ""},  # tool sets its own count
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "rank 0: OK" in out.stdout
    assert "PASS" in out.stdout


def test_make_cell_array_single_process():
    """Single-process degenerate case of the addressable-shard feeder."""
    import jax

    from xmhw_tpu.parallel.mesh import cell_mesh, make_cell_array

    mesh = cell_mesh()
    full = np.arange(5 * 16, dtype=np.float32).reshape(5, 16)
    arr = make_cell_array(mesh, (5, 16), lambda idx: full[idx])
    np.testing.assert_array_equal(np.asarray(arr), full)
    assert len(arr.addressable_shards) == len(jax.devices())
