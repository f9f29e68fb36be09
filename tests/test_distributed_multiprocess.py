"""Multi-process distributed smoke (VERDICT r3 #7): 2 processes x 4 virtual
CPU devices through `parallel.distributed.initialize` + one sharded train
step + `gather_object` — the multi-host path `tools/dist_train.sh` promises
(reference `tools/dist_train.sh:12-33`). Each child runs
tests/_distributed_child.py; both must print "child ok <same loss>".
"""
from __future__ import annotations

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_cpu_distributed():
    child = os.path.join(os.path.dirname(__file__), "_distributed_child.py")
    coord = f"127.0.0.1:{_free_port()}"
    nprocs = 2
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "").replace(
            "--xla_force_host_platform_device_count=8", "").strip()
        + " --xla_force_host_platform_device_count=4"
    ).strip()
    # don't inherit a compilation cache: AOT entries are machine-keyed and
    # cross-process races on one dir add noise, not speed, for this smoke
    env["JAX_COMPILATION_CACHE_DIR"] = ""

    procs = [
        subprocess.Popen(
            [sys.executable, child, str(i), str(nprocs), coord],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(nprocs)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"child {i} rc={p.returncode}:\n{out[-3000:]}"
        assert "child ok" in out, f"child {i} output:\n{out[-3000:]}"
    # both processes computed the SAME global loss (one synchronized step)
    loss_vals = [
        line.split()[-1]
        for o in outs for line in o.splitlines() if line.startswith("child ok")
    ]
    assert len(set(loss_vals)) == 1, loss_vals
