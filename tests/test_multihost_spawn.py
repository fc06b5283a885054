"""A REAL 2-process jax.distributed run on localhost: two worker
processes join a coordinator, form one global 8-device mesh (4 virtual
CPU devices each), feed host-local landmark shards, and the distributed
vision BA must reproduce the single-device solve bit-closely in both.

This exercises the actual DCN code path (coordinator handshake, global
mesh spanning processes, make_array_from_process_local_data feeding,
cross-process psum) that the single-process tests cannot
(SURVEY.md §2.3 distributed-communication row)."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_ba():
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "multihost_worker.py")
    env = {
        k: v
        for k, v in os.environ.items()
        # scrub the axon (remote-TPU tunnel) plugin and any stale
        # distributed config from the children
        if "axon" not in v.lower() or k in ("PATH", "HOME")
    }
    env.pop("PYTHONPATH", None)
    env["PYTHONPATH"] = repo
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=840)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert "MULTIHOST_OK" in out, f"worker {pid} output:\n{out[-4000:]}"
