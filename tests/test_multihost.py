"""Multi-host bring-up: a REAL 2-process ``jax.distributed`` group on CPU.

This executes the path no single-process test can: ``init_distributed``
(parallel/mesh.py — the jax.distributed.initialize/NCCL-init analog,
SURVEY §2.3), a cross-process device mesh, and one sharded decode step with
token parity — each worker holds 2 virtual CPU devices and the pair forms a
4-device global (data=4) mesh. r03 verdict item 5.
"""
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_decode():
    # bounded by the communicate(timeout=540) below (pytest-timeout is not
    # installed in this image)
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # machine-local per-user cache (same rationale as conftest.py: never
    # load foreign-arch CPU executables from the image-baked ~/.cache)
    from conftest import TEST_COMPILE_CACHE_DIR
    env["JAX_COMPILATION_CACHE_DIR"] = TEST_COMPILE_CACHE_DIR
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "multihost_worker.py"),
             str(i), "2", str(port)],
            env=env, cwd=str(REPO), stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert "MULTIHOST_OK" in out, f"worker {i} no OK marker:\n{out}"
