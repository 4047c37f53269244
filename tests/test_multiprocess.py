"""Multi-PROCESS distributed runtime test (SURVEY.md §2.3, §4.5).

The in-suite 8-virtual-device tests validate SPMD partitioning inside one
process; this test exercises what those cannot: the jax.distributed
coordinator handshake, cross-process collectives (Gloo over loopback —
the CPU stand-in for ICI/DCN), host-0 gating, and global-array placement
from per-process hosts. Two subprocesses with 4 virtual CPU devices each
train cnn-trad-pool2 for two epochs on the same synthetic corpus; SPMD
requires their replicated parameters to agree.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from honk_tpu import data as D

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_training(tmp_path):
    data_dir = str(tmp_path / "sc")
    D.generate_dataset(data_dir, clips_per_word=6, n_speakers=3, noise_seconds=3)

    port = _free_port()
    env = dict(os.environ, PYTHONPATH=REPO)
    env.pop("XLA_FLAGS", None)  # worker sets its own 4-device topology
    procs, outs = [], []
    for pid in range(2):
        out = str(tmp_path / f"result_{pid}.json")
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    os.path.join(REPO, "tests", "mp_worker.py"),
                    str(pid),
                    "2",
                    str(port),
                    data_dir,
                    out,
                ],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    logs = []
    try:
        for p in procs:
            stdout, _ = p.communicate(timeout=900)
            logs.append(stdout)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()  # exact child PIDs only (no pattern kills)
        pytest.fail("two-process training timed out")
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    results = [json.load(open(o)) for o in outs]
    for r in results:
        assert r["n_processes"] == 2 and r["n_devices"] == 8

    # SPMD: one global program -> replicated params must agree bitwise-ish
    # (Gloo all-reduce delivers identical sums to every rank).
    np.testing.assert_allclose(
        results[0]["param_checksum"], results[1]["param_checksum"], rtol=1e-12
    )
    assert results[0]["test_acc"] == results[1]["test_acc"]

    # Host-0 gating: only process 0 logs/prints.
    assert "final test accuracy:" in logs[0]
    assert "final test accuracy:" not in logs[1]


@pytest.mark.slow
def test_distributed_init_on_real_tpu(tmp_path):
    """Slow lane (VERDICT r2 #7): the jax.distributed coordinator + training
    + host-0 checkpoint-write path against the REAL chip topology it will
    meet in production — one process, one TPU, coordinator handshake and
    real device placement. Skips cleanly (worker exit 42) when no TPU is
    reachable (e.g. CI without the tunnel, or the chip is held)."""
    data_dir = str(tmp_path / "sc")
    D.generate_dataset(data_dir, clips_per_word=6, n_speakers=3, noise_seconds=3)

    port = _free_port()
    out = str(tmp_path / "result_tpu.json")
    ckpt = str(tmp_path / "ck")
    env = dict(os.environ, PYTHONPATH=REPO, HONK_MP_PLATFORM="tpu")
    env.pop("XLA_FLAGS", None)
    p = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tests", "mp_worker.py"),
         "0", "1", str(port), data_dir, out, ckpt],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    try:
        log, _ = p.communicate(timeout=900)
    except subprocess.TimeoutExpired:
        p.kill()  # exact child PID only (no pattern kills)
        pytest.fail("TPU worker timed out")
    if p.returncode == 42:
        # On the dev box the TPU is an axon-tunnel PJRT plugin that does
        # not register under a jax.distributed client (verified r3); on a
        # real pod the canonical 'tpu' platform initializes normally.
        pytest.skip("no TPU backend available under jax.distributed here")
    assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    r = json.load(open(out))
    assert r["n_processes"] == 1
    assert r["backend"] != "cpu", r
    assert "TPU" in r["device"], r
    assert "final test accuracy:" in log
    # host-0 checkpoint write landed on disk
    assert os.path.isdir(ckpt) and os.listdir(ckpt), os.listdir(tmp_path)
