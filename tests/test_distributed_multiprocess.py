"""The multi-host bootstrap actually EXECUTED: two OS processes join one
jax.distributed job over a localhost coordinator, build a global mesh that
spans both, and run a jitted cross-process reduction (the TPU-native
replacement for the reference's `accelerate launch` DDP spawn,
train_finetune_videodiffusion.py:99-102 / SURVEY.md section 5.8).

Runs on the CPU backend — the same controller/coordination path a TPU pod
uses, minus ICI.  Single-process no-op behavior is covered too.
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_init_distributed_noop_single_process(monkeypatch):
    from eeg2video_tpu.parallel.distributed import init_distributed

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES", raising=False)
    assert init_distributed() is False


def test_two_process_psum(tmp_path):
    coordinator = f"localhost:{_free_port()}"
    worker = os.path.join(os.path.dirname(__file__), "_distributed_worker.py")
    repo = os.path.dirname(os.path.dirname(worker))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # no virtual device fan-out: 1 device/process
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=os.path.dirname(os.path.dirname(worker)))
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"WORKER_OK pid={pid} total=12.0" in out, out
