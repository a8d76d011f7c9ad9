"""Multi-host training wiring: 2 CPU processes x 2 virtual devices run one
global train step through the real Trainer (jax.distributed + gloo
collectives + per-host loader sharding + make_array_from_process_local_data).

TPU-native replacement for the reference's accelerate multi-node launch
(train.sh:1); SURVEY.md §2.4 multi-node row.
"""

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


@pytest.mark.slow
def test_two_process_train_step(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "multihost_worker.py")
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)   # sitecustomize would pin the TPU
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = repo
    port = str(_free_port())

    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), port, str(tmp_path)],
        env=env, cwd=repo, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in (0, 1)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"MH_OK step=1 pid={pid}" in out, out[-3000:]
    # process 0 logged a finite loss
    assert "loss=None" not in outs[0]
