"""Multi-host demonstration (round-3 verdict item #5).

Spawns TWO real processes that coordinate through
parallel/mesh.initialize_distributed over localhost (the same
jax.distributed path a pod slice uses over DCN), form a global 4-device
'data' mesh (2 virtual CPU devices per process), and run one sharded GAN
train step with each process feeding its local half of the global batch
(mesh.shard_batch_across_hosts). The parent asserts both processes
computed identical step metrics — the distributed step IS one global
program, not two diverging local ones.
"""

import json
import pathlib
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # spawns 2 processes, compiles a train step

WORKER = pathlib.Path(__file__).parent / "_multihost_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_mesh_runs_sharded_train_step():
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=900)
        assert p.returncode == 0, (
            f"worker failed rc={p.returncode}\nstdout:{stdout[-2000:]}\n"
            f"stderr:{stderr[-4000:]}"
        )
        lines = [ln for ln in stdout.splitlines() if ln.startswith("METRICS ")]
        assert lines, stdout[-2000:]
        outs.append(json.loads(lines[-1][len("METRICS "):]))

    a, b = sorted(outs, key=lambda o: o["process"])
    assert a["process"] == 0 and b["process"] == 1
    assert a["devices"] == b["devices"] == 4
    for key in a:
        if key == "process":
            continue
        assert a[key] == pytest.approx(b[key], rel=1e-6), (
            f"metric {key} diverged across processes: {a[key]} vs {b[key]}"
        )
