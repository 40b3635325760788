"""Two-process jax.distributed smoke test (round-2 verdict item 4).

Spawns 2 CPU processes (coordinator on localhost) that run
mesh_utils.init_distributed() and one sharded loss+grad step on a global
4-device mesh spanning both processes, then asserts the loss matches a
single-process run of the same mesh. This executes the multi-host (DCN)
code path that virtual-mesh tests cannot: cross-process rendezvous,
global array assembly from process-local shards, and collectives that
cross the process boundary. Reference analog: torchrun + NCCL DDP
(scripts/train.sh:12-16, lab4d/train.py:28-33).
"""

import os
import re
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "distributed_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run(pid, nproc, port):
    env = dict(os.environ)
    # the axon sitecustomize registers the tunneled-TPU PJRT plugin at
    # interpreter start (before worker code runs) whenever these are set;
    # strip them so the workers are pure-CPU processes
    for var in ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE",
                "TPU_NAME", "TPU_WORKER_HOSTNAMES"):
        env.pop(var, None)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.Popen(
        [sys.executable, WORKER, str(pid), str(nproc), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=REPO, env=env,
    )


def _parse(out):
    m = re.search(r"RESULT pid=(\d+) loss=([-\d.]+) gnorm=([-\d.]+)", out)
    assert m, f"no RESULT line in: {out[-2000:]}"
    return float(m.group(2)), float(m.group(3))


@pytest.mark.slow
def test_two_process_loss_matches_single_process():
    port = _free_port()
    procs = [_run(i, 2, port) for i in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, f"worker failed:\n{err[-4000:]}"
        outs.append(out)
    loss0, gnorm0 = _parse(outs[0])
    loss1, gnorm1 = _parse(outs[1])
    # both processes see the same replicated loss
    assert loss0 == pytest.approx(loss1, rel=1e-6)
    assert gnorm0 == pytest.approx(gnorm1, rel=1e-5)

    # single-process reference on the same 4-device mesh
    ref = _run(0, 1, _free_port())
    out, err = ref.communicate(timeout=900)
    assert ref.returncode == 0, f"reference failed:\n{err[-4000:]}"
    loss_ref, gnorm_ref = _parse(out)
    assert loss0 == pytest.approx(loss_ref, rel=1e-5)
    assert gnorm0 == pytest.approx(gnorm_ref, rel=1e-4)
