"""Multi-host (2-process) mesh training equals single-process.

The TPU-native replacement for the reference's ``torchrun
--nproc_per_node=8`` + DDP launch (``model_train/README.md:10-13``): two
OS processes, each with 2 CPU devices, initialize ``jax.distributed``
through ``parallel.distributed.maybe_initialize_distributed``, load
per-process batch slices through the production ``DataLoader``, assemble
global arrays with ``mesh.shard_batch``, and run DP train steps.  Losses
must match a single-process run of the identical computation bit-for-bit
(same reduction tree: 4-device mesh either way).
"""

import pathlib
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = pathlib.Path(__file__).resolve().parent / "multihost_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_losses_match_single(tmp_path):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    outs = [tmp_path / f"w{i}.txt" for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(i), "2", coord, str(outs[i])],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(out)
    assert all(p.returncode == 0 for p in procs), "\n".join(logs)[-4000:]

    losses = [np.asarray([float(x) for x in o.read_text().split()])
              for o in outs]
    # Both processes see the same (global) loss.
    np.testing.assert_allclose(losses[0], losses[1], rtol=0, atol=0)

    # Single-process reference run (also 4 devices -> same reduction tree).
    ref_out = tmp_path / "single.txt"
    p = subprocess.run(
        [sys.executable, str(WORKER), "0", "1", "unused", str(ref_out)],
        capture_output=True, text=True, timeout=900)
    assert p.returncode == 0, p.stdout + p.stderr
    ref = np.asarray([float(x) for x in ref_out.read_text().split()])
    np.testing.assert_allclose(losses[0], ref, rtol=0, atol=1e-6)
