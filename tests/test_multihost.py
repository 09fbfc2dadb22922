"""Multi-host bring-up (SURVEY §2.7-1, VERDICT r1 item 5): two real OS
processes form one jax.distributed job over CPU, run the actual trainer with
per-host batch rows, and finish with identical replicated params."""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from test_datasets import _make_kubric_dir  # noqa: E402


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_trainer(tmp_path):
    root = _make_kubric_dir(tmp_path / "data", n_seqs=2, T=10, H=32, W=32, n_traj=32)
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        PALLAS_AXON_POOL_IPS="",
        PYTHONPATH=repo_root + os.pathsep + env.get("PYTHONPATH", ""),
    )
    procs = []
    for pid in range(2):
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, worker,
                    "--coordinator", f"127.0.0.1:{port}",
                    "--num_processes", "2",
                    "--process_id", str(pid),
                    "--data_root", root,
                    "--exp_dir", str(tmp_path / f"exp{pid}"),
                ],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"

    sums = []
    for out in outs:
        m = re.search(r"MULTIHOST_OK process=\d+ checksum=([-\d.]+)", out)
        assert m, out[-4000:]
        sums.append(float(m.group(1)))
    # replicated params identical across hosts
    np.testing.assert_allclose(sums[0], sums[1], rtol=0, atol=1e-9)
