"""Multi-host DCN path: 2-process CPU smoke test (SURVEY.md §2.3).

Two OS processes run the real CLI entry (`cli recover --shard
--coordinator localhost:<port>`), jax.distributed wires them over the
Gloo CPU backend, and the 'rays' mesh axis spans both processes'
devices — the same SPMD program that rides ICI/DCN on a pod.  Proves
init_distributed + the sharded recovery step execute cross-process, and
that the psum'd parameters come back identical on every process.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_recover(tmp_path):
    from PIL import Image

    target = tmp_path / "target.png"
    Image.fromarray(
        np.full((16, 16, 3), 128, np.uint8), mode="RGB"
    ).save(target)

    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    procs = []
    for pid in range(2):
        cmd = [
            sys.executable, "-m", "inverse_path_tracer_tpu.cli", "recover",
            "/root/reference/scenes/0.txt", str(target),
            "--cpu", "--shard",
            "--coordinator", f"localhost:{port}",
            "--num-processes", "2", "--process-id", str(pid),
            "--steps", "2", "--lr", "0.1",
            "--width", "16", "--height", "16", "--spp", "4",
            "--bounces", "2", "--tile", "64",
            "--out", str(tmp_path / f"out{pid}.npy"),
        ]
        procs.append(
            subprocess.Popen(
                cmd, env=env, cwd=str(tmp_path),
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
        )
    outs = [p.communicate(timeout=280)[0].decode() for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
    # Both processes saw the 2-device global mesh...
    for out in outs:
        assert "'process_count': 2" in out
        assert "'global_devices': 2" in out
    # ...and the replicated (psum'd) recovered materials agree exactly.
    a = np.load(tmp_path / "out0.npy")
    b = np.load(tmp_path / "out1.npy")
    np.testing.assert_array_equal(a, b)
    assert a.shape == (30, 3)
