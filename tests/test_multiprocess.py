"""Real multi-process (DCN-path) training: N `jax.distributed` processes.

VERDICT r3 missing #4 / SURVEY §4: the multi-host launch path
(parallel/multihost.py + scripts/multihost_worker.py) exercised as actual
separate OS processes — a coordinator and a worker — each contributing local
CPU devices to one global mesh, running sharded training iterations with
cross-process gloo all-reduces, and collectively writing + restoring an orbax
checkpoint.  This is the closest a single machine gets to the DCN path; the
same worker binary is the real multi-host entry point.
"""
import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_training_and_checkpoint(tmp_path):
    port = _free_port()
    n_proc, dev_per_proc = 2, 2
    result_json = tmp_path / "result.json"
    ckpt_dir = tmp_path / "ckpt"
    ckpt_dir.mkdir()

    env = dict(os.environ)
    env.update(
        LGC_FORCE_PLATFORM="cpu",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=(
            env.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={dev_per_proc}"
        ).strip(),
    )

    procs = []
    for pid in range(n_proc):
        cmd = [
            sys.executable, "-m",
            "legged_gym_custom_tpu.scripts.multihost_worker",
            "--coordinator", f"127.0.0.1:{port}",
            "--num_processes", str(n_proc),
            "--process_id", str(pid),
            "--task", "go2",
            "--num_envs", "16",
            "--iterations", "2",
            "--ckpt_dir", str(ckpt_dir),
            "--result_json", str(result_json),
        ]
        procs.append(
            subprocess.Popen(
                cmd, env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )

    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"

    assert result_json.exists(), outs[0][-4000:]
    result = json.loads(result_json.read_text())
    assert result["process_count"] == n_proc
    assert result["global_devices"] == n_proc * dev_per_proc
    assert result["local_devices"] == dev_per_proc
    # training ran: finite loss from a real sharded update
    import math

    assert math.isfinite(result["value_loss"])
    # collective checkpoint round-trip restored the true iteration counter
    assert result["restored_iteration"] == 2
    assert (ckpt_dir / "multihost_model.ckpt").exists()
