"""Multi-process scaling efficiency WITHOUT the intra-op confound.

The virtual-mesh scaling number (bench.py `mesh_sharding_overhead`) is an
honest *lower bound*: its 1-device baseline keeps XLA:CPU intra-op
parallelism across all host cores while the 8 virtual devices time-slice the
same silicon.  This bench removes that confound the way VERDICT r3 asked:
each `jax.distributed` process is pinned to its own disjoint core set
(taskset), so the 1-process baseline and the N-process run get exactly
1/N-th and N/N-ths of the machine respectively — the measured ratio is then
sharding + collective overhead only, the quantity that transfers to real
multi-chip hardware where every shard owns its own silicon.

  baseline: 1 process x 1 device, pinned to core 0,   E envs  -> fps_1
  scaled:   N processes x 1 device, cores 0..N-1,     E envs  -> fps_N
  efficiency = fps_N / (N * fps_1)        (1.0 = perfect strong scaling)

Run: python -m legged_gym_custom_tpu.scripts.bench_multiprocess
         [--procs 2] [--total_envs 64] [--iters 3]
Emits one JSON line.
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import socket
import subprocess
import sys
import tempfile


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run(n_procs: int, total_envs: int, iters: int, warmup: int,
         timeout: int = 1800):
    port = _free_port()
    env = dict(os.environ)
    env.update(
        LGC_FORCE_PLATFORM="cpu",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=(
            env.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=1"
        ).strip(),
    )
    tmp = tempfile.mkdtemp(prefix="lgc_mp_bench_")
    result_json = os.path.join(tmp, "result.json")
    have_taskset = shutil.which("taskset") is not None
    procs = []
    try:
        for pid in range(n_procs):
            cmd = []
            if have_taskset:
                cmd += ["taskset", "-c", str(pid % (os.cpu_count() or 1))]
            cmd += [
                sys.executable, "-m",
                "legged_gym_custom_tpu.scripts.multihost_worker",
                "--coordinator", f"127.0.0.1:{port}",
                "--num_processes", str(n_procs),
                "--process_id", str(pid),
                "--task", "go2",
                "--num_envs", str(total_envs),
                "--iterations", str(iters),
                "--warmup", str(warmup),
                "--result_json", result_json,
            ]
            procs.append(subprocess.Popen(
                cmd, env=env, stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT, text=True,
            ))
        outs = [p.communicate(timeout=timeout)[0] for p in procs]
        for pid, (p, out) in enumerate(zip(procs, outs)):
            if p.returncode != 0:
                raise RuntimeError(
                    f"bench process {pid}/{n_procs} failed:\n{out[-2000:]}"
                )
        with open(result_json) as f:
            return json.load(f)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        shutil.rmtree(tmp, ignore_errors=True)


def run_bench(procs: int = 2, total_envs: int = 64, iters: int = 3,
              warmup: int = 1):
    r1 = _run(1, total_envs, iters, warmup)
    rn = _run(procs, total_envs, iters, warmup)
    eff = rn["fps"] / (procs * r1["fps"])
    # Sync-only isolation: a 1-process run with the PER-PROCESS env share on
    # one pinned core does exactly the work each scaled process does, minus
    # the cross-process collectives and barriers.  fps_N / (N * fps_half) =
    # dt_half / dt_N is therefore the collective+sync overhead alone — free
    # of the strong-scaling cache/bandwidth confounds that dominate the
    # plain ratio on a single machine (a 256-env XLA:CPU step on one core is
    # more than 2x a 128-env step: working-set effects).
    r_half = _run(1, max(total_envs // procs, 1), iters, warmup)
    sync_eff = rn["fps"] / (procs * r_half["fps"])
    return {
        "procs": procs,
        "total_envs": total_envs,
        "fps_1proc_1core": r1["fps"],
        f"fps_{procs}proc_{procs}core": rn["fps"],
        "efficiency": round(eff, 4),
        "fps_1proc_half_batch": r_half["fps"],
        "sync_only_efficiency": round(sync_eff, 4),
        # phase split (last iteration): where the scaling loss lives —
        # collection (env scan, per-step scalar collectives) vs learning
        # (minibatched update, full-gradient pmean per minibatch)
        "collection_s_1proc": r1.get("collection_s"),
        "learning_s_1proc": r1.get("learning_s"),
        "collection_s_1proc_half": r_half.get("collection_s"),
        "learning_s_1proc_half": r_half.get("learning_s"),
        f"collection_s_{procs}proc": rn.get("collection_s"),
        f"learning_s_{procs}proc": rn.get("learning_s"),
        "taskset": shutil.which("taskset") is not None,
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--total_envs", type=int, default=64)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--warmup", type=int, default=1)
    args = ap.parse_args()
    print(json.dumps(run_bench(args.procs, args.total_envs, args.iters,
                               args.warmup)))
