"""Multi-host launch helpers (SURVEY §2.5 (c): per-host env shards on a global
mesh; DCN only at dispatch/logging boundaries).

Each host runs the same program; `init_distributed()` wires jax.distributed,
`global_mesh()` builds one mesh over all hosts' devices with the env batch on
the 'data' axis.  Env state construction stays host-local: every host owns
`B_global / num_hosts` envs; parameters replicate; PPO gradient reductions
ride ICI within hosts and DCN across (inserted by XLA from the shardings).
"""
from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Initialize jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID)."""
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return  # single-host
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=int(num_processes or os.environ.get("JAX_NUM_PROCESSES", 1)),
        process_id=int(process_id or os.environ.get("JAX_PROCESS_ID", 0)),
    )


def global_mesh(axis: str = "data") -> Mesh:
    return Mesh(np.asarray(jax.devices()), (axis,))


def local_env_count(total_envs: int) -> int:
    n = jax.process_count()
    assert total_envs % n == 0, (total_envs, n)
    return total_envs // n


def is_primary() -> bool:
    return jax.process_index() == 0
