"""Device mesh + sharding helpers (SURVEY §2.5 TPU-native obligations).

The analog of the reference's single-GPU 4096-env batching, scaled across
chips: a 1-D 'data' mesh axis shards the env batch; parameters replicate; XLA
inserts the psum/all-gather collectives over ICI for gradient and statistics
reductions.  Multi-host: each process contributes its local devices to the
same global mesh (jax.distributed), env shards stay host-local, checkpoint
arrays are host-sharded.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(parallel_cfg=None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    axis = getattr(parallel_cfg, "data_axis", "data") if parallel_cfg else "data"
    shape = getattr(parallel_cfg, "mesh_shape", None) if parallel_cfg else None
    if shape is None:
        dev_array = np.asarray(devices)
    else:
        dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (env-batch) dim across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_env_state(mesh: Mesh, state, axis: str = "data"):
    """Place an EnvState pytree: (B, ...) leaves sharded, scalars replicated."""
    n_dev = int(np.prod(mesh.devices.shape))
    data = batch_sharding(mesh, axis)
    rep = replicated(mesh)

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] % n_dev == 0 and x.shape[0] >= n_dev:
            return jax.device_put(x, data)
        return jax.device_put(x, rep)

    return jax.tree.map(place, state)


def shard_params(mesh: Mesh, params):
    return jax.device_put(params, replicated(mesh))
