"""Trajectory batching utilities for recurrent policies
(reference rsl_rl/utils/utils.py:33-71).

Splits (T, B, ...) rollouts at episode boundaries and zero-pads each
trajectory to the full horizon, with the inverse unpad — the legacy RNN
minibatch path kept for ActorCriticRecurrent (models/recurrent.py).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def split_and_pad_trajectories(tensor: jnp.ndarray, dones: jnp.ndarray):
    """Split at done flags and pad to the horizon length.

    Args:
      tensor: (T, B, ...) rollout data.
      dones: (T, B) booleans.
    Returns:
      padded (T, n_traj, ...) trajectories and a (T, n_traj) validity mask.

    Host-side (numpy) implementation: trajectory counts are data-dependent, so
    this cannot be jitted with static shapes — it serves the (deprecated)
    recurrent training path, reference README.md:41.
    """
    tensor = np.asarray(tensor)
    dones = np.asarray(dones).astype(bool)
    T, B = dones.shape
    trajs = []
    for b in range(B):
        start = 0
        for t in range(T):
            if dones[t, b]:
                trajs.append(tensor[start:t + 1, b])
                start = t + 1
        if start < T:
            trajs.append(tensor[start:, b])
    n = len(trajs)
    trailing = tensor.shape[2:]
    padded = np.zeros((T, n) + trailing, dtype=tensor.dtype)
    mask = np.zeros((T, n), dtype=bool)
    for i, tr in enumerate(trajs):
        padded[: len(tr), i] = tr
        mask[: len(tr), i] = True
    return jnp.asarray(padded), jnp.asarray(mask)


def unpad_trajectories(trajectories, masks):
    """Inverse of split_and_pad_trajectories (reference utils.py:60-71)."""
    trajectories = np.asarray(trajectories)
    masks = np.asarray(masks).astype(bool)
    T, n = masks.shape
    cols = [trajectories[masks[:, i], i] for i in range(n)]
    flat = np.concatenate(cols, axis=0)
    return jnp.asarray(flat)
