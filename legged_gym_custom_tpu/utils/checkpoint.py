"""Orbax-backed checkpointing for training state.

The reference pickles a single-state dict per checkpoint
(rsl_rl/runners/on_policy_runner.py:283-297) and loses the adaptation /
estimator optimizer states.  Here a checkpoint is a *directory*:

    model_<it>.ckpt/
        state/      # orbax PyTree checkpoint (multi-host sharded-array safe)
        meta.json   # scalars: iteration, learning rate, total updates, infos

Orbax writes sharded `jax.Array`s cooperatively from every host (each process
persists only its addressable shards), which is what the multi-host mesh path
(parallel/multihost.py) needs; the pickle format stays supported for loading
old checkpoints (runner.load auto-detects file vs directory).
"""
from __future__ import annotations

import json
import os

import jax
import numpy as np

try:  # orbax is baked into the image, but keep the fallback explicit
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


def have_orbax() -> bool:
    return _HAVE_ORBAX


def save_checkpoint(path: str, arrays, metadata: dict) -> None:
    """Save an array pytree + JSON-serializable metadata under `path`."""
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    ckptr = ocp.PyTreeCheckpointer()
    state_dir = os.path.join(path, "state")
    ckptr.save(state_dir, arrays, force=True)
    if jax.process_index() == 0:
        with open(os.path.join(path, "meta.json"), "w") as f:
            # `default=str` keeps non-JSON infos (arrays, custom objects — the
            # reference's torch.save accepted anything) from aborting the save
            # after the state directory has already been written.
            json.dump(metadata, f, default=str)


def load_checkpoint(path: str, target=None):
    """Restore (arrays, metadata) written by `save_checkpoint`.

    `target`: optional pytree with the desired structure (e.g. optax
    NamedTuple optimizer states) — orbax otherwise returns plain nested
    dicts, which would not round-trip into the TrainState.  When the target
    leaves are (possibly sharded) `jax.Array`s, restore_args are constructed
    from their shardings so orbax re-shards onto the *current* mesh instead
    of materializing host-local numpy copies (which raises for
    non-addressable arrays on a multi-host mesh).
    """
    if not _HAVE_ORBAX:
        raise RuntimeError(
            f"orbax is required to load directory checkpoints: {path}"
        )
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    state_dir = os.path.join(path, "state")
    if target is not None:
        restore_args = ocp.checkpoint_utils.construct_restore_args(target)
        arrays = ckptr.restore(state_dir, item=target, restore_args=restore_args)
    else:
        arrays = jax.tree.map(np.asarray, ckptr.restore(state_dir))
    meta_path = os.path.join(path, "meta.json")
    metadata = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            metadata = json.load(f)
    return arrays, metadata
