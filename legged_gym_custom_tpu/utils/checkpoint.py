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


def _pack_empty(tree):
    """Swap zero-size leaves for 1-element placeholders.

    Tasks with a zero-width obs stream (e.g. anymal's num_scan_obs = 0,
    mirroring reference legged_robot_config.py:7) carry empty (0, h) kernels
    in params/opt states; orbax refuses to serialize zero-size arrays.  The
    placeholders carry no information — `_unpack_empty` rebuilds the empties
    from the restore target's shapes.
    """
    return jax.tree.map(
        lambda x: x if np.asarray(x).size else np.zeros((1,), np.asarray(x).dtype),
        tree,
    )


def _unpack_empty(restored, target):
    import jax.numpy as jnp

    return jax.tree.map(
        lambda r, t: r if np.asarray(t).size else jnp.zeros(t.shape, t.dtype),
        restored,
        target,
    )


def save_checkpoint(path: str, arrays, metadata: dict) -> None:
    """Save an array pytree + JSON-serializable metadata under `path`."""
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    ckptr = ocp.PyTreeCheckpointer()
    state_dir = os.path.join(path, "state")
    ckptr.save(state_dir, _pack_empty(arrays), force=True)
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
    single = jax.process_count() == 1
    if target is not None:
        packed = _pack_empty(target)
        if single:
            # Restore straight to host numpy: no device involvement at all.
            # Restoring onto the accelerator and then copying back
            # (np.asarray on a restored jax.Array) round-trips every leaf
            # through the device transfer path, which on remote-tunneled
            # platforms is slow at best and has been observed to wedge.
            # The caller (runner.load) device-puts afterwards as needed.
            restore_args = jax.tree.map(
                lambda _: ocp.RestoreArgs(restore_type=np.ndarray), packed
            )
        else:
            # Multi-host: re-shard onto the current mesh from the target's
            # shardings (host-local numpy copies would raise for
            # non-addressable arrays).
            restore_args = ocp.checkpoint_utils.construct_restore_args(packed)
        restored = ckptr.restore(state_dir, item=packed, restore_args=restore_args)
        arrays = _unpack_empty(restored, target)
    else:
        # Derive the tree structure from checkpoint metadata (no array
        # reads), then restore every leaf as host numpy — same rationale
        # as the single-process branch above.
        meta_tree = ckptr.metadata(state_dir)
        item_meta = getattr(meta_tree, "item_metadata", meta_tree)
        restore_args = jax.tree.map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray),
            item_meta,
            is_leaf=lambda x: hasattr(x, "shape"),
        )
        arrays = ckptr.restore(state_dir, restore_args=restore_args)
    meta_path = os.path.join(path, "meta.json")
    metadata = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            metadata = json.load(f)
    return arrays, metadata
