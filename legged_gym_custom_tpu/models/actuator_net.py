"""ANYmal SEA actuator-network weight conversion.

Loads the reference TorchScript checkpoint
(resources/actuator_nets/anydrive_v3_lstm.pt, reference anymal.py:52-54) with
CPU torch and converts it to the pure-jnp LSTMWeights consumed by
physics.actuator.lstm_actuator: 2-layer LSTM (input 2 = [pos err, vel],
hidden 8) + linear head -> torque.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from legged_gym_custom_tpu.physics.actuator import LSTMWeights


def load_actuator_net(path: str) -> LSTMWeights:
    import torch

    module = torch.jit.load(path, map_location="cpu")
    sd = {k: v.detach().numpy() for k, v in module.state_dict().items()}

    w_ih, w_hh, b_ih, b_hh = [], [], [], []
    layer = 0
    while f"lstm.weight_ih_l{layer}" in sd or any(
        k.endswith(f"weight_ih_l{layer}") for k in sd
    ):
        def find(suffix):
            for k, v in sd.items():
                if k.endswith(suffix):
                    return v
            raise KeyError(suffix)

        w_ih.append(jnp.asarray(find(f"weight_ih_l{layer}")))
        w_hh.append(jnp.asarray(find(f"weight_hh_l{layer}")))
        b_ih.append(jnp.asarray(find(f"bias_ih_l{layer}")))
        b_hh.append(jnp.asarray(find(f"bias_hh_l{layer}")))
        layer += 1
    if layer == 0:
        raise ValueError(f"no LSTM weights found in {path}: keys={list(sd)}")

    lin_w = None
    lin_b = None
    for k, v in sd.items():
        if "lstm" not in k and k.endswith("weight") and v.ndim == 2:
            lin_w = v
        if "lstm" not in k and k.endswith("bias") and v.ndim == 1:
            lin_b = v
    if lin_w is None:
        raise ValueError(f"no output linear layer found in {path}")
    return LSTMWeights(
        w_ih=tuple(w_ih),
        w_hh=tuple(w_hh),
        b_ih=tuple(b_ih),
        b_hh=tuple(b_hh),
        w_out=jnp.asarray(lin_w),
        b_out=jnp.asarray(lin_b),
        in_scale=jnp.asarray(sd["in_scale"]).reshape(-1) if "in_scale" in sd else jnp.asarray(1.0),
        out_scale=jnp.asarray(sd["out_scale"]).reshape(()) if "out_scale" in sd else jnp.asarray(1.0),
    )
