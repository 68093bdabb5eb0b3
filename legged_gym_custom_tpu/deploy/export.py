"""Policy export for deployment (replaces TorchScript export,
reference helpers.py:180-214 `export_policy_as_jit`).

The bundle is a single .npz of named numpy arrays for the four inference
modules (policy / adaptation_module / estimator / scan_encoder) in a layout
the pure-numpy deploy controller (deploy/controller.py) executes without jax
or torch — the portable format obligation of SURVEY §2.4 (TorchScript row).

Naming scheme: `<module>/<idx>/kernel|bias` for dense layers in forward
order; conv layers additionally carry `.../convkernel` with flax layout
(k, in, out).
"""
from __future__ import annotations

import os
from typing import Dict

import numpy as np


def _flatten_mlp(tree) -> list:
    """Ordered (kernel, bias) list from a flax MLP/Dense param tree."""
    layers = []

    def visit(node, path):
        if isinstance(node, dict):
            if "kernel" in node:
                layers.append((path, np.asarray(node["kernel"]), np.asarray(node["bias"])))
            else:
                for k in sorted(node.keys(), key=_layer_sort_key):
                    visit(node[k], path + "/" + k)

    visit(tree, "")
    return layers


def _layer_sort_key(name: str):
    import re

    m = re.match(r"([A-Za-z_]+)_(\d+)", name)
    if m:
        return (m.group(1), int(m.group(2)))
    return (name, -1)


def export_policy_bundle(nets, params, out_dir: str, cfg_meta: Dict | None = None,
                         filename: str = "policy_bundle.npz") -> str:
    os.makedirs(out_dir, exist_ok=True)
    arrays = {}

    modules = {
        "policy": params["actor"]["params"],
        "estimator": params["estimator"]["params"],
        "scan_encoder": params["scan_encoder"]["params"],
        "adaptation_module": params["adapt_encoder"]["params"],
    }
    for mod_name, tree in modules.items():
        for i, (path, kernel, bias) in enumerate(_flatten_mlp(tree)):
            kind = "convkernel" if kernel.ndim == 3 else "kernel"
            arrays[f"{mod_name}/{i}/{kind}"] = kernel
            arrays[f"{mod_name}/{i}/bias"] = bias
    arrays["std"] = np.asarray(params["std"])
    if cfg_meta:
        for k, v in cfg_meta.items():
            arrays[f"meta/{k}"] = np.asarray(v)
    path = os.path.join(out_dir, filename)
    np.savez(path, **arrays)
    return path


def load_policy_bundle(path: str) -> Dict[str, Dict[int, dict]]:
    """Load into {module: [layer dicts in order]} for the numpy runtime."""
    data = np.load(path)
    modules: Dict[str, dict] = {}
    for key in data.files:
        if key.startswith("meta/") or key == "std":
            continue
        mod, idx, kind = key.split("/")
        modules.setdefault(mod, {}).setdefault(int(idx), {})[kind] = data[key]
    out = {}
    for mod, layers in modules.items():
        out[mod] = [layers[i] for i in sorted(layers)]
    out["std"] = data["std"]
    out["meta"] = {
        k.split("/", 1)[1]: data[k] for k in data.files if k.startswith("meta/")
    }
    return out
