"""ctypes binding for the native C++ deploy inference runtime (csrc/).

Replaces the reference's libtorch/TorchScript C++ runtime on the robot
(deploy_base.py:32-35) with a dependency-free shared library.  Falls back to
the numpy runtime when the library isn't built.

The weight file is a flat binary ("LGCT") written from the same .npz bundle
the numpy controller consumes (deploy/export.py).
"""
from __future__ import annotations

import ctypes
import os
import struct
import subprocess

import numpy as np

from .export import load_policy_bundle

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "csrc",
    "liblgc_deploy.so",
)


def write_flat_bundle(npz_path: str, out_path: str) -> str:
    """Convert an .npz policy bundle to the C runtime's flat binary format."""
    bundle = load_policy_bundle(npz_path)
    arrays = {}
    for mod in ("policy", "estimator", "scan_encoder", "adaptation_module"):
        for i, layer in enumerate(bundle[mod]):
            for kind, arr in layer.items():
                arrays[f"{mod}/{i}/{kind}"] = np.asarray(arr, np.float32)
    with open(out_path, "wb") as f:
        f.write(b"LGCT")
        f.write(struct.pack("<II", 1, len(arrays)))
        for name, arr in arrays.items():
            nb = name.encode()
            f.write(struct.pack("<I", len(nb)))
            f.write(nb)
            f.write(struct.pack("<I", arr.ndim))
            for d in arr.shape:
                f.write(struct.pack("<I", d))
            f.write(np.ascontiguousarray(arr, np.float32).tobytes())
    return out_path


def build_library(force: bool = False) -> str | None:
    """Build csrc/liblgc_deploy.so with make; returns the path or None."""
    if os.path.exists(_LIB_PATH) and not force:
        return _LIB_PATH
    csrc = os.path.dirname(_LIB_PATH)
    try:
        subprocess.run(["make", "-C", csrc], check=True, capture_output=True)
        return _LIB_PATH if os.path.exists(_LIB_PATH) else None
    except Exception:
        return None


class NativePolicy:
    """C++-evaluated policy: obs(572) + scan(132) -> actions(12)."""

    def __init__(self, flat_bundle_path: str, num_actions: int = 12):
        lib_path = build_library()
        if lib_path is None:
            raise RuntimeError("liblgc_deploy.so unavailable (build failed)")
        self.lib = ctypes.CDLL(lib_path)
        self.lib.lgc_bundle_load.restype = ctypes.c_void_p
        self.lib.lgc_bundle_load.argtypes = [ctypes.c_char_p]
        self.lib.lgc_policy_forward.restype = ctypes.c_int
        self.lib.lgc_policy_forward.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        self.handle = self.lib.lgc_bundle_load(flat_bundle_path.encode())
        if not self.handle:
            raise RuntimeError(f"failed to load {flat_bundle_path}")
        self.num_actions = num_actions

    def __call__(self, obs: np.ndarray, scan: np.ndarray) -> np.ndarray:
        obs = np.ascontiguousarray(obs, np.float32)
        scan = np.ascontiguousarray(scan, np.float32)
        out = np.zeros(self.num_actions, np.float32)
        rc = self.lib.lgc_policy_forward(
            self.handle,
            obs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), obs.size,
            scan.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), scan.size,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out.size,
        )
        if rc != 0:
            raise RuntimeError(f"lgc_policy_forward failed: {rc}")
        return out

    def __del__(self):
        try:
            self.lib.lgc_bundle_free(ctypes.c_void_p(self.handle))
        except Exception:
            pass
