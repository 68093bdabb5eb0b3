"""Round-trip tests for utils/checkpoint.py, including the target=None
metadata-derived restore branch (ADVICE r2: previously had no caller/test)."""
import numpy as np
import pytest

from legged_gym_custom_tpu.utils import checkpoint as ckpt

pytestmark = pytest.mark.skipif(not ckpt.have_orbax(), reason="orbax unavailable")


def _tree():
    return {
        "params": {
            "w": np.arange(6, dtype=np.float32).reshape(2, 3),
            "b": np.zeros((3,), np.float32),
        },
        "empty": np.zeros((0, 4), np.float32),  # zero-width obs stream case
        "scalar": np.float32(3.5),
    }


def test_roundtrip_with_target(tmp_path):
    arrays = _tree()
    ckpt.save_checkpoint(str(tmp_path / "c.ckpt"), arrays, {"iter": 7})
    target = {k: np.zeros_like(v) for k, v in arrays["params"].items()}
    target = {"params": target, "empty": np.zeros((0, 4), np.float32),
              "scalar": np.float32(0)}
    restored, meta = ckpt.load_checkpoint(str(tmp_path / "c.ckpt"), target=target)
    assert meta["iter"] == 7
    np.testing.assert_array_equal(restored["params"]["w"], arrays["params"]["w"])
    assert restored["empty"].shape == (0, 4)


def test_roundtrip_without_target(tmp_path):
    """target=None: structure derived from checkpoint metadata alone."""
    arrays = {"a": np.full((4,), 2.0, np.float32), "b": {"c": np.ones((2, 2))}}
    ckpt.save_checkpoint(str(tmp_path / "n.ckpt"), arrays, {"lr": 1e-3})
    restored, meta = ckpt.load_checkpoint(str(tmp_path / "n.ckpt"))
    assert meta["lr"] == 1e-3
    np.testing.assert_array_equal(np.asarray(restored["a"]), arrays["a"])
    np.testing.assert_array_equal(np.asarray(restored["b"]["c"]), arrays["b"]["c"])
