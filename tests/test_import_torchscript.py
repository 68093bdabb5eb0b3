"""Reference-network import parity: the shipped TorchScript Go2 policies must
produce identical actions through our pure-numpy deploy runtime."""
import os

import numpy as np
import pytest

MODEL_DIR = "/root/reference/deploy/networks/go2/parkour_v12_ft_iii"


@pytest.mark.skipif(not os.path.isdir(MODEL_DIR), reason="reference networks unavailable")
def test_imported_policy_matches_torch(tmp_path, rng):
    torch = pytest.importorskip("torch")
    from legged_gym_custom_tpu.deploy.controller import (
        NumpyAdaptationEncoder,
        NumpyMLP,
    )
    from legged_gym_custom_tpu.deploy.export import load_policy_bundle
    from legged_gym_custom_tpu.deploy.import_torchscript import (
        import_torchscript_policy,
    )

    path = import_torchscript_policy(MODEL_DIR, str(tmp_path / "bundle.npz"))
    bundle = load_policy_bundle(path)
    policy = NumpyMLP(bundle["policy"])
    estimator = NumpyMLP(bundle["estimator"])
    scan_enc = NumpyMLP(bundle["scan_encoder"])
    adapt = NumpyAdaptationEncoder(bundle["adaptation_module"])

    t_policy = torch.jit.load(os.path.join(MODEL_DIR, "policy.pt"), map_location="cpu")
    t_est = torch.jit.load(os.path.join(MODEL_DIR, "estimator.pt"), map_location="cpu")
    t_scan = torch.jit.load(os.path.join(MODEL_DIR, "scan_encoder.pt"), map_location="cpu")
    t_adapt = torch.jit.load(
        os.path.join(MODEL_DIR, "adaptation_module.pt"), map_location="cpu"
    )

    obs = rng.normal(size=572).astype(np.float32)
    scan = rng.normal(size=132).astype(np.float32)
    with torch.no_grad():
        est_t = t_est(torch.from_numpy(obs[None])).numpy()[0]
        scan_t = t_scan(torch.from_numpy(scan[None])).numpy()[0]
        hist = obs[:520].reshape(1, 10, 52)
        ad_t = t_adapt(torch.from_numpy(hist)).numpy()[0]
        actor_in = np.concatenate([obs, ad_t, scan_t, est_t])[None]
        act_t = t_policy(torch.from_numpy(actor_in)).numpy()[0]

    np.testing.assert_allclose(estimator(obs), est_t, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(scan_enc(scan), scan_t, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(adapt(obs[:520].reshape(10, 52)), ad_t, rtol=1e-4, atol=1e-5)
    act_np = policy(np.concatenate([obs, ad_t, scan_t, est_t]))
    np.testing.assert_allclose(act_np, act_t, rtol=1e-4, atol=1e-5)
