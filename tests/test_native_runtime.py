"""C++ deploy runtime vs the numpy/jax reference implementations."""
import os
import shutil

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None, reason="no C++ toolchain"
)


def test_native_matches_numpy(tmp_path, rng):
    import jax

    from legged_gym_custom_tpu.deploy.controller import (
        NumpyAdaptationEncoder, NumpyMLP,
    )
    from legged_gym_custom_tpu.deploy.export import (
        export_policy_bundle, load_policy_bundle,
    )
    from legged_gym_custom_tpu.deploy.native import NativePolicy, write_flat_bundle
    from legged_gym_custom_tpu.models.networks import ActorCriticNetworks

    class P:
        actor_hidden_dims = [64, 32]
        critic_hidden_dims = [64, 32]
        priv_encoder_hidden_dims = [16, 8]
        scan_encoder_hidden_dims = [16, 8]
        estimator_hidden_dims = [16, 8]
        use_history = True
        latent_encoder_output_dim = 20
        scan_encoder_output_dim = 32
        activation = "elu"
        init_noise_std = 1.0

    nets = ActorCriticNetworks(
        P, num_proprio=52, num_privileged_obs=29, num_critic_obs=736,
        num_estimated_obs=3, num_scan_obs=132, num_actions=12,
        history_buffer_length=10,
    )
    params = nets.init_params(jax.random.PRNGKey(3))
    npz = export_policy_bundle(nets, params, str(tmp_path))
    flat = write_flat_bundle(npz, str(tmp_path / "bundle.lgct"))
    native = NativePolicy(flat)

    bundle = load_policy_bundle(npz)
    policy = NumpyMLP(bundle["policy"])
    estimator = NumpyMLP(bundle["estimator"])
    scan_enc = NumpyMLP(bundle["scan_encoder"])
    adapt = NumpyAdaptationEncoder(bundle["adaptation_module"])

    for _ in range(3):
        obs = rng.normal(size=572).astype(np.float32)
        scan = rng.normal(size=132).astype(np.float32)
        lat = adapt(obs[:520].reshape(10, 52))
        ref = policy(np.concatenate([obs, lat, scan_enc(scan), estimator(obs)]))
        got = native(obs, scan)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
