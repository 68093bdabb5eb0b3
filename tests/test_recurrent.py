"""Shape/carry tests for the deprecated recurrent actor-critic
(reference rsl_rl/modules/actor_critic_recurrent.py:40-116; kept for parity
even though upstream marks it incompatible with the 5-stream API)."""
import jax
import jax.numpy as jnp

from legged_gym_custom_tpu.models.recurrent import ActorCriticRecurrent, Memory


def test_recurrent_shapes_and_carry():
    B, num_obs, num_critic, num_act = 4, 48, 60, 12
    net = ActorCriticRecurrent(
        num_obs=num_obs, num_critic_obs=num_critic, num_actions=num_act,
        actor_hidden_dims=(32, 32), critic_hidden_dims=(32, 32),
        rnn_hidden_size=16,
    )
    key = jax.random.PRNGKey(0)
    mem = Memory(hidden_size=16)
    carry_a = mem.initialize_carry(key, (B,))
    carry_c = mem.initialize_carry(key, (B,))
    obs = jnp.ones((B, num_obs))
    cobs = jnp.ones((B, num_critic))
    params = net.init(key, obs, cobs, carry_a, carry_c)
    mean, value, new_a, new_c = net.apply(params, obs, cobs, carry_a, carry_c)
    assert mean.shape == (B, num_act)
    assert value.shape == (B,)
    # the carry must actually advance (non-trivial recurrence)
    moved = jax.tree.map(
        lambda a, b: bool(jnp.any(a != b)), carry_a, new_a
    )
    assert any(jax.tree.leaves(moved))


def test_recurrent_gru_variant():
    net = ActorCriticRecurrent(
        num_obs=8, num_critic_obs=8, num_actions=3,
        actor_hidden_dims=(16,), critic_hidden_dims=(16,),
        rnn_hidden_size=8, rnn_type="gru",
    )
    key = jax.random.PRNGKey(1)
    mem = Memory(hidden_size=8, rnn_type="gru")
    carry_a = mem.initialize_carry(key, (2,))
    carry_c = mem.initialize_carry(key, (2,))
    obs = jnp.zeros((2, 8))
    params = net.init(key, obs, obs, carry_a, carry_c)
    mean, value, _, _ = net.apply(params, obs, obs, carry_a, carry_c)
    assert mean.shape == (2, 3) and value.shape == (2,)


def test_recurrent_memory_integrates_history():
    """Behavioral (not just shape) check: the recurrent policy's output must
    depend on the observation HISTORY, not only the current frame — two
    different prefixes followed by the same final observation yield
    different actions (the property the reference's LSTM path exists for,
    actor_critic_recurrent.py:40-116)."""
    B, num_obs, num_act = 3, 10, 4
    net = ActorCriticRecurrent(
        num_obs=num_obs, num_critic_obs=num_obs, num_actions=num_act,
        actor_hidden_dims=(32,), critic_hidden_dims=(32,),
        rnn_hidden_size=16,
    )
    key = jax.random.PRNGKey(3)
    mem = Memory(hidden_size=16)
    carry0 = mem.initialize_carry(key, (B,))
    obs_final = jnp.ones((B, num_obs)) * 0.3
    params = net.init(key, obs_final, obs_final, carry0, carry0)

    def run(prefix_scale):
        ca, cc = carry0, carry0
        for t in range(5):
            prefix = jnp.full((B, num_obs), prefix_scale * (t + 1) * 0.1)
            _, _, ca, cc = net.apply(params, prefix, prefix, ca, cc)
        mean, value, _, _ = net.apply(params, obs_final, obs_final, ca, cc)
        return mean

    m1 = run(1.0)
    m2 = run(-1.0)
    assert float(jnp.max(jnp.abs(m1 - m2))) > 1e-4, (
        "recurrent policy ignored its history"
    )
