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
