"""Recurrent actor-critic (reference rsl_rl/modules/actor_critic_recurrent.py).

The reference keeps an LSTM/GRU `Memory`-wrapped actor-critic that predates
the 5-stream API and is documented as deprecated/incompatible
(reference README.md:41).  Provided here as a functional flax equivalent for
users migrating recurrent policies; the mainline trainer uses the
feed-forward ActorCriticNetworks (models/networks.py).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .networks import MLP, _ACTIVATIONS


class Memory(nn.Module):
    """Single-layer LSTM/GRU memory (actor_critic_recurrent.py:79-116)."""

    hidden_size: int = 256
    rnn_type: str = "lstm"

    @nn.compact
    def __call__(self, x, carry):
        if self.rnn_type == "lstm":
            cell = nn.OptimizedLSTMCell(self.hidden_size)
        elif self.rnn_type == "gru":
            cell = nn.GRUCell(self.hidden_size)
        else:
            raise ValueError(self.rnn_type)
        carry, out = cell(carry, x)
        return out, carry

    @nn.nowrap
    def initialize_carry(self, key, batch_dims: Tuple[int, ...]):
        # nn.nowrap: callable on an unbound module (no flax scope needed),
        # mirroring flax's own RNNCellBase.initialize_carry
        if self.rnn_type == "lstm":
            cell = nn.OptimizedLSTMCell(self.hidden_size, parent=None)
        else:
            cell = nn.GRUCell(self.hidden_size, parent=None)
        return cell.initialize_carry(key, batch_dims + (self.hidden_size,))


class ActorCriticRecurrent(nn.Module):
    num_obs: int
    num_critic_obs: int
    num_actions: int
    actor_hidden_dims: Sequence[int] = (256, 256, 256)
    critic_hidden_dims: Sequence[int] = (256, 256, 256)
    rnn_hidden_size: int = 256
    rnn_type: str = "lstm"
    activation: str = "elu"

    def setup(self):
        self.memory_a = Memory(self.rnn_hidden_size, self.rnn_type)
        self.memory_c = Memory(self.rnn_hidden_size, self.rnn_type)
        self.actor = MLP(self.actor_hidden_dims, self.num_actions, self.activation)
        self.critic = MLP(self.critic_hidden_dims, 1, self.activation)

    def act(self, obs, carry_a):
        feat, carry_a = self.memory_a(obs, carry_a)
        return self.actor(feat), carry_a

    def evaluate(self, critic_obs, carry_c):
        feat, carry_c = self.memory_c(critic_obs, carry_c)
        return self.critic(feat)[..., 0], carry_c

    def __call__(self, obs, critic_obs, carry_a, carry_c):
        mean, carry_a = self.act(obs, carry_a)
        value, carry_c = self.evaluate(critic_obs, carry_c)
        return mean, value, carry_a, carry_c
