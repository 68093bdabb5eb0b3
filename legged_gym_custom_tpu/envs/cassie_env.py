"""Cassie biped environment (reference legged_gym/envs/cassie/cassie.py:42-46).

Uses the base legged-robot machinery; the single-stance `no_fly` reward term
lives in envs/rewards.py.
"""
from .base_env import LeggedEnv


class CassieEnv(LeggedEnv):
    pass
