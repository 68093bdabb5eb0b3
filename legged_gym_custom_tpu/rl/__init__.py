from .ppo import PPOConfig, TrainState, Transition, compute_gae, dagger_update, init_train_state, policy_act, ppo_update
from .runner import OnPolicyRunner
