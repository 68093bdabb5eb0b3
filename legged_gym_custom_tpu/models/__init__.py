from .networks import (
    Actor,
    ActorCriticNetworks,
    AdaptationEncoder,
    Critic,
    MLP,
    MlpEstimator,
    PrivilegedEncoder,
    ScanEncoder,
)
