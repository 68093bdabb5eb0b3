"""Batched MPC / trajectory optimization on the TPU physics core."""
from .mppi import MPCState, MPPI, MPPIConfig
