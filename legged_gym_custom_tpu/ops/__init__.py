"""Pallas TPU kernels for the hot compute paths.

`fused_step` holds the flagship kernel: the entire flat-plane physics control
step (PD + FK + contact + ABA + integration, all decimation x substeps) as a
single VMEM-resident pallas_call — the TPU-native replacement for the
reference's PhysX `gym.simulate` hot loop (legged_robot.py:79-85).
"""
from . import fused_step

__all__ = ["fused_step"]
