"""Batched TPU-native physics engine (replaces Isaac Gym, SURVEY §2.4)."""
from .algorithms import ModelArrays, aba, body_inertias, crba, model_arrays, rnea
from .actuator import PDParams, compute_torques
from .contact import ContactParams, compute_contacts
from .engine import (
    DomainRandParams,
    PhysicsState,
    SimParams,
    StepInfo,
    control_step,
    effective_joint_inertia,
    link_states,
    substep,
)
from .heightfield import Heightfield, from_raw, height_bilinear, height_min3, plane, surface
from .patch import LocalPatch, extract as extract_patch
from .patch import height_min3 as patch_height_min3
from .patch import surface as patch_surface
from .model import RobotModel
from .urdf import load_urdf
