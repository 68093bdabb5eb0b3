"""Package setup (reference setup.py analog; deps are jax-stack not torch)."""
from setuptools import find_packages, setup

setup(
    name="legged_gym_custom_tpu",
    version="0.1.0",
    author="legged_gym_custom_tpu developers",
    license="BSD-3-Clause",
    packages=find_packages(include=["legged_gym_custom_tpu*"]),
    description="TPU-native legged-robot RL + MPC framework (Go2/ANYmal/Cassie/G1)",
    python_requires=">=3.10",
    install_requires=[
        "jax",
        "flax",
        "optax",
        "numpy",
        "scipy",
        "pyyaml",
    ],
    extras_require={
        "deploy": ["mujoco"],
        "dev": ["pytest", "mujoco", "torch"],
    },
)
