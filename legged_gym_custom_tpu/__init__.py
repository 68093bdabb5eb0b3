"""legged_gym_custom_tpu — a TPU-native legged-robot RL + MPC framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
JustinMLu/legged_gym_custom ("ARCAD Gym"): batched articulated rigid-body
physics (replacing Isaac Gym/PhysX), curriculum terrain generation, the Go2 /
ANYmal / Cassie task family with ROA adaptation + state estimation + scandot
perception, a pure-JAX PPO/DAgger trainer sharded over TPU meshes, and a
deploy stack (param export, numpy controller, MuJoCo sim-to-sim oracle).

Layer map (mirrors reference SURVEY.md §1, re-architected TPU-first):
  scripts/   CLI entry points (train/play)           <- reference legged_gym/scripts
  utils/     task registry, configclass, logging     <- reference legged_gym/utils
  rl/        PPO+ROA+DAgger runner (pure JAX)        <- reference rsl_rl
  models/    Flax networks (actor-critic, encoders)  <- reference rsl_rl/modules
  envs/      pure-functional vectorized envs         <- reference legged_gym/envs
  terrain/   heightfield composer + primitives       <- reference legged_gym/utils/terrain*.py
  physics/   batched Featherstone + contact engine   <- replaces Isaac Gym (C++/CUDA)
  ops/       Pallas TPU kernels for hot paths
  parallel/  mesh/sharding helpers (pjit/shard_map)
  deploy/    export + 50 Hz controller + MuJoCo loop <- reference deploy/
"""

__version__ = "0.1.0"

import os

LEGGED_GYM_TPU_ROOT_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# Robot assets (URDF etc.) are read from the reference resources tree when
# available; consumers may override via the LEGGED_GYM_RESOURCES env var.
LEGGED_GYM_RESOURCES_DIR = os.environ.get(
    "LEGGED_GYM_RESOURCES", "/root/reference/resources"
)

# Escape hatch for hosts whose sitecustomize pre-imports jax and pins an
# accelerator platform (overriding JAX_PLATFORMS): LGC_FORCE_PLATFORM=cpu
# re-points the live jax config and clears the already-initialized backends.
# Combine with XLA_FLAGS=--xla_force_host_platform_device_count=N for a
# virtual multi-device CPU mesh (the tests' conftest does the same).
# Persistent XLA compilation cache: TPU compiles of the big jitted phases
# (collection / learning / deploy loops) take minutes on this platform and
# are re-paid on every process start without it.  Opt out with
# LGC_NO_COMPILE_CACHE=1; point elsewhere with JAX_COMPILATION_CACHE_DIR.
# (CPU runs are excluded: XLA:CPU AOT cache entries record host machine
# features and can SIGILL when loaded on a different host; TPU compiles are
# the ones that cost minutes anyway.)
_cpu_forced = (
    os.environ.get("LGC_FORCE_PLATFORM") == "cpu"
    or os.environ.get("JAX_PLATFORMS", "").startswith("cpu")
)
if os.environ.get("LGC_NO_COMPILE_CACHE") != "1" and not _cpu_forced:
    try:
        import jax as _jax_cc

        _jax_cc.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/lgc_jax_cache"),
        )
        _jax_cc.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        _jax_cc.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - old jax without the knobs
        pass

_force = os.environ.get("LGC_FORCE_PLATFORM")
if _force:
    import jax as _jax

    _jax.config.update("jax_platforms", _force)
    try:
        import jax.extend.backend as _jeb

        _jeb.clear_backends()
    except Exception:  # pragma: no cover - jax version differences
        pass
