"""Unit tests for the speed-of-light accounting (ops/roofline.py) and the
HLO comm-budget parser (scripts/comm_budget.py)."""
import numpy as np

import jax.numpy as jnp

from legged_gym_custom_tpu import physics as phys
from legged_gym_custom_tpu.ops import fused_step, roofline

GO2_URDF = "/root/reference/resources/robots/go2/urdf/go2.urdf"


def _spec(hf_K=0):
    model = phys.load_urdf(GO2_URDF, "go2")
    ma = phys.model_arrays(model)
    pd = phys.PDParams(
        p_gains=jnp.full(12, 40.0), d_gains=jnp.full(12, 1.0),
        default_dof_pos=jnp.zeros(12),
        torque_limits=jnp.asarray(model.dof_effort_limits, jnp.float32),
        action_scale=0.25,
    )
    dof_limits = (
        jnp.asarray(model.dof_pos_limits[:, 0], jnp.float32),
        jnp.asarray(model.dof_pos_limits[:, 1], jnp.float32),
        jnp.asarray(model.dof_vel_limits, jnp.float32),
    )
    params = phys.SimParams(
        substeps=4,
        dof_damping=jnp.full(12, 0.1), dof_armature=jnp.full(12, 0.01),
        dof_frictionloss=jnp.full(12, 0.2),
    )
    return fused_step.build_spec(ma, params, pd, dof_limits,
                                 hf_K=hf_K, hf_hs=0.1 if hf_K else 0.0)


def test_kernel_op_counts_scale_with_terrain():
    """The jaxpr-derived counts are positive, dominated by real arithmetic,
    and grow when the terrain tent-weight math is added."""
    flat = roofline.count_kernel_ops(_spec(0))
    terr = roofline.count_kernel_ops(_spec(24))
    assert flat["flops"] > 1e5  # 16 substeps of 13-body Featherstone
    assert flat["transcendentals"] > 100
    assert terr["flops"] > flat["flops"]
    # per-env HBM bytes: state+params+outputs (+patch for terrain)
    assert roofline.kernel_bytes_per_env(_spec(0)) == pytest_approx_bytes(0)
    assert roofline.kernel_bytes_per_env(_spec(24)) == pytest_approx_bytes(24)


def pytest_approx_bytes(K):
    spec = _spec(K)
    ndof, nl = len(spec.parent) - 1, spec.n_links
    n = 2 * (3 + 4 + 3 + 3 + ndof + ndof) + (1 + 1 + 3 + ndof + ndof) + ndof \
        + nl * 3 + ndof
    if K:
        n += K * K + 2
    return 4 * n


def test_roofline_report_math():
    """With pinned peaks, the report computes the documented max(compute,
    memory) bound and percentage."""
    spec = _spec(0)
    peaks = {"vpu_gflops": 1000.0, "trans_gops": 20.0, "hbm_gbps": 300.0}
    rep = roofline.roofline_report(spec, achieved_ms=10.0, batch=1024,
                                   peaks=peaks)
    ops = roofline.count_kernel_ops(spec)
    expect_compute = (
        ops["flops"] / 1e12 + ops["transcendentals"] / 20e9
    ) * 1024 * 1e3
    assert abs(rep["compute_bound_ms"] - round(expect_compute, 3)) < 2e-3
    assert rep["bound"] in ("compute", "memory")
    assert rep["roofline_pct"] == round(
        100.0 * rep["speed_of_light_ms"] / 10.0, 1
    )


def test_comm_budget_hlo_parser():
    """The HLO parser attributes collectives to loop bodies and multiplies
    by trip count."""
    from legged_gym_custom_tpu.scripts.comm_budget import summarize

    hlo = """\
%wide.region_0.1_spmd (p: f32[4]) -> f32[4] {
  %x = f32[4]{0} all-reduce(%p), replica_groups={}, to_apply=%add
}

ENTRY %main (a: f32[4]) -> f32[4] {
  %w = (s32[], f32[4]{0}) while(%t), condition=%cond.9, body=%wide.region_0.1_spmd
  %y = f32[8]{0} all-gather(%a), dimensions={0}
}
"""
    s = summarize(hlo, loop_trips=24)
    assert s["counts"] == {"all-reduce": 24, "all-gather": 1}
    assert s["total_bytes_per_step"] == 24 * 16 + 32
