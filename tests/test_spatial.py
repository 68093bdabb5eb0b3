"""Unit tests for quaternion / spatial-vector math."""
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as R

from legged_gym_custom_tpu.physics import spatial as sp


def _rand_quat(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    return q


def test_quat_rotate_matches_scipy(rng):
    for _ in range(10):
        q = _rand_quat(rng)
        v = rng.normal(size=3)
        # scipy uses xyzw
        r = R.from_quat([q[1], q[2], q[3], q[0]])
        np.testing.assert_allclose(
            np.asarray(sp.quat_rotate(jnp.asarray(q), jnp.asarray(v))),
            r.apply(v),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(sp.quat_rotate_inverse(jnp.asarray(q), jnp.asarray(v))),
            r.inv().apply(v),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(sp.quat_to_matrix(jnp.asarray(q))), r.as_matrix(), atol=1e-5
        )


def test_quat_mul_matches_scipy(rng):
    a, b = _rand_quat(rng), _rand_quat(rng)
    ra = R.from_quat([a[1], a[2], a[3], a[0]])
    rb = R.from_quat([b[1], b[2], b[3], b[0]])
    got = np.asarray(sp.quat_mul(jnp.asarray(a), jnp.asarray(b)))
    want = (ra * rb).as_quat()  # xyzw
    want = np.array([want[3], want[0], want[1], want[2]])
    if np.dot(got, want) < 0:
        want = -want
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_rpy_roundtrip(rng):
    rpy = rng.uniform(-1.0, 1.0, size=3)
    q = sp.quat_from_rpy(*[jnp.asarray(x) for x in rpy])
    r2 = sp.quat_to_rpy(q)
    np.testing.assert_allclose(np.asarray(jnp.stack(r2)), rpy, atol=1e-5)
    # matches scipy extrinsic xyz
    r = R.from_euler("xyz", rpy)
    np.testing.assert_allclose(np.asarray(sp.quat_to_matrix(q)), r.as_matrix(), atol=1e-5)


def test_quat_integrate_consistency(rng):
    from scipy.linalg import expm

    q = jnp.asarray(_rand_quat(rng))
    w_body = rng.normal(size=3)
    dt = 0.05
    q2 = sp.quat_integrate(q, jnp.asarray(w_body), dt)
    # exponential map: R2 = R1 @ expm(hat(w_body) * dt) for body-frame omega
    R1 = np.asarray(sp.quat_to_matrix(q))
    R2 = np.asarray(sp.quat_to_matrix(q2))
    expect = R1 @ expm(np.asarray(sp.hat(jnp.asarray(w_body))) * dt)
    np.testing.assert_allclose(R2, expect, atol=1e-5)


def test_motion_force_transform_duality(rng):
    E = R.from_quat(R.random(random_state=0).as_quat()).as_matrix()
    p = rng.normal(size=3)
    m = jnp.asarray(rng.normal(size=6))
    f = jnp.asarray(rng.normal(size=6))
    E = jnp.asarray(E)
    p = jnp.asarray(p)
    mB = sp.xform_motion(E, p, m)
    fB = sp.xform_force(E, p, f)
    # power invariance f.v
    np.testing.assert_allclose(float(jnp.dot(mB, fB)), float(jnp.dot(m, f)), rtol=1e-5)
    # inverse round trip
    np.testing.assert_allclose(np.asarray(sp.inv_xform_motion(E, p, mB)), np.asarray(m), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sp.inv_xform_force(E, p, fB)), np.asarray(f), atol=1e-5)
    # 6x6 matrix agrees with the pair form
    X = sp.xform_to_mat66(E, p)
    np.testing.assert_allclose(np.asarray(X @ m), np.asarray(mB), atol=1e-5)


def test_inertia_mul_matches_mat66(rng):
    mass = 2.3
    com = rng.normal(size=3) * 0.1
    I_c = np.diag(rng.uniform(0.1, 0.3, size=3))
    m_, h, I_o = sp.spatial_inertia_about_origin(mass, jnp.asarray(com), jnp.asarray(I_c))
    v = jnp.asarray(rng.normal(size=6))
    f1 = sp.inertia_mul(m_, h, I_o, v)
    M = sp.inertia_to_mat66(m_, h, I_o)
    np.testing.assert_allclose(np.asarray(M @ v), np.asarray(f1), rtol=1e-5, atol=1e-6)
    # symmetry & positive definiteness
    np.testing.assert_allclose(np.asarray(M), np.asarray(M).T, atol=1e-6)
    assert np.all(np.linalg.eigvalsh(np.asarray(M)) > 0)


def test_wrap_to_pi():
    vals = jnp.asarray([0.0, 3.2, -3.2, 6.4, -6.4])
    out = np.asarray(sp.wrap_to_pi(vals))
    assert np.all(out >= -np.pi) and np.all(out < np.pi)
    np.testing.assert_allclose(np.sin(out), np.sin(np.asarray(vals)), atol=1e-6)
