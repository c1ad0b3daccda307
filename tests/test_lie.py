"""Property tests for vislam_tpu.lie against scipy closed forms.

Mirrors the verification the reference never had (SURVEY.md §4): every math op
checked against an independent oracle (scipy.spatial.transform.Rotation).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as Rsp

from vislam_tpu import lie

jax.config.update("jax_enable_x64", False)

N = 64


def random_quats(rng, n=N):
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    q[q[:, 0] < 0] *= -1
    return q.astype(np.float32)


def to_scipy(q_wxyz):
    return Rsp.from_quat(np.roll(np.asarray(q_wxyz), -1, axis=-1))  # xyzw


def test_quat_mul_matches_scipy(rng):
    a, b = random_quats(rng), random_quats(rng)
    ours = np.asarray(lie.quat_mul(jnp.array(a), jnp.array(b)))
    ref = (to_scipy(a) * to_scipy(b)).as_matrix()
    ours_mat = np.asarray(lie.quat_to_mat(jnp.array(ours)))
    np.testing.assert_allclose(ours_mat, ref, atol=1e-5)


def test_quat_rotate_matches_matrix(rng):
    q = random_quats(rng)
    v = rng.normal(size=(N, 3)).astype(np.float32)
    out1 = np.asarray(lie.quat_rotate(jnp.array(q), jnp.array(v)))
    out2 = np.einsum("nij,nj->ni", np.asarray(lie.quat_to_mat(jnp.array(q))), v)
    np.testing.assert_allclose(out1, out2, atol=1e-5)


def test_quat_mat_roundtrip(rng):
    q = random_quats(rng)
    m = lie.quat_to_mat(jnp.array(q))
    q2 = np.asarray(lie.mat_to_quat(m))
    np.testing.assert_allclose(np.abs(np.sum(q * q2, axis=-1)), 1.0, atol=1e-5)


def test_mat_to_quat_near_pi(rng):
    # Rotations by ~pi are the hard case for naive trace-based conversion.
    axes = rng.normal(size=(N, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    angles = np.pi - rng.uniform(0, 1e-4, size=N)
    R = Rsp.from_rotvec(axes * angles[:, None]).as_matrix().astype(np.float32)
    q = np.asarray(lie.mat_to_quat(jnp.array(R)))
    R2 = np.asarray(lie.quat_to_mat(jnp.array(q)))
    np.testing.assert_allclose(R2, R, atol=1e-4)


def test_so3_exp_log_roundtrip(rng):
    w = rng.normal(size=(N, 3)).astype(np.float32)
    w *= rng.uniform(0, 3.0, size=(N, 1)) / np.linalg.norm(w, axis=-1, keepdims=True)
    R = lie.so3_exp(jnp.array(w))
    w2 = np.asarray(lie.so3_log(R))
    np.testing.assert_allclose(w2, w, atol=1e-4)


def test_so3_exp_matches_scipy(rng):
    w = rng.normal(size=(N, 3)).astype(np.float32)
    R = np.asarray(lie.so3_exp(jnp.array(w)))
    Rref = Rsp.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(R, Rref, atol=1e-5)


def test_so3_log_small_and_pi(rng):
    # atol per scale: log() conditioning degrades near theta=pi in float32.
    for scale, atol in [(1e-8, 2e-4), (1e-5, 2e-4), (3.14159, 5e-4)]:
        axes = rng.normal(size=(N, 3))
        axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
        w = (axes * scale).astype(np.float32)
        R = Rsp.from_rotvec(w).as_matrix().astype(np.float32)
        w2 = np.asarray(lie.so3_log(jnp.array(R)))
        R2 = Rsp.from_rotvec(w2).as_matrix()
        np.testing.assert_allclose(R2, R, atol=atol)


def test_so3_log_grad_no_nan(rng):
    w = jnp.array([1e-9, 0.0, 0.0])
    g = jax.grad(lambda v: jnp.sum(lie.so3_log(lie.so3_exp(v))))(w)
    assert np.all(np.isfinite(np.asarray(g)))


def test_se3_exp_log_roundtrip(rng):
    xi = rng.normal(size=(N, 6)).astype(np.float32)
    xi[:, 3:] *= 0.8
    T = lie.se3_exp(jnp.array(xi))
    xi2 = np.asarray(lie.se3_log(T))
    np.testing.assert_allclose(xi2, xi, atol=1e-4)


def test_se3_compose_inverse(rng):
    xi = rng.normal(size=(N, 6)).astype(np.float32) * 0.5
    T = lie.se3_exp(jnp.array(xi))
    Tinv = lie.se3_inverse(T)
    R, t = lie.se3_compose(T, Tinv)
    np.testing.assert_allclose(np.asarray(R), np.broadcast_to(np.eye(3), (N, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t), 0.0, atol=1e-5)


def test_se3_apply_matches_matrix(rng):
    xi = rng.normal(size=(N, 6)).astype(np.float32) * 0.5
    T = lie.se3_exp(jnp.array(xi))
    p = jnp.array(rng.normal(size=(N, 3)).astype(np.float32))
    out = np.asarray(lie.se3_apply(T, p))
    M = np.asarray(lie.se3_matrix(T))
    ph = np.concatenate([np.asarray(p), np.ones((N, 1), np.float32)], axis=-1)
    out2 = np.einsum("nij,nj->ni", M, ph)[:, :3]
    np.testing.assert_allclose(out, out2, atol=1e-5)


def test_se3_adjoint_property(rng):
    # Ad_T xi  ==  log(T exp(xi) T^-1)
    xi_T = rng.normal(size=(6,)).astype(np.float32) * 0.3
    xi = rng.normal(size=(6,)).astype(np.float32) * 0.05
    T = lie.se3_exp(jnp.array(xi_T))
    lhs = np.asarray(lie.se3_adjoint(T) @ jnp.array(xi))
    rhs = np.asarray(
        lie.se3_log(
            lie.se3_compose(lie.se3_compose(T, lie.se3_exp(jnp.array(xi))), lie.se3_inverse(T))
        )
    )
    np.testing.assert_allclose(lhs, rhs, atol=1e-3)


def test_rpy_roundtrip_and_scipy(rng):
    rpy = np.stack(
        [
            rng.uniform(-np.pi, np.pi, N),
            rng.uniform(-1.4, 1.4, N),  # avoid gimbal lock
            rng.uniform(-np.pi, np.pi, N),
        ],
        axis=-1,
    ).astype(np.float32)
    q = lie.rpy_to_quat(jnp.array(rpy))
    Rref = Rsp.from_euler("ZYX", rpy[:, ::-1]).as_matrix()
    np.testing.assert_allclose(np.asarray(lie.quat_to_mat(q)), Rref, atol=1e-5)
    rpy2 = np.asarray(lie.quat_to_rpy(q))
    np.testing.assert_allclose(rpy2, rpy, atol=1e-4)


def test_angle_diff_seam():
    a = jnp.array([3.1, -3.1, 0.1])
    b = jnp.array([-3.1, 3.1, -0.1])
    d = np.asarray(lie.angle_diff(a, b))
    np.testing.assert_allclose(d, [-2 * np.pi + 6.2, 2 * np.pi - 6.2, 0.2], atol=1e-5)


def test_quat_slerp_endpoints(rng):
    q0, q1 = jnp.array(random_quats(rng, 8)), jnp.array(random_quats(rng, 8))
    np.testing.assert_allclose(
        np.asarray(lie.quat_slerp(q0, q1, 0.0)), np.asarray(q0), atol=1e-5
    )
    s1 = np.asarray(lie.quat_slerp(q0, q1, 1.0))
    dot = np.abs(np.sum(s1 * np.asarray(q1), axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_vmap_and_jit_compatible(rng):
    w = jnp.array(rng.normal(size=(4, 3)).astype(np.float32))
    f = jax.jit(jax.vmap(lambda v: lie.so3_log(lie.so3_exp(v))))
    np.testing.assert_allclose(np.asarray(f(w)), np.asarray(w), atol=1e-4)
