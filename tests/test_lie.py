"""Property tests for SO3/SE3/Sim3 (exp/log round trips, group axioms)."""

import numpy as np
import jax.numpy as jnp
import scipy.spatial.transform as sst

from sdslam_tpu.geometry import lie

ATOL = 2e-4


def rand_phi(rng, n, scale=2.0):
    return jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * scale / 3)


def test_so3_exp_matches_scipy(rng):
    phi = rand_phi(rng, 64)
    R = np.asarray(lie.so3_exp(phi))
    R_ref = sst.Rotation.from_rotvec(np.asarray(phi)).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=ATOL)


def test_so3_log_roundtrip(rng):
    phi = rand_phi(rng, 64)
    phi2 = lie.so3_log(lie.so3_exp(phi))
    np.testing.assert_allclose(np.asarray(phi2), np.asarray(phi), atol=ATOL)


def test_so3_log_small_and_near_pi(rng):
    for scale in [1e-6, 1e-4, 3.1, 3.141]:
        v = rng.normal(size=(16, 3)).astype(np.float32)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        phi = jnp.asarray(v * scale)
        R = lie.so3_exp(phi)
        phi2 = lie.so3_log(R)
        R2 = lie.so3_exp(phi2)
        # compare rotations, not tangents (sign ambiguity at pi)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=5e-3)


def test_quat_mat_roundtrip(rng):
    phi = rand_phi(rng, 64)
    R = lie.so3_exp(phi)
    q = lie.mat_to_quat(R)
    R2 = lie.quat_to_mat(q)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=ATOL)
    # quat_rotate consistent with matrix action
    v = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
    rv = lie.quat_rotate(q, v)
    rv2 = jnp.einsum("nij,nj->ni", R, v)
    np.testing.assert_allclose(np.asarray(rv), np.asarray(rv2), atol=ATOL)


def test_se3_exp_log_roundtrip(rng):
    xi = jnp.asarray(rng.normal(size=(64, 6)).astype(np.float32) * 0.5)
    T = lie.se3_exp(xi)
    xi2 = lie.se3_log(T)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=ATOL)


def test_se3_inverse_and_compose(rng):
    xi = jnp.asarray(rng.normal(size=(32, 6)).astype(np.float32) * 0.5)
    T = lie.se3_exp(xi)
    I = T @ lie.se3_inv(T)
    np.testing.assert_allclose(
        np.asarray(I), np.broadcast_to(np.eye(4), (32, 4, 4)), atol=ATOL
    )


def test_se3_apply(rng):
    xi = jnp.asarray(rng.normal(size=(6,)).astype(np.float32))
    T = lie.se3_exp(xi)
    X = jnp.asarray(rng.normal(size=(100, 3)).astype(np.float32))
    Y = lie.se3_apply(T, X)
    Xh = np.concatenate([np.asarray(X), np.ones((100, 1), np.float32)], axis=1)
    Y_ref = (np.asarray(T) @ Xh.T).T[:, :3]
    np.testing.assert_allclose(np.asarray(Y), Y_ref, atol=ATOL)


def test_sim3_exp_log_roundtrip(rng):
    xi = np.concatenate(
        [
            rng.normal(size=(64, 6)).astype(np.float32) * 0.5,
            rng.normal(size=(64, 1)).astype(np.float32) * 0.3,
        ],
        axis=1,
    )
    S = lie.sim3_exp(jnp.asarray(xi))
    xi2 = lie.sim3_log(S)
    np.testing.assert_allclose(np.asarray(xi2), xi, atol=1e-3)


def test_sim3_scale_recovery(rng):
    phi = rand_phi(rng, 16)
    R = lie.so3_exp(phi)
    t = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
    s = jnp.asarray(np.exp(rng.normal(size=16)).astype(np.float32))
    S = lie.sim3_from_Rts(R, t, s)
    R2, t2, s2 = lie.sim3_Rts(S)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-3)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t), atol=1e-4)


def test_sim3_inverse(rng):
    xi = np.concatenate(
        [
            rng.normal(size=(16, 6)).astype(np.float32) * 0.5,
            rng.normal(size=(16, 1)).astype(np.float32) * 0.3,
        ],
        axis=1,
    )
    S = lie.sim3_exp(jnp.asarray(xi))
    I = S @ lie.sim3_inv(S)
    np.testing.assert_allclose(
        np.asarray(I), np.broadcast_to(np.eye(4), (16, 4, 4)), atol=1e-3
    )


def test_sim3_se3_embedding(rng):
    xi6 = jnp.asarray(rng.normal(size=(8, 6)).astype(np.float32) * 0.5)
    T = lie.se3_exp(xi6)
    xi7 = lie.sim3_log(T)
    np.testing.assert_allclose(np.asarray(xi7[:, 6]), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(xi7[:, :6]), np.asarray(xi6), atol=1e-3)
