"""Two-view monocular initializer tests: F path (general 3D), H path
(planar), outlier robustness, degenerate rejection."""

import numpy as np
import jax
import jax.numpy as jnp

from sdslam_tpu.geometry import lie
from sdslam_tpu.geometry.camera import CameraModel
from sdslam_tpu.solvers import initializer

CAM = CameraModel(fx=320.0, fy=320.0, cx=159.5, cy=119.5, width=320, height=240)


def project(X):
    return np.stack(
        [CAM.fx * X[:, 0] / X[:, 2] + CAM.cx, CAM.fy * X[:, 1] / X[:, 2] + CAM.cy], 1
    ).astype(np.float32)


def make_pair(rng, planar=False, n=200, noise=0.3, n_out=0):
    if planar:
        X = rng.uniform([-1.2, -0.9, 0], [1.2, 0.9, 0], size=(n, 3)).astype(np.float32)
        X[:, 2] = 2.0 + 0.3 * X[:, 0] * 0.2  # slightly tilted plane
    else:
        X = rng.uniform([-1.2, -0.9, 1.5], [1.2, 0.9, 3.5], size=(n, 3)).astype(np.float32)
    xi = np.array([0.12, -0.05, 0.04, 0.02, 0.06, -0.01], np.float32)
    T21 = np.asarray(lie.se3_exp(jnp.asarray(xi)))
    R, t = T21[:3, :3], T21[:3, 3]
    X2 = X @ R.T + t
    uv1 = project(X) + rng.normal(size=(n, 2)).astype(np.float32) * noise
    uv2 = project(X2) + rng.normal(size=(n, 2)).astype(np.float32) * noise
    if n_out:
        uv2[:n_out] += rng.uniform(20, 80, size=(n_out, 2)).astype(np.float32)
    valid = np.ones(n, bool)
    return uv1, uv2, valid, R, t, X


def rot_err(Ra, Rb):
    c = np.clip((np.trace(Ra.T @ Rb) - 1) / 2, -1, 1)
    return np.degrees(np.arccos(c))


def dir_err(ta, tb):
    c = abs(float(ta @ tb) / (np.linalg.norm(ta) * np.linalg.norm(tb) + 1e-12))
    return np.degrees(np.arccos(np.clip(c, 0, 1)))


def test_general_scene(rng):
    uv1, uv2, valid, R_gt, t_gt, X = make_pair(rng)
    res = initializer.initialize_two_view(
        CAM, jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(valid), jax.random.key(0)
    )
    assert bool(res.success)
    assert rot_err(np.asarray(res.R21), R_gt) < 1.0
    assert dir_err(np.asarray(res.t21), t_gt) < 3.0
    assert int(res.n_good) > 150
    # triangulated structure correct up to the global scale
    inl = np.asarray(res.inliers)
    scale = np.median(np.asarray(res.X1)[inl, 2] / X[inl, 2])
    err = np.linalg.norm(np.asarray(res.X1)[inl] / scale - X[inl], axis=1)
    assert np.median(err) < 0.1  # DLT with 0.3px noise, no refinement


def test_planar_scene_uses_homography(rng):
    uv1, uv2, valid, R_gt, t_gt, X = make_pair(rng, planar=True)
    res = initializer.initialize_two_view(
        CAM, jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(valid), jax.random.key(1)
    )
    assert bool(res.used_homography)
    assert bool(res.success)
    assert rot_err(np.asarray(res.R21), R_gt) < 1.5
    assert dir_err(np.asarray(res.t21), t_gt) < 5.0


def test_with_outliers(rng):
    uv1, uv2, valid, R_gt, t_gt, X = make_pair(rng, n_out=50)
    res = initializer.initialize_two_view(
        CAM, jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(valid), jax.random.key(2)
    )
    assert bool(res.success)
    assert rot_err(np.asarray(res.R21), R_gt) < 1.5
    inl = np.asarray(res.inliers)
    assert inl[:50].mean() < 0.1  # outliers rejected


def test_pure_rotation_rejected(rng):
    """No parallax -> initialization must fail (no triangulable structure)."""
    n = 200
    X = rng.uniform([-1.2, -0.9, 1.5], [1.2, 0.9, 3.5], size=(n, 3)).astype(np.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray(np.array([0.0, 0.08, 0.0], np.float32))))
    uv1 = project(X)
    uv2 = project(X @ R.T)
    ok = ((uv2[:, 0] > 0) & (uv2[:, 0] < 320) & (uv2[:, 1] > 0) & (uv2[:, 1] < 240))
    res = initializer.initialize_two_view(
        CAM, jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(ok), jax.random.key(3)
    )
    assert not bool(res.success)
