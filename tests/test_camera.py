"""Camera model tests: projection round trips, distortion vs OpenCV oracle."""

import numpy as np
import jax.numpy as jnp

from sdslam_tpu.geometry import camera as cam_mod
from sdslam_tpu.geometry.camera import CameraModel

TUM1 = CameraModel(
    fx=517.306408,
    fy=516.469215,
    cx=318.643040,
    cy=255.313989,
    width=640,
    height=480,
    k1=0.262383,
    k2=-0.953104,
    p1=-0.005358,
    p2=0.002628,
    k3=1.163314,
    bf=40.0,
)
SIMPLE = CameraModel(fx=525.0, fy=525.0, cx=319.5, cy=239.5, width=640, height=480)


def test_project_backproject_roundtrip(rng):
    X = rng.uniform([-1, -1, 0.5], [1, 1, 5], size=(200, 3)).astype(np.float32)
    uv, z = cam_mod.project(SIMPLE, jnp.asarray(X))
    X2 = cam_mod.backproject(SIMPLE, uv, z)
    np.testing.assert_allclose(np.asarray(X2), X, atol=1e-3)


def test_distort_undistort_roundtrip(rng):
    xn = rng.uniform(-0.35, 0.35, size=(200, 2)).astype(np.float32)
    xd = cam_mod.distort_normalized(TUM1, jnp.asarray(xn))
    xu = cam_mod.undistort_normalized(TUM1, xd, iters=20)
    np.testing.assert_allclose(np.asarray(xu), xn, atol=1e-4)


def test_distortion_matches_opencv(rng):
    import cv2

    xn = rng.uniform(-0.3, 0.3, size=(100, 2)).astype(np.float64)
    X = np.concatenate([xn, np.ones((100, 1))], axis=1)
    K = np.asarray(TUM1.K, np.float64)
    dist = np.array([TUM1.k1, TUM1.k2, TUM1.p1, TUM1.p2, TUM1.k3])
    uv_cv, _ = cv2.projectPoints(X, np.zeros(3), np.zeros(3), K, dist)
    uv_cv = uv_cv.reshape(-1, 2)
    uv, _ = cam_mod.project(TUM1, jnp.asarray(X.astype(np.float32)), distort=True)
    np.testing.assert_allclose(np.asarray(uv), uv_cv, atol=0.1)


def test_undistort_pixels_matches_opencv(rng):
    import cv2

    uv = rng.uniform([50, 50], [590, 430], size=(100, 2)).astype(np.float32)
    K = np.asarray(TUM1.K, np.float64)
    dist = np.array([TUM1.k1, TUM1.k2, TUM1.p1, TUM1.p2, TUM1.k3])
    und_cv = cv2.undistortPoints(uv.reshape(-1, 1, 2).astype(np.float64), K, dist, P=K)
    und_cv = und_cv.reshape(-1, 2)
    und = cam_mod.undistort_pixels(TUM1, jnp.asarray(uv))
    np.testing.assert_allclose(np.asarray(und), und_cv, atol=0.15)


def test_projection_jacobian_matches_fd(rng):
    X = rng.uniform([-1, -1, 1.0], [1, 1, 4], size=(50, 3)).astype(np.float32)
    J = np.asarray(cam_mod.project_jacobian(SIMPLE, jnp.asarray(X)))
    eps = 1e-3
    for k in range(3):
        dX = np.zeros(3, np.float32)
        dX[k] = eps
        up, _ = cam_mod.project(SIMPLE, jnp.asarray(X + dX))
        um, _ = cam_mod.project(SIMPLE, jnp.asarray(X - dX))
        fd = (np.asarray(up) - np.asarray(um)) / (2 * eps)
        np.testing.assert_allclose(J[:, :, k], fd, atol=5e-2, rtol=1e-2)


def test_virtual_right():
    u = jnp.asarray([100.0, 200.0])
    d = jnp.asarray([2.0, 0.0])
    vr = cam_mod.virtual_right(TUM1, u, d)
    np.testing.assert_allclose(np.asarray(vr), [100.0 - 40.0 / 2.0, -1.0])


def test_scaled_intrinsics():
    c2 = SIMPLE.scaled(0.5)
    assert c2.width == 320 and c2.height == 240
    np.testing.assert_allclose(c2.fx, SIMPLE.fx * 0.5)
