"""EPnP solver tests: exact recovery, noise, outliers, degenerate guards."""

import numpy as np
import jax
import jax.numpy as jnp

from sdslam_tpu.geometry import lie
from sdslam_tpu.geometry.camera import CameraModel
from sdslam_tpu.solvers import epnp

CAM = CameraModel(fx=320.0, fy=320.0, cx=159.5, cy=119.5, width=320, height=240)


def make_problem(rng, n=100, noise=0.0, n_out=0):
    Xw = rng.uniform([-1.5, -1.0, -0.5], [1.5, 1.0, 0.5], size=(n, 3)).astype(np.float32)
    xi = np.array([0.2, -0.1, 2.2, 0.15, -0.2, 0.1], np.float32)
    T = np.asarray(lie.se3_exp(jnp.asarray(xi)))
    R, t = T[:3, :3], T[:3, 3]
    Xc = Xw @ R.T + t
    uv = np.stack(
        [CAM.fx * Xc[:, 0] / Xc[:, 2] + CAM.cx, CAM.fy * Xc[:, 1] / Xc[:, 2] + CAM.cy], 1
    ).astype(np.float32)
    uv += rng.normal(size=uv.shape).astype(np.float32) * noise
    if n_out:
        uv[:n_out] += rng.uniform(20, 60, size=(n_out, 2)).astype(np.float32)
    return Xw, uv, R, t


def rot_err(Ra, Rb):
    c = np.clip((np.trace(Ra.T @ Rb) - 1) / 2, -1, 1)
    return np.degrees(np.arccos(c))


def test_epnp_exact(rng):
    Xw, uv, R_gt, t_gt = make_problem(rng)
    R, t, err = epnp.epnp(CAM, jnp.asarray(Xw), jnp.asarray(uv), jnp.ones(len(Xw), bool))
    assert rot_err(np.asarray(R), R_gt) < 0.2
    assert np.linalg.norm(np.asarray(t) - t_gt) < 0.01
    assert float(err) < 0.5


def test_epnp_ransac_with_outliers(rng):
    Xw, uv, R_gt, t_gt = make_problem(rng, noise=0.5, n_out=30)
    res = epnp.ransac_epnp(
        CAM, jnp.asarray(Xw), jnp.asarray(uv), jnp.ones(len(Xw), bool),
        jax.random.key(0),
    )
    assert bool(res.success)
    assert rot_err(np.asarray(res.R), R_gt) < 1.0
    assert np.linalg.norm(np.asarray(res.t) - t_gt) < 0.05
    inl = np.asarray(res.inliers)
    assert inl[:30].mean() < 0.2
    assert inl[30:].mean() > 0.9


def test_epnp_insufficient_points(rng):
    Xw, uv, R_gt, t_gt = make_problem(rng, n=100)
    valid = np.zeros(100, bool)
    valid[:5] = True
    res = epnp.ransac_epnp(
        CAM, jnp.asarray(Xw), jnp.asarray(uv), jnp.asarray(valid),
        jax.random.key(1), min_inliers=10,
    )
    assert not bool(res.success)
