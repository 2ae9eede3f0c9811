"""Pose estimation tests: GN pose-opt convergence + photometric alignment."""

import numpy as np
import jax.numpy as jnp

from sdslam_tpu.geometry import camera as cam_mod
from sdslam_tpu.geometry import lie
from sdslam_tpu.geometry.camera import CameraModel
from sdslam_tpu.io import synthetic
from sdslam_tpu.ops import pyramid as pyr_ops
from sdslam_tpu.solvers import image_align, pose_opt

CAM = CameraModel(fx=320.0, fy=320.0, cx=159.5, cy=119.5, width=320, height=240, bf=32.0)


def make_scene_points(rng, n=200):
    return rng.uniform([-1.5, -1.0, 1.5], [1.5, 1.0, 5.0], size=(n, 3)).astype(np.float32)


def pose_err(Ta, Tb):
    d = np.asarray(lie.se3_log(jnp.asarray(Ta) @ lie.se3_inv(jnp.asarray(Tb))))
    return np.abs(d[:3]).max(), np.abs(d[3:]).max()


def test_pose_opt_converges_clean(rng):
    X = make_scene_points(rng)
    xi = np.array([0.1, -0.05, 0.08, 0.03, -0.02, 0.04], np.float32)
    T_gt = lie.se3_exp(jnp.asarray(xi))
    uv, z = cam_mod.project(CAM, lie.se3_apply(T_gt, jnp.asarray(X)))
    valid = np.asarray(z) > 0
    T0 = lie.se3_exp(jnp.asarray(xi + rng.normal(size=6).astype(np.float32) * 0.03))
    res = pose_opt.optimize_pose(
        CAM, T0, jnp.asarray(X), uv, jnp.ones(len(X), jnp.float32), jnp.asarray(valid)
    )
    t_err, r_err = pose_err(res.Tcw, T_gt)
    assert t_err < 1e-3 and r_err < 1e-3
    assert int(res.n_inliers) > 190


def test_pose_opt_rejects_outliers(rng):
    X = make_scene_points(rng, 300)
    xi = np.array([0.05, 0.02, -0.03, 0.01, 0.05, -0.02], np.float32)
    T_gt = lie.se3_exp(jnp.asarray(xi))
    uv = np.array(cam_mod.project(CAM, lie.se3_apply(T_gt, jnp.asarray(X)))[0])
    # corrupt 25% of observations
    n_out = 75
    uv[:n_out] += rng.uniform(15, 60, size=(n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    T0 = lie.se3_exp(jnp.asarray(xi + rng.normal(size=6).astype(np.float32) * 0.02))
    res = pose_opt.optimize_pose(
        CAM, T0, jnp.asarray(X), jnp.asarray(uv.astype(np.float32)),
        jnp.ones(len(X), jnp.float32), jnp.ones(len(X), bool),
    )
    t_err, r_err = pose_err(res.Tcw, T_gt)
    assert t_err < 2e-3 and r_err < 2e-3
    inl = np.asarray(res.inliers)
    assert inl[:n_out].mean() < 0.1  # outliers flagged
    assert inl[n_out:].mean() > 0.95


def test_pose_opt_stereo_edges(rng):
    X = make_scene_points(rng)
    T_gt = lie.se3_exp(jnp.asarray(np.array([0.02, 0.01, 0.05, 0.01, -0.03, 0.02], np.float32)))
    Xc = lie.se3_apply(T_gt, jnp.asarray(X))
    uv, z = cam_mod.project(CAM, Xc)
    ur = cam_mod.virtual_right(CAM, uv[:, 0], z)
    T0 = jnp.eye(4)
    res = pose_opt.optimize_pose(
        CAM, T0, jnp.asarray(X), uv, jnp.ones(len(X), jnp.float32),
        jnp.ones(len(X), bool), ur_obs=ur,
    )
    t_err, r_err = pose_err(res.Tcw, T_gt)
    assert t_err < 1e-3 and r_err < 1e-3


def _prep_align(rng, i0=0, i1=1, n_pts=300):
    # 60-frame orbit ~ realistic 30fps inter-frame motion (the reference's
    # operating regime; LK basin is a few px at the coarse level)
    seq = synthetic.SyntheticSequence(CAM, n_frames=60, trajectory="orbit")
    _, img0, depth0 = seq.frame(i0)
    _, img1, _ = seq.frame(i1)
    pyr0 = tuple(pyr_ops.build_pyramid(img0, 5, 2.0))
    pyr1 = tuple(pyr_ops.build_pyramid(img1, 5, 2.0))
    # sample reference points on a grid with rendered depth
    vs, us = np.mgrid[30:210:9, 30:290:9]
    uv = np.stack([us.ravel(), vs.ravel()], 1).astype(np.float32)[:n_pts]
    d = np.asarray(depth0)[uv[:, 1].astype(int), uv[:, 0].astype(int)]
    X_ref = np.asarray(cam_mod.backproject(CAM, jnp.asarray(uv), jnp.asarray(d)))
    T_gt = np.asarray(seq.poses[i1] @ lie.se3_inv(seq.poses[i0]))
    return pyr0, pyr1, uv, X_ref, T_gt


def test_image_align_recovers_pose(rng):
    pyr0, pyr1, uv, X_ref, T_gt = _prep_align(rng)
    valid = jnp.ones(len(uv), bool)
    res = image_align.align(
        pyr0, pyr1, jnp.asarray(uv), jnp.asarray(X_ref), valid,
        jnp.eye(4),  # identity init: must pull in the whole inter-frame motion
        CAM.fx, CAM.fy, CAM.cx, CAM.cy, max_level=4, min_level=1,
    )
    t_err, r_err = pose_err(res.T_cur_ref, T_gt)
    assert t_err < 0.01 and r_err < 0.01
    assert float(res.error) < 0.01
    assert int(res.n_meas) > 1000


def test_image_align_error_signal_discriminates(rng):
    """Aligning non-corresponding frames must report a much higher error than
    aligning true neighbors — this is the loop-detection signal
    (LoopClosing::DetectLoop error<1.5x best)."""
    pyr0, pyr1, uv, X_ref, T_gt = _prep_align(rng, 0, 1)
    valid = jnp.ones(len(uv), bool)
    good = image_align.align(
        pyr0, pyr1, jnp.asarray(uv), jnp.asarray(X_ref), valid, jnp.eye(4),
        CAM.fx, CAM.fy, CAM.cx, CAM.cy, max_level=4, min_level=2,
    )
    # photometrically unrelated view: same geometry, different scene texture
    far_seq = synthetic.SyntheticSequence(CAM, n_frames=2, seed=7)
    _, img_far, _ = far_seq.frame(0)
    pyr_far = tuple(pyr_ops.build_pyramid(img_far, 5, 2.0))
    bad = image_align.align(
        pyr0, pyr_far, jnp.asarray(uv), jnp.asarray(X_ref), valid, jnp.eye(4),
        CAM.fx, CAM.fy, CAM.cx, CAM.cy, max_level=4, min_level=2,
    )
    assert float(good.error) * 3 < float(bad.error)
