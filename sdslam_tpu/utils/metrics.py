"""Trajectory evaluation: ATE / RPE (TUM-benchmark-style).

The reference has no built-in evaluation; it exports trajectories for the
external TUM scripts (/root/reference/Examples/ROS/SD-SLAM/launch/
sdslam_TUM1_evaluation_file.launch, ros_rgbd.cc:107-175).  Here evaluation is
a first-class utility: numpy implementations of absolute trajectory error
(with Umeyama SE3/Sim3 alignment) and relative pose error.
"""

from __future__ import annotations

import numpy as np


def camera_centers(Tcw_list) -> np.ndarray:
    """[N,4,4] world->camera poses -> [N,3] camera centers in world."""
    T = np.asarray(Tcw_list)
    R = T[:, :3, :3]
    t = T[:, :3, 3]
    return -np.einsum("nji,nj->ni", R, t)


def umeyama(src, dst, with_scale=False):
    """Least-squares similarity src->dst. Returns (s, R, t)."""
    mu_s = src.mean(0)
    mu_d = dst.mean(0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    if with_scale:
        var_s = (xs**2).sum() / len(src)
        s = float(np.trace(np.diag(D) @ S) / var_s)
    else:
        s = 1.0
    t = mu_d - s * R @ mu_s
    return s, R, t


def ate_rmse(est_Tcw, gt_Tcw, align=True, with_scale=False) -> float:
    """Absolute trajectory RMSE (meters) after optional Umeyama alignment."""
    pe = camera_centers(est_Tcw)
    pg = camera_centers(gt_Tcw)
    if align:
        s, R, t = umeyama(pe, pg, with_scale)
        pe = (s * (R @ pe.T)).T + t
    err = np.linalg.norm(pe - pg, axis=1)
    return float(np.sqrt((err**2).mean()))


def rpe(est_Tcw, gt_Tcw, delta: int = 1):
    """Relative pose error over frame pairs (i, i+delta).

    Returns (trans_rmse [m], rot_rmse [rad])."""
    est = np.asarray(est_Tcw)
    gt = np.asarray(gt_Tcw)
    n = len(est) - delta
    terr, rerr = [], []
    for i in range(n):
        de = est[i + delta] @ np.linalg.inv(est[i])
        dg = gt[i + delta] @ np.linalg.inv(gt[i])
        e = de @ np.linalg.inv(dg)
        terr.append(np.linalg.norm(e[:3, 3]))
        c = np.clip((np.trace(e[:3, :3]) - 1) / 2, -1, 1)
        rerr.append(np.arccos(c))
    return float(np.sqrt(np.mean(np.square(terr)))), float(
        np.sqrt(np.mean(np.square(rerr)))
    )
