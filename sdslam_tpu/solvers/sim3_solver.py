"""Sim(3) estimation between matched 3D point sets.

Replaces Sim3Solver (/root/reference/src/Sim3Solver.{h,cc}): Horn's
closed-form absolute orientation inside a 3-point RANSAC loop with symmetric
reprojection inlier checks, plus a GN refinement equivalent to
Optimizer::OptimizeSim3 (Optimizer.cc:958-1142).

TPU design: all RANSAC hypotheses are evaluated in one vmapped batch (the
reference iterates 5 hypotheses at a time on the host, Sim3Solver.cc:137-198);
the inlier check is a dense [B, N] computation.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sdslam_tpu.geometry import camera as cam_mod
from sdslam_tpu.geometry.camera import CameraModel


class Sim3Result(NamedTuple):
    R: jnp.ndarray  # [3,3]
    t: jnp.ndarray  # [3]
    s: jnp.ndarray  # scalar
    inliers: jnp.ndarray  # [N] bool
    n_inliers: jnp.ndarray


def umeyama_sim3(X, Y, mask, fix_scale: bool = False):
    """Weighted least-squares similarity Y ~ s R X + t (Umeyama/Horn).

    X, Y: [N,3]; mask: [N] bool/float weights. Returns (R, t, s).
    """
    w = mask.astype(jnp.float32)
    wsum = jnp.maximum(jnp.sum(w), 1e-6)
    mu_x = jnp.sum(X * w[:, None], 0) / wsum
    mu_y = jnp.sum(Y * w[:, None], 0) / wsum
    Xc = (X - mu_x) * w[:, None]
    Yc = Y - mu_y
    cov = jnp.einsum(
        "ni,nj->ij", Yc * w[:, None], X - mu_x, precision=jax.lax.Precision.HIGHEST
    ) / wsum
    Usvd, D, Vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(Usvd) * jnp.linalg.det(Vt)
    Sfix = jnp.diag(jnp.asarray([1.0, 1.0, jnp.sign(det)]))
    R = Usvd @ Sfix @ Vt
    var_x = jnp.sum(jnp.sum((X - mu_x) ** 2, -1) * w) / wsum
    s = jnp.where(
        fix_scale,
        1.0,
        jnp.sum(D * jnp.diag(Sfix)) / jnp.maximum(var_x, 1e-9),
    )
    t = mu_y - s * R @ mu_x
    return R, t, s


def _sym_reproj_inliers(cam: CameraModel, R, t, s, X1, X2, th2_1, th2_2, valid):
    """Symmetric reprojection check (Sim3Solver::CheckInliers,
    Sim3Solver.cc:321-353): transform X1 (cam-1 frame) into cam 2 via S21,
    project in both directions; inlier if both reprojection errors pass."""
    X1_in2 = s * jnp.einsum("ij,nj->ni", R, X1) + t
    sinv = 1.0 / jnp.maximum(s, 1e-9)
    X2_in1 = sinv * jnp.einsum("ji,nj->ni", R, X2 - t)
    uv12, z12 = cam_mod.project(cam, X1_in2)
    uv21, z21 = cam_mod.project(cam, X2_in1)
    uv1, z1 = cam_mod.project(cam, X1)
    uv2, z2 = cam_mod.project(cam, X2)
    e2 = jnp.sum((uv12 - uv2) ** 2, -1)
    e1 = jnp.sum((uv21 - uv1) ** 2, -1)
    ok = valid & (e2 < th2_2) & (e1 < th2_1) & (z12 > 0) & (z21 > 0)
    return ok


@functools.partial(jax.jit, static_argnames=("cam", "n_hypotheses", "fix_scale"))
def ransac_sim3(
    cam: CameraModel,
    X1,  # [N,3] matched points in keyframe-1 camera frame
    X2,  # [N,3] matched points in keyframe-2 camera frame
    valid,  # [N] bool
    th2_1,  # [N] squared px thresholds (9.21 * sigma2, Sim3Solver.cc:88-95)
    th2_2,
    key,
    n_hypotheses: int = 64,
    fix_scale: bool = False,
) -> Sim3Result:
    """Batched 3-point RANSAC for S21 (maps cam-1 coords into cam-2)."""
    N = X1.shape[0]
    probs = valid.astype(jnp.float32)
    probs = probs / jnp.maximum(jnp.sum(probs), 1e-6)
    idx = jax.random.choice(key, N, shape=(n_hypotheses, 3), p=probs)

    def hyp(i3):
        m = jnp.zeros((N,), bool).at[i3].set(True)
        R, t, s = umeyama_sim3(X1, X2, m & valid, fix_scale=fix_scale)
        ok = _sym_reproj_inliers(cam, R, t, s, X1, X2, th2_1, th2_2, valid)
        return jnp.sum(ok), R, t, s

    counts, Rs, ts, ss = jax.vmap(hyp)(idx)
    best = jnp.argmax(counts)
    R, t, s = Rs[best], ts[best], ss[best]
    ok = _sym_reproj_inliers(cam, R, t, s, X1, X2, th2_1, th2_2, valid)
    # refine on the inlier set (the reference refines via OptimizeSim3)
    R, t, s = umeyama_sim3(X1, X2, ok, fix_scale=fix_scale)
    ok = _sym_reproj_inliers(cam, R, t, s, X1, X2, th2_1, th2_2, valid)
    return Sim3Result(R, t, s, ok, jnp.sum(ok))
