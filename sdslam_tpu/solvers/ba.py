"""Bundle adjustment with Schur-complement elimination of landmarks.

Replaces the reference's g2o BlockSolver_6_3 + LM pipeline (Optimizer.cc:
LocalBundleAdjustment :417-714, BundleAdjustment/GlobalBundleAdjustemnt
:46-219) and the vendored g2o engine itself (src/extra/g2o) with one batched
TPU formulation:

  * The observation graph comes straight from the map's kf_mp table
    (build_obs_lists): edges are [P, M] (point, observing-KF) pairs with a
    static per-point cap M.
  * Per-iteration: batched residuals/Jacobians for every edge at once ->
    per-point 3x3 Hpp + per-camera 6x6 Hcc via segment scatter -> dense
    Schur-reduced camera system S [6K, 6K] assembled by scatter-adding
    M x M per-point coupling blocks -> one dense Cholesky solve (MXU) ->
    batched landmark back-substitution.
  * Fixed cameras (the reference's frontier KFs / KF0) stay in the system
    with a huge diagonal prior instead of being removed — static shapes,
    no graph rebuilds.
  * Robust Huber weights, per-octave information, mono 2D + stereo 3D
    (u, v, u_r) residuals; outlier observations erased between passes
    exactly like the reference's two-stage 5+10 iteration schedule.

The dense reduced camera system is deliberate: for K <= a few hundred KFs a
[6K, 6K] Cholesky is a single large MXU op, far faster on TPU than sparse
pointer-chasing — and it is the unit that distributes across a device mesh
(psum of per-shard S contributions; see parallel/).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from sdslam_tpu.geometry import lie
from sdslam_tpu.geometry.camera import CameraModel
from sdslam_tpu.mapping import map_state as M

CHI2_MONO = 5.991
CHI2_STEREO = 7.815
HUBER_MONO = 2.4477
HUBER_STEREO = 2.7955
FIXED_PRIOR = 1e12  # diagonal prior pinning fixed cameras


class BAResult(NamedTuple):
    kf_Tcw: jnp.ndarray  # [K,4,4] updated poses
    pt_pos: jnp.ndarray  # [P,3] updated points
    obs_inlier: jnp.ndarray  # [P,M] bool surviving observations
    chi2: jnp.ndarray  # scalar mean inlier chi2


def _edge_terms(cam, kf_Tcw, pt_pos, obs_kf, obs_kp, kf_uv_und, kf_uright, kf_octave, scale_factor):
    """Residuals r [P,M,3], Jacobians Jc [P,M,3,6], Jp [P,M,3,3], info w [P,M]."""
    P, Mo = obs_kf.shape
    c = jnp.clip(obs_kf, 0, kf_Tcw.shape[0] - 1)
    k = jnp.clip(obs_kp, 0, kf_uv_und.shape[1] - 1)
    T = kf_Tcw[c]  # [P,M,4,4]
    Xc = lie.se3_apply(T, pt_pos[:, None, :])  # [P,M,3]
    x, y, z = Xc[..., 0], Xc[..., 1], Xc[..., 2]
    zi = 1.0 / jnp.maximum(z, 1e-6)
    zi2 = zi * zi
    u = cam.fx * x * zi + cam.cx
    v = cam.fy * y * zi + cam.cy
    ur = u - cam.bf * zi
    uv_obs = kf_uv_und[c, k]  # [P,M,2]
    ur_obs = kf_uright[c, k]
    stereo = ur_obs >= 0
    r = jnp.stack(
        [u - uv_obs[..., 0], v - uv_obs[..., 1], jnp.where(stereo, ur - ur_obs, 0.0)],
        axis=-1,
    )
    zero = jnp.zeros_like(x)
    Ju = jnp.stack([cam.fx * zi, zero, -cam.fx * x * zi2], -1)
    Jv = jnp.stack([zero, cam.fy * zi, -cam.fy * y * zi2], -1)
    Jr = jnp.stack([cam.fx * zi, zero, -cam.fx * x * zi2 + cam.bf * zi2], -1)
    JX = jnp.stack([Ju, Jv, Jr], axis=-2)  # [P,M,3,3] d(uvr)/dXc
    ones = jnp.ones_like(x)
    row_mask = jnp.stack([ones, ones, stereo.astype(x.dtype)], -1)
    JX = JX * row_mask[..., None]
    # camera: left-perturbation Tcw <- Exp(xi) Tcw: dXc/dxi = [I | -hat(Xc)]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=x.dtype), Xc.shape[:-1] + (3, 3))
    dXdxi = jnp.concatenate([eye, -lie.hat(Xc)], axis=-1)  # [P,M,3,6]
    Jc = jnp.einsum("...ij,...jk->...ik", JX, dXdxi)
    # point: dXc/dXw = R
    R = T[..., :3, :3]
    Jp = jnp.einsum("...ij,...jk->...ik", JX, R)
    inv_sigma2 = 1.0 / scale_factor ** (2.0 * kf_octave[c, k].astype(jnp.float32))
    behind = z <= 0.05
    return r, Jc, Jp, inv_sigma2, stereo, behind


def _gn_iteration(
    cam,
    kf_Tcw,
    pt_pos,
    obs_kf,
    obs_kp,
    obs_ok,
    kf_uv_und,
    kf_uright,
    kf_octave,
    cam_active,
    pt_active,
    scale_factor,
    use_huber: bool,
    lm_lambda: float,
):
    K = kf_Tcw.shape[0]
    P, Mo = obs_kf.shape
    r, Jc, Jp, info, stereo, behind = _edge_terms(
        cam, kf_Tcw, pt_pos, obs_kf, obs_kp, kf_uv_und, kf_uright, kf_octave, scale_factor
    )
    ok = obs_ok & (~behind)
    w = info * ok
    if use_huber:
        rn = jnp.sqrt(jnp.sum(r * r, -1) * info + 1e-12)
        hub = jnp.where(stereo, HUBER_STEREO, HUBER_MONO)
        w = w * jnp.minimum(1.0, hub / jnp.maximum(rn, 1e-9))
    # zero-out Jacobians of fixed cameras / points
    c = jnp.clip(obs_kf, 0, K - 1)
    Jc = Jc * cam_active[c][..., None, None]
    Jp = Jp * pt_active[:, None, None, None]

    wJc = Jc * w[..., None, None]
    wJp = Jp * w[..., None, None]
    hp = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)

    # one-hot camera indicator U[p,m,k]: all edge->camera reductions become
    # matmuls on the MXU (scatter-add assembly serializes on TPU and was the
    # dominant BA cost; the Schur pair term factors per point, so
    # S[a,b] = sum_p YU[p,a] @ WU[p,b]^T needs no [P,M,M] blocks at all)
    U = (c[..., None] == jnp.arange(K)[None, None, :]).astype(jnp.float32)
    U = U * ok[..., None]  # masked edges contribute nothing

    # per-point 3x3 and gradient
    Hpp = hp("pmri,pmrj->pij", wJp, Jp)  # [P,3,3]
    bp = -hp("pmri,pmr->pi", wJp, r)  # [P,3]
    # per-camera 6x6 and gradient
    Hcc_e = hp("pmri,pmrj->pmij", wJc, Jc)  # [P,M,6,6]
    bc_e = -hp("pmri,pmr->pmi", wJc, r)  # [P,M,6]
    Hcc = hp("pmk,pmij->kij", U, Hcc_e)  # [K,6,6]
    bc = hp("pmk,pmi->ki", U, bc_e)  # [K,6]
    # coupling blocks W = Jc^T w Jp per edge
    W = hp("pmri,pmrj->pmij", wJc, Jp)  # [P,M,6,3]

    # damp + invert point blocks
    damp_p = lm_lambda * jnp.maximum(
        jnp.trace(Hpp, axis1=-2, axis2=-1)[..., None, None] / 3.0, 1e-8
    )
    Hpp_d = Hpp + damp_p * jnp.broadcast_to(jnp.eye(3), Hpp.shape) + 1e-9 * jnp.eye(3)
    Hpp_inv = jnp.linalg.inv(Hpp_d)
    Y = hp("pmij,pjk->pmik", W, Hpp_inv)  # [P,M,6,3]

    # Schur assembly via per-point camera aggregates
    YU = hp("pmk,pmic->pkic", U, Y)  # [P,K,6,3]
    WU = hp("pmk,pmic->pkic", U, W)  # [P,K,6,3]
    S = -hp("paic,pbjc->abij", YU, WU)  # [K,K,6,6]
    S = S.at[jnp.arange(K), jnp.arange(K)].add(Hcc)
    # reduced gradient: bs = bc - sum_i Y_i bp
    bs = bc - hp("pkic,pc->ki", YU, bp)

    # camera damping + fixed-camera prior
    diag_scale = jnp.maximum(
        jnp.trace(S[jnp.arange(K), jnp.arange(K)], axis1=-2, axis2=-1) / 6.0, 1e-6
    )
    prior = jnp.where(cam_active, lm_lambda * diag_scale, FIXED_PRIOR)
    S = S.at[jnp.arange(K), jnp.arange(K)].add(
        prior[:, None, None] * jnp.broadcast_to(jnp.eye(6), (K, 6, 6))
    )

    # dense solve of the reduced camera system (MXU)
    S_dense = S.transpose(0, 2, 1, 3).reshape(K * 6, K * 6)
    b_dense = bs.reshape(K * 6)
    L, low = jax.scipy.linalg.cho_factor(S_dense, lower=True)
    dc = jax.scipy.linalg.cho_solve((L, low), b_dense).reshape(K, 6)
    dc = dc * cam_active[:, None]

    # landmark back-substitution: dp = Hpp^-1 (bp - sum_m W_m^T dc_m)
    dc_pm = hp("pmk,ki->pmi", U, dc)  # gather-free per-edge camera updates
    Wt_dc = hp("pmij,pmi->pj", W, dc_pm)
    dp = hp("pij,pj->pi", Hpp_inv, bp - Wt_dc) * pt_active[:, None]

    kf_Tcw_new = jnp.where(
        cam_active[:, None, None], lie.se3_exp(dc) @ kf_Tcw, kf_Tcw
    )
    pt_pos_new = pt_pos + dp
    return kf_Tcw_new, pt_pos_new


def _robust_cost(cam, kf_Tcw, pt_pos, obs_kf, obs_kp, obs_ok, kf_uv_und, kf_uright, kf_octave, scale_factor):
    """Total Huber-robustified cost over included edges (for LM accept/reject)."""
    r, _, _, info, stereo, behind = _edge_terms(
        cam, kf_Tcw, pt_pos, obs_kf, obs_kp, kf_uv_und, kf_uright, kf_octave, scale_factor
    )
    ok = obs_ok & (~behind)
    chi2 = jnp.sum(r * r, -1) * info
    delta = jnp.where(stereo, HUBER_STEREO, HUBER_MONO)
    d2 = delta * delta
    rho = jnp.where(chi2 <= d2, chi2, 2.0 * delta * jnp.sqrt(chi2) - d2)
    return jnp.sum(jnp.where(ok, rho, 0.0))


def _chi2(cam, kf_Tcw, pt_pos, obs_kf, obs_kp, obs_ok, kf_uv_und, kf_uright, kf_octave, scale_factor):
    r, _, _, info, stereo, behind = _edge_terms(
        cam, kf_Tcw, pt_pos, obs_kf, obs_kp, kf_uv_und, kf_uright, kf_octave, scale_factor
    )
    chi2 = jnp.sum(r * r, -1) * info
    th = jnp.where(stereo, CHI2_STEREO, CHI2_MONO)
    inlier = obs_ok & (~behind) & (chi2 <= th)
    mean = jnp.sum(jnp.where(inlier, chi2, 0.0)) / jnp.maximum(jnp.sum(inlier), 1)
    return chi2, inlier, mean


@functools.partial(
    jax.jit,
    static_argnames=("cam", "scale_factor", "iters1", "iters2", "max_obs"),
)
def bundle_adjust(
    cam: CameraModel,
    ms: M.MapState,
    cam_active,  # [K] bool: cameras to optimize (others fixed)
    pt_active,  # [P] bool: points to optimize
    scale_factor: float = 2.0,
    iters1: int = 4,
    iters2: int = 6,
    max_obs: int = 16,
    lm_lambda: float = 1e-4,
) -> BAResult:
    """Two-stage BA (5 iters -> outlier erase -> 10 iters), the reference's
    LocalBundleAdjustment schedule (Optimizer.cc:608-653)."""
    obs_kf, obs_kp = M.build_obs_lists(ms, max_obs)
    obs_ok = obs_kf >= 0
    # a point is optimizable with >= 2 mono observations, or with a single
    # STEREO observation (u_r ties it to measured depth: a full 3D
    # measurement, so no gauge freedom — the RGB-D case)
    n_obs = jnp.sum(obs_ok, axis=1)
    ur = ms.kf_uright[
        jnp.clip(obs_kf, 0, ms.K - 1), jnp.clip(obs_kp, 0, ms.N - 1)
    ]
    n_stereo = jnp.sum(obs_ok & (ur >= 0), axis=1)
    pt_act = pt_active & ms.pt_valid & ((n_obs >= 2) | (n_stereo >= 1))
    cam_act = cam_active & ms.kf_valid
    # only edges of optimizable points enter the system: a frozen point with
    # residuals would act as a wrong anchor and bias every camera observing
    # it (the reference's BA graphs likewise contain only optimized points)
    obs_ok = obs_ok & pt_act[:, None]

    kf_Tcw, pt_pos = ms.kf_Tcw, ms.pt_pos
    args = (ms.kf_uv_und, ms.kf_uright, ms.kf_octave)

    def stage(carry, n_iters, use_huber):
        """Levenberg-Marquardt: adaptive lambda with accept/reject, matching
        g2o's OptimizationAlgorithmLevenberg step control."""
        kf_Tcw, pt_pos, obs_ok = carry
        cost0 = _robust_cost(cam, kf_Tcw, pt_pos, obs_kf, obs_kp, obs_ok, *args, scale_factor)

        def body(_, st):
            T, X, lam, cost = st
            T_new, X_new = _gn_iteration(
                cam, T, X, obs_kf, obs_kp, obs_ok, *args,
                cam_act, pt_act, scale_factor, use_huber, lam,
            )
            cost_new = _robust_cost(
                cam, T_new, X_new, obs_kf, obs_kp, obs_ok, *args, scale_factor
            )
            accept = cost_new < cost
            T = jnp.where(accept, T_new, T)
            X = jnp.where(accept, X_new, X)
            cost = jnp.where(accept, cost_new, cost)
            lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-7), jnp.minimum(lam * 8.0, 1e3))
            return (T, X, lam, cost)

        kf_Tcw, pt_pos, _, _ = jax.lax.fori_loop(
            0, n_iters, body, (kf_Tcw, pt_pos, jnp.asarray(lm_lambda, jnp.float32), cost0)
        )
        return kf_Tcw, pt_pos

    kf_Tcw, pt_pos = stage((kf_Tcw, pt_pos, obs_ok), iters1, True)
    # outlier pass (Optimizer.cc:612-629)
    chi2, inlier, _ = _chi2(
        cam, kf_Tcw, pt_pos, obs_kf, obs_kp, obs_ok, *args, scale_factor
    )
    obs_ok2 = obs_ok & inlier
    kf_Tcw, pt_pos = stage((kf_Tcw, pt_pos, obs_ok2), iters2, True)
    chi2, inlier, mean = _chi2(
        cam, kf_Tcw, pt_pos, obs_kf, obs_kp, obs_ok2, *args, scale_factor
    )
    return BAResult(kf_Tcw, pt_pos, obs_ok2 & inlier, mean)


def apply_ba_result(
    ms: M.MapState, res: BAResult, obs_kf=None, obs_kp=None, max_obs: int = 16
) -> M.MapState:
    """Write BA output back into the map and erase outlier observations
    (the reference erases them under the map mutex, Optimizer.cc:686-695)."""
    if obs_kf is None:
        obs_kf, obs_kp = M.build_obs_lists(ms, max_obs)
    ms = ms._replace(kf_Tcw=res.kf_Tcw, pt_pos=res.pt_pos)
    # erase observations flagged as outliers: clear kf_mp[c, k]
    bad = (obs_kf >= 0) & (~res.obs_inlier)
    c = jnp.where(bad, obs_kf, ms.K)  # OOB sentinel -> dropped
    k = jnp.clip(obs_kp, 0, ms.N - 1)
    kf_mp = ms.kf_mp.at[c.ravel(), k.ravel()].set(-1, mode="drop")
    return ms._replace(kf_mp=kf_mp)


def local_ba(
    cam: CameraModel,
    ms: M.MapState,
    center_kf: int,
    scale_factor: float = 2.0,
    covis_min: int = 15,
    max_obs: int = 16,
    covis=None,
) -> M.MapState:
    """Local BA around a keyframe: optimize it + its covisible neighbors +
    their points; every other KF observing those points stays fixed
    (Optimizer::LocalBundleAdjustment, Optimizer.cc:417-714)."""
    cov = M.covisibility(ms) if covis is None else covis
    local = cov[center_kf] >= covis_min
    local = local.at[center_kf].set(True)
    local = local & ms.kf_valid
    # the oldest keyframe is always fixed, even when covisible — the gauge
    # anchor (the reference fixes KF id 0 inside local BA, Optimizer.cc:486)
    oldest = jnp.argmin(
        jnp.where(ms.kf_valid, ms.kf_frame_id, jnp.iinfo(jnp.int32).max)
    )
    local = local.at[oldest].set(False)
    # active points: observed by any local KF
    obs = M.observation_table(ms)
    pt_local = jnp.zeros((ms.P,), bool)
    contrib = jnp.where(local[:, None], obs, -1)
    pt_local = pt_local.at[jnp.where(contrib >= 0, contrib, ms.P).ravel()].set(
        True, mode="drop"
    )
    res = bundle_adjust(
        cam, ms, local, pt_local, scale_factor=scale_factor, max_obs=max_obs
    )
    return apply_ba_result(ms, res, max_obs=max_obs)


def global_ba(
    cam: CameraModel,
    ms: M.MapState,
    fixed_kf: int = 0,
    scale_factor: float = 2.0,
    iters: int = 10,
    max_obs: int = 16,
) -> M.MapState:
    """Full-map BA with one gauge-fixing keyframe
    (GlobalBundleAdjustemnt [sic], Optimizer.cc:46-50)."""
    cam_active = ms.kf_valid.at[fixed_kf].set(False)
    res = bundle_adjust(
        cam, ms, cam_active, ms.pt_valid,
        scale_factor=scale_factor, iters1=iters // 2, iters2=iters, max_obs=max_obs,
    )
    return apply_ba_result(ms, res, max_obs=max_obs)
