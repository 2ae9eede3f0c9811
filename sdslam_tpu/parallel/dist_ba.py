"""Distributed bundle adjustment over a device mesh.

The TPU-native replacement for the reference's absent distributed layer
(SURVEY.md §2.9): landmarks + observation blocks are sharded across devices
(axis "dp"); each device computes the Schur contributions of its point
shard; the reduced camera system S [6K,6K] and gradient are combined with
one psum over ICI; the dense Cholesky solve is replicated (it is tiny
relative to the edge work); landmark back-substitution stays fully local to
each shard.  This is the BASELINE.json north-star recipe: "distributed BA
via Schur-reduced camera systems with psum of the reduced normal equations".

Communication per iteration: one psum of [6K*6K + 6K] floats (K=256 ->
9.4 MB) — independent of the number of points, so scaling over points is
near-linear until the collective dominates.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sdslam_tpu.geometry import lie
from sdslam_tpu.geometry.camera import CameraModel
from sdslam_tpu.solvers import ba as ba_mod


def _shard_terms(cam, kf_Tcw, pt_pos, obs_kf, obs_kp, obs_ok, kf_uv_und,
                 kf_uright, kf_octave, cam_active, pt_active, scale_factor,
                 use_huber, lm_lambda, K):
    """Per-shard Schur contributions (runs under shard_map on a point shard).

    Returns (S_local [K,K,6,6], bs_local [K,6], Hpp_inv [Ploc,3,3],
    W [Ploc,M,6,3], bp [Ploc,3])."""
    hp = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)
    es = ba_mod._prep_edges(
        obs_kf, obs_kp, kf_uv_und, kf_uright, kf_octave, scale_factor, K
    )
    r, Jc, Jp, info, stereo, behind = ba_mod._edge_terms_from(
        cam, kf_Tcw, pt_pos, es, scale_factor
    )
    ok = obs_ok & (~behind)
    w = info * ok
    if use_huber:
        rn = jnp.sqrt(jnp.sum(r * r, -1) * info + 1e-12)
        hub = jnp.where(stereo, ba_mod.HUBER_STEREO, ba_mod.HUBER_MONO)
        w = w * jnp.minimum(1.0, hub / jnp.maximum(rn, 1e-9))
    c = jnp.clip(obs_kf, 0, K - 1)
    Jc = Jc * cam_active[c][..., None, None]
    Jp = Jp * pt_active[:, None, None, None]
    wJc = Jc * w[..., None, None]
    wJp = Jp * w[..., None, None]

    Ploc, Mo = obs_kf.shape
    # MXU one-hot assembly (see ba._gn_iteration): the Schur pair term
    # factors per point, so no [P,M,M] blocks and no scatters
    U = es.cam_onehot * ok[..., None]
    Hpp = hp("pmri,pmrj->pij", wJp, Jp)
    bp = -hp("pmri,pmr->pi", wJp, r)
    Hcc_e = hp("pmri,pmrj->pmij", wJc, Jc)
    bc_e = -hp("pmri,pmr->pmi", wJc, r)
    Hcc = hp("pmk,pmij->kij", U, Hcc_e)
    bc = hp("pmk,pmi->ki", U, bc_e)
    W = hp("pmri,pmrj->pmij", wJc, Jp)
    damp_p = lm_lambda * jnp.maximum(
        jnp.trace(Hpp, axis1=-2, axis2=-1)[..., None, None] / 3.0, 1e-8
    )
    Hpp_inv = ba_mod._inv3x3_spd(
        Hpp + damp_p * jnp.broadcast_to(jnp.eye(3), Hpp.shape) + 1e-9 * jnp.eye(3)
    )
    Y = hp("pmij,pjk->pmik", W, Hpp_inv)
    YU = hp("pmk,pmic->pkic", U, Y)
    WU = hp("pmk,pmic->pkic", U, W)
    S = -hp("paic,pbjc->abij", YU, WU)
    S = S.at[jnp.arange(K), jnp.arange(K)].add(Hcc)
    bs = bc - hp("pkic,pc->ki", YU, bp)
    return S, bs, Hpp_inv, W, bp, c, U


def make_distributed_gn_step(mesh: Mesh, cam: CameraModel, K: int,
                             scale_factor: float = 2.0,
                             use_huber: bool = True,
                             lm_lambda: float = 1e-4):
    """Build a jitted one-iteration distributed GN step.

    Sharding: point-indexed arrays over mesh axis 'dp'; camera arrays
    replicated. Returns a function
      step(kf_Tcw, pt_pos, obs_kf, obs_kp, obs_ok, kf_uv_und, kf_uright,
           kf_octave, cam_active, pt_active) -> (kf_Tcw', pt_pos')
    """

    def step_local(kf_Tcw, pt_pos, obs_kf, obs_kp, obs_ok, kf_uv_und,
                   kf_uright, kf_octave, cam_active, pt_active):
        S, bs, Hpp_inv, W, bp, c, U = _shard_terms(
            cam, kf_Tcw, pt_pos, obs_kf, obs_kp, obs_ok, kf_uv_und,
            kf_uright, kf_octave, cam_active, pt_active, scale_factor,
            use_huber, lm_lambda, K,
        )
        # combine the reduced camera system over ICI
        S = jax.lax.psum(S, "dp")
        bs = jax.lax.psum(bs, "dp")
        diag_scale = jnp.maximum(
            jnp.trace(S[jnp.arange(K), jnp.arange(K)], axis1=-2, axis2=-1) / 6.0,
            1e-6,
        )
        prior = jnp.where(cam_active, lm_lambda * diag_scale, ba_mod.FIXED_PRIOR)
        S = S.at[jnp.arange(K), jnp.arange(K)].add(
            prior[:, None, None] * jnp.broadcast_to(jnp.eye(6), (K, 6, 6))
        )
        S_dense = S.transpose(0, 2, 1, 3).reshape(K * 6, K * 6)
        L, low = jax.scipy.linalg.cho_factor(S_dense, lower=True)
        dc = jax.scipy.linalg.cho_solve((L, low), bs.reshape(K * 6)).reshape(K, 6)
        dc = dc * cam_active[:, None]
        # local landmark back-substitution on this shard
        hp = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)
        dc_pm = hp("pmk,ki->pmi", U, dc)
        Wt_dc = hp("pmij,pmi->pj", W, dc_pm)
        dp = hp("pij,pj->pi", Hpp_inv, bp - Wt_dc) * pt_active[:, None]
        kf_Tcw_new = jnp.where(
            cam_active[:, None, None], lie.se3_exp(dc) @ kf_Tcw, kf_Tcw
        )
        return kf_Tcw_new, pt_pos + dp

    pt_sharded = P("dp")
    rep = P()
    step = jax.shard_map(
        step_local,
        mesh=mesh,
        in_specs=(rep, pt_sharded, pt_sharded, pt_sharded, pt_sharded,
                  rep, rep, rep, rep, pt_sharded),
        out_specs=(rep, pt_sharded),
        check_vma=False,
    )
    return jax.jit(step)


def distributed_bundle_adjust(mesh: Mesh, cam: CameraModel, ms, cam_active,
                              pt_active, iters: int = 10,
                              scale_factor: float = 2.0, max_obs: int = 8):
    """Full distributed BA over a MapState (host-callable convenience)."""
    from sdslam_tpu.mapping import map_state as M

    obs_kf, obs_kp = M.build_obs_lists(ms, max_obs)
    obs_ok = obs_kf >= 0
    n_obs = jnp.sum(obs_ok, axis=1)
    ur = ms.kf_uright[jnp.clip(obs_kf, 0, ms.K - 1), jnp.clip(obs_kp, 0, ms.N - 1)]
    n_stereo = jnp.sum(obs_ok & (ur >= 0), axis=1)
    pt_act = pt_active & ms.pt_valid & ((n_obs >= 2) | (n_stereo >= 1))
    obs_ok = obs_ok & pt_act[:, None]
    cam_act = cam_active & ms.kf_valid

    # global arrays: process-spanning when the mesh spans hosts (each
    # process contributes only its own devices' shards), plain device_put
    # otherwise (parallel/multihost.py)
    from sdslam_tpu.parallel.multihost import global_put

    step = make_distributed_gn_step(mesh, cam, ms.K, scale_factor)
    kf_Tcw = global_put(mesh, ms.kf_Tcw, P())
    pt_pos = global_put(mesh, ms.pt_pos, P("dp"))
    obs_kf = global_put(mesh, obs_kf, P("dp"))
    obs_kp = global_put(mesh, obs_kp, P("dp"))
    obs_ok = global_put(mesh, obs_ok, P("dp"))
    pt_act = global_put(mesh, pt_act, P("dp"))
    uv_r = global_put(mesh, ms.kf_uv_und, P())
    ur_r = global_put(mesh, ms.kf_uright, P())
    oct_r = global_put(mesh, ms.kf_octave, P())
    ca_r = global_put(mesh, cam_act, P())
    for _ in range(iters):
        kf_Tcw, pt_pos = step(
            kf_Tcw, pt_pos, obs_kf, obs_kp, obs_ok, uv_r, ur_r, oct_r,
            ca_r, pt_act,
        )
    return ms._replace(kf_Tcw=kf_Tcw, pt_pos=pt_pos)
