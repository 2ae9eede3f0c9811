"""Loop detection, Sim3 verification, and loop correction.

Replaces the LoopClosing thread (/root/reference/src/LoopClosing.{h,cc}):

  detect:   direct photometric alignment of the current keyframe against
            every non-connected keyframe (DetectLoop, LoopClosing.cc:100-222
            — no bag-of-words, the "SD" signature); candidates keep error
            < 1.5x best and below an absolute bound; covisibility-group
            consistency over consecutive keyframes (th=3,
            LoopClosing.cc:146-218) gates Sim3 verification.
  verify:   brute-force descriptor matching between the two keyframes'
            map points (SearchByPoints), Horn Sim3 RANSAC, acceptance by
            inlier count (ComputeSim3, LoopClosing.cc:224-368).
  correct:  propagate the Sim3 correction to the current keyframe's
            covisible group, move their points, fuse duplicates, optimize
            the essential graph, and optionally run global BA
            (CorrectLoop, LoopClosing.cc:370-533).

TPU shape: detection is one vmapped alignment over the keyframe pool (same
batched kernel as relocalization); verification is dense matching + one
vmapped RANSAC; correction is pure array math + the dense Sim3 pose graph.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sdslam_tpu.features import matching
from sdslam_tpu.geometry import camera as cam_mod
from sdslam_tpu.geometry import lie
from sdslam_tpu.geometry.camera import CameraModel
from sdslam_tpu.mapping import local_mapping as LM
from sdslam_tpu.mapping import map_state as M
from sdslam_tpu.ops import hamming as ham
from sdslam_tpu.solvers import ba, image_align, pose_graph, sim3_solver

LOOP_ALIGN_MAX_ERROR = 0.03  # KF<->KF coarse alignment bound (ImageAlign ctor)


class LoopCandidate(NamedTuple):
    found: jnp.ndarray  # bool
    cand_kf: jnp.ndarray  # int32 slot
    errors: jnp.ndarray  # [K] all alignment errors


@functools.partial(
    jax.jit,
    static_argnames=("cam", "scale_factor", "n_levels", "store_min_level", "min_frame_gap"),
)
def detect_loop_candidates(
    cam: CameraModel,
    ms: M.MapState,
    kf_slot,
    covis,  # [K,K] covisibility (connected KFs are not loop candidates)
    scale_factor: float = 2.0,
    n_levels: int = 5,
    store_min_level: int = 2,
    min_frame_gap: int = 30,
) -> LoopCandidate:
    """Batched KF<->KF coarse alignment (coarsest level only, LoopClosing
    behavior) of kf_slot against every valid, non-connected keyframe."""
    K = ms.K
    cur_pyr = tuple(pl[kf_slot] for pl in ms.kf_pyramid)

    def align_one(other):
        ref_uv = ms.kf_uv[other]
        ref_depth = ms.kf_depth[other]
        valid = ms.kf_kp_valid[other] & (ref_depth > 0) & (ms.kf_mp[other] >= 0)
        X_ref = cam_mod.backproject(
            cam, ms.kf_uv_und[other], jnp.maximum(ref_depth, 1e-3)
        )
        pyr_ref = tuple(pl[other] for pl in ms.kf_pyramid)
        res = image_align.align(
            pyr_ref,
            cur_pyr,
            ref_uv,
            X_ref,
            valid,
            jnp.eye(4),
            cam.fx, cam.fy, cam.cx, cam.cy,
            scale_factor=scale_factor,
            max_level=n_levels - 1,
            min_level=n_levels - 1,  # coarsest level only (LoopClosing.cc:121-143)
            iters=15,
            start_level=store_min_level,
        )
        return res.error

    errors = jax.vmap(align_one)(jnp.arange(K))
    connected = (covis[kf_slot] > 0) | (jnp.arange(K) == kf_slot)
    # temporal neighbors are trivially similar; exclude recent ids too
    recent = jnp.abs(ms.kf_frame_id - ms.kf_frame_id[kf_slot]) < min_frame_gap
    errors = jnp.where(ms.kf_valid & (~connected) & (~recent), errors, jnp.inf)
    best = jnp.argmin(errors)
    found = errors[best] < LOOP_ALIGN_MAX_ERROR
    return LoopCandidate(found, best.astype(jnp.int32), errors)


class Sim3Verification(NamedTuple):
    accepted: jnp.ndarray  # bool
    S_cur_cand: jnp.ndarray  # [4,4] sim3 mapping cand-camera coords -> cur-camera
    n_inliers: jnp.ndarray


@functools.partial(
    jax.jit,
    static_argnames=("cam", "scale_factor", "fix_scale", "min_inliers", "min_total"),
)
def verify_loop_sim3(
    cam: CameraModel,
    ms: M.MapState,
    cur_kf,
    cand_kf,
    key,
    covis=None,  # [K,K] covisibility for the final neighborhood gate
    scale_factor: float = 2.0,
    fix_scale: bool = True,  # RGB-D: true scale known (Sim3Solver.h:37)
    min_inliers: int = 20,
    min_total: int = 40,
) -> Sim3Verification:
    """The full ComputeSim3 chain (LoopClosing.cc:224-368): brute-force
    descriptor matching -> Horn RANSAC -> Sim3-guided mutual matching
    (SearchBySim3) -> iterative Sim3 GN (OptimizeSim3, >=20 inliers) ->
    project the candidate's covisible neighborhood and require >=40 total
    matches."""
    # descriptors of the keypoints bound to map points
    d1 = ms.kf_desc[cur_kf]
    d2 = ms.kf_desc[cand_kf]
    v1 = ms.kf_kp_valid[cur_kf] & (ms.kf_mp[cur_kf] >= 0)
    v2 = ms.kf_kp_valid[cand_kf] & (ms.kf_mp[cand_kf] >= 0)
    res = matching.search_brute_force(d1, v1, d2, v2, th_desc=ham.TH_LOW, ratio=0.75)
    # res: cand-kp -> cur-kp assignment
    pair_cur = res.kp_to_query
    # per-keypoint bound map-point positions in each camera frame
    p_cand = ms.kf_mp[cand_kf]
    X_cand_all = lie.se3_apply(
        ms.kf_Tcw[cand_kf], ms.pt_pos[jnp.clip(p_cand, 0, ms.P - 1)]
    )
    p_cur_kp = ms.kf_mp[cur_kf]
    X_cur_all = lie.se3_apply(
        ms.kf_Tcw[cur_kf], ms.pt_pos[jnp.clip(p_cur_kp, 0, ms.P - 1)]
    )

    def gather_pairs(pair):
        p_cur = p_cur_kp[jnp.clip(pair, 0, ms.N - 1)]
        ok = (pair >= 0) & (p_cand >= 0) & (p_cur >= 0)
        X1 = X_cand_all  # cand-camera frame, indexed by cand kp
        X2 = X_cur_all[jnp.clip(pair, 0, ms.N - 1)]  # cur-camera frame
        return X1, X2, ok

    X1, X2, ok = gather_pairs(pair_cur)
    oct_cand = ms.kf_octave[cand_kf].astype(jnp.float32)
    th2 = 9.21 * scale_factor ** (2.0 * oct_cand)
    r = sim3_solver.ransac_sim3(
        cam, X1, X2, ok, th2, th2, key, n_hypotheses=128, fix_scale=fix_scale
    )
    S_ransac = lie.sim3_from_Rts(r.R, r.t, r.s)
    # S maps cand-camera -> cur-camera: RANSAC solved X2(cur) ~ s R X1(cand)+t
    # guided mutual matching grows the set (SearchBySim3, ORBmatcher.cc:734)
    ext = matching.search_by_sim3(
        cam, S_ransac,
        ms.kf_uv_und[cur_kf], d1, v1, ms.kf_octave[cur_kf], X_cur_all,
        ms.kf_uv_und[cand_kf], d2, v2, ms.kf_octave[cand_kf], X_cand_all,
        scale_factor=scale_factor,
    )
    pair_all = jnp.where(pair_cur >= 0, pair_cur, ext.kp_to_query)
    X1, X2, ok = gather_pairs(pair_all)
    # iterative GN refinement (OptimizeSim3, Optimizer.cc:958-1142)
    inv_sigma2_cand = 1.0 / scale_factor ** (2.0 * oct_cand)
    oct_cur = ms.kf_octave[cur_kf].astype(jnp.float32)
    inv_sigma2_cur = (
        1.0 / scale_factor ** (2.0 * oct_cur[jnp.clip(pair_all, 0, ms.N - 1)])
    )
    uv_cur = ms.kf_uv_und[cur_kf][jnp.clip(pair_all, 0, ms.N - 1)]
    uv_cand = ms.kf_uv_und[cand_kf]
    opt = sim3_solver.optimize_sim3(
        cam, S_ransac, X2, X1, uv_cur, uv_cand,
        inv_sigma2_cur, inv_sigma2_cand, ok,
        th2=10.0, fix_scale=fix_scale,
    )
    S = opt.S
    # final gate (LoopClosing.cc:329-367): project every point seen by the
    # candidate and its covisible neighborhood through the corrected pose;
    # accept only if the total match count clears min_total
    if covis is not None:
        neigh = (covis[cand_kf] > 0) | (jnp.arange(ms.K) == cand_kf)
        obs = M.observation_table(ms)
        in_hood = jnp.zeros((ms.P,), bool)
        contrib = jnp.where((neigh & ms.kf_valid)[:, None], obs, -1)
        in_hood = in_hood.at[
            jnp.where(contrib >= 0, contrib, ms.P).ravel()
        ].set(True, mode="drop")
        T_corr = lie.sim3_to_se3(S @ lie.se3_to_sim3(ms.kf_Tcw[cand_kf]))
        hood = matching.search_by_projection(
            cam, T_corr, ms.pt_pos, ms.pt_desc, in_hood & ms.pt_valid,
            jnp.zeros((ms.P,), jnp.int32),
            ms.kf_uv_und[cur_kf], d1, ms.kf_kp_valid[cur_kf],
            ms.kf_octave[cur_kf],
            radius_px=10.0, th_desc=ham.TH_LOW, scale_factor=scale_factor,
            octave_window=None,
        )
        total = hood.count()
    else:
        total = opt.n_inliers + min_total  # gate disabled
    accepted = (
        (r.n_inliers >= min_inliers)
        & (opt.n_inliers >= min_inliers)
        & (total >= min_total)
    )
    return Sim3Verification(accepted, S, opt.n_inliers)


@functools.partial(jax.jit, static_argnames=("scale_factor",))
def correct_loop_poses(
    ms: M.MapState,
    cur_kf,
    cand_kf,
    S_cur_cand,  # verified sim3: X_cur = S * X_cand
    covis,
    scale_factor: float = 2.0,
):
    """Apply the loop correction (CorrectLoop, LoopClosing.cc:398-530):

    corrected pose of the current KF: Tcw_cur' = S_cur_cand * Tcw_cand; the
    correction delta (in world) propagates to the current KF's covisible
    group and their points; then the Sim3 essential graph is optimized with
    the loop edge, and all points are re-anchored through their reference
    keyframes."""
    K = ms.K
    # corrected current pose via the loop measurement
    T_cur_corr = S_cur_cand @ ms.kf_Tcw[cand_kf]
    # world-side correction for the current group: S_w = Tcw_corr^-1 * Tcw_old
    S_w = lie.sim3_inv(T_cur_corr) @ ms.kf_Tcw[cur_kf]  # maps old world -> new world

    group = (covis[cur_kf] >= 15) | (jnp.arange(K) == cur_kf)
    group &= ms.kf_valid
    # corrected group poses: Tkw' = Tkw_old * S_w^-1
    kf_Tcw_corr = jnp.where(
        group[:, None, None], ms.kf_Tcw @ lie.sim3_inv(S_w), ms.kf_Tcw
    )

    # move the group's points into the corrected world
    obs = M.observation_table(ms)
    pt_in_group = jnp.zeros((ms.P,), bool)
    contrib = jnp.where(group[:, None], obs, -1)
    pt_in_group = pt_in_group.at[
        jnp.where(contrib >= 0, contrib, ms.P).ravel()
    ].set(True, mode="drop")
    pos_corr = lie.sim3_apply(S_w, ms.pt_pos)
    pt_pos = jnp.where((pt_in_group & ms.pt_valid)[:, None], pos_corr, ms.pt_pos)

    ms = ms._replace(kf_Tcw=kf_Tcw_corr, pt_pos=pt_pos)

    # essential-graph optimization with the loop edge (fixed: candidate KF).
    # Loop measurement: corrected T_cur = S_cur_cand @ T_cand, so the edge
    # S_ij = T_cur * T_cand^-1 = S_cur_cand. All PREVIOUS loop closures'
    # stored edges re-enter the graph (Optimizer.cc:853-874), and tree
    # edges preempt covisibility under the edge cap.
    edges, n_dropped = pose_graph.make_edges_from_covisibility(
        ms.kf_Tcw, ms.kf_valid, covis, ms.kf_parent,
        loop_i=jnp.atleast_1d(cur_kf).astype(jnp.int32),
        loop_j=jnp.atleast_1d(cand_kf).astype(jnp.int32),
        loop_S=S_cur_cand[None],
        stored_loops=ms.loop_edges,
        covis_min=100,
        max_edges=1024,
    )
    fixed = jnp.zeros((K,), bool).at[cand_kf].set(True)
    # anchor points to their reference KFs before PGO, re-apply after
    ref = jnp.clip(ms.pt_ref_kf, 0, K - 1)
    T_ref_before = ms.kf_Tcw[ref]
    S_opt = pose_graph.optimize_pose_graph(
        ms.kf_Tcw, ms.kf_valid, fixed, edges, iters=20, fix_scale=True
    )
    kf_Tcw_new = lie.sim3_to_se3(S_opt)
    T_ref_after = kf_Tcw_new[ref]
    # re-anchor: X' = T_after^-1 * T_before * X (MP correction via ref KF,
    # Optimizer.cc:931-955)
    Xc = lie.se3_apply(T_ref_before, ms.pt_pos)
    pt_pos2 = lie.se3_apply(lie.se3_inv(T_ref_after), Xc)
    pt_pos2 = jnp.where(ms.pt_valid[:, None], pt_pos2, ms.pt_pos)
    ms = ms._replace(kf_Tcw=kf_Tcw_new, pt_pos=pt_pos2)
    # remember the loop edge for every later essential-graph optimization
    # (KeyFrame::AddLoopEdge, KeyFrame.cc:401)
    ms = M.add_loop_edge(ms, cur_kf, cand_kf)
    return ms, n_dropped


@dataclasses.dataclass
class LoopCloser:
    """Host-side loop-closing orchestration (consistency across KFs +
    correction sequencing + optional global BA).

    Consistency follows the reference's covisibility-group scheme
    (LoopClosing.cc:146-218): each candidate expands into its covisible
    group; a candidate is consistent with a previously-seen group when the
    groups share a keyframe, and must stay consistent for
    `consistency_th` (=3, LoopClosing.cc:49) consecutive detections before
    Sim3 verification runs."""

    cam: CameraModel
    scale_factor: float = 2.0
    n_levels: int = 5
    consistency_th: int = 3  # mnCovisibilityConsistencyTh (LoopClosing.cc:49)
    fix_scale: bool = True
    run_gba: bool = True
    min_frame_gap: int = 30
    # previous consistent groups: list of (frozenset of KF slots, count)
    _consistent_groups: list = dataclasses.field(default_factory=list)
    _seed: int = 0

    def process_keyframe(self, ms: M.MapState, kf_slot: int):
        """Run detection/verification/correction for a new keyframe.

        Returns (ms, info dict)."""
        covis = M.covisibility(ms)
        cand = detect_loop_candidates(
            self.cam, ms, jnp.asarray(kf_slot), covis,
            scale_factor=self.scale_factor, n_levels=self.n_levels,
            min_frame_gap=self.min_frame_gap,
        )
        info = {"detected": bool(cand.found), "candidate": int(cand.cand_kf)}
        if not bool(cand.found):
            # no candidates: clear history (LoopClosing.cc:216 analogue)
            self._consistent_groups = []
            return ms, info

        # all candidates within 1.5x of the best error (LoopClosing.cc:146)
        errors = np.asarray(cand.errors)
        best_err = float(errors[int(cand.cand_kf)])
        cand_slots = np.flatnonzero(
            (errors <= 1.5 * best_err) & (errors < LOOP_ALIGN_MAX_ERROR)
        )
        covis_np = np.asarray(covis)

        # covisibility-group consistency (LoopClosing.cc:152-218)
        new_groups: list = []
        enough: list = []
        group_used = [False] * len(self._consistent_groups)
        for slot in cand_slots:
            group = frozenset(
                np.flatnonzero(covis_np[slot] > 0).tolist() + [int(slot)]
            )
            consistent_count = 0
            for gi, (prev_group, prev_count) in enumerate(
                self._consistent_groups
            ):
                if group & prev_group:
                    consistent_count = max(consistent_count, prev_count + 1)
                    group_used[gi] = True
            new_groups.append((group, consistent_count))
            if consistent_count + 1 >= self.consistency_th:
                enough.append(int(slot))
        self._consistent_groups = new_groups
        info["n_candidates"] = len(cand_slots)
        if not enough:
            info["pending"] = True
            return ms, info

        # verify consistent candidates best-error-first until one accepts
        enough.sort(key=lambda s: errors[s])
        for cand_slot in enough:
            self._seed += 1
            ver = verify_loop_sim3(
                self.cam, ms, jnp.asarray(kf_slot), jnp.asarray(cand_slot),
                jax.random.key(self._seed), covis=covis,
                scale_factor=self.scale_factor, fix_scale=self.fix_scale,
            )
            info["sim3_inliers"] = int(ver.n_inliers)
            info["candidate"] = int(cand_slot)
            if bool(ver.accepted):
                break
        else:
            return ms, info

        ms, n_dropped = correct_loop_poses(
            ms, jnp.asarray(kf_slot), jnp.asarray(cand_slot), ver.S_cur_cand,
            covis, scale_factor=self.scale_factor,
        )
        if int(n_dropped) > 0:
            # no silent caps: the essential graph lost covisibility edges
            print(
                f"[loop_closing] WARNING: pose-graph edge cap truncated "
                f"{int(n_dropped)} covisibility edges (tree/loop edges kept)"
            )
            info["edges_dropped"] = int(n_dropped)
        # fuse duplicated landmarks around the corrected region
        ms = LM.fuse_neighbors(
            self.cam, ms, jnp.asarray(kf_slot), scale_factor=self.scale_factor
        )
        ms = M.finalize_point_statistics(ms, self.scale_factor, self.n_levels)
        if self.run_gba:
            ms = ba.global_ba(self.cam, ms, scale_factor=self.scale_factor)
        info["corrected"] = True
        self._consistent_groups = []
        return ms, info
