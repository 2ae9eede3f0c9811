"""ORGANIC loop closure end-to-end (VERDICT r3 next-round #3): no injected
keyframes — drift accumulates naturally over a full 360-degree circuit
whose locally-scoped views keep the loop start outside the covisible
window, then the revisit fires the complete causal chain through the LIVE
system: detection -> device consistency (th=3) -> async Sim3 verification
-> correction -> GBA (run_gba=True), matching LoopClosing.cc:370-533 +
RunGlobalBundleAdjustment (:585-678).

Drift mechanism (chosen after measuring the alternatives): zero-mean
pixel/depth noise does NOT accumulate — RGB-D depth anchoring self-heals
a few-cm seam through local matching before loop closure can fire. What
drifts real RGB-D odometry is SYSTEMATIC depth error, so the sequence
applies a slowly-varying depth-scale bias (±8% over the lap, the shape of
a sensor calibration/temperature drift): integrating differently-scaled
segments accumulates ~6-10 cm of seam error that local matching cannot
absorb, while local tracking stays healthy. The closed-circuit trajectory
(io/synthetic.circuit_trajectory) sweeps yaw through 360 deg inside a
watertight room so each segment sees a different wall (VERDICT r3 weak
#3: the previous e2e injected pre-drifted keyframes)."""

import numpy as np
import pytest
import jax.numpy as jnp

from sdslam_tpu.geometry.camera import CameraModel
from sdslam_tpu.io.synthetic import SyntheticSequence, circuit_trajectory
from sdslam_tpu.system import RGBD, SDSlamSystem
from sdslam_tpu.utils.config import (
    MapConfig, ORBConfig, SystemConfig, TrackingConfig,
)
from sdslam_tpu.utils.metrics import ate_rmse

pytestmark = pytest.mark.heavy

CAM = CameraModel(
    fx=320.0, fy=320.0, cx=159.5, cy=119.5, width=320, height=240, bf=32.0
)

N_LAP = 240  # frames for the full circuit
N_REVISIT = 40  # frames past closure (re-traverses the circuit start)
DEPTH_BIAS_AMP = 0.08  # slowly-varying depth-scale bias (organic drift)


def _make_sequence():
    # radius 0.6 in a 3.5 m room keeps every surface 0.5-4 m away: far
    # enough to drift, close enough that depth stays observable (the r4
    # 0.8/5.0 variant put walls 4-6 m out and tracking broke mid-lap)
    lap = np.asarray(circuit_trajectory(N_LAP, radius=0.6))
    poses = np.concatenate([lap, lap[:N_REVISIT]])
    return SyntheticSequence(
        CAM, trajectory="custom", poses=poses,
        scene_kwargs={"closed": True, "size": 3.5},
    )


def test_organic_loop_closure_with_gba():
    cfg = SystemConfig(
        camera=CAM,
        orb=ORBConfig(max_keypoints=512, n_levels=4),
        map=MapConfig(max_keyframes=96, max_points=8192,
                      max_kps_per_frame=512),
        tracking=TrackingConfig(depth_map_factor=1000.0),
    )
    seq = _make_sequence()
    n = len(seq)
    sysm = SDSlamSystem(cfg, sensor=RGBD, loop_closing=True)
    assert sysm.loop_closer.run_gba  # GBA ON through the live chain
    noise = np.random.default_rng(11)

    # spies: KF poses immediately before a correction applies + GBA count
    pre_snapshots = []
    gba_runs = []
    orig_apply = sysm.loop_closer._apply_correction
    from sdslam_tpu.solvers import ba as ba_mod

    orig_gba = ba_mod.global_ba

    def spy_apply(ms, kf_slot, cand_slot, S, info):
        pre_snapshots.append(
            (np.asarray(ms.kf_Tcw), np.asarray(ms.kf_valid),
             np.asarray(ms.kf_frame_id))
        )
        return orig_apply(ms, kf_slot, cand_slot, S, info)

    def spy_gba(*a, **kw):
        gba_runs.append(1)
        return orig_gba(*a, **kw)

    sysm.loop_closer._apply_correction = spy_apply
    ba_mod.global_ba = spy_gba
    try:
        for i in range(n):
            ts, img, depth = seq.frame(i)
            img8 = np.clip(
                np.asarray(img) + noise.normal(0, 2.0, (CAM.height, CAM.width)),
                0, 255,
            ).astype(np.uint8)
            bias = 1.0 + DEPTH_BIAS_AMP * np.sin(2 * np.pi * i / N_LAP)
            dep16 = np.clip(
                (np.asarray(depth) * bias + noise.normal(0, 0.01, depth.shape))
                * 1000.0, 0, 65535,
            ).astype(np.uint16)
            sysm.track_rgbd(img8, dep16, float(i) / 30.0)
        sysm.finish()
    finally:
        ba_mod.global_ba = orig_gba

    assert sysm.get_tracking_state() == "OK"
    # 1. the chain fired ORGANICALLY (detection->consistency->Sim3->correct)
    assert pre_snapshots, "no organic loop correction fired"
    # 2. GBA ran as part of the live correction (RunGlobalBundleAdjustment)
    assert gba_runs, "correction applied but GBA did not run"

    gt = np.asarray(seq.poses)

    def kf_ate(kf_Tcw, kf_valid, kf_fid):
        sel = np.flatnonzero(kf_valid & (kf_fid >= 0) & (kf_fid < n))
        est = np.stack([kf_Tcw[s] for s in sel])
        ref = np.stack([gt[kf_fid[s]] for s in sel])
        return ate_rmse(est, ref, align=True)

    ate_pre = kf_ate(*pre_snapshots[0])
    t = sysm.tracker
    ate_post = kf_ate(
        np.asarray(t.ms.kf_Tcw), np.asarray(t.ms.kf_valid),
        np.asarray(t.ms.kf_frame_id),
    )
    print(f"organic loop: KF ATE pre={ate_pre*100:.2f}cm "
          f"post={ate_post*100:.2f}cm corrections={len(pre_snapshots)} "
          f"gba={len(gba_runs)}")
    # 3. the correction + GBA reduced the keyframe ATE
    assert ate_post < ate_pre, (ate_pre, ate_post)
    # 4. a loop edge was recorded in the essential graph
    le = np.asarray(t.ms.loop_edges)
    assert (le >= 0).any()
