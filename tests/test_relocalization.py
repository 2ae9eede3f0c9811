"""Relocalization: kidnap recovery via batched all-keyframe alignment."""

import numpy as np
import jax.numpy as jnp

from sdslam_tpu.geometry import lie
from sdslam_tpu.geometry.camera import CameraModel
from sdslam_tpu.io.synthetic import SyntheticSequence
from sdslam_tpu.pipeline.tracking import RGBDTracker
from sdslam_tpu.utils.config import MapConfig, ORBConfig, SystemConfig

CAM = CameraModel(
    fx=320.0, fy=320.0, cx=159.5, cy=119.5, width=320, height=240, bf=32.0
)


def test_kidnap_recovery():
    cfg = SystemConfig(
        camera=CAM,
        orb=ORBConfig(max_keypoints=512, n_levels=4),
        map=MapConfig(max_keyframes=32, max_points=4096, max_kps_per_frame=512),
    )
    seq = SyntheticSequence(CAM, n_frames=16, trajectory="orbit", radius=0.06, yaw_amp=0.04)
    t = RGBDTracker(cfg)
    for i in range(12):
        ts, img, depth = seq.frame(i)
        t.track(img, depth, ts)
    assert t.st.status == "OK"

    # kidnap: sensor blackout (status is eventually-consistent under the
    # async frame pipeline; flush() synchronizes the host view)
    t.track(jnp.zeros((240, 320)), jnp.zeros((240, 320)), 90.0)
    t.flush()
    assert t.st.status == "LOST"

    # reappear at a previously-visited viewpoint -> relocalize
    ts, img, depth = seq.frame(5)
    T = t.track(img, depth, 91.0)
    assert t.st.status == "OK"
    e = np.asarray(lie.se3_log(jnp.asarray(T) @ lie.se3_inv(jnp.asarray(np.asarray(seq.poses[5])))))
    assert np.abs(e[:3]).max() < 0.01
    assert np.abs(e[3:]).max() < 0.01

    # and tracking continues normally afterwards
    ts, img, depth = seq.frame(6)
    T = t.track(img, depth, 91.03)
    t.flush()
    assert t.st.status == "OK"
    T = t.trajectory[-1]
    e = np.asarray(lie.se3_log(jnp.asarray(T) @ lie.se3_inv(jnp.asarray(np.asarray(seq.poses[6])))))
    assert np.abs(e[:3]).max() < 0.01


def test_epnp_recovers_when_alignment_fails():
    """Reappear at a known viewpoint but with a strong in-plane roll:
    photometric alignment (seeded at each keyframe's own pose,
    Tracking.cc:1073) has no basin for a ~35 deg rotation, while ORB
    descriptors are rotation-invariant — the EPnP-RANSAC geometric
    fallback (PnPsolver.cc:445, dead in the reference; live here per
    SURVEY.md §2.3) must recover the pose."""
    from sdslam_tpu.io import synthetic as S

    cfg = SystemConfig(
        camera=CAM,
        orb=ORBConfig(max_keypoints=512, n_levels=4),
        map=MapConfig(max_keyframes=32, max_points=4096, max_kps_per_frame=512),
    )
    seq = SyntheticSequence(CAM, n_frames=16, trajectory="orbit",
                            radius=0.06, yaw_amp=0.04)
    t = RGBDTracker(cfg)
    for i in range(12):
        ts, img, depth = seq.frame(i)
        t.track(img, depth, ts)
    t.track(jnp.zeros((240, 320)), jnp.zeros((240, 320)), 90.0)
    t.flush()
    assert t.st.status == "LOST"

    # rolled revisit of frame 5's viewpoint
    roll = np.deg2rad(35.0)
    Rz = np.array(
        [[np.cos(roll), -np.sin(roll), 0, 0],
         [np.sin(roll), np.cos(roll), 0, 0],
         [0, 0, 1, 0], [0, 0, 0, 1]], np.float32,
    )
    T_gt = Rz @ np.asarray(seq.poses[5])
    img, depth = S.render(seq.scene, CAM, jnp.asarray(T_gt))
    T = t.track(np.asarray(img), np.asarray(depth), 91.0)
    assert t.st.status == "OK"
    e = np.asarray(lie.se3_log(jnp.asarray(T) @ lie.se3_inv(jnp.asarray(T_gt))))
    assert np.abs(e[:3]).max() < 0.02
    assert np.abs(e[3:]).max() < 0.02


def test_unrecognizable_view_stays_lost():
    cfg = SystemConfig(
        camera=CAM,
        orb=ORBConfig(max_keypoints=512, n_levels=4),
        map=MapConfig(max_keyframes=32, max_points=4096, max_kps_per_frame=512),
    )
    seq = SyntheticSequence(CAM, n_frames=8, trajectory="forward", step=0.01)
    t = RGBDTracker(cfg)
    for i in range(8):
        ts, img, depth = seq.frame(i)
        t.track(img, depth, ts)
    t.track(jnp.zeros((240, 320)), jnp.zeros((240, 320)), 90.0)
    t.flush()
    assert t.st.status == "LOST"
    # a frame from an unrelated scene must NOT relocalize
    other = SyntheticSequence(CAM, n_frames=2, seed=9)
    ts, img, depth = other.frame(0)
    t.track(img, depth, 91.0)
    t.flush()
    assert t.st.status == "LOST"
