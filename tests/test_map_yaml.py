"""Reference-format YAML map save/load (System.cc:277-533 parity).

Round trip: run RGB-D SLAM on synthetic frames, save the reference-schema
trajectory YAML + PNGs, load into a FRESH system, verify the map rebuilds
(keyframes, poses, linked points) and relocalization against the loaded map
recovers the pose."""

import numpy as np
import pytest

from sdslam_tpu.geometry.camera import CameraModel
from sdslam_tpu.io.synthetic import SyntheticSequence
from sdslam_tpu.system import RGBD, SDSlamSystem
from sdslam_tpu.utils.config import (
    MapConfig, ORBConfig, SystemConfig, TrackingConfig,
)


def _cfg():
    cam = CameraModel(fx=240.0, fy=240.0, cx=159.5, cy=119.5,
                      width=320, height=240, bf=24.0)
    return SystemConfig(
        camera=cam,
        orb=ORBConfig(max_keypoints=512, n_levels=4),
        map=MapConfig(max_keyframes=12, max_points=4096, max_kps_per_frame=512),
        tracking=TrackingConfig(),
    )


def test_yaml_save_load_roundtrip(tmp_path):
    cfg = _cfg()
    sysm = SDSlamSystem(cfg, sensor=RGBD, loop_closing=False)
    seq = SyntheticSequence(cfg.camera, n_frames=10, trajectory="orbit",
                            radius=0.05, yaw_amp=0.03)
    for i in range(10):
        ts, img, depth = seq.frame(i)
        sysm.track_rgbd(np.asarray(img), np.asarray(depth), ts)
    sysm.tracker.flush()
    n_kf_orig = int(np.asarray(sysm.tracker.ms.kf_valid).sum())
    poses_orig = {
        int(fid): np.asarray(T)
        for fid, T, v in zip(
            np.asarray(sysm.tracker.ms.kf_frame_id),
            np.asarray(sysm.tracker.ms.kf_Tcw),
            np.asarray(sysm.tracker.ms.kf_valid),
        )
        if v
    }

    ypath = str(tmp_path / "trajectory.yaml")
    sysm.save_trajectory(ypath, str(tmp_path / "kf_images"))
    text = open(ypath).read()
    assert text.startswith("%YAML:1.0")
    assert "keyframes:" in text and "points:" in text and "camera:" in text

    # fresh system loads the YAML
    sys2 = SDSlamSystem(_cfg(), sensor=RGBD, loop_closing=False)
    assert sys2.load_trajectory(ypath)
    ms2 = sys2.tracker.ms
    assert int(np.asarray(ms2.kf_valid).sum()) == n_kf_orig
    assert sys2.tracker.st.status == "LOST"  # forced relocalization
    # poses survive the quaternion round trip
    for fid, T2, v in zip(
        np.asarray(ms2.kf_frame_id), np.asarray(ms2.kf_Tcw),
        np.asarray(ms2.kf_valid),
    ):
        if v:
            assert np.allclose(T2, poses_orig[int(fid)], atol=1e-3)
    # a usable fraction of points re-linked by pixel matching
    assert int(np.asarray(ms2.pt_valid).sum()) > 50

    # relocalization against the loaded map recovers a pose
    ts, img, depth = seq.frame(5)
    pose = sys2.track_rgbd(np.asarray(img), np.asarray(depth), ts)
    sys2.tracker.flush()
    if sys2.tracker.st.status == "OK":
        gt = np.asarray(seq.poses[5])
        err = np.linalg.norm(np.asarray(pose)[:3, 3] - gt[:3, 3])
        assert err < 0.1
