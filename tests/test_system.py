"""System facade: sensor routing, persistence round-trip, localization mode,
reset, and loop-closing integration hooks."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from sdslam_tpu.geometry.camera import CameraModel
from sdslam_tpu.io.synthetic import SyntheticSequence
from sdslam_tpu.system import MONOCULAR, RGBD, SDSlamSystem
from sdslam_tpu.utils.config import MapConfig, ORBConfig, SystemConfig

CAM = CameraModel(
    fx=320.0, fy=320.0, cx=159.5, cy=119.5, width=320, height=240, bf=32.0
)


def small_cfg():
    return SystemConfig(
        camera=CAM,
        orb=ORBConfig(max_keypoints=512, n_levels=4),
        map=MapConfig(max_keyframes=32, max_points=4096, max_kps_per_frame=512),
    )


def run_rgbd(n=10, loop_closing=False):
    sysm = SDSlamSystem(small_cfg(), sensor=RGBD, loop_closing=loop_closing)
    seq = SyntheticSequence(CAM, n_frames=n, trajectory="orbit", radius=0.06, yaw_amp=0.04)
    for i in range(n):
        ts, img, depth = seq.frame(i)
        sysm.track_rgbd(img, depth, ts)
    return sysm, seq


def test_rgbd_routing_and_trajectory(tmp_path):
    sysm, seq = run_rgbd()
    assert sysm.get_tracking_state() == "OK"
    out = tmp_path / "traj.txt"
    sysm.save_trajectory_tum(str(out))
    lines = out.read_text().strip().splitlines()
    assert len(lines) == 10
    row = [float(x) for x in lines[3].split()]
    assert len(row) == 8  # ts tx ty tz qx qy qz qw
    # quaternion normalized
    assert abs(sum(v * v for v in row[4:]) - 1.0) < 1e-3


def test_sensor_type_enforced():
    sysm = SDSlamSystem(small_cfg(), sensor=MONOCULAR)
    with pytest.raises(AssertionError):
        sysm.track_rgbd(np.zeros((240, 320)), np.zeros((240, 320)), 0.0)
    with pytest.raises(ValueError):
        SDSlamSystem(small_cfg(), sensor="stereo")


def test_map_save_load_localization(tmp_path):
    sysm, seq = run_rgbd()
    path = str(tmp_path / "map.npz")
    sysm.save_map(path)
    n_pts = int(sysm.tracker.ms.n_points())

    fresh = SDSlamSystem(small_cfg(), sensor=RGBD)
    fresh.load_map(path)
    assert int(fresh.tracker.ms.n_points()) == n_pts
    assert fresh.get_tracking_state() == "LOST"
    fresh.activate_localization_mode()
    # a frame from the mapped region relocalizes and tracks, without mapping
    kf_before = int(fresh.tracker.ms.n_keyframes())
    for i in (4, 5, 6):
        ts, img, depth = seq.frame(i)
        fresh.track_rgbd(img, depth, 100.0 + i * 0.03)
    assert fresh.get_tracking_state() == "OK"
    assert int(fresh.tracker.ms.n_keyframes()) == kf_before  # frozen map


def test_reset():
    sysm, seq = run_rgbd(6)
    assert int(sysm.tracker.ms.n_keyframes()) > 0
    sysm.reset()
    assert sysm.get_tracking_state() == "NOT_INITIALIZED"
    assert int(sysm.tracker.ms.n_keyframes()) == 0
    ts, img, depth = seq.frame(0)
    sysm.track_rgbd(img, depth, 0.0)
    assert sysm.get_tracking_state() == "OK"
