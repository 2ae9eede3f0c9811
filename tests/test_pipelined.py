"""Tracking-vs-mapping device pipelining (parallel/pipelined.py).

The reference's Tracking/LocalMapping thread decoupling re-expressed as two
devices (SURVEY.md §2.9): tracking on device 0, keyframe mapping passes on
device 1, snapshot swap on completion. Runs on the virtual CPU mesh."""

import jax
import numpy as np
import pytest

from sdslam_tpu.geometry.camera import CameraModel
from sdslam_tpu.io.synthetic import SyntheticSequence
from sdslam_tpu.parallel.pipelined import PipelinedRGBDTracker
from sdslam_tpu.utils.config import (
    MapConfig, ORBConfig, SystemConfig, TrackingConfig,
)
from sdslam_tpu.utils.metrics import ate_rmse


@pytest.mark.heavy  # ~85 s (two-device program compiles); the driver's
# dryrun_multichip exercises the same path every round
def test_pipelined_rgbd_tracks_and_maps():
    assert len(jax.devices()) >= 2, "conftest provides 8 virtual devices"
    cam = CameraModel(fx=240.0, fy=240.0, cx=159.5, cy=119.5,
                      width=320, height=240, bf=24.0)
    cfg = SystemConfig(
        camera=cam,
        orb=ORBConfig(max_keypoints=512, n_levels=4),
        map=MapConfig(max_keyframes=16, max_points=4096, max_kps_per_frame=512),
        tracking=TrackingConfig(),
    )
    tr = PipelinedRGBDTracker(cfg)
    assert tr.track_device != tr.map_device

    n = 14
    seq = SyntheticSequence(cam, n_frames=n, trajectory="orbit",
                            radius=0.05, yaw_amp=0.03)
    for i in range(n):
        ts, img, depth = seq.frame(i)
        tr.track(np.asarray(img), np.asarray(depth), ts)
    tr.flush()

    # mapping passes ran: more than the initial keyframe exists
    n_kf = int(np.asarray(tr.ms.kf_valid).sum())
    assert n_kf >= 2, "no mapping pass completed"
    # trajectory accuracy comparable to the single-device tracker
    est = np.stack([np.asarray(p) for p in tr.trajectory])
    gt = np.stack([np.asarray(p) for p in seq.poses])
    ate = ate_rmse(est, gt)
    assert ate < 0.02, f"ATE too high: {ate}"
    # the tracking snapshot lives on the tracking device
    assert tr.ms.kf_Tcw.devices() == {tr.track_device}
