"""Monocular pipeline: two-view bootstrap + tracking + triangulated growth.

Monocular scale is arbitrary (normalized to median-depth 1 at init), so ATE
is evaluated after Sim3 (scale-included) alignment.
"""

import numpy as np

from sdslam_tpu.geometry.camera import CameraModel
from sdslam_tpu.io.synthetic import SyntheticSequence
from sdslam_tpu.pipeline.tracking import MonoTracker
from sdslam_tpu.utils import metrics
from sdslam_tpu.utils.config import MapConfig, ORBConfig, SystemConfig

CAM = CameraModel(fx=320.0, fy=320.0, cx=159.5, cy=119.5, width=320, height=240)


def test_mono_slam_sequence():
    cfg = SystemConfig(
        camera=CAM,
        orb=ORBConfig(max_keypoints=512, n_levels=4),
        map=MapConfig(max_keyframes=32, max_points=4096, max_kps_per_frame=512),
    )
    n = 16
    # lateral sweep gives the parallax monocular init needs
    seq = SyntheticSequence(CAM, n_frames=n, trajectory="orbit", radius=0.12, yaw_amp=0.03)
    t = MonoTracker(cfg)
    for i in range(n):
        ts, img, _ = seq.frame(i)
        t.track(img, ts)
    assert t.st.status == "OK"
    assert int(t.ms.n_points()) > 100
    assert int(t.ms.n_keyframes()) >= 2

    est = np.stack(t.trajectory)
    gt = np.asarray(seq.poses)
    ate = metrics.ate_rmse(est, gt, align=True, with_scale=True)
    print(f"mono ATE (sim3-aligned) = {ate*100:.2f} cm")
    assert ate < 0.05
