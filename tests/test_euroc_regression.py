"""Dataset regression: EuRoC MH sequences, mono+IMU (SURVEY.md §4).

Activates when a sequence is present locally (no network egress here);
point SDSLAM_EUROC_ROOT at an ASL-format folder (mav0/cam0, mav0/imu0).
The always-on equivalent coverage runs on the synthetic renderer
(tests/test_fusion.py, tests/test_mono.py)."""

import os

import numpy as np
import pytest

EUROC_ROOT = os.environ.get("SDSLAM_EUROC_ROOT", "/root/datasets/MH_01_easy")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(EUROC_ROOT),
    reason=f"EuRoC sequence not present at {EUROC_ROOT} (no network egress)",
)


def test_euroc_mh_fusion_ate():
    from sdslam_tpu.geometry.camera import CameraModel
    from sdslam_tpu.io.datasets import EuRoCDataset
    from sdslam_tpu.system import MONOCULAR_IMU, SDSlamSystem
    from sdslam_tpu.utils.config import (
        MapConfig, ORBConfig, SystemConfig, TrackingConfig,
    )

    # EuRoC cam0 intrinsics (the reference's EuRoC.yaml)
    cam = CameraModel(
        fx=458.654, fy=457.296, cx=367.215, cy=248.375,
        k1=-0.28340811, k2=0.07395907, p1=0.00019359, p2=1.76187114e-05,
        width=752, height=480,
    )
    cfg = SystemConfig(
        camera=cam,
        orb=ORBConfig(max_keypoints=1024, n_levels=5),
        map=MapConfig(max_keyframes=96, max_points=12288,
                      max_kps_per_frame=1024),
        tracking=TrackingConfig(),
    )
    ds = EuRoCDataset(EUROC_ROOT)
    sysm = SDSlamSystem(cfg, sensor=MONOCULAR_IMU)
    last_t = None
    n = min(len(ds), 200)
    tracked = 0
    for i in range(n):
        ts, img = ds.frame(i)
        rows = ds.imu_between(last_t, ts) if last_t else []
        meas = rows[-1] if rows else [0.0] * 6
        last_t = ts
        sysm.track_fusion(np.asarray(img), meas, ts)
        if sysm.tracker.st.status == "OK":
            tracked += 1
    sysm.tracker.flush()
    # mono+IMU on MH_01: expect sustained tracking once initialized
    assert tracked > n // 3, f"tracked only {tracked}/{n} frames"
