"""Degraded-condition schedule stress (VERDICT r3 next-round #7, closes r2
weak #8): the trimmed GN/LM schedules (pose 2x4 + 2x5, local BA 3+5) were
justified only by an ATE tie on easy synthetic motion. This test runs a
FAST-ROTATION, noisy sequence — where extra iterations are most likely to
matter — with the trimmed defaults against the reference-length schedules
(pose 4x10, Optimizer.cc:343-407; local BA 5+10, :608-653) and gates the
trimmed schedule's ATE within a bound of the long one."""

import numpy as np
import pytest

from sdslam_tpu.geometry.camera import CameraModel
from sdslam_tpu.io.synthetic import SyntheticSequence
from sdslam_tpu.pipeline.tracking import RGBDTracker
from sdslam_tpu.utils import metrics
from sdslam_tpu.utils.config import (
    MapConfig, ORBConfig, SystemConfig, TrackingConfig,
)

pytestmark = pytest.mark.heavy

CAM = CameraModel(
    fx=320.0, fy=320.0, cx=159.5, cy=119.5, width=320, height=240, bf=32.0
)


def _run(seq, frames, pose_sched, ba_sched):
    cfg = SystemConfig(
        camera=CAM,
        orb=ORBConfig(max_keypoints=512, n_levels=4),
        map=MapConfig(max_keyframes=32, max_points=4096,
                      max_kps_per_frame=512),
        tracking=TrackingConfig(
            depth_map_factor=1000.0,
            pose_gn_schedule=pose_sched,
            ba_schedule=ba_sched,
        ),
    )
    t = RGBDTracker(cfg)
    for ts, img, dep in frames:
        t.track(img, dep, ts)
    t.flush()
    est = np.stack(t.trajectory)
    gt = np.asarray(seq.poses)[: len(est)]
    return t.st.status, metrics.ate_rmse(est, gt, align=True)


def test_trimmed_schedules_hold_under_fast_motion():
    n = 26
    # ~3 deg/frame peak yaw + strong lateral flow: roughly the limit of
    # what a 30 fps handheld camera does, far above TUM's 1-3 deg/frame
    seq = SyntheticSequence(CAM, n_frames=n, trajectory="orbit",
                            radius=0.10, yaw_amp=0.20)
    noise = np.random.default_rng(5)
    frames = []
    for i in range(n):
        ts, img, dep = seq.frame(i)
        img8 = np.clip(
            np.asarray(img) + noise.normal(0, 2.0, (CAM.height, CAM.width)),
            0, 255,
        ).astype(np.uint8)
        dep16 = (np.asarray(dep) * 1000).astype(np.uint16)
        frames.append((ts, img8, dep16))

    st_long, ate_long = _run(seq, frames, ((4, 10), (4, 10)), (5, 10))
    st_trim, ate_trim = _run(seq, frames, ((2, 4), (2, 5)), (3, 5))
    print(f"schedule stress: trimmed ATE={ate_trim*100:.2f}cm "
          f"({st_trim}) vs reference-length ATE={ate_long*100:.2f}cm "
          f"({st_long})")
    assert st_trim == "OK" and st_long == "OK"
    # the trimmed schedule must not lose meaningful accuracy even here
    assert ate_trim <= max(ate_long * 1.5, ate_long + 0.003), (
        ate_trim, ate_long,
    )
