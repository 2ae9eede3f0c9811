"""Mono+IMU fusion: synthetic gyro/accel from ground truth feeds
track_fusion; the gyro rate must aid prediction (TrackFusion path)."""

import numpy as np
import jax.numpy as jnp

from sdslam_tpu.geometry import lie
from sdslam_tpu.geometry.camera import CameraModel
from sdslam_tpu.io.synthetic import SyntheticSequence
from sdslam_tpu.system import MONOCULAR_IMU, SDSlamSystem
from sdslam_tpu.utils import metrics
from sdslam_tpu.utils.config import MapConfig, ORBConfig, SystemConfig

CAM = CameraModel(fx=320.0, fy=320.0, cx=159.5, cy=119.5, width=320, height=240)


def synth_imu(poses, fps=30.0):
    """Per-frame gyro (body rates) + accel (gravity + motion) from GT poses."""
    gyro = []
    g_world = np.array([0.0, -9.81, 0.0])
    for i in range(len(poses)):
        j = max(i - 1, 0)
        rel = np.asarray(poses[i]) @ np.linalg.inv(np.asarray(poses[j]))
        w = np.asarray(lie.so3_log(jnp.asarray(rel[:3, :3].astype(np.float32)))) * fps
        R = np.asarray(poses[i])[:3, :3]
        accel = R @ (-g_world)  # gravity in the body frame (dominant term)
        gyro.append(np.concatenate([w, accel]))
    return gyro


def test_fusion_pipeline_runs_and_tracks():
    cfg = SystemConfig(
        camera=CAM,
        orb=ORBConfig(max_keypoints=512, n_levels=4),
        map=MapConfig(max_keyframes=32, max_points=4096, max_kps_per_frame=512),
    )
    n = 14
    seq = SyntheticSequence(CAM, n_frames=n, trajectory="orbit", radius=0.12, yaw_amp=0.03)
    imu = synth_imu(seq.poses)
    sysm = SDSlamSystem(cfg, sensor=MONOCULAR_IMU, loop_closing=False)
    for i in range(n):
        ts, img, _ = seq.frame(i)
        sysm.track_fusion(img, imu[i], ts)
    assert sysm.get_tracking_state() == "OK"
    est = np.stack(sysm.tracker.trajectory)
    gt = np.asarray(seq.poses)
    ate = metrics.ate_rmse(est, gt, align=True, with_scale=True)
    assert ate < 0.06
    # gravity low-pass has converged near |g|
    assert abs(np.linalg.norm(sysm.imu.gravity) - 9.81) < 1.0
