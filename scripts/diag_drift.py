"""Diagnose the >17-keyframe drift: run a long synthetic orbit on CPU and
print per-frame translation error + KF count + inliers, to find where and
how error amplifies through the KF-spawned point chain."""

import os
import sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from sdslam_tpu.geometry.camera import CameraModel
from sdslam_tpu.io import synthetic
from sdslam_tpu.pipeline.tracking import RGBDTracker
from sdslam_tpu.utils import metrics
from sdslam_tpu.utils.config import MapConfig, ORBConfig, SystemConfig

CAM = CameraModel(
    fx=320.0, fy=320.0, cx=159.5, cy=119.5, width=320, height=240, bf=32.0
)


def main(n=80, trajectory="orbit", **kw):
    cfg = SystemConfig(
        camera=CAM,
        orb=ORBConfig(max_keypoints=512, n_levels=4),
        map=MapConfig(max_keyframes=64, max_points=8192, max_kps_per_frame=512),
    )
    seq = synthetic.SyntheticSequence(CAM, n_frames=n, trajectory=trajectory, **kw)
    tracker = RGBDTracker(cfg)
    gt = np.asarray(seq.poses)
    for i in range(n):
        ts, img, depth = seq.frame(i)
        tracker.track(img, depth, ts)
        tracker.flush()
        est = np.asarray(tracker.trajectory[i])
        # translation error of camera center
        Rg, tg = gt[i][:3, :3], gt[i][:3, 3]
        Re, te = est[:3, :3], est[:3, 3]
        cg = -Rg.T @ tg
        ce = -Re.T @ te
        err = np.linalg.norm(cg - ce)
        nkf = int(np.asarray(tracker.ms.kf_valid).sum())
        npt = int(np.asarray(tracker.ms.pt_valid).sum())
        print(f"f={i:3d} err={err*100:7.3f}cm nKF={nkf:3d} nPT={npt:5d} "
              f"status={tracker.st.status}")
    est = np.stack([np.asarray(p) for p in tracker.trajectory])
    ate = metrics.ate_rmse(est, gt, align=False)
    print(f"ATE={ate*100:.2f}cm")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 80
    traj = sys.argv[2] if len(sys.argv) > 2 else "orbit"
    kw = {}
    for a in sys.argv[3:]:
        k, v = a.split("=")
        kw[k] = float(v)
    if not kw:
        kw = {"radius": 0.06, "yaw_amp": 0.04} if traj == "orbit" else {"step": 0.01}
    main(n, traj, **kw)
