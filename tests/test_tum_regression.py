"""Dataset regression: ATE RMSE on TUM RGB-D sequences (SURVEY.md §4).

The north-star metric is ATE RMSE on TUM fr1/xyz (BASELINE.json). This
environment has no network egress, so the test activates only when a
sequence is present locally; point SDSLAM_TUM_ROOT at a directory laid out
like rgbd_dataset_freiburg1_xyz (rgb.txt, depth.txt, groundtruth.txt).

Synthetic-scene regression (exact ground truth) runs everywhere else:
tests/test_odometry.py.
"""

import os

import numpy as np
import pytest

TUM_ROOT = os.environ.get(
    "SDSLAM_TUM_ROOT", "/root/datasets/rgbd_dataset_freiburg1_xyz"
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(TUM_ROOT),
    reason=f"TUM sequence not present at {TUM_ROOT} (no network egress)",
)


def test_tum_fr1_ate():
    from sdslam_tpu.geometry.camera import CameraModel
    from sdslam_tpu.io.datasets import TUMRGBDDataset, read_tum_list
    from sdslam_tpu.system import RGBD, SDSlamSystem
    from sdslam_tpu.utils.config import (
        MapConfig, ORBConfig, SystemConfig, TrackingConfig,
    )
    from sdslam_tpu.utils.metrics import ate_rmse

    # TUM fr1 intrinsics (the reference's TUM1.yaml)
    cam = CameraModel(
        fx=517.306408, fy=516.469215, cx=318.643040, cy=255.313989,
        k1=0.262383, k2=-0.953104, p1=-0.005358, p2=0.002628, k3=1.163314,
        width=640, height=480, bf=40.0,
    )
    cfg = SystemConfig(
        camera=cam,
        orb=ORBConfig(max_keypoints=1024, n_levels=5),
        map=MapConfig(max_keyframes=96, max_points=12288,
                      max_kps_per_frame=1024),
        tracking=TrackingConfig(depth_map_factor=5000.0),
    )
    ds = TUMRGBDDataset(TUM_ROOT, depth_factor=5000.0)
    sysm = SDSlamSystem(cfg, sensor=RGBD, loop_closing=True)
    stamps = []
    n = min(len(ds), 300)
    # raw u16 depth counts: the tracker applies DepthMapFactor on device
    # (feeding the loader's meters would double-divide)
    it = ds.prefetch_iter(raw=True)
    for i, (ts, img, depth) in enumerate(it):
        if i >= n:
            break
        sysm.track_rgbd(img, depth, ts)
        stamps.append(ts)
    sysm.tracker.flush()
    est = np.stack([np.asarray(p) for p in sysm.tracker.trajectory])

    # groundtruth association
    gt_list = read_tum_list(os.path.join(TUM_ROOT, "groundtruth.txt"))
    gt_t = np.array([t for t, _ in gt_list])
    # build gt poses nearest to each frame stamp
    from sdslam_tpu.geometry import lie
    import jax.numpy as jnp

    gt_rows = []
    with open(os.path.join(TUM_ROOT, "groundtruth.txt")) as f:
        for line in f:
            if line.startswith("#"):
                continue
            v = [float(x) for x in line.split()]
            gt_rows.append(v)
    gt_rows = np.array(gt_rows)
    est_sel, gt_sel = [], []
    for i, ts in enumerate(stamps):
        j = int(np.argmin(np.abs(gt_rows[:, 0] - ts)))
        if abs(gt_rows[j, 0] - ts) > 0.05:
            continue
        tx, ty, tz, qx, qy, qz, qw = gt_rows[j, 1:8]
        R = np.asarray(
            lie.quat_to_mat(jnp.asarray([qw, qx, qy, qz], jnp.float32))
        )
        Twc = np.eye(4)
        Twc[:3, :3] = R
        Twc[:3, 3] = [tx, ty, tz]
        gt_sel.append(np.linalg.inv(Twc))  # Tcw
        est_sel.append(est[i])
    ate = ate_rmse(np.stack(est_sel), np.stack(gt_sel))
    # the reference claims real-time operation with ORB-SLAM2-class accuracy;
    # published ORB-SLAM2 ATE on fr1/xyz is ~1 cm — accept 5 cm headroom
    assert ate < 0.05, f"TUM fr1 ATE RMSE {ate*100:.2f} cm"
