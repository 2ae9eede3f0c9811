"""Streaming front-end: approximate-time sync + runner odometry emission.

Covers the ROS-node capabilities (Examples/ROS/SD-SLAM/src/*.cc) the
framework provides without ROS: message pairing, IMU association, odometry
records, TUM-format export.
"""

import numpy as np
import pytest

from sdslam_tpu.io.stream import (
    ApproximateTimeSync,
    ImageMsg,
    ImuMsg,
    OdometryMsg,
    StreamRunner,
    associate_imu_to_frames,
)


def test_approx_sync_pairs_nearest():
    pairs = []
    sync = ApproximateTimeSync(lambda a, b: pairs.append((a.stamp, b.stamp)),
                               queue_size=10, slop=0.02)
    # interleaved streams with small offsets
    for k in range(5):
        t = k * 0.1
        sync.push_a(ImageMsg(t, np.zeros((2, 2), np.uint8)))
        sync.push_b(ImageMsg(t + 0.005, np.zeros((2, 2), np.uint16)))
    assert len(pairs) == 5
    for ta, tb in pairs:
        assert abs(ta - tb) <= 0.02


def test_approx_sync_drops_unmatched():
    pairs = []
    sync = ApproximateTimeSync(lambda a, b: pairs.append((a.stamp, b.stamp)),
                               queue_size=3, slop=0.01)
    # stream A runs far ahead of B: old A messages must be discarded, and
    # the eventual close pair still emits
    for k in range(4):
        sync.push_a(ImageMsg(k * 0.1, np.zeros((2, 2), np.uint8)))
    sync.push_b(ImageMsg(0.301, np.zeros((2, 2), np.uint16)))
    assert len(pairs) == 1
    assert pairs[0][0] == pytest.approx(0.3) and pairs[0][1] == 0.301


def test_imu_association_nearest():
    imu = [ImuMsg(t, np.ones(3) * t, np.zeros(3)) for t in (0.0, 0.1, 0.2)]
    out = associate_imu_to_frames([0.04, 0.11, 0.5], imu)
    assert out[0].stamp == 0.0
    assert out[1].stamp == 0.1
    assert out[2].stamp == 0.2


def test_odometry_msg_fields():
    Twc = np.eye(4)
    Twc[:3, 3] = [1.0, 2.0, 3.0]
    o = OdometryMsg(stamp=1.5, Twc=Twc, tracked=True)
    assert np.allclose(o.position, [1, 2, 3])
    q = o.quaternion_xyzw
    assert np.allclose(q, [0, 0, 0, 1], atol=1e-6)  # identity rotation


def test_stream_runner_rgbd(tmp_path):
    from sdslam_tpu.geometry.camera import CameraModel
    from sdslam_tpu.io.synthetic import SyntheticSequence
    from sdslam_tpu.system import RGBD, SDSlamSystem
    from sdslam_tpu.utils.config import (
        MapConfig, ORBConfig, SystemConfig, TrackingConfig,
    )

    cam = CameraModel(fx=120.0, fy=120.0, cx=79.5, cy=59.5,
                      width=160, height=120, bf=10.0)
    cfg = SystemConfig(
        camera=cam,
        orb=ORBConfig(max_keypoints=256, n_levels=3),
        map=MapConfig(max_keyframes=8, max_points=1024, max_kps_per_frame=256),
        tracking=TrackingConfig(),
    )
    sysm = SDSlamSystem(cfg, sensor=RGBD, loop_closing=False)
    runner = StreamRunner(sysm, sensor="rgbd", slop=0.02)

    seq = SyntheticSequence(cam, n_frames=6, trajectory="orbit", radius=0.04)
    for i in range(6):
        ts, img, depth = seq.frame(i)
        img8 = (np.asarray(img)).astype(np.uint8)
        d32 = np.asarray(depth, np.float32)
        runner.push_image(ImageMsg(ts, img8))
        runner.push_depth(ImageMsg(ts + 0.002, d32))
    sysm.tracker.flush()
    assert len(runner.odometry) == 6
    # poses are world-from-camera transforms near the origin-ish orbit
    p = runner.write_tum_trajectory(str(tmp_path / "odo.txt"))
    lines = (tmp_path / "odo.txt").read_text().strip().splitlines()
    assert len(lines) == 6
    assert len(lines[0].split()) == 8
