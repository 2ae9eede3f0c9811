"""Viewer renders + AR plane detection."""

import os

import numpy as np

from sdslam_tpu import viewer


def test_detect_plane(rng):
    # 80 points on a plane + 20 outliers
    n = 80
    pts = np.zeros((100, 3), np.float32)
    pts[:n, 0] = rng.uniform(-1, 1, n)
    pts[:n, 2] = rng.uniform(1, 3, n)
    pts[:n, 1] = 0.5 + 0.001 * rng.normal(size=n)
    pts[n:] = rng.uniform(-1, 1, (20, 3))
    res = viewer.detect_plane(pts)
    assert res is not None
    nrm, d, inl = res
    assert inl[:n].mean() > 0.9
    # plane normal ~ y axis
    assert abs(abs(nrm[1]) - 1.0) < 0.05


def test_detect_plane_insufficient():
    assert viewer.detect_plane(np.zeros((2, 3))) is None


def test_draw_map_and_frame(tmp_path, rng):
    from sdslam_tpu.geometry.camera import CameraModel
    from sdslam_tpu.io.synthetic import SyntheticSequence
    from sdslam_tpu.pipeline.tracking import RGBDTracker
    from sdslam_tpu.utils.config import MapConfig, ORBConfig, SystemConfig

    cam = CameraModel(fx=320.0, fy=320.0, cx=159.5, cy=119.5,
                      width=320, height=240, bf=32.0)
    cfg = SystemConfig(camera=cam, orb=ORBConfig(max_keypoints=512, n_levels=4),
                       map=MapConfig(max_keyframes=32, max_points=4096,
                                     max_kps_per_frame=512))
    seq = SyntheticSequence(cam, n_frames=6, trajectory="orbit", radius=0.06,
                            yaw_amp=0.04)
    t = RGBDTracker(cfg)
    for i in range(6):
        ts, img, depth = seq.frame(i)
        t.track(img, depth, ts)
    p1 = str(tmp_path / "map.png")
    viewer.draw_map(t.ms, trajectory=t.trajectory, path=p1)
    assert os.path.getsize(p1) > 10000
    f = t.st.last_frame.features
    p2 = str(tmp_path / "frame.png")
    viewer.draw_frame(np.asarray(img), np.asarray(f.uv)[np.asarray(f.valid)],
                      state_text="OK", path=p2)
    assert os.path.getsize(p2) > 10000
    # array-return mode
    arr = viewer.draw_map(t.ms)
    assert arr.ndim == 3 and arr.shape[2] == 3


def test_status_text():
    assert viewer.status_text("NOT_INITIALIZED", 0, 0, 0) == "TRYING TO INITIALIZE"
    assert "RELOCALIZE" in viewer.status_text("LOST", 5, 100, 0)
    s = viewer.status_text("OK", 7, 420, 55)
    assert "SLAM MODE" in s and "KFs: 7" in s and "MPs: 420" in s
    assert viewer.status_text("OK", 7, 420, 55, localization_only=True).startswith(
        "LOCALIZATION")


def test_draw_ar(tmp_path, rng):
    from sdslam_tpu.geometry.camera import CameraModel

    cam = CameraModel(fx=320.0, fy=320.0, cx=159.5, cy=119.5,
                      width=320, height=240, bf=32.0)
    # synthetic floor plane y = 0.5 (y down), camera at origin looking +z
    pts = rng.uniform([-1, 0.5, 1.0], [1, 0.5, 3.0], size=(200, 3))
    pts[:, 1] += rng.normal(size=200) * 0.002
    plane = viewer.detect_plane(pts)
    assert plane is not None
    img = np.full((240, 320), 128, np.uint8)
    p = str(tmp_path / "ar.png")
    viewer.draw_ar(img, cam, np.eye(4), plane, points=pts, path=p)
    assert os.path.getsize(p) > 10000
    arr = viewer.draw_ar(img, cam, np.eye(4), plane, points=pts)
    assert arr.ndim == 3
