"""Pattern detection + calibration on rendered chessboards."""

import numpy as np
import pytest

from sdslam_tpu.features import pattern
from sdslam_tpu.geometry.camera import CameraModel

CAM = CameraModel(fx=320.0, fy=320.0, cx=159.5, cy=119.5, width=320, height=240)


def render_board(cam, T_board_cam, pattern_size=(6, 4), cell=pattern.CELL_SIZE):
    """Render a synthetic chessboard (with a border) via cv2 warp."""
    import cv2

    cols, rows = pattern_size
    sq = 40  # px per cell in the texture
    bw, bh = (cols + 1) * sq, (rows + 1) * sq
    tex = np.zeros((bh, bw), np.uint8)
    for i in range(rows + 1):
        for j in range(cols + 1):
            if (i + j) % 2 == 0:
                tex[i * sq : (i + 1) * sq, j * sq : (j + 1) * sq] = 255
    # board texture spans [-cell, cols*cell] x [-cell, rows*cell] in board coords
    corners_board = np.array(
        [[-cell, -cell, 0], [cols * cell, -cell, 0],
         [cols * cell, rows * cell, 0], [-cell, rows * cell, 0]], np.float32
    )
    R, t = T_board_cam[:3, :3], T_board_cam[:3, 3]
    Xc = corners_board @ R.T + t
    uv = np.stack(
        [cam.fx * Xc[:, 0] / Xc[:, 2] + cam.cx, cam.fy * Xc[:, 1] / Xc[:, 2] + cam.cy], 1
    ).astype(np.float32)
    src = np.array([[0, 0], [bw, 0], [bw, bh], [0, bh]], np.float32)
    H, _ = cv2.findHomography(src, uv)
    img = np.full((cam.height, cam.width), 128, np.uint8)
    warped = cv2.warpPerspective(tex, H, (cam.width, cam.height),
                                 flags=cv2.INTER_LINEAR, borderValue=128)
    mask = cv2.warpPerspective(np.ones_like(tex) * 255, H, (cam.width, cam.height)) > 0
    img[mask] = warped[mask]
    return img.astype(np.float32)


def board_pose(z=0.5, rx=0.3, ry=0.2, tx=-0.08, ty=-0.05):
    import cv2

    R, _ = cv2.Rodrigues(np.array([rx, ry, 0.0]))
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R
    T[:3, 3] = [tx, ty, z]
    return T


def test_detect_pattern_pose():
    T_gt = board_pose()
    img = render_board(CAM, T_gt)
    res = pattern.detect_pattern(img, CAM)
    assert res.found
    # recovered board pose close to ground truth
    dt = np.linalg.norm(res.T_board_cam[:3, 3] - T_gt[:3, 3])
    assert dt < 0.01
    dR = res.T_board_cam[:3, :3].T @ T_gt[:3, :3]
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 1.0


def test_metric_points_on_board():
    T_gt = board_pose()
    img = render_board(CAM, T_gt)
    res = pattern.detect_pattern(img, CAM)
    assert res.found
    # query the detected corner pixels themselves: all on the board, at
    # metric positions matching the known grid
    # corners lie exactly on the rectangle boundary: allow 5 mm margin
    inside, X_cam = pattern.metric_points_on_board(res, CAM, res.corners_uv, margin=0.005)
    assert inside.mean() > 0.95
    obj = pattern.board_object_points()
    R, t = T_gt[:3, :3], T_gt[:3, 3]
    X_gt = obj @ R.T + t
    err = np.linalg.norm(X_cam[inside] - X_gt[inside], axis=1)
    assert np.median(err) < 0.005  # 5 mm

    # a pixel far off the board must be excluded
    inside2, _ = pattern.metric_points_on_board(
        res, CAM, np.array([[5.0, 5.0]], np.float32)
    )
    assert not inside2[0]


def test_no_pattern_in_noise(rng):
    img = rng.uniform(0, 255, (240, 320)).astype(np.float32)
    res = pattern.detect_pattern(img, CAM)
    assert not res.found


def test_calibration_roundtrip():
    imgs = [
        render_board(CAM, board_pose(z=0.5 + 0.08 * i, rx=0.25 + 0.12 * i,
                                     ry=-0.25 + 0.12 * i, tx=-0.06 + 0.02 * i,
                                     ty=-0.04 + 0.015 * i),
                     cell=0.0302)
        for i in range(6)
    ]
    cam_est, rms = pattern.calibrate_from_images(imgs, cell=0.0302)
    assert rms < 1.0
    # a small 6x4 board over 6 views bounds focal accuracy to ~10%
    assert abs(cam_est.fx - CAM.fx) / CAM.fx < 0.12
    assert abs(cam_est.cx - CAM.cx) < 15


def test_pattern_initialization_mono():
    """UsePattern monocular bootstrap (Tracking::PatternInitialization,
    Tracking.cc:506-568): a chessboard frame creates a metric-scale map."""
    from sdslam_tpu.pipeline.tracking import MonoTracker
    from sdslam_tpu.utils.config import (
        MapConfig, ORBConfig, SystemConfig, TrackingConfig,
    )

    cfg = SystemConfig(
        camera=CAM,
        orb=ORBConfig(max_keypoints=512, n_levels=3),
        map=MapConfig(max_keyframes=8, max_points=2048, max_kps_per_frame=512),
        tracking=TrackingConfig(use_pattern=True),
    )
    tr = MonoTracker(cfg)
    img = render_board(CAM, board_pose(z=0.5))
    tr.track(img, 0.0)
    tr.flush()
    assert tr.st.status == "OK"
    ms = tr.ms
    n_pts = int(np.asarray(ms.pt_valid).sum())
    assert n_pts >= 20
    # metric scale: points live on the board plane ~0.4-0.7 m from the camera
    z = np.asarray(ms.pt_pos)[np.asarray(ms.pt_valid)][:, 2]
    assert (np.abs(np.median(z) - 0.5) < 0.15), np.median(z)
