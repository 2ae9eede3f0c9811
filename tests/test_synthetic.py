"""Synthetic renderer sanity: depth geometry + photometric consistency."""

import numpy as np
import jax.numpy as jnp

from sdslam_tpu.geometry import lie
from sdslam_tpu.geometry.camera import CameraModel, backproject
from sdslam_tpu.io import synthetic

CAM = CameraModel(fx=320.0, fy=320.0, cx=159.5, cy=119.5, width=320, height=240)


def test_render_shapes_and_ranges():
    seq = synthetic.SyntheticSequence(CAM, n_frames=2)
    ts, img, depth = seq.frame(0)
    assert img.shape == (240, 320) and depth.shape == (240, 320)
    img = np.asarray(img)
    depth = np.asarray(depth)
    assert img.min() >= 0 and img.max() <= 255
    assert (depth > 0).all() and depth.max() < 20
    # texture has real contrast for the direct alignment path
    assert img.std() > 10


def test_depth_is_geometrically_consistent():
    """Backprojected points from view A must land on the same surface in view B."""
    seq = synthetic.SyntheticSequence(CAM, n_frames=8, trajectory="orbit")
    _, img0, depth0 = seq.frame(0)
    _, img1, depth1 = seq.frame(1)
    T0, T1 = seq.poses[0], seq.poses[1]

    vs, us = np.mgrid[20:220:10, 20:300:10]
    uv = jnp.asarray(np.stack([us.ravel(), vs.ravel()], 1).astype(np.float32))
    d = jnp.asarray(np.asarray(depth0)[vs.ravel(), us.ravel()])
    Xc0 = backproject(CAM, uv, d)
    Xw = lie.se3_apply(lie.se3_inv(T0), Xc0)
    Xc1 = lie.se3_apply(T1, Xw)
    uv1 = jnp.stack(
        [
            CAM.fx * Xc1[:, 0] / Xc1[:, 2] + CAM.cx,
            CAM.fy * Xc1[:, 1] / Xc1[:, 2] + CAM.cy,
        ],
        1,
    )
    uv1 = np.asarray(uv1)
    z1 = np.asarray(Xc1[:, 2])
    inb = (
        (uv1[:, 0] >= 1)
        & (uv1[:, 0] < 319)
        & (uv1[:, 1] >= 1)
        & (uv1[:, 1] < 239)
    )
    ui = np.round(uv1[inb, 0]).astype(int)
    vi = np.round(uv1[inb, 1]).astype(int)
    d1 = np.asarray(depth1)[vi, ui]
    # rendered depth in view B equals transferred depth (no occlusion in a convex room)
    err = np.abs(d1 - z1[inb]) / z1[inb]
    assert np.median(err) < 0.02

    # photometric consistency: intensity at corresponding pixels matches
    i0 = np.asarray(img0)[vs.ravel(), us.ravel()][inb]
    i1 = np.asarray(img1)[vi, ui]
    assert np.median(np.abs(i0 - i1)) < 12.0  # nearest-pixel sampling tolerance


def test_trajectories_start_at_identity():
    seq = synthetic.SyntheticSequence(CAM, n_frames=5, trajectory="orbit")
    np.testing.assert_allclose(np.asarray(seq.poses[0]), np.eye(4), atol=1e-5)
    seq2 = synthetic.SyntheticSequence(CAM, n_frames=5, trajectory="forward")
    np.testing.assert_allclose(np.asarray(seq2.poses[0]), np.eye(4), atol=1e-5)
