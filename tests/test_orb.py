"""ORB front-end tests: FAST vs OpenCV oracle, rotation invariance, pyramid."""

import numpy as np
import jax.numpy as jnp
import pytest

from sdslam_tpu.features.frame import ORBExtractor, make_frame
from sdslam_tpu.geometry.camera import CameraModel
from sdslam_tpu.io import synthetic
from sdslam_tpu.ops import fast as fast_ops
from sdslam_tpu.ops import pyramid as pyr_ops
from sdslam_tpu.utils.config import ORBConfig

CAM = CameraModel(fx=320.0, fy=320.0, cx=159.5, cy=119.5, width=320, height=240)


def checker_image(rng, size=(240, 320), n_blobs=60):
    """Image with corner-rich content: random rectangles over noise."""
    img = rng.uniform(40, 80, size=size).astype(np.float32)
    for _ in range(n_blobs):
        y = rng.integers(20, size[0] - 40)
        x = rng.integers(20, size[1] - 40)
        h = rng.integers(8, 30)
        w = rng.integers(8, 30)
        img[y : y + h, x : x + w] = rng.uniform(100, 220)
    return img


def test_pyramid_shapes():
    img = jnp.zeros((240, 320), jnp.float32)
    pyr = pyr_ops.build_pyramid(img, 4, 2.0)
    assert [p.shape for p in pyr] == [(240, 320), (120, 160), (60, 80), (30, 40)]


def test_level_quotas():
    q = pyr_ops.level_quotas(1024, 5, 2.0)
    assert sum(q) == 1024
    assert q[0] > q[1] > q[2] > q[3] > q[4] > 0


def test_fast_matches_opencv(rng):
    import cv2

    img = checker_image(rng).astype(np.uint8).astype(np.float32)
    uv, score, valid = fast_ops.detect_keypoints(
        jnp.asarray(img), 512, threshold=20.0
    )
    uv = np.asarray(uv)[np.asarray(valid)]
    assert len(uv) > 100

    # oracle with a threshold margin: borderline uint8/NMS differences aside,
    # our t=20 corners must all be cv2 t=10 corners
    det = cv2.FastFeatureDetector_create(threshold=10, nonmaxSuppression=False)
    kps = det.detect(img.astype(np.uint8))
    cv_uv = np.array([k.pt for k in kps], np.float32)
    assert len(cv_uv) > 0
    d = np.linalg.norm(uv[:, None, :] - cv_uv[None, :, :], axis=-1).min(axis=1)
    assert np.mean(d <= 1.0) > 0.97


def test_fast_score_monotonic_in_threshold(rng):
    img = checker_image(rng)
    s = np.asarray(fast_ops.fast_score_map(jnp.asarray(img)))
    # score is the max threshold at which corner survives: pixels passing
    # t=40 must be a superset-of-equal of those passing t=60
    assert ((s > 60) <= (s > 40)).all()
    assert (s >= 0).all()


def test_extractor_end_to_end(rng):
    cfg = ORBConfig(max_keypoints=512, n_levels=4)
    ext = ORBExtractor(CAM, cfg)
    img = checker_image(rng)
    feats, pyramid = ext(img)
    v = np.asarray(feats.valid)
    assert v.sum() > 150
    uv = np.asarray(feats.uv)[v]
    assert (uv[:, 0] < 320).all() and (uv[:, 1] < 240).all()
    assert len(pyramid) == 4
    # descriptors of valid kps are non-trivial
    desc = np.asarray(feats.desc)[v]
    bitcounts = np.unpackbits(desc.view(np.uint8), axis=1).sum(axis=1)
    assert np.median(bitcounts) > 32  # not all-zero / stuck

    # multiple octaves represented
    assert len(np.unique(np.asarray(feats.octave)[v])) >= 2


def hamming(d1, d2):
    x = np.bitwise_xor(d1.view(np.uint8), d2.view(np.uint8))
    return np.unpackbits(x, axis=-1).sum(-1)


def test_descriptor_rotation_invariance(rng):
    """Descriptors must survive in-plane rotation (the point of oriented BRIEF)."""
    import cv2

    img = checker_image(rng)
    angle_deg = 30.0
    M = cv2.getRotationMatrix2D((160, 120), angle_deg, 1.0)
    rot = cv2.warpAffine(img, M, (320, 240), flags=cv2.INTER_LINEAR)

    cfg = ORBConfig(max_keypoints=256, n_levels=1)
    ext = ORBExtractor(CAM, cfg)
    f1, _ = ext(img)
    f2, _ = ext(rot)
    v1, v2 = np.asarray(f1.valid), np.asarray(f2.valid)
    uv1 = np.asarray(f1.uv)[v1]
    uv2 = np.asarray(f2.uv)[v2]
    d1 = np.asarray(f1.desc)[v1]
    d2 = np.asarray(f2.desc)[v2]

    # ground-truth correspondence: rotate uv1 by M, find f2 kp within 2 px
    uv1h = np.concatenate([uv1, np.ones((len(uv1), 1))], axis=1)
    uv1r = uv1h @ M.T
    dist = np.linalg.norm(uv1r[:, None] - uv2[None], axis=-1)
    j = dist.argmin(axis=1)
    ok = dist[np.arange(len(uv1)), j] < 2.0
    assert ok.sum() > 30

    dh = hamming(d1[ok], d2[j[ok]])
    # random 256-bit pairs average 128; matched rotated pairs must be far below
    assert np.median(dh) < 60


def test_rgbd_frame_channels(rng):
    cam = CameraModel(
        fx=320.0, fy=320.0, cx=159.5, cy=119.5, width=320, height=240, bf=32.0
    )
    seq = synthetic.SyntheticSequence(cam, n_frames=1)
    _, img, depth = seq.frame(0)
    ext = ORBExtractor(cam, ORBConfig(max_keypoints=256, n_levels=3))
    fr = make_frame(ext, img, depth_img=depth)
    v = np.asarray(fr.features.valid)
    d = np.asarray(fr.depth)
    ur = np.asarray(fr.uright)
    assert (d[v] > 0).mean() > 0.95  # synthetic depth is dense
    got = v & (d > 0)
    np.testing.assert_allclose(
        ur[got],
        np.asarray(fr.features.uv_und)[got, 0] - 32.0 / d[got],
        atol=1e-4,
    )
    assert (d[~v] == -1).all()
