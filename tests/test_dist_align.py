"""Distributed relocalization/loop-detection scan (parallel/dist_align.py):
keyframes sharded over the 8-device CPU mesh; results must match the
single-device vmapped scan."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from sdslam_tpu.geometry.camera import CameraModel
from sdslam_tpu.io.synthetic import SyntheticSequence
from sdslam_tpu.parallel.dist_align import distributed_align_scan
from sdslam_tpu.pipeline.relocalization import relocalize
from sdslam_tpu.pipeline.tracking import RGBDTracker
from sdslam_tpu.utils.config import (
    MapConfig, ORBConfig, SystemConfig, TrackingConfig,
)


def test_distributed_scan_matches_single_device():
    cam = CameraModel(fx=160.0, fy=160.0, cx=79.5, cy=59.5,
                      width=160, height=120, bf=16.0)
    cfg = SystemConfig(
        camera=cam,
        orb=ORBConfig(max_keypoints=256, n_levels=3),
        map=MapConfig(max_keyframes=8, max_points=1024, max_kps_per_frame=256),
        tracking=TrackingConfig(),
    )
    tr = RGBDTracker(cfg)
    seq = SyntheticSequence(cam, n_frames=10, trajectory="orbit",
                            radius=0.05, yaw_amp=0.05)
    for i in range(10):
        ts, img, depth = seq.frame(i)
        tr.track(np.asarray(img), np.asarray(depth), ts)
    tr.flush()
    jax.block_until_ready(tr.ms.kf_Tcw)
    assert int(np.asarray(tr.ms.kf_valid).sum()) >= 2

    # query: a frame mid-sequence
    from sdslam_tpu.features.frame import make_frame

    ts, img, depth = seq.frame(5)
    fr = make_frame(tr.extractor, np.asarray(img), depth_img=np.asarray(depth))

    # single-device reference errors (relocalize's align_errors field)
    f = fr.features
    rr = relocalize(cam, tr.ms, f.uv_und, f.desc, f.octave, f.valid,
                    fr.uright, fr.pyramid, scale_factor=2.0, n_levels=3,
                    store_min_level=2)
    ref_err = np.asarray(rr.align_errors)

    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    T_rels, errors = distributed_align_scan(
        mesh, cam, tr.ms, fr.pyramid, scale_factor=2.0, n_levels=3,
        store_min_level=2, min_level=1,
    )
    err = np.asarray(errors)
    assert err.shape == (tr.ms.K,)
    # same winner and near-identical errors (identical math, sharded)
    valid = np.asarray(tr.ms.kf_valid)
    assert np.argmin(np.where(valid, err, np.inf)) == np.argmin(
        np.where(valid, ref_err, np.inf)
    )
    np.testing.assert_allclose(err[valid], ref_err[valid], rtol=1e-4, atol=1e-6)
