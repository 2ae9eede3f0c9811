"""Large-map regime: the SURVEY §5 "scale the map" analog demonstrated.

Builds a 128-keyframe / ~10k-point map (more keyframes than an entire TUM
fr1 sequence produces at the reference's cadence), then exercises the
passes whose cost is O(N_KF) or O(P):

  * batched relocalization against the full pool (one vmapped align),
  * the SAME scan sharded over the 8-device mesh (dist_align) with
    identical winners — the multi-chip path at scale,
  * a full-pool statistics rebuild and local BA window.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from sdslam_tpu.geometry import lie
from sdslam_tpu.geometry.camera import CameraModel
from sdslam_tpu.io import synthetic
from sdslam_tpu.mapping import map_state as M
from sdslam_tpu.features.frame import ORBExtractor, make_frame
from sdslam_tpu.parallel.dist_align import distributed_align_scan
from sdslam_tpu.pipeline.relocalization import relocalize
from sdslam_tpu.pipeline.tracking import KF_STORE_MIN_LEVEL, spawn_points
from sdslam_tpu.utils.config import MapConfig, ORBConfig, SystemConfig

pytestmark = pytest.mark.heavy

CAM = CameraModel(
    fx=320.0, fy=320.0, cx=159.5, cy=119.5, width=320, height=240, bf=32.0
)
N_KF = 128


def build_large_map():
    cfg = SystemConfig(
        camera=CAM,
        orb=ORBConfig(max_keypoints=256, n_levels=4),
        map=MapConfig(max_keyframes=N_KF, max_points=32768,
                      max_kps_per_frame=256),
    )
    seq = synthetic.SyntheticSequence(
        CAM, n_frames=N_KF, trajectory="orbit", radius=0.25, yaw_amp=0.2
    )
    extractor = ORBExtractor(CAM, cfg.orb)
    shapes = []
    h, w = CAM.height, CAM.width
    for lvl in range(cfg.orb.n_levels):
        if lvl >= KF_STORE_MIN_LEVEL:
            shapes.append((h, w))
        h, w = (h + 1) // 2, (w + 1) // 2
    ms = M.init_map(N_KF, cfg.map.max_points, cfg.orb.max_keypoints,
                    tuple(shapes))
    for i in range(N_KF):
        ts, img, depth = seq.frame(i)
        fr = make_frame(extractor, img, depth_img=depth)
        f = fr.features
        ms = M.insert_keyframe(
            ms, jnp.asarray(i), jnp.asarray(seq.poses[i]),
            f.uv, f.uv_und, f.octave, f.angle, f.desc, f.valid,
            fr.depth, fr.uright, jnp.full((f.capacity,), -1, jnp.int32),
            tuple(fr.pyramid[KF_STORE_MIN_LEVEL:]),
            jnp.asarray(i * 4, jnp.int32), jnp.asarray(float(i), jnp.float32),
            jnp.asarray(i - 1, jnp.int32),
        )
        # spawn only every 2nd KF: bounds the point pool like the real
        # pipeline's fuse/cull would
        if i % 2 == 0:
            ms = spawn_points(
                ms=ms, cam=CAM, slot=jnp.asarray(i),
                close_depth_th=jnp.asarray(4.0, jnp.float32),
                scale_factor=2.0, n_levels=4, update_stats=False,
            )
    ms = M.finalize_point_statistics(ms, 2.0, 4)
    return cfg, seq, extractor, ms


def test_large_map_global_passes():
    cfg, seq, extractor, ms = build_large_map()
    n_kf = int(ms.n_keyframes())
    n_pt = int(ms.n_points())
    assert n_kf == N_KF and n_pt > 5000
    print(f"large map: {n_kf} KFs, {n_pt} points")

    # --- batched relocalization against all 128 KFs ---
    qi = 77
    ts, img, depth = seq.frame(qi)
    fr = make_frame(extractor, img, depth_img=depth)
    f = fr.features
    t0 = time.perf_counter()
    rr = relocalize(
        CAM, ms, f.uv_und, f.desc, f.octave, f.valid, fr.uright, fr.pyramid,
        key=jax.random.key(0), scale_factor=2.0, n_levels=4,
        store_min_level=KF_STORE_MIN_LEVEL,
    )
    jax.block_until_ready(rr.Tcw)
    dt = time.perf_counter() - t0
    assert bool(rr.success)
    e = np.asarray(lie.se3_log(
        rr.Tcw @ lie.se3_inv(jnp.asarray(np.asarray(seq.poses[qi])))
    ))
    print(f"reloc over {n_kf} KFs: {dt*1e3:.0f} ms, err={np.abs(e).max():.4f}")
    assert np.abs(e[:3]).max() < 0.02

    # --- the same scan sharded over the mesh: same winner ---
    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("dp",))
    _, errors_d = distributed_align_scan(
        mesh, CAM, ms, fr.pyramid, scale_factor=2.0, n_levels=4,
        store_min_level=KF_STORE_MIN_LEVEL,
    )
    errors_d = np.asarray(errors_d)
    # the distributed scan must rank the same neighborhood on top
    assert abs(int(np.argmin(errors_d)) - qi) <= 2

    # --- full-pool local BA window around the query keyframe ---
    from sdslam_tpu.solvers import ba

    t0 = time.perf_counter()
    ms2 = ba.local_ba(CAM, ms, jnp.asarray(qi), scale_factor=2.0)
    jax.block_until_ready(ms2.kf_Tcw)
    print(f"local BA at {n_kf}-KF scale: {(time.perf_counter()-t0)*1e3:.0f} ms")
    # ground-truth-consistent map: BA must not move poses materially
    d = np.asarray(ms2.kf_Tcw) - np.asarray(ms.kf_Tcw)
    assert np.abs(d).max() < 0.05
