"""Per-stage device-time budget at bench shapes (640x480, 1024 kps, K=64,
P=8192): slope-times each component of the steady frame step and of the
keyframe mapping pass SEPARATELY on a live map state, so optimization
targets are named functions instead of anonymous fusions.

Run alone: python scripts/diag_stage_budget.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from sdslam_tpu.geometry.camera import CameraModel
    from sdslam_tpu.io.synthetic import SyntheticSequence
    from sdslam_tpu.pipeline.tracking import RGBDTracker, pack_frame
    from sdslam_tpu.utils.config import (
        MapConfig, ORBConfig, SystemConfig, TrackingConfig,
    )

    cam = CameraModel(fx=525.0, fy=525.0, cx=319.5, cy=239.5,
                      width=640, height=480, bf=40.0)
    cfg = SystemConfig(
        camera=cam,
        orb=ORBConfig(max_keypoints=1024, n_levels=5),
        map=MapConfig(max_keyframes=64, max_points=8192, max_kps_per_frame=1024),
        tracking=TrackingConfig(depth_map_factor=1000.0),
    )
    n = 16
    seq = SyntheticSequence(cam, n_frames=n, trajectory="orbit",
                            radius=0.06, yaw_amp=0.04)
    frames = [(t, np.asarray(i).astype(np.uint8),
               (np.asarray(d) * 1000).astype(np.uint16))
              for (t, i, d) in (seq.frame(k) for k in range(n))]
    tr = RGBDTracker(cfg)
    for i in range(n):
        ts, img, dep = frames[i]
        tr.track(img, dep, ts)
    tr.flush()
    ms = tr.ms
    print(f"map: {int(np.asarray(ms.kf_valid).sum())} KFs, "
          f"{int(np.asarray(ms.pt_valid).sum())} points", flush=True)

    def slope(make_body, *args, reps=(20, 120)):
        fs = []
        for r in reps:
            def run(*a, r=r):
                def body(i, acc):
                    return acc + make_body(i, *a)
                return lax.fori_loop(0, r, body, jnp.float32(0))
            fs.append(jax.jit(run))
        for f in fs:
            np.asarray(f(*args))
        ts_ = []
        for f in fs:
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(f(*args))
                best = min(best, time.perf_counter() - t0)
            ts_.append(best)
        return (ts_[1] - ts_[0]) / (reps[1] - reps[0])

    sf, nl = cfg.orb.scale_factor, cfg.orb.n_levels

    # opaque zeros: keep each loop body dependent on i so XLA cannot hoist
    # it out of the timing loop (0*i would constant-fold)
    def z(i):
        return jnp.round(i.astype(jnp.float32) * 1e-20).astype(jnp.int32)

    def zf(i):
        return i.astype(jnp.float32) * 1e-20

    # ---- steady-frame components ---------------------------------------
    from sdslam_tpu.features.frame import make_frame
    from sdslam_tpu.pipeline import tracking as T

    ts0, img0, dep0 = frames[-1]
    buf = jnp.asarray(pack_frame(img0, dep0, ts0))
    core = tr.extractor.core
    H, W = cam.height, cam.width
    Hh, Wh = H // 2, W // 2

    def unpack(buf):
        img = buf[:H, :W]
        dep = buf[H:H + Hh, :Wh].astype(jnp.uint16) | (
            buf[H:H + Hh, Wh:2 * Wh].astype(jnp.uint16) << 8)
        return img, dep

    def extract_body(i, buf):
        img, dep = unpack(buf + z(i).astype(jnp.uint8))
        feats, pyr, d, ur = core(img, dep, 1000.0)
        return jnp.sum(feats.uv) + jnp.sum(pyr[0][0])

    print(f"extract (pyramid+FAST+BRIEF+depth): "
          f"{slope(extract_body, buf)*1e3:.3f} ms", flush=True)

    frame = make_frame(tr.extractor, img0, depth_img=np.asarray(dep0, np.float32) / 1000.0)
    f0 = frame.features
    T_pred = jnp.asarray(tr.st.T_last)
    slot = jnp.asarray(max(tr.st.last_kf_slot, 0), jnp.int32)

    def track_body(i, uv_und, desc, octave, valid, uright, T_pred):
        out, packed = T.track_step(
            cam, ms, uv_und, desc, octave, valid, uright, frame.pyramid,
            slot, T_pred + zf(i),
            scale_factor=sf, n_levels=nl,
            align_min_level=cfg.tracking.align_min_level,
        )
        return jnp.sum(out.Tcw) + out.n_inliers.astype(jnp.float32)

    print(f"track_step (align+match+2x pose GN): "
          f"{slope(track_body, f0.uv_und, f0.desc, f0.octave, f0.valid, frame.uright, T_pred)*1e3:.3f} ms",
          flush=True)

    # ---- KF-pass components --------------------------------------------
    from sdslam_tpu.mapping import local_mapping as LM
    from sdslam_tpu.mapping import map_state as M
    from sdslam_tpu.solvers import ba

    inc = M.incidence_matrix(ms)
    covis = M.covisibility(ms, inc=inc)
    obs_cnt_inc = M.point_obs_count_from_inc(ms, inc)
    obs_lists = M.build_obs_lists(ms, 16)
    rows = (covis[slot] > 0) | (jnp.arange(ms.K) == slot)
    touched = jnp.dot(
        rows.astype(jnp.bfloat16), inc, preferred_element_type=jnp.float32
    ) > 0

    # ---- the WHOLE fused mapping pass, as the tracker runs it ----------
    ts1, img1, dep1 = frames[-1]
    fr1 = make_frame(tr.extractor, img1,
                     depth_img=np.asarray(dep1, np.float32) / 1000.0)
    f1 = fr1.features
    stored_pyr = tuple(fr1.pyramid[T.KF_STORE_MIN_LEVEL:])
    assoc0 = jnp.full((f1.uv.shape[0],), -1, jnp.int32)

    def kf_core_body(i):
        ms2, s2, _, _ = T._kf_core(
            cam, ms, ms.kf_Tcw[slot] + zf(i),
            f1.uv, f1.uv_und, f1.octave, f1.angle, f1.desc, f1.valid,
            fr1.depth, fr1.uright, assoc0, stored_pyr,
            jnp.asarray(99, jnp.int32), jnp.asarray(3.3, jnp.float32), slot,
            jnp.asarray(4.0, jnp.float32),
            scale_factor=sf, n_levels=nl,
        )
        return jnp.sum(ms2.kf_Tcw) + s2.astype(jnp.float32)

    try:
        dt = slope(kf_core_body, reps=(8, 40))
        print(f"KF WHOLE _kf_core pass          : {dt*1e3:7.3f} ms", flush=True)
    except Exception as e:
        print(f"KF WHOLE _kf_core pass          : FAIL {type(e).__name__} "
              f"{str(e)[:120]}", flush=True)

    stages = [
        ("covisibility", lambda i: jnp.sum(
            M.covisibility(ms._replace(kf_frame_id=ms.kf_frame_id + z(i)))
        ).astype(jnp.float32)),
        ("build_obs_lists(16)", lambda i: jnp.sum(
            M.build_obs_lists(
                ms._replace(kf_frame_id=ms.kf_frame_id + z(i)), 16
            )[0]
        ).astype(jnp.float32)),
        ("fuse_neighbors", lambda i: jnp.sum(
            LM.fuse_neighbors(
                cam, ms, slot + z(i), scale_factor=sf, covis=covis,
                obs_cnt=obs_cnt_inc,
            ).kf_mp
        ).astype(jnp.float32)),
        ("local_ba (3+5)", lambda i: jnp.sum(
            ba.local_ba(cam, ms, slot + z(i), scale_factor=sf, covis=covis,
                        inc=inc).kf_Tcw
        )),
        ("spawn_points", lambda i: jnp.sum(
            T.spawn_points(cam, ms, slot + z(i),
                           jnp.asarray(4.0, jnp.float32), scale_factor=sf,
                           n_levels=nl, update_stats=False).pt_pos
        )),
        ("triangulate_new_points", lambda i: jnp.sum(
            LM.triangulate_new_points(cam, ms, slot + z(i), scale_factor=sf,
                                      n_levels=nl, covis=covis,
                                      update_stats=False).pt_pos
        )),
        ("update_tracking_counters", lambda i: jnp.sum(
            M.update_tracking_counters(
                ms, cam, ms.kf_Tcw[slot + z(i)], ms.kf_mp[slot]
            ).pt_visible
        ).astype(jnp.float32)),
        ("cull_points", lambda i: jnp.sum(
            LM.cull_points(
                ms, obs_cnt=jnp.sum(obs_lists[0] >= 0, axis=1) + z(i)
            ).pt_valid
        ).astype(jnp.float32)),
        ("cull_keyframes", lambda i: jnp.sum(
            LM.cull_keyframes(ms, slot + z(i), obs_lists=obs_lists,
                              rows_mask=rows, covis=covis).kf_valid
        ).astype(jnp.float32)),
        ("finalize_stats_local", lambda i: jnp.sum(
            M.finalize_point_statistics_local(
                ms, rows | (z(i) > 0), sf, nl, obs_lists=obs_lists,
                touched=touched | (z(i) > 0),
            ).pt_max_dist
        )),
        ("insert_keyframe+stats", lambda i: jnp.sum(
            M.finalize_point_statistics(
                M.insert_keyframe(
                    ms, slot, ms.kf_Tcw[slot] + zf(i), ms.kf_uv[slot],
                    ms.kf_uv_und[slot], ms.kf_octave[slot], ms.kf_angle[slot],
                    ms.kf_desc[slot], ms.kf_kp_valid[slot], ms.kf_depth[slot],
                    ms.kf_uright[slot], ms.kf_mp[slot],
                    tuple(pl[slot] for pl in ms.kf_pyramid),
                    jnp.asarray(99, jnp.int32), jnp.asarray(3.3, jnp.float32),
                    slot,
                ), sf, nl
            ).pt_max_dist
        )),
    ]
    for name, body in stages:
        try:
            dt = slope(body, reps=(8, 40))
            print(f"KF stage {name:28s}: {dt*1e3:7.3f} ms", flush=True)
        except Exception as e:
            print(f"KF stage {name:28s}: FAIL {type(e).__name__} "
                  f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
