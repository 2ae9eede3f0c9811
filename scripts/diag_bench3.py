"""Bench-pass breakdown diagnostic (r3): answers, on real hardware,
(a) whether concurrent uploads aggregate bandwidth through the relay,
(b) where a bench pass's wall time goes (upload / scan compute / drain),
(c) the per-frame device compute time of the fused scan.

Run ALONE (one TPU process; no concurrent CPU jobs). Generous outer
timeout; never kill mid-op (CLAUDE.md wedge protocol).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    print("device:", jax.devices()[0], flush=True)

    # --- (a) upload concurrency ------------------------------------------
    g = jax.jit(lambda a: jnp.sum(a, dtype=jnp.int32))
    payload = np.random.randint(0, 255, (8, 1024, 1024), np.uint8)  # 8 MB
    g(jax.device_put(payload)).block_until_ready()  # compile

    t0 = time.perf_counter()
    s = g(jax.device_put(payload))
    while not s.is_ready():
        time.sleep(0.002)
    t1 = time.perf_counter() - t0
    print(f"1-stream: {payload.nbytes/t1/1e6:.1f} MB/s", flush=True)

    t0 = time.perf_counter()
    ds = [jax.device_put(payload) for _ in range(4)]
    ss = [g(d) for d in ds]
    for s in ss:
        while not s.is_ready():
            time.sleep(0.002)
    t4 = time.perf_counter() - t0
    print(f"4-stream: {4*payload.nbytes/t4/1e6:.1f} MB/s aggregate", flush=True)

    # --- (b)+(c) bench pass breakdown ------------------------------------
    from sdslam_tpu.geometry.camera import CameraModel
    from sdslam_tpu.io.synthetic import SyntheticSequence
    from sdslam_tpu.pipeline.tracking import RGBDTracker
    from sdslam_tpu.utils.config import (
        MapConfig, ORBConfig, SystemConfig, TrackingConfig,
    )

    WARMUP, CHUNK, N_CHUNKS = 6, 16, 4
    cam = CameraModel(fx=525.0, fy=525.0, cx=319.5, cy=239.5,
                      width=640, height=480, bf=40.0)
    cfg = SystemConfig(
        camera=cam,
        orb=ORBConfig(max_keypoints=1024, n_levels=5),
        map=MapConfig(max_keyframes=64, max_points=8192, max_kps_per_frame=1024),
        tracking=TrackingConfig(depth_map_factor=1000.0),
    )
    n_frames = WARMUP + CHUNK * N_CHUNKS
    seq = SyntheticSequence(cam, n_frames=n_frames, trajectory="orbit",
                            radius=0.06, yaw_amp=0.04)
    frames = [
        (t, np.asarray(i).astype(np.uint8),
         (np.asarray(d) * 1000).astype(np.uint16))
        for (t, i, d) in (seq.frame(k) for k in range(n_frames))
    ]
    items = [(i, d, t) for (t, i, d) in frames[WARMUP:]]
    chunks = [items[k: k + CHUNK] for k in range(0, len(items), CHUNK)]

    def one_pass(label):
        tracker = RGBDTracker(cfg)
        t_init0 = time.perf_counter()
        for i in range(WARMUP):
            ts, img, depth = frames[i]
            tracker.track(img, depth, ts)
        tracker.flush()
        t_init = time.perf_counter() - t_init0

        t0 = time.perf_counter()
        ups = [tracker.upload_batch(ch) for ch in chunks]
        t_up_issue = time.perf_counter() - t0
        # wait for the LAST upload to land (dependent sum would add compile;
        # measure via scan instead)
        t1 = time.perf_counter()
        for ch, up in zip(chunks, ups):
            tracker.track_batch(ch, uploaded=up)
        t_dispatch = time.perf_counter() - t1
        t2 = time.perf_counter()
        while tracker._pending and not tracker._pending[-1][1].is_ready():
            time.sleep(0.002)
        t_compute = time.perf_counter() - t2
        t3 = time.perf_counter()
        tracker.flush()
        t_drain = time.perf_counter() - t3
        total = time.perf_counter() - t0
        n = CHUNK * N_CHUNKS
        print(
            f"{label}: total={total:.3f}s ({n/total:.1f} fps) "
            f"init={t_init:.2f}s up_issue={t_up_issue:.3f}s "
            f"dispatch={t_dispatch:.3f}s compute_wait={t_compute:.3f}s "
            f"drain={t_drain:.3f}s per_frame={1e3*total/n:.1f}ms",
            flush=True,
        )
        return n / total

    one_pass("rehearsal(compile)")
    for k in range(3):
        one_pass(f"pass{k}")


if __name__ == "__main__":
    main()
