"""Benchmark: tracked frames/s per chip on the synthetic RGB-D workload.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = the reference's 30 fps real-time operating cadence
(/root/reference/Examples/Monocular/monocular.cc:59) — the only quantitative
performance claim the reference makes (BASELINE.md).

Measures the full per-frame pipeline (ORB extraction + EKF + photometric
alignment + matching + two pose GNs + keyframe-cadence mapping passes) at
the reference's workload scale: 640x480, 5 pyramid levels, 1024-keypoint
budget, real uint8/uint16 camera payloads packed and uploaded per frame.

Methodology notes (hard-won; see CLAUDE.md "environment quirks"):
  * The timed region uses track_batch — 16 frames per device dispatch via
    lax.scan, exact per-frame semantics (tests/test_odometry.py proves
    trajectory equality with per-frame track()). This is the offline/
    throughput ingestion mode; per-frame track() is the low-latency live
    mode and is bounded by per-dispatch tunnel costs that do not exist on
    directly-attached TPUs.
  * Chunk uploads are DOUBLE-BUFFERED (upload_batch handle): chunk k+1's
    host->device transfer is issued while the device scans chunk k. Some
    tunnel modes drop to ~10 MB/s H2D — serializing a 0.9 MB/frame camera
    payload against compute would bound everything at the link rate;
    overlap makes throughput max(transfer, compute), which is also what a
    live camera pipeline achieves.
  * flush() runs INSIDE the timed region: every pose is fetched to host
    before the clock stops, so the number is honest even on tunnel
    backends whose block_until_ready acks early.
  * One fixed chunk size: a variable tail chunk would trigger a scan
    recompile inside the timed region. Per-frame results drain ONE stacked
    fetch per chunk — tunnel backends charge per-fetch (occasionally
    seconds).
  * Best-of-3 fresh-tracker passes: the device tunnel occasionally stalls
    for seconds on unrelated traffic; throughput is the steady-state rate.
"""

import json
import time

import numpy as np

WARMUP = 6  # per-frame init segment (map bootstrap + compile)
CHUNK = 16
N_CHUNKS = 4


def main():
    import jax

    # persistent compilation cache: first bench invocation on a fresh machine
    # pays remote-compile cost once; subsequent runs start hot
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from sdslam_tpu.geometry.camera import CameraModel
    from sdslam_tpu.io.synthetic import SyntheticSequence
    from sdslam_tpu.pipeline.tracking import RGBDTracker
    from sdslam_tpu.utils.config import (
        MapConfig, ORBConfig, SystemConfig, TrackingConfig,
    )

    # reference-scale workload: 640x480, 1024-keypoint budget
    cam = CameraModel(
        fx=525.0, fy=525.0, cx=319.5, cy=239.5, width=640, height=480, bf=40.0
    )
    cfg = SystemConfig(
        camera=cam,
        orb=ORBConfig(max_keypoints=1024, n_levels=5),
        map=MapConfig(max_keyframes=64, max_points=8192, max_kps_per_frame=1024),
        tracking=TrackingConfig(depth_map_factor=1000.0),  # u16 mm depth
    )
    n_frames = WARMUP + CHUNK * N_CHUNKS
    seq = SyntheticSequence(cam, n_frames=n_frames, trajectory="orbit",
                            radius=0.06, yaw_amp=0.04)
    # realistic camera payloads: uint8 intensity + uint16 millimeter depth
    # (pre-rendered outside the loop; packing/upload stays inside)
    frames = [
        (t, np.asarray(i).astype(np.uint8),
         (np.asarray(d) * 1000).astype(np.uint16))
        for (t, i, d) in (seq.frame(k) for k in range(n_frames))
    ]
    items = [(i, d, t) for (t, i, d) in frames[WARMUP:]]
    chunks = [items[k: k + CHUNK] for k in range(0, len(items), CHUNK)]

    fps = 0.0
    for rep in range(3):
        tracker = RGBDTracker(cfg)
        for i in range(WARMUP):
            ts, img, depth = frames[i]
            tracker.track(img, depth, ts)
        tracker.flush()
        t0 = time.perf_counter()
        n_timed = 0
        # double-buffered: chunk k's scan is dispatched, then chunk k+1's
        # upload starts while the device is busy
        up = tracker.upload_batch(chunks[0])
        for k, ch in enumerate(chunks):
            tracker.track_batch(ch, uploaded=up)
            n_timed += len(ch)
            if k + 1 < len(chunks):
                up = tracker.upload_batch(chunks[k + 1])
        tracker.flush()  # every pose fetched inside the timed region
        elapsed = time.perf_counter() - t0
        fps = max(fps, n_timed / elapsed)

    print(
        json.dumps(
            {
                "metric": "tracked_frames_per_second_per_chip",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / 30.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
