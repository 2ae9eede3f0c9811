"""Diagnose the driver-bench regression: time several drain/dispatch
strategies for the same 40-frame workload on the real TPU.

Strategies:
  rt:      tunnel round-trip + dispatch microbenchmarks
  enqueue: per-frame track() with drains disabled, ONE flush at the end
           (the honest max-throughput number: all results fetched)
  policy:  track() exactly as shipped (current drain policy)
  batch8/16: track_batch in chunks, flush at end

Run ONE at a time (single TPU process!): python scripts/diag_bench.py <mode>
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from sdslam_tpu.geometry.camera import CameraModel
    from sdslam_tpu.io.synthetic import SyntheticSequence
    from sdslam_tpu.pipeline.tracking import RGBDTracker
    from sdslam_tpu.utils.config import (
        MapConfig, ORBConfig, SystemConfig, TrackingConfig,
    )

    cam = CameraModel(
        fx=525.0, fy=525.0, cx=319.5, cy=239.5, width=640, height=480, bf=40.0
    )
    cfg = SystemConfig(
        camera=cam,
        orb=ORBConfig(max_keypoints=1024, n_levels=5),
        map=MapConfig(max_keyframes=64, max_points=8192, max_kps_per_frame=1024),
        tracking=TrackingConfig(depth_map_factor=1000.0),
    )
    n_frames = 40
    seq = SyntheticSequence(cam, n_frames=n_frames, trajectory="orbit",
                            radius=0.06, yaw_amp=0.04)
    frames = [
        (t, np.asarray(i).astype(np.uint8),
         (np.asarray(d) * 1000).astype(np.uint16))
        for (t, i, d) in (seq.frame(k) for k in range(n_frames))
    ]
    return cfg, frames, RGBDTracker


def bench_rt():
    import jax
    import jax.numpy as jnp
    x = jnp.zeros((8, 128), jnp.float32)
    f = jax.jit(lambda a: a + 1)
    f(x).block_until_ready()
    # dispatch cost
    t0 = time.perf_counter()
    for _ in range(50):
        y = f(x)
    t1 = time.perf_counter()
    y.block_until_ready()
    t2 = time.perf_counter()
    print(f"dispatch: {(t1-t0)/50*1e3:.2f} ms/op, block tail: {(t2-t1)*1e3:.2f} ms")
    # full fetch round trip
    t0 = time.perf_counter()
    for _ in range(20):
        np.asarray(f(x))
    t1 = time.perf_counter()
    print(f"fetch round trip: {(t1-t0)/20*1e3:.2f} ms")
    # blocking chain: does block_until_ready lie?
    big = jnp.zeros((512, 512), jnp.float32)
    g = jax.jit(lambda a: jnp.tanh(a @ a))
    g(big).block_until_ready()
    t0 = time.perf_counter()
    z = big
    for _ in range(200):
        z = g(z)
    z.block_until_ready()
    t1 = time.perf_counter()
    np.asarray(z)
    t2 = time.perf_counter()
    print(f"200-op chain: block={t1-t0:.3f}s fetch_after_block={(t2-t1)*1e3:.1f} ms")


def bench_enqueue(cfg, frames, RGBDTracker):
    tracker = RGBDTracker(cfg)
    for i in range(6):
        ts, img, dep = frames[i]
        tracker.track(img, dep, ts)
    tracker.flush()
    # disable the in-loop drain policy entirely
    tracker.PIPELINE_DEPTH = 10_000
    tracker.DRAIN_HIGH_WATER = 10_000
    t0 = time.perf_counter()
    for i in range(6, len(frames)):
        ts, img, dep = frames[i]
        tracker.track(img, dep, ts)
    tracker.flush()  # fetch EVERYTHING inside the timed region
    el = time.perf_counter() - t0
    n = len(frames) - 6
    print(f"enqueue+flush: {n/el:.1f} fps ({el/n*1e3:.1f} ms/frame)")


def bench_policy(cfg, frames, RGBDTracker):
    tracker = RGBDTracker(cfg)
    for i in range(6):
        ts, img, dep = frames[i]
        tracker.track(img, dep, ts)
    t0 = time.perf_counter()
    for i in range(6, len(frames)):
        ts, img, dep = frames[i]
        tracker.track(img, dep, ts)
    el_nofl = time.perf_counter() - t0
    tracker.flush()
    el = time.perf_counter() - t0
    n = len(frames) - 6
    print(f"policy: {n/el_nofl:.1f} fps unflushed, {n/el:.1f} fps flushed")


def bench_batch(cfg, frames, RGBDTracker, B):
    tracker = RGBDTracker(cfg)
    for i in range(6):
        ts, img, dep = frames[i]
        tracker.track(img, dep, ts)
    tracker.flush()
    items = [(i, d, t) for (t, i, d) in frames[6:]]
    # warm the scan program for chunk size B (and the tail size)
    chunks = [items[k : k + B] for k in range(0, len(items), B)]
    tracker.track_batch(chunks[0])
    tracker.flush()
    t0 = time.perf_counter()
    for ch in chunks[1:]:
        tracker.track_batch(ch)
    tracker.flush()
    el = time.perf_counter() - t0
    n = sum(len(c) for c in chunks[1:])
    print(f"batch{B}: {n/el:.1f} fps ({el/n*1e3:.1f} ms/frame)")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "rt"
    if mode == "rt":
        bench_rt()
    else:
        cfg, frames, T = build()
        if mode == "enqueue":
            bench_enqueue(cfg, frames, T)
        elif mode == "policy":
            bench_policy(cfg, frames, T)
        elif mode.startswith("batch"):
            bench_batch(cfg, frames, T, int(mode[5:]))
        else:
            raise SystemExit(f"unknown mode {mode}")
