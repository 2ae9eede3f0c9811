"""Separate H2D upload cost from device compute cost for the per-frame path.

Modes:
  h2d:     time single-frame uploads vs a 16-frame stacked upload
  compute: pre-upload all frames, run the fused per-frame step on
           device-resident buffers (zero H2D in the timed region), flush
  batch16: track_batch with ONLY full 16-frame chunks (no tail recompile)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from scripts.diag_bench import build


def bench_h2d():
    import jax
    import jax.numpy as jnp
    H, W = 480, 640
    buf = np.random.randint(0, 255, (H + 1, 3 * W), np.uint8)
    x = jnp.asarray(buf)
    x.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(20):
        jnp.asarray(buf).block_until_ready()
    t1 = time.perf_counter()
    print(f"single-frame H2D ({buf.nbytes/1e6:.2f} MB): {(t1-t0)/20*1e3:.1f} ms")
    stack = np.stack([buf] * 16)
    jnp.asarray(stack).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(5):
        jnp.asarray(stack).block_until_ready()
    t1 = time.perf_counter()
    per = (t1 - t0) / 5 / 16 * 1e3
    print(f"16-stack H2D ({stack.nbytes/1e6:.1f} MB): {(t1-t0)/5*1e3:.1f} ms "
          f"({per:.1f} ms/frame)")


def bench_compute():
    import jax.numpy as jnp
    from sdslam_tpu.pipeline.tracking import pack_frame
    cfg, frames, RGBDTracker = build()
    tracker = RGBDTracker(cfg)
    for i in range(6):
        ts, img, dep = frames[i]
        tracker.track(img, dep, ts)
    tracker.flush()
    tracker.PIPELINE_DEPTH = 10_000
    tracker.DRAIN_HIGH_WATER = 10_000
    # pre-upload every remaining frame
    bufs = [jnp.asarray(pack_frame(i, d, t)) for (t, i, d) in frames[6:]]
    for b in bufs:
        b.block_until_ready()
    md, wd, ud, thd = tracker._flags_dev
    t0 = time.perf_counter()
    n = 0
    for b in bufs:
        out = tracker._fused_packed(tracker.ms, tracker.dst, b, md, wd, ud, thd)
        tracker.ms, tracker.dst = out[0], out[1]
        n += 1
    np.asarray(out[2])  # fetch the last packed result = full sync
    el = time.perf_counter() - t0
    print(f"device-resident compute: {n/el:.1f} fps ({el/n*1e3:.1f} ms/frame)")


def bench_batch16():
    cfg, frames, RGBDTracker = build()
    tracker = RGBDTracker(cfg)
    for i in range(6):
        ts, img, dep = frames[i]
        tracker.track(img, dep, ts)
    tracker.flush()
    items = [(i, d, t) for (t, i, d) in frames[6:]] * 3  # 102 frames
    B = 16
    chunks = [items[k : k + B] for k in range(0, len(items) - B + 1, B)]
    tracker.track_batch(chunks[0])  # warm the B=16 scan program
    tracker.flush()
    t0 = time.perf_counter()
    for ch in chunks[1:]:
        tracker.track_batch(ch)
    tracker.flush()
    el = time.perf_counter() - t0
    n = sum(len(c) for c in chunks[1:])
    print(f"batch16: {n/el:.1f} fps ({el/n*1e3:.1f} ms/frame)")


if __name__ == "__main__":
    mode = sys.argv[1]
    dict(h2d=bench_h2d, compute=bench_compute, batch16=bench_batch16)[mode]()
