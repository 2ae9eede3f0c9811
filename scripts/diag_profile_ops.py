"""Per-op device-time profile of the steady-state fused tracking step on
real hardware: runs a few frames under jax.profiler.trace and aggregates
the perfetto trace's device-op durations by fusion name. Per CLAUDE.md,
profiler op timings are trustworthy in every tunnel mode (unlike wall
clocks). Run ALONE; generous timeout."""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
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

    cam = CameraModel(fx=525.0, fy=525.0, cx=319.5, cy=239.5,
                      width=640, height=480, bf=40.0)
    cfg = SystemConfig(
        camera=cam,
        orb=ORBConfig(max_keypoints=1024, n_levels=5),
        map=MapConfig(max_keyframes=64, max_points=8192, max_kps_per_frame=1024),
        tracking=TrackingConfig(depth_map_factor=1000.0),
    )
    n = 20
    seq = SyntheticSequence(cam, n_frames=n, trajectory="orbit",
                            radius=0.06, yaw_amp=0.04)
    frames = [(t, np.asarray(i).astype(np.uint8),
               (np.asarray(d) * 1000).astype(np.uint16))
              for (t, i, d) in (seq.frame(k) for k in range(n))]
    tr = RGBDTracker(cfg)
    for i in range(12):  # init + warm both branches
        ts, img, dep = frames[i]
        tr.track(img, dep, ts)
    tr.flush()

    out = "/tmp/jaxtrace"
    os.system(f"rm -rf {out}")
    with jax.profiler.trace(out):
        for i in range(12, n):
            ts, img, dep = frames[i]
            tr.track(img, dep, ts)
        tr.flush()

    # aggregate device events from the perfetto trace
    paths = glob.glob(f"{out}/**/*.trace.json.gz", recursive=True)
    print("trace files:", paths, flush=True)
    agg = defaultdict(float)
    total = 0.0
    for p in paths:
        with gzip.open(p, "rt") as f:
            data = json.load(f)
        # find TPU device track pids (name contains "TPU" and not "host")
        dev_pids = set()
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                nm = ev.get("args", {}).get("name", "")
                if "TPU" in nm or "/device:" in nm.lower() or "xla" in nm.lower():
                    dev_pids.add(ev["pid"])
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "X" and ev.get("pid") in dev_pids:
                dur = float(ev.get("dur", 0.0))
                name = ev.get("name", "?")
                agg[name] += dur
                total += dur
    n_timed = n - 12
    print(f"total device time: {total/1e3:.1f} ms over {n_timed} frames "
          f"= {total/1e3/n_timed:.1f} ms/frame", flush=True)
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{dur/1e3:9.2f} ms  {dur/max(total,1e-9)*100:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
