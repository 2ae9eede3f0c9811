"""Stage-level timing of the per-frame pipeline on the live backend.

Measures: H2D upload, fused no-KF step, KF-cadence step, dispatch overhead
(a trivial jitted op), to locate the dominant per-frame cost.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from sdslam_tpu.geometry.camera import CameraModel
from sdslam_tpu.io.synthetic import SyntheticSequence
from sdslam_tpu.pipeline.tracking import RGBDTracker
from sdslam_tpu.utils.config import MapConfig, ORBConfig, SystemConfig, TrackingConfig


def main():
    cam = CameraModel(fx=525.0, fy=525.0, cx=319.5, cy=239.5,
                      width=640, height=480, bf=40.0)
    cfg = SystemConfig(
        camera=cam,
        orb=ORBConfig(max_keypoints=1024, n_levels=5),
        map=MapConfig(max_keyframes=64, max_points=8192, max_kps_per_frame=1024),
        tracking=TrackingConfig(depth_map_factor=1000.0),
    )
    n = 24
    seq = SyntheticSequence(cam, n_frames=n, trajectory="orbit",
                            radius=0.06, yaw_amp=0.04)
    frames = [seq.frame(i) for i in range(n)]
    frames = [(t, np.asarray(i).astype(np.uint8),
               (np.asarray(d) * 1000).astype(np.uint16)) for (t, i, d) in frames]

    tr = RGBDTracker(cfg)
    # init + warm both branches
    for i in range(8):
        ts, img, dep = frames[i]
        tr.track(img, dep, ts)
    tr.flush()

    dev = jax.devices()[0]
    print("backend:", dev.platform, dev.device_kind)

    # 1. dispatch overhead: trivial op, blocked each time
    f_triv = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8,), jnp.float32)
    f_triv(x).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(20):
        x = f_triv(x)
    x.block_until_ready()
    print(f"trivial dispatch (pipelined x20): {(time.perf_counter()-t0)/20*1e3:.2f} ms")
    t0 = time.perf_counter()
    for _ in range(10):
        f_triv(x).block_until_ready()
    print(f"trivial dispatch (blocking): {(time.perf_counter()-t0)/10*1e3:.2f} ms")

    # 2. H2D upload of one frame payload
    ts, img, dep = frames[0]
    for _ in range(2):
        jax.device_put(img).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(10):
        a = jax.device_put(img)
        b = jax.device_put(dep)
        a.block_until_ready(); b.block_until_ready()
    print(f"H2D img+depth (blocking): {(time.perf_counter()-t0)/10*1e3:.2f} ms")

    # 3. fused step, steady state (mostly no-KF), pipelined like the bench
    t0 = time.perf_counter()
    k = 0
    for i in range(8, n):
        ts, img, dep = frames[i]
        tr.track(img, dep, ts)
        k += 1
    tr.flush()
    jax.block_until_ready(tr.ms.kf_Tcw)
    dt = (time.perf_counter() - t0) / k
    print(f"steady-state track (pipelined): {dt*1e3:.2f} ms/frame = {1/dt:.1f} fps")

    # 4. fused step blocking (compute time incl. transfer, no pipelining)
    ts, img, dep = frames[-1]
    img_d, dep_d = jnp.asarray(img), jnp.asarray(dep)
    t0 = time.perf_counter()
    for j in range(6):
        out = tr._fused(tr.ms, tr.dst, img_d, dep_d,
                        jnp.asarray(ts + j, jnp.float32),
                        *(tr._flags_dev))
        tr.ms, tr.dst = out[0], out[1]
        jax.block_until_ready(out[2])
    print(f"fused step (blocking): {(time.perf_counter()-t0)/6*1e3:.2f} ms")


if __name__ == "__main__":
    main()
