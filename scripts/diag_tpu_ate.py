"""On-device end-to-end ATE check: 36-frame synthetic orbit through the
production packed tracker ON THE TPU (whatever kernel gates are active),
ATE vs exact ground truth. Validates device numerics (bf16 defaults,
Pallas kernels) against the CPU-verified <2 cm gate.

Run ALONE; generous timeout; never kill mid-op.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from sdslam_tpu.geometry.camera import CameraModel
    from sdslam_tpu.io.synthetic import SyntheticSequence
    from sdslam_tpu.solvers import image_align
    from sdslam_tpu.system import RGBD, SDSlamSystem
    from sdslam_tpu.utils import metrics
    from sdslam_tpu.utils.config import (
        MapConfig, ORBConfig, SystemConfig, TrackingConfig,
    )

    print("align kernel enabled:", image_align._align_kernel_enabled(),
          flush=True)
    cam = CameraModel(fx=320.0, fy=320.0, cx=159.5, cy=119.5,
                      width=320, height=240, bf=32.0)
    cfg = SystemConfig(
        camera=cam,
        orb=ORBConfig(max_keypoints=512, n_levels=4),
        map=MapConfig(max_keyframes=32, max_points=4096, max_kps_per_frame=512),
        tracking=TrackingConfig(depth_map_factor=1000.0),
    )
    seq = SyntheticSequence(cam, n_frames=36, trajectory="orbit",
                            radius=0.06, yaw_amp=0.04)
    sysm = SDSlamSystem(cfg, sensor=RGBD, loop_closing=False)
    t0 = time.perf_counter()
    for i in range(36):
        ts, img, depth = seq.frame(i)
        sysm.track_rgbd(np.asarray(img).astype(np.uint8),
                        (np.asarray(depth) * 1000).astype(np.uint16), ts)
    sysm.finish()
    dt = time.perf_counter() - t0
    est = np.stack([np.asarray(p) for p in sysm.tracker.trajectory])
    ate = metrics.ate_rmse(est, np.asarray(seq.poses), align=True)
    print(f"TPU e2e: ATE {100*ate:.3f} cm, state "
          f"{sysm.get_tracking_state()}, {36/dt:.1f} fps wall", flush=True)
    assert ate < 0.02, ate


if __name__ == "__main__":
    main()
