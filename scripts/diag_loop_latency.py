"""Frame-loop latency around loop-closing events (VERDICT r2 item 6's
"Done" criterion): on real hardware, measure the host wall time of
(a) a plain tracked frame, (b) the frame whose poll dispatches Sim3
verification (consistency hit), (c) the frame whose poll drains the
verification result and applies the correction.

(b) must NOT spike: verification is one async device dispatch. Run ALONE
on the TPU (no concurrent CPU jobs); generous timeout, never kill mid-op.
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

    from sdslam_tpu.geometry import lie
    from sdslam_tpu.geometry.camera import CameraModel
    from sdslam_tpu.io.synthetic import SyntheticSequence
    from sdslam_tpu.pipeline.loop_closing import LoopCloser
    from sdslam_tpu.pipeline.tracking import RGBDTracker
    from sdslam_tpu.utils.config import MapConfig, ORBConfig, SystemConfig
    from tests.test_loop_closing import _insert_revisit_kf, build_tracked_map

    t, seq, cfg = build_tracked_map()
    closer = LoopCloser(cam=t.cam, scale_factor=2.0, n_levels=4,
                        fix_scale=True, run_gba=False, min_frame_gap=50)
    drift = np.asarray(lie.se3_exp(jnp.asarray(
        np.array([0.05, -0.03, 0.04, 0.01, -0.02, 0.01], np.float32))))

    # warm every program involved (detection, verification, correction)
    import copy
    ms_backup = t.ms
    for k, fidx in enumerate((0, 1, 0)):
        wrong = drift @ np.asarray(seq.poses[fidx]).astype(np.float32)
        slot = _insert_revisit_kf(t, seq, cfg, fidx, wrong, 500 + 10 * k)
        closer.dispatch_keyframe(t.ms, slot)
    t.ms, _ = closer.poll(t.ms, force=True)
    print("warmup done (all programs compiled)", flush=True)

    # timed run on a fresh closer
    t.ms = ms_backup
    closer2 = LoopCloser(cam=t.cam, scale_factor=2.0, n_levels=4,
                         fix_scale=True, run_gba=False, min_frame_gap=50)
    stamps = []
    for k, fidx in enumerate((0, 1, 0)):
        wrong = drift @ np.asarray(seq.poses[fidx]).astype(np.float32)
        slot = _insert_revisit_kf(t, seq, cfg, fidx, wrong, 800 + 10 * k)
        t0 = time.perf_counter()
        closer2.dispatch_keyframe(t.ms, slot)
        t1 = time.perf_counter()
        t.ms, infos = closer2.poll(t.ms)
        t2 = time.perf_counter()
        stamps.append((t1 - t0, t2 - t1, infos))
        print(
            f"KF event {k}: dispatch={1e3*(t1-t0):.1f} ms "
            f"poll={1e3*(t2-t1):.1f} ms infos={[list(i.keys()) for i in infos]}",
            flush=True,
        )
    # drain the async verification and time the (rare) correction apply
    t0 = time.perf_counter()
    t.ms, infos = closer2.poll(t.ms, force=True)
    print(
        f"final drain (verify result + correction): "
        f"{1e3*(time.perf_counter()-t0):.1f} ms "
        f"infos={[list(i.keys()) for i in infos]}",
        flush=True,
    )


if __name__ == "__main__":
    main()
