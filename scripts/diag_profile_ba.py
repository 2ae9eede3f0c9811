"""Per-op device profile of the local-BA core at production shape
(K=24, P=2048, M=10, E=20480): where do the ~400 us per GN iteration go
once the edge kernel (13 us) and the dense solve (52 us) are accounted
for? jax.profiler op times are trustworthy in every tunnel mode.

Run alone: python scripts/diag_profile_ba.py
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def profile_device_ops(fn, out_dir):
    import jax

    os.system(f"rm -rf {out_dir}")
    with jax.profiler.trace(out_dir):
        fn()
    paths = glob.glob(f"{out_dir}/**/*.trace.json.gz", recursive=True)
    agg = defaultdict(float)
    total = 0.0
    for p in paths:
        with gzip.open(p, "rt") as f:
            data = json.load(f)
        dev_pids = set()
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                nm = ev.get("args", {}).get("name", "")
                if "TPU" in nm or "/device:" in nm.lower() or "xla" in nm.lower():
                    dev_pids.add(ev["pid"])
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "X" and ev.get("pid") in dev_pids:
                agg[ev.get("name", "?")] += float(ev.get("dur", 0.0))
                total += float(ev.get("dur", 0.0))
    return agg, total


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from sdslam_tpu.geometry.camera import CameraModel
    from sdslam_tpu.io.synthetic import make_dist_ba_problem
    from sdslam_tpu.solvers import ba

    K, P, Mo = 24, 2048, 10
    rng = np.random.default_rng(0)
    cam = CameraModel(fx=525.0, fy=525.0, cx=319.5, cy=239.5,
                      width=640, height=480, bf=40.0)
    (T0, X0, obs_kf, obs_kp, kf_uv, kf_ur, kf_oct, T_gt, X_gt
     ) = make_dist_ba_problem(rng, K, P, Mo, cam, noise_px=0.5)
    es = ba._prep_edges(
        jnp.asarray(obs_kf), jnp.asarray(obs_kp), jnp.asarray(kf_uv),
        jnp.asarray(kf_ur), jnp.asarray(kf_oct), 2.0, K,
    )
    obs_ok = jnp.asarray(obs_kf >= 0)
    cam_act = jnp.ones((K,), bool).at[0].set(False)
    pt_act = jnp.ones((P,), bool)
    T_d, X_d = jnp.asarray(T0), jnp.asarray(X0)

    REPS = 40

    def run_iters(T, X):
        def body(i, st):
            T, X = st
            T2, X2, c = ba._gn_iteration(
                cam, T, X, es, obs_ok, cam_act, pt_act, 2.0, True,
                jnp.float32(1e-4) * (1 + 0 * c if False else 1),
            )
            return (T2, X2)
        return lax.fori_loop(0, REPS, body, (T, X))

    f = jax.jit(run_iters)
    jax.block_until_ready(f(T_d, X_d))  # compile

    agg, total = profile_device_ops(
        lambda: jax.block_until_ready(f(T_d, X_d)), "/tmp/jaxtrace_ba"
    )
    print(f"total device time: {total/1e3:.1f} ms over {REPS} GN iterations "
          f"= {total/REPS:.0f} us/iter", flush=True)
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:35]:
        print(f"{dur/REPS:9.1f} us/iter  {dur/max(total,1e-9)*100:5.1f}%  "
              f"{name[:110]}")


if __name__ == "__main__":
    main()
