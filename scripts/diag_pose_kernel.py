"""Slope-time the fused pose-GN Pallas kernel vs the XLA while-loop path.

Methodology (r4, the only trustworthy timing through the tunnel besides
jax.profiler): run the same body at two rep counts and divide the time
difference — (T_hi - T_lo)/(hi - lo) cancels every fixed dispatch/fetch
cost. Also verifies the kernel actually COMPILES standalone on TPU (a
Pallas bench that silently falls back "measures" the XLA path twice —
CLAUDE.md).

Usage: python scripts/diag_pose_kernel.py  (TPU; nothing else running)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from sdslam_tpu.geometry import lie
    from sdslam_tpu.geometry.camera import CameraModel
    from sdslam_tpu.solvers import pose_opt

    print(f"platform: {jax.devices()[0].platform} ({jax.devices()[0]})")

    rng = np.random.default_rng(0)
    N = 1024
    cam = CameraModel(fx=525.0, fy=525.0, cx=319.5, cy=239.5,
                      width=640, height=480, bf=40.0)
    X = rng.uniform([-1.5, -1.0, 2.0], [1.5, 1.0, 6.0], (N, 3)).astype(np.float32)
    T_true = np.asarray(lie.se3_exp(jnp.asarray(
        [0.05, -0.03, 0.08, 0.02, -0.015, 0.01], jnp.float32)))
    Xc = X @ T_true[:3, :3].T + T_true[:3, 3]
    u = cam.fx * Xc[:, 0] / Xc[:, 2] + cam.cx
    v = cam.fy * Xc[:, 1] / Xc[:, 2] + cam.cy
    uv = (np.stack([u, v], -1) + rng.normal(0, 0.4, (N, 2))).astype(np.float32)
    ur = (u - cam.bf / Xc[:, 2]).astype(np.float32)
    ur = np.where(rng.uniform(size=N) < 0.6, ur, -1.0).astype(np.float32)
    oct_ = rng.integers(0, 4, N)
    isig = (1.0 / 2.0 ** (2.0 * oct_)).astype(np.float32)
    valid = rng.uniform(size=N) > 0.25
    T0 = jnp.asarray(np.asarray(lie.se3_exp(jnp.asarray(
        [0.04, -0.02, 0.07, 0.015, -0.012, 0.008], jnp.float32))))

    Xd, uvd, urd = jnp.asarray(X), jnp.asarray(uv), jnp.asarray(ur)
    isd, vd = jnp.asarray(isig), jnp.asarray(valid)

    # 1. standalone kernel compile check (direct call, no gate)
    from sdslam_tpu.ops.pallas import pose_kernel as pk
    edata = pk.pack_edges(Xd, uvd, urd, isd, vd, urd >= 0)
    try:
        T, inl, n, chi = pk.pose_optimize(
            edata, T0, lie.se3_inv(T0), 100.0, 4.0,
            cam.fx, cam.fy, cam.cx, cam.cy, cam.bf,
            rounds=2, iters=4, has_prior=True,
        )
        jax.block_until_ready(T)
        print(f"kernel COMPILED; n_inl={int(n)} chi2={float(chi):.2f}")
    except Exception as e:  # noqa
        msg = str(e)
        for key in ("Mosaic", "unsupported", "vmem", "INTERNAL"):
            if key.lower() in msg.lower():
                print(f"kernel FAILED ({key}):")
        print(msg[:3000])
        return

    # 2. slope timing: hot-path schedule (2 rounds x 4-5 iters), both paths
    def make_run(fused, rounds, iters):
        def body(i, T):
            r = pose_opt.optimize_pose(
                cam, T, Xd, uvd, isd, vd, ur_obs=urd,
                rounds=rounds, iters_per_round=iters,
                T_prior=T0, prior_rot_info=100.0, prior_trans_info=4.0,
                fused=fused,
            )
            return r.Tcw
        return jax.jit(
            lambda reps: jax.lax.fori_loop(0, reps, body, T0),
            static_argnums=0,
        )

    saved = pose_opt._POSE_KERNEL
    for fused, label in ((False, "xla "), (True, "pallas")):
        pose_opt._POSE_KERNEL = True if fused else False
        run = make_run(fused, 2, 4)
        for reps in (5, 50):
            np.asarray(run(reps))  # compile both rep counts
        ts = {}
        for reps in (5, 50):
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(run(reps))
                best = min(best, time.perf_counter() - t0)
            ts[reps] = best
        slope = (ts[50] - ts[5]) / 45.0
        print(f"{label} solve(2x4): slope {slope*1e6:8.1f} us/solve "
              f"(t5={ts[5]*1e3:.1f} ms t50={ts[50]*1e3:.1f} ms)")
    pose_opt._POSE_KERNEL = saved


if __name__ == "__main__":
    main()
