"""Full benchmark table (SURVEY.md §6/§7: the BASELINE.md metrics).

Produces BENCH_TABLE.md + a JSON blob with:
  * ATE RMSE on the synthetic RGB-D sequence (exact ground truth)
  * tracked frames/s per chip (the bench.py metric)
  * local-BA ms per LM iteration
  * hot-kernel throughput vs roofline (Hamming popcounts, BA edge pass)

Run on the target chip:  python scripts/bench_table.py
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from sdslam_tpu.geometry.camera import CameraModel
    from sdslam_tpu.io.synthetic import SyntheticSequence
    from sdslam_tpu.pipeline.tracking import RGBDTracker
    from sdslam_tpu.utils.config import (
        MapConfig, ORBConfig, SystemConfig, TrackingConfig,
    )
    from sdslam_tpu.utils.metrics import ate_rmse

    dev = jax.devices()[0]
    rows = []
    blob = {"device": f"{dev.platform}:{dev.device_kind}"}

    cam = CameraModel(fx=525.0, fy=525.0, cx=319.5, cy=239.5,
                      width=640, height=480, bf=40.0)
    cfg = SystemConfig(
        camera=cam,
        orb=ORBConfig(max_keypoints=1024, n_levels=5),
        map=MapConfig(max_keyframes=64, max_points=8192,
                      max_kps_per_frame=1024),
        tracking=TrackingConfig(depth_map_factor=1000.0),
    )
    n = 40
    seq = SyntheticSequence(cam, n_frames=n, trajectory="orbit",
                            radius=0.06, yaw_amp=0.04)
    frames = [
        (t, np.asarray(i).astype(np.uint8),
         (np.asarray(d) * 1000).astype(np.uint16))
        for (t, i, d) in (seq.frame(k) for k in range(n))
    ]

    # --- fps + ATE (two passes, best fps; ATE from the last pass) ---------
    fps = 0.0
    for _ in range(2):
        tr = RGBDTracker(cfg)
        for i in range(6):
            ts, img, dep = frames[i]
            tr.track(img, dep, ts)
        tr.flush()
        jax.block_until_ready(tr.ms.kf_Tcw)
        t0 = time.perf_counter()
        for i in range(6, n):
            ts, img, dep = frames[i]
            tr.track(img, dep, ts)
        fps = max(fps, (n - 6) / (time.perf_counter() - t0))
        tr.flush()
    est = np.stack([np.asarray(p) for p in tr.trajectory])
    gt = np.stack([np.asarray(p) for p in seq.poses])
    ate = float(ate_rmse(est, gt))
    rows.append(("ATE RMSE (synthetic orbit, 40 frames)",
                 f"{ate*100:.3f} cm", "exact GT renderer"))
    rows.append(("tracked frames/s per chip (live, per-frame)", f"{fps:.1f}",
                 "vs 30 fps reference real-time claim "
                 f"({fps/30.0:.2f}x)"))
    blob.update(ate_rmse_m=ate, frames_per_second=round(fps, 2))

    # --- offline batch ingestion (track_batch, B frames per dispatch) -----
    B = 4
    fps_b = 0.0
    for _ in range(2):
        tr = RGBDTracker(cfg)
        tr.track_batch([(i, d, t) for (t, i, d) in frames[:8]])
        tr.flush()
        jax.block_until_ready(tr.ms.kf_Tcw)
        tr.track_batch([(i, d, t) for (t, i, d) in frames[8:8 + B]])
        tr.flush()
        jax.block_until_ready(tr.ms.kf_Tcw)
        t0 = time.perf_counter()
        k = 0
        for s in range(8 + B, n - B + 1, B):
            tr.track_batch([(i, d, t) for (t, i, d) in frames[s:s + B]])
            k += B
        tr.flush()
        jax.block_until_ready(tr.ms.kf_Tcw)
        fps_b = max(fps_b, k / (time.perf_counter() - t0))
    rows.append(("tracked frames/s per chip (offline, batch=4)",
                 f"{fps_b:.1f}", "lax.scan over 4 frames per dispatch"))
    blob["frames_per_second_batch4"] = round(fps_b, 2)

    # --- local BA ms/iter ---------------------------------------------------
    import functools
    from sdslam_tpu.mapping import map_state as M
    import sdslam_tpu.solvers.ba as B

    ms = tr.ms
    slot = jnp.asarray(int(np.flatnonzero(np.asarray(ms.kf_valid))[-1]))
    covis = jax.jit(M.covisibility)(ms)
    jax.block_until_ready(covis)
    orig = B._ba_core

    def timed(i1, i2, reps=8):
        def core(cam_, T, X, es, ok, ca, pa, sf, _a, _b, lam):
            return orig(cam_, T, X, es, ok, ca, pa, sf, i1, i2, lam)

        B._ba_core = core
        f = jax.jit(functools.partial(
            B.local_ba, cfg.camera, scale_factor=2.0, covis_min=15))
        out = f(ms, slot, covis=covis)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(ms, slot, covis=covis)
        jax.block_until_ready(out)
        B._ba_core = orig
        return (time.perf_counter() - t0) / reps

    t10 = timed(5, 5)
    t0i = timed(0, 0)
    ms_per_iter = (t10 - t0i) / 10 * 1e3
    rows.append(("local BA ms / LM iteration", f"{ms_per_iter:.3f} ms",
                 "24 KFs x 2048 pts x 10 obs compacted system"))
    blob["ba_ms_per_iter"] = round(ms_per_iter, 4)

    # --- hot-kernel roofline -------------------------------------------------
    # kernels are timed with ON-DEVICE repetition (lax.fori_loop around the
    # kernel, input varied per iteration to defeat CSE): a host-side rep
    # loop measures the ~2 ms tunnel dispatch, not the kernel
    from functools import partial

    import jax.lax as lax
    from sdslam_tpu.ops import hamming as ham

    REPS = 100

    def device_time(make_body, *args):
        def looped(*a):
            def body(i, acc):
                return acc + make_body(i, *a)

            return lax.fori_loop(0, REPS, body, jnp.float32(0))

        f = jax.jit(looped)
        f(*args).block_until_ready()
        t0 = time.perf_counter()
        f(*args).block_until_ready()
        return (time.perf_counter() - t0) / REPS

    a = jnp.asarray(
        np.random.randint(0, 2**32, (1024, 8), dtype=np.uint64).astype(np.uint32))
    b = jnp.asarray(
        np.random.randint(0, 2**32, (1024, 8), dtype=np.uint64).astype(np.uint32))
    dt = device_time(
        lambda i, a_, b_: jnp.sum(
            ham.hamming_matrix(a_ ^ i.astype(jnp.uint32), b_)
        ).astype(jnp.float32),
        a, b,
    )
    gpair = 1024 * 1024 / dt / 1e9
    # traffic: [N,M] i32 output + 2x[N,8] u32 inputs; compute: 8 xor+popcnt
    # +add per pair -> ~24 VPU ops per 4 output bytes (arithmetic intensity
    # ~6 op/B, so the kernel is compute-leaning; roofline % is the HBM view)
    ham_bytes = 1024 * 1024 * 4 + 2 * 1024 * 8 * 4
    ham_gb = ham_bytes / dt / 1e9
    rows.append(("Hamming matrix (1k x 1k, 256-bit)",
                 f"{dt*1e6:.0f} us = {gpair:.2f} G pair/s = {ham_gb:.0f} GB/s",
                 f"~{min(ham_gb/819*100, 100):.0f}% of v5e HBM roofline, "
                 "8 xor+popcnt+add per pair, on-device timed"))
    blob["hamming_us"] = round(dt * 1e6, 1)
    blob["hamming_gbps"] = round(ham_gb, 1)

    # BA edge kernel: bytes = (27 in + 55 out) * E * 4
    from sdslam_tpu.ops.pallas import ba_edge_kernel as bak

    if dev.platform == "tpu":
        for label, E in (("20k edges", 2048 * 10), ("512k edges", 524288)):
            packed = jnp.asarray(np.random.rand(27, E).astype(np.float32))

            dt = device_time(
                lambda i, x: jnp.sum(
                    bak.ba_edge_terms(
                        x.at[0, 0].set(i.astype(jnp.float32)),
                        525.0, 525.0, 319.5, 239.5, 40.0, True,
                    )[54]
                ),
                packed,
            )
            gb = (27 + 55) * E * 4 / dt / 1e9
            pct = min(gb / 819.0 * 100, 100.0)  # v5e HBM ~819 GB/s
            rows.append((f"BA edge-assembly Pallas kernel ({label})",
                         f"{dt*1e6:.0f} us = {gb:.0f} GB/s",
                         f"~{pct:.0f}% of v5e HBM roofline, on-device timed"))
            blob[f"ba_edge_kernel_gbps_{E}"] = round(gb, 1)

    # --- write ----------------------------------------------------------------
    lines = [
        "# Benchmark table (sdslam_tpu)",
        "",
        f"Device: `{blob['device']}`. Reference baseline: 30 fps real-time",
        "claim (BASELINE.md; the reference publishes no ATE/fps numbers).",
        "",
        "| metric | value | notes |",
        "|---|---|---|",
    ]
    for name, val, note in rows:
        lines.append(f"| {name} | {val} | {note} |")
    # BENCH_TABLE.md is hand-curated (tunnel-regime context, TR sweep,
    # profiler numbers); never clobber it — write alongside
    with open("/root/repo/BENCH_TABLE.autogen.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps(blob))


if __name__ == "__main__":
    main()
