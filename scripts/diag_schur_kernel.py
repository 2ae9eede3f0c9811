"""Standalone compile + parity check of the r5 v2 BA Schur kernel on the
real TPU, then slope-timed _gn_iteration / _ba_core A/B.

A Pallas bench that silently falls back can "measure" the XLA path twice
(CLAUDE.md) — so step 1 calls ba_edge_schur DIRECTLY (any Mosaic lowering
failure surfaces here, not as a silent gate), compares against interpret
mode, and only then times the full iteration.

Run alone (no concurrent CPU load): python scripts/diag_schur_kernel.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from sdslam_tpu.geometry.camera import CameraModel
    from sdslam_tpu.ops.pallas import ba_schur_kernel as bsk
    from sdslam_tpu.solvers import ba

    print(f"device: {jax.devices()[0]}", flush=True)

    # ---- 1. direct kernel call: compile + parity vs interpret -----------
    K, P, Mo = 24, 512, 10
    rng = np.random.default_rng(0)
    cam_id = rng.integers(0, K, (Mo, P))
    packed = np.zeros((28, Mo, P), np.float32)
    T = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    T[:, 0, 3] = rng.uniform(-0.3, 0.3, K)
    packed[0:16] = T.reshape(K, 16).T[:, cam_id]
    X = rng.uniform([-2, -2, 1.5], [2, 2, 5], (P, 3)).astype(np.float32)
    packed[16:19] = np.broadcast_to(X.T[:, None, :], (3, Mo, P))
    # project through the observing camera
    Tc = T[cam_id]  # [Mo,P,4,4]
    Xcc = np.einsum("mpij,pj->mpi", Tc[..., :3, :3], X) + Tc[..., :3, 3]
    u = 525.0 * Xcc[..., 0] / Xcc[..., 2] + 319.5
    v = 525.0 * Xcc[..., 1] / Xcc[..., 2] + 239.5
    packed[19] = u + rng.normal(0, 0.5, (Mo, P))
    packed[20] = v + rng.normal(0, 0.5, (Mo, P))
    packed[21] = u - 40.0 / Xcc[..., 2]
    packed[22] = 1.0
    packed[23] = 1.0
    packed[24] = (rng.uniform(size=(Mo, P)) > 0.1).astype(np.float32)
    packed[25] = 1.0
    packed[26] = 1.0
    packed[27] = cam_id.astype(np.float32)
    pj = jnp.asarray(packed)

    args = (pj, jnp.float32(1e-4), 525.0, 525.0, 319.5, 239.5, 40.0, True, K)
    t0 = time.time()
    try:
        e_t, r_t, z_t = jax.tree.map(
            np.asarray, bsk.ba_edge_schur(*args, emit_zt=True)
        )
        print(f"1. compiled emit_zt=True in {time.time()-t0:.1f} s", flush=True)
    except Exception as ex:
        print(f"1. COMPILE FAIL emit_zt=True: {type(ex).__name__}: "
              f"{str(ex)[:400]}")
        return
    t0 = time.time()
    try:
        e_f, r_f, _ = jax.tree.map(
            np.asarray,
            bsk.ba_edge_schur(*args, emit_zt=False),
        )
        print(f"1. compiled emit_zt=False in {time.time()-t0:.1f} s",
              flush=True)
    except Exception as ex:
        print(f"1. COMPILE FAIL emit_zt=False: {type(ex).__name__}: "
              f"{str(ex)[:400]}")
        e_f = r_f = None

    e_i, r_i, z_i = jax.tree.map(
        np.asarray, bsk.ba_edge_schur(*args, emit_zt=True, interpret=True)
    )
    for name, a, b in (("edge", e_t, e_i), ("rows", r_t, r_i),
                       ("zt", z_t, z_i)):
        d = np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-9)
        print(f"   parity {name}: max rel dev {d:.2e}")
    if e_f is not None:
        d = np.max(np.abs(e_f[:51] - e_i)) / max(np.max(np.abs(e_i)), 1e-9)
        print(f"   parity edge (emit_zt=False): {d:.2e}")

    # ---- 2. slope-timed full iteration at production local-BA shape -----
    def device_time(make_body, *args, reps=(50, 450)):
        lo, hi = reps

        def looped(n):
            def run(*a):
                def body(i, acc):
                    return acc + make_body(i, *a)
                return lax.fori_loop(0, n, body, jnp.float32(0))
            return jax.jit(run)

        f_lo, f_hi = looped(lo), looped(hi)
        f_lo(*args).block_until_ready()
        f_hi(*args).block_until_ready()
        t_lo = t_hi = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f_lo(*args))
            t_lo = min(t_lo, time.perf_counter() - t0)
            t0 = time.perf_counter()
            np.asarray(f_hi(*args))
            t_hi = min(t_hi, time.perf_counter() - t0)
        return (t_hi - t_lo) / (hi - lo)

    K, P, Mo = 24, 2048, 10
    cam = CameraModel(fx=525.0, fy=525.0, cx=319.5, cy=239.5,
                      width=640, height=480, bf=40.0)
    pts = rng.uniform([-2, -2, 1], [2, 2, 5], (P, 3)).astype(np.float32)
    kf_T = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    kf_T[:, 0, 3] = rng.uniform(-0.5, 0.5, K)
    obs_cam = rng.integers(0, K, (P, Mo)).astype(np.int32)
    Tpm = kf_T[obs_cam]
    Xc = np.einsum("pmij,pj->pmi", Tpm[..., :3, :3], pts) + Tpm[..., :3, 3]
    u = 525.0 * Xc[..., 0] / Xc[..., 2] + 319.5
    v = 525.0 * Xc[..., 1] / Xc[..., 2] + 239.5
    uv_obs = np.stack([u, v], -1).astype(np.float32) + rng.normal(
        0, 0.5, (P, Mo, 2))
    ur_obs = (u - 40.0 / Xc[..., 2]).astype(np.float32)
    onehot = (obs_cam.T[..., None] == np.arange(K)).astype(np.float32)
    es = ba._EdgeStatic(
        jnp.asarray(uv_obs.transpose(1, 0, 2)), jnp.asarray(ur_obs.T),
        jnp.ones((Mo, P), jnp.float32), jnp.ones((Mo, P), bool),
        jnp.asarray(onehot), jnp.asarray(obs_cam.T.astype(np.float32)),
    )
    obs_ok = jnp.ones((P, Mo), bool)
    cam_act = jnp.ones((K,), bool).at[0].set(False)
    pt_act = jnp.ones((P,), bool)
    T_d, X_d = jnp.asarray(kf_T), jnp.asarray(pts)

    def one_iter(i, T, X):
        T2, X2, cost = ba._gn_iteration(
            cam, T, X + i * 1e-12, es, obs_ok, cam_act, pt_act,
            2.0, True, jnp.float32(1e-4),
        )
        return jnp.sum(T2) + jnp.sum(X2) + cost

    def stage_full(i, T, X):
        Tn, Xn, obs_in, mean = ba._ba_core(
            cam, T, X + i * 1e-12, es, obs_ok, cam_act, pt_act, 2.0, 3, 5,
            1e-4,
        )
        return jnp.sum(Tn) + mean

    for kernel_on in (True, False):
        ba._EDGE_KERNEL = kernel_on
        label = "v2 schur kernel" if kernel_on else "XLA fallback"
        dt = device_time(one_iter, T_d, X_d)
        print(f"2. full _gn_iteration (K={K}, P={P}, M={Mo}, E={P*Mo}) "
              f"[{label}]: {dt*1e6:.0f} us", flush=True)
        dt = device_time(stage_full, T_d, X_d, reps=(5, 25))
        print(f"3. full _ba_core 3+5 schedule [{label}]: {dt*1e6:.0f} us "
              f"(/9 linearizations = {dt*1e6/9:.0f} us)", flush=True)
    ba._EDGE_KERNEL = None


if __name__ == "__main__":
    main()
