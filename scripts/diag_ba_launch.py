"""Decompose the local-BA LM iteration cost on the real TPU.

r3 measured ~550 us per ba_edge_terms invocation at the production 20k-edge
size and called it launch-bound (BENCH_TABLE.md). But the align kernel runs
~90 pallas launches in 1.85 ms, so 550 us cannot be generic pallas launch
overhead — this script isolates what it actually is:

  1. launch floor: a minimal pallas kernel (1 tile in/out) in a fori_loop
  2. ba_edge_terms alone at E=20480 / 131072, TR sweep incl. single-step
  3. the XLA reduction tail of _gn_iteration (everything after the kernel)
  4. one full _gn_iteration at the compacted local-BA shape
  5. the [6K,6K] cho_factor+cho_solve alone (suspect: sequential panels)
  6. the full 3+5 local-BA stage

Timing: fetch-based (np.asarray of a dependent scalar), REPS iterations in
ONE jitted fori_loop — trustworthy in every tunnel regime (CLAUDE.md).

Run alone (no concurrent CPU load): python scripts/diag_ba_launch.py
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from sdslam_tpu.geometry.camera import CameraModel
    from sdslam_tpu.ops.pallas import ba_edge_kernel as bak
    from sdslam_tpu.solvers import ba

    # SLOPE timing (r4): a single dispatch+fetch through the tunnel costs
    # ~25-30 ms in mid regimes REGARDLESS of program content, so dividing
    # one fetch-timed call by REPS=50 attributes ~500 us of tunnel round
    # trip to every iteration — exactly the r3 artifact that made the edge
    # kernel look "launch-bound" (a tiny-kernel control measures the same
    # ~520 us). Timing the SAME body at two rep counts and taking the
    # slope cancels every fixed cost.
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

    # ---- 1. pallas launch floor -----------------------------------------
    def tiny_kernel(in_ref, out_ref):
        out_ref[:, :] = in_ref[:, :] * 2.0

    def tiny(x):
        return pl.pallas_call(
            tiny_kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    x0 = jnp.ones((8, 128), jnp.float32)
    dt = device_time(lambda i, x: jnp.sum(tiny(x + i)), x0)
    print(f"1. pallas launch floor (tiny kernel): {dt*1e6:.1f} us")
    # control: identical harness body without the pallas call — separates
    # launch overhead from loop/regime overhead in the same run
    dt = device_time(lambda i, x: jnp.sum((x + i) * 2.0), x0)
    print(f"1b. XLA-only control (same body, no pallas): {dt*1e6:.1f} us")

    # ---- 2. edge kernel alone -------------------------------------------
    for E in (20480, 131072):
        packed = jnp.asarray(np.random.rand(27, E).astype(np.float32))
        for tr in (32, E // 128):  # production tile vs single grid step
            try:
                dt = device_time(
                    lambda i, x, tr=tr: jnp.sum(
                        bak.ba_edge_terms(
                            x + i * 1e-9, 525.0, 525.0, 319.5, 239.5, 40.0,
                            True, tr=tr,
                        )[54]
                    ),
                    packed,
                )
                gb = (27 + 55) * E * 4 / dt / 1e9
                print(f"2. ba_edge_terms E={E} TR={tr}: {dt*1e6:.0f} us  "
                      f"{gb:.0f} GB/s ({gb/819*100:.0f}% roofline)")
            except Exception as e:
                print(f"2. ba_edge_terms E={E} TR={tr}: FAIL "
                      f"{type(e).__name__}: {str(e)[:100]}")

    # ---- 3-6. full iteration decomposition at local-BA shape ------------
    K, P, Mo = 24, 2048, 10
    rng = np.random.default_rng(0)
    cam = CameraModel(fx=525.0, fy=525.0, cx=319.5, cy=239.5,
                      width=640, height=480, bf=40.0)
    # synthetic but realistic local-BA system
    pts = rng.uniform([-2, -2, 1], [2, 2, 5], (P, 3)).astype(np.float32)
    kf_T = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    kf_T[:, 0, 3] = rng.uniform(-0.5, 0.5, K)
    obs_cam = rng.integers(0, K, (P, Mo)).astype(np.int32)
    Tpm = kf_T[obs_cam]  # [P,Mo,4,4]
    Xc = np.einsum("pmij,pj->pmi", Tpm[..., :3, :3], pts) + Tpm[..., :3, 3]
    u = 525.0 * Xc[..., 0] / Xc[..., 2] + 319.5
    v = 525.0 * Xc[..., 1] / Xc[..., 2] + 239.5
    uv_obs = np.stack([u, v], -1).astype(np.float32) + rng.normal(0, 0.5, (P, Mo, 2))
    ur_obs = (u - 40.0 / Xc[..., 2]).astype(np.float32)
    onehot = (obs_cam.T[..., None] == np.arange(K)).astype(np.float32)
    # r5 v2: _EdgeStatic is observation-major [Mo, P]
    es = ba._EdgeStatic(
        jnp.asarray(uv_obs.transpose(1, 0, 2)), jnp.asarray(ur_obs.T),
        jnp.ones((Mo, P), jnp.float32), jnp.ones((Mo, P), bool),
        jnp.asarray(onehot), jnp.asarray(obs_cam.T.astype(np.float32)),
    )
    obs_ok = jnp.ones((P, Mo), bool)
    cam_act = jnp.ones((K,), bool).at[0].set(False)
    pt_act = jnp.ones((P,), bool)
    T_d = jnp.asarray(kf_T)
    X_d = jnp.asarray(pts)

    def one_iter(i, T, X):
        T2, X2, cost = ba._gn_iteration(
            cam, T, X + i * 1e-12, es, obs_ok, cam_act, pt_act,
            2.0, True, jnp.float32(1e-4),
        )
        return jnp.sum(T2) + jnp.sum(X2) + cost

    # A/B the production edge path: pallas kernel vs pure-XLA fallback —
    # at 20k edges the pallas launch overhead (~0.5 ms, see 1.) may exceed
    # the entire XLA fused-elementwise pass
    for kernel_on in (True, False):
        ba._EDGE_KERNEL = kernel_on
        dt = device_time(one_iter, T_d, X_d)
        label = "pallas edge kernel" if kernel_on else "XLA fallback"
        print(f"4. full _gn_iteration (K={K}, P={P}, M={Mo}, E={P*Mo}) "
              f"[{label}]: {dt*1e6:.0f} us")

    # 5. the dense solve alone
    S0 = jnp.asarray(
        rng.normal(0, 1, (6 * K, 6 * K)).astype(np.float32)
    )
    S0 = S0 @ S0.T + 6 * K * jnp.eye(6 * K)
    b0 = jnp.asarray(rng.normal(0, 1, (6 * K,)).astype(np.float32))

    def solve_only(i, S, b):
        L, low = jax.scipy.linalg.cho_factor(S + i * 1e-9, lower=True)
        return jnp.sum(jax.scipy.linalg.cho_solve((L, low), b))

    dt = device_time(solve_only, S0, b0)
    print(f"5. cho_factor+cho_solve [{6*K},{6*K}]: {dt*1e6:.0f} us")

    def lstsq_alt(i, S, b):
        return jnp.sum(jnp.linalg.solve(S + i * 1e-9, b))

    dt = device_time(lstsq_alt, S0, b0)
    print(f"5b. jnp.linalg.solve [{6*K},{6*K}]: {dt*1e6:.0f} us")

    # 6. full two-stage local-BA core (3+5 schedule)
    def stage_full(i, T, X):
        Tn, Xn, obs_in, mean = ba._ba_core(
            cam, T, X + i * 1e-12, es, obs_ok, cam_act, pt_act, 2.0, 3, 5,
            1e-4,
        )
        return jnp.sum(Tn) + mean

    for kernel_on in (True, False):
        ba._EDGE_KERNEL = kernel_on
        dt = device_time(stage_full, T_d, X_d, reps=(5, 25))
        label = "pallas edge kernel" if kernel_on else "XLA fallback"
        print(f"6. full _ba_core 3+5 schedule [{label}]: {dt*1e6:.0f} us "
              f"(/9 linearizations = {dt*1e6/9:.0f} us)")


if __name__ == "__main__":
    main()
