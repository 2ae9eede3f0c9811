"""A/B the full per-frame alignment on real TPU: XLA per-iteration loop vs
per-iteration pallas kernel vs the r4 fused whole-level kernel (GN loop in
ONE launch per level). Slope timing (two rep counts) cancels the tunnel's
~25-30 ms fixed dispatch+fetch cost (CLAUDE.md r4 timing artifact).

Run alone: python scripts/diag_align_fused.py
"""

import functools
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

    from sdslam_tpu.ops.pallas import align_kernel as ak
    from sdslam_tpu.solvers import image_align

    # 1. compile check: the fused kernel standalone (never trust a bench
    # that may silently fall back, CLAUDE.md)
    rng = np.random.default_rng(0)
    H, W = 120, 160
    img = jnp.asarray(rng.random((H, W), np.float32) * 255)
    N = 1024
    X = jnp.asarray(np.concatenate(
        [rng.uniform(-1, 1, (N, 2)), rng.uniform(1, 3, (N, 1))], 1
    ).astype(np.float32))
    patch = jnp.asarray(rng.random((N, 16), np.float32) * 255)
    J = jnp.asarray(rng.normal(0, 0.01, (N, 16, 6)).astype(np.float32))
    okpx = jnp.ones((N, 16), bool)
    Hinv = jnp.eye(6, dtype=jnp.float32)
    T, chi, n = ak.align_level(
        img, X, patch, J, okpx, Hinv, jnp.eye(4, dtype=jnp.float32),
        120.0, 120.0, 79.5, 59.5, iters=30,
    )
    np.asarray(T)
    print("fused align_level COMPILES on TPU; n_px =", int(n), flush=True)

    # 2. full 3-level alignment timing at production shape
    lvl_shapes = [(480 >> l, 640 >> l) for l in range(5)]
    pyr_ref = tuple(jnp.asarray(rng.random(s, np.float32) * 255)
                    for s in lvl_shapes[2:])
    pyr_cur = tuple(jnp.asarray(rng.random(s, np.float32) * 255)
                    for s in lvl_shapes[2:])
    uv = jnp.asarray(rng.uniform([8, 8], [632, 472], (N, 2)).astype(np.float32))
    valid = jnp.ones((N,), bool)

    def one(i, T0, fused):
        res = image_align.align(
            pyr_ref, pyr_cur, uv, X, valid, T0,
            525.0, 525.0, 319.5, 239.5,
            scale_factor=2.0, max_level=4, min_level=2, start_level=2,
            fused=fused,
        )
        return res.T_cur_ref

    def slope_time(body):
        """body: (i, T) -> T. Returns per-call time via two rep counts."""
        fs = []
        for reps in (10, 60):
            fs.append(jax.jit(functools.partial(
                lambda reps, T: lax.fori_loop(0, reps, body, T), reps)))
        T0 = jnp.eye(4, dtype=jnp.float32)
        for f in fs:
            np.asarray(f(T0))
        ts = []
        for f in fs:
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(f(T0))
                best = min(best, time.perf_counter() - t0)
            ts.append(best)
        return (ts[1] - ts[0]) / 50

    for label, kernel_on, fused in (
        ("XLA per-iteration", False, False),
        ("pallas per-iteration", True, False),
        ("pallas FUSED level-loop", True, True),
    ):
        image_align._ALIGN_KERNEL = kernel_on
        image_align.align.clear_cache()
        try:
            dt = slope_time(functools.partial(
                lambda fused, i, T: one(i, T, fused), fused))
            print(f"full 3-level alignment [{label}]: {dt*1e3:.3f} ms")
        except Exception as e:
            print(f"[{label}] FAIL {type(e).__name__}: {str(e)[:200]}")
    image_align._ALIGN_KERNEL = "auto"
    image_align.align.clear_cache()


if __name__ == "__main__":
    main()
