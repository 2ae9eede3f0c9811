"""Sweep the BA edge kernel over edge count and sublane tile (TR) to find
where it saturates HBM, and measure the Hamming kernel's roofline %.

Run on the real TPU: python scripts/diag_kernels.py
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

    from sdslam_tpu.ops.pallas import ba_edge_kernel as bak

    REPS = 50

    def device_time(make_body, *args):
        def looped(*a):
            def body(i, acc):
                return acc + make_body(i, *a)
            return lax.fori_loop(0, REPS, body, jnp.float32(0))
        f = jax.jit(looped)
        f(*args).block_until_ready()
        t0 = time.perf_counter()
        np.asarray(f(*args))  # fetch: trustworthy in every tunnel mode
        return (time.perf_counter() - t0) / REPS

    for TR in (8, 16, 32, 64, 128):
        for E in (20480, 131072, 524288):
            packed = jnp.asarray(np.random.rand(27, E).astype(np.float32))
            try:
                dt = device_time(
                    lambda i, x, tr=TR: jnp.sum(
                        bak.ba_edge_terms(
                            x.at[0, 0].set(i.astype(jnp.float32)),
                            525.0, 525.0, 319.5, 239.5, 40.0, True, tr=tr,
                        )[54]
                    ),
                    packed,
                )
            except Exception as e:  # Mosaic lowering limits at big TR
                print(f"TR={TR} E={E}: FAIL {type(e).__name__}: {str(e)[:120]}")
                continue
            gb = (27 + 55) * E * 4 / dt / 1e9
            print(f"TR={TR} E={E}: {dt*1e6:.0f} us  {gb:.0f} GB/s "
                  f"({gb/819*100:.0f}% roofline)")

    # Hamming roofline: output-dominated (N*M i32 distance matrix)
    from sdslam_tpu.ops import hamming as ham
    for N in (1024, 4096):
        a = jnp.asarray(np.random.randint(0, 2**32, (N, 8), np.uint64).astype(np.uint32))
        b = jnp.asarray(np.random.randint(0, 2**32, (N, 8), np.uint64).astype(np.uint32))
        dt = device_time(
            lambda i, a_, b_: jnp.sum(
                ham.hamming_matrix(a_ ^ i.astype(jnp.uint32), b_)
            ).astype(jnp.float32),
            a, b,
        )
        bytes_ = N * N * 4 + 2 * N * 8 * 4
        print(f"hamming N={N}: {dt*1e6:.0f} us  {N*N/dt/1e9:.1f} Gpair/s  "
              f"{bytes_/dt/1e9:.0f} GB/s ({bytes_/dt/1e9/819*100:.0f}% roofline)")




def bench_align():
    """Time the production XLA image-alignment path at tracking shapes:
    the north-star patch-warp kernel can only save a fraction of this."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from sdslam_tpu.solvers import image_align

    H, W = 480, 640
    lvl_shapes = [(H >> l, W >> l) for l in range(5)]
    rng = np.random.default_rng(0)
    pyr_ref = tuple(jnp.asarray(rng.random(s, np.float32) * 255) for s in lvl_shapes[2:])
    pyr_cur = tuple(jnp.asarray(rng.random(s, np.float32) * 255) for s in lvl_shapes[2:])
    N = 1024
    uv = jnp.asarray(rng.uniform([8, 8], [W - 8, H - 8], (N, 2)).astype(np.float32))
    X = jnp.asarray(
        np.concatenate([rng.uniform(-1, 1, (N, 2)), rng.uniform(1, 3, (N, 1))], 1
                       ).astype(np.float32))
    valid = jnp.ones((N,), bool)

    def one(i, T0):
        res = image_align.align(
            pyr_ref, pyr_cur, uv, X, valid, T0,
            525.0, 525.0, 319.5, 239.5,
            scale_factor=2.0, max_level=4, min_level=2, start_level=2,
        )
        return res.T_cur_ref

    import time
    for kernel_on in (False, True):
        image_align._ALIGN_KERNEL = kernel_on
        image_align.align.clear_cache()  # gate is read at trace time
        f = jax.jit(lambda T: lax.fori_loop(0, 20, one, T))
        try:
            T = jnp.eye(4)
            np.asarray(f(T))
            t0 = time.perf_counter()
            np.asarray(f(T))
            dt = (time.perf_counter() - t0) / 20
            label = "pallas patch-warp" if kernel_on else "XLA two-hot"
            print(f"full per-frame alignment, {label} "
                  f"(3 levels, <=30 iters, 1024 pts): {dt*1e3:.2f} ms")
        except Exception as e:
            print(f"kernel_on={kernel_on}: FAIL {type(e).__name__}: "
                  f"{str(e)[:200]}")
    image_align._ALIGN_KERNEL = False
    image_align.align.clear_cache()


if __name__ == "__main__":
    import sys as _sys
    if len(_sys.argv) > 1 and _sys.argv[1] == "align":
        bench_align()
    else:
        main()
