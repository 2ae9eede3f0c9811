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

    for TR in (8, 16, 32, 64):
        bak.TR = TR
        for E in (20480, 131072, 524288):
            packed = jnp.asarray(np.random.rand(27, E).astype(np.float32))
            try:
                dt = device_time(
                    lambda i, x: jnp.sum(
                        bak.ba_edge_terms(
                            x.at[0, 0].set(i.astype(jnp.float32)),
                            525.0, 525.0, 319.5, 239.5, 40.0, True,
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


if __name__ == "__main__":
    main()
