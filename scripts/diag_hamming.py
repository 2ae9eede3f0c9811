"""Slope-time the Hamming distance paths: XLA VPU xor+popcount vs the
Pallas MXU +-1 kernel, at production shapes. Produces the trustworthy
roofline number VERDICT r4 #4 asked for (the r3 ~10% figure was
fetch-timed, a methodology r4 proved attributes ~25 ms of tunnel round
trip to the op).

Roofline model: traffic = 32*(Na+Nb) read + 4*Na*Nb write bytes at
819 GB/s. The XLA path is VPU-popcount COMPUTE-bound at large N (8 xor +
8 popcnt + 7 add per pair); the MXU path is a 256-deep bf16 matmul.

Run alone on TPU: python scripts/diag_hamming.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from sdslam_tpu.ops import hamming as ham
    from sdslam_tpu.ops.pallas import hamming_kernel as hk

    print(f"platform: {jax.devices()[0].platform}")
    rng = np.random.default_rng(0)

    def device_time(make_body, *args, reps=(20, 120)):
        lo, hi = reps

        def looped(n):
            def run(*a):
                def body(i, acc):
                    return acc + make_body(i, *a)
                return lax.fori_loop(0, n, body, jnp.int32(0))
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

    # standalone compile + parity check first (a silent fallback would
    # "measure" the XLA path twice)
    a = jnp.asarray(
        rng.integers(0, 2**32, (256, 8), dtype=np.uint64).astype(np.uint32))
    b = jnp.asarray(
        rng.integers(0, 2**32, (256, 8), dtype=np.uint64).astype(np.uint32))
    ref = np.asarray(ham.hamming_matrix(a, b))
    out = np.asarray(hk.hamming_matrix_pallas(a, b))
    assert (out == ref).all(), "kernel/XLA mismatch on TPU"
    print("pallas kernel COMPILED on TPU, parity exact")

    for Na, Nb in ((1024, 1024), (1024, 8192), (4096, 4096)):
        da = jnp.asarray(
            rng.integers(0, 2**32, (Na, 8), dtype=np.uint64).astype(np.uint32))
        db = jnp.asarray(
            rng.integers(0, 2**32, (Nb, 8), dtype=np.uint64).astype(np.uint32))
        bytes_ = 32 * (Na + Nb) + 4 * Na * Nb
        for name, fn in (
            ("xla-vpu", lambda i, x, y: jnp.sum(
                ham.hamming_matrix(
                    x ^ i.astype(jnp.uint32)[None, None], y), dtype=jnp.int32)),
            ("pallas-mxu", lambda i, x, y: jnp.sum(
                hk.hamming_matrix_pallas(
                    x ^ i.astype(jnp.uint32)[None, None], y),
                dtype=jnp.int32)),
        ):
            dt = device_time(fn, da, db)
            gbs = bytes_ / dt / 1e9
            gpairs = Na * Nb / dt / 1e9
            print(f"{Na}x{Nb} {name:10s}: {dt*1e6:8.1f} us  "
                  f"{gpairs:6.1f} Gpair/s  {gbs:5.0f} GB/s "
                  f"({gbs/819*100:.0f}% HBM roofline)")


if __name__ == "__main__":
    main()
