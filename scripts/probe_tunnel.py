"""Tiny TPU tunnel health probe: measures H2D bandwidth, fetch latency,
and dispatch latency to classify the current tunnel regime (CLAUDE.md
"environment quirks"). Keep it SMALL — never run concurrently with other
TPU work; give it a generous outer timeout and never kill it mid-op.

Prints one JSON line:
  {"h2d_mb_s": ..., "fetch_ms": ..., "dispatch_ms": ..., "regime": ...}
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    dev = jax.devices()[0]

    # warm up: one tiny upload + op + fetch (pays any connection setup)
    t_setup0 = time.perf_counter()
    x = jnp.asarray(np.ones((8, 8), np.float32))
    f = jax.jit(lambda a: a @ a)
    y = f(x)
    y.block_until_ready()
    _ = np.asarray(y)
    setup_s = time.perf_counter() - t_setup0

    # H2D bandwidth: 8 MB upload, timed to completion via a dependent op
    payload = np.random.randint(0, 255, (4, 1024, 1024), np.uint8)  # 4 MB
    g = jax.jit(lambda a: jnp.sum(a, dtype=jnp.int32))
    # compile first with a resident array
    warm = jax.device_put(payload)
    g(warm).block_until_ready()
    t0 = time.perf_counter()
    d = jax.device_put(payload)
    s = g(d)
    while not s.is_ready():
        time.sleep(0.002)
    up_s = time.perf_counter() - t0
    h2d = payload.nbytes / up_s / 1e6

    # fetch latency: tiny READY result -> host
    small = f(x)
    while not small.is_ready():
        time.sleep(0.002)
    t0 = time.perf_counter()
    _ = np.asarray(small)
    fetch_ms = (time.perf_counter() - t0) * 1e3

    # dispatch latency: 20 chained tiny ops, no fetch
    t0 = time.perf_counter()
    z = x
    for _ in range(20):
        z = f(z)
    while not z.is_ready():
        time.sleep(0.002)
    disp_ms = (time.perf_counter() - t0) * 1e3 / 20

    if h2d > 50 and fetch_ms < 60:
        regime = "good"
    elif h2d > 5:
        regime = "degraded"
    else:
        regime = "bad"
    print(json.dumps({
        "h2d_mb_s": round(h2d, 1),
        "fetch_ms": round(fetch_ms, 1),
        "dispatch_ms": round(disp_ms, 2),
        "setup_s": round(setup_s, 1),
        "regime": regime,
    }))


if __name__ == "__main__":
    main()
