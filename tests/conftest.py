"""Test harness: force CPU with 8 virtual devices so sharding tests run
without TPU hardware (SURVEY.md §4).

Note: the environment ships a sitecustomize that forces JAX_PLATFORMS=axon
at interpreter startup, so setting the env var alone is not enough — we also
override through jax.config before any computation runs.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import hashlib  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def _host_cache_dir() -> str:
    """CPU-feature-keyed cache directory.

    The XLA:CPU AOT cache is NOT portable across machines: entries
    compiled on a host with different CPU features (avx512/amx variants
    across the fleet) deserialize with 'machine type ... doesn't match'
    warnings and can SIGSEGV outright inside
    compilation_cache.get_executable_and_time (observed r3: intermittent
    hard crashes of the suite after the working machine changed). Keying
    the directory by the host's feature flags makes cross-machine reads
    impossible while keeping same-machine reruns fast."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    digest = hashlib.sha256(line.encode()).hexdigest()[:10]
                    break
            else:
                digest = "generic"
    except OSError:
        digest = "generic"
    return f"/root/.jax_cache_cpu_{digest}"


# persistent compile cache: the suite's dominant cost is XLA compiles of
# the big fused tracker programs; caching them makes reruns fast (keyed by
# HLO hash, so code changes invalidate exactly what they touch)
jax.config.update("jax_compilation_cache_dir", _host_cache_dir())
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "heavy: long-running e2e/distributed tests "
        "(fast tier: pytest -m 'not heavy')",
    )


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
