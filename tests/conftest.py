"""Test configuration: force an 8-device virtual CPU mesh.

The reference (SHI-Labs/Versatile-Diffusion) has no test suite at all; we test
every subsystem on a fake multi-device CPU topology so sharding logic is
exercised without TPU hardware (SURVEY.md section 4).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Must be set before jax is imported anywhere.
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import pytest  # noqa: E402
import jax  # noqa: E402

# The environment's TPU plugin overrides JAX_PLATFORMS at import time; force
# the virtual 8-device CPU topology explicitly.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the parity tests jit big graphs on CPU; this
# makes re-runs near-instant.
jax.config.update("jax_compilation_cache_dir", "/tmp/vdtpu-jax-cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


@pytest.fixture(scope="session")
def rng():
    import jax
    return jax.random.PRNGKey(0)
