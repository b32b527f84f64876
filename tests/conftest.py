"""Test harness: run everything on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4's implication: multi-chip sharding is validated by mesh
shrinking onto host CPU devices; the driver separately dry-runs the multichip
path via __graft_entry__.dryrun_multichip.

The axon TPU plugin registers itself at interpreter start (sitecustomize) and
overrides JAX_PLATFORMS, so we force the CPU platform through jax.config after
import — this reliably wins over the plugin.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache: the suite's wall-clock is dominated by CPU
# compiles of the same tiny-config programs every run; warm runs skip them.
_cache_dir = os.environ.get("TACO_TEST_CACHE", "/tmp/jax_test_cache")
if _cache_dir:
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.default_backend() == "cpu"
    assert jax.device_count() == 8
