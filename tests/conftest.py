"""Test harness config: CPU platform with 8 virtual devices.

Multi-chip sharding is validated on a virtual CPU mesh (no multi-chip TPU
hardware in CI); numerics are validated against torch-CPU ground truth.
Must set env before jax import.
"""

import os

# jax may ALREADY be imported (the machine's sitecustomize registers a TPU
# plugin at interpreter start), so env vars alone are not enough; XLA_FLAGS
# still works because the CPU backend initializes lazily, and the platform
# is forced through jax.config below.
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # tests run on the virtual mesh
# The env var above is read when jax's config initializes — which already
# happened in sitecustomize — so the cache dir must ALSO be set through
# jax.config (same trap as jax_platforms).  Without this the persistent
# cache silently never writes and every test pays full compile time.
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from unet_tpu.config import UnetConfig  # noqa: E402


# One shared scaled-down config for model-level tests: same topology as the
# reference default (4 levels, attention at ds 4 and 8, HS=32) but
# C_model=32 and 32x32 images so CPU compiles stay tractable.
SMALL_CFG = UnetConfig(model_channels=32, image_size=32,
                       attention_ds=(4, 8), num_head_channels=32)

# The reference production config (ImageNet-64).
FULL_CFG = UnetConfig()


@pytest.fixture(scope="session")
def small_cfg():
    return SMALL_CFG


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
