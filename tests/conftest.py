"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on a virtual CPU mesh (the driver separately dry-run-compiles the
multi-chip path via __graft_entry__.dryrun_multichip).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Persistent compilation cache: XLA-CPU compiles cost ~1s per op-shape in
# this sandbox; caching makes test reruns fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The sandbox's sitecustomize force-registers the axon TPU plugin and sets
# JAX_PLATFORMS=axon before conftest runs; switching the platform config
# post-import is what actually takes effect.
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
assert jax.default_backend() == "cpu"

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cosmo():
    from baryonification_tpu.cosmology import Cosmology
    return Cosmology(Omega_m=0.3, Omega_b=0.05, h=0.7, sigma8=0.8, n_s=0.96)
