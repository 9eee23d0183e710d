import os
import sys

# Tests run on the CPU backend with 8 virtual devices so the
# multi-chip sharding paths compile and execute without TPU hardware.
# The axon sitecustomize registers the TPU plugin whenever
# PALLAS_AXON_POOL_IPS is set, overriding JAX_PLATFORMS — drop it.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")
# persistent compile cache: the big masked while_loop kernels take
# ~1 min each to compile; cache across test runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

# The axon sitecustomize imports jax at interpreter startup (before this
# conftest runs), so jax's config has already latched JAX_PLATFORMS=axon
# from the env — the os.environ override above is too late for it.
# Force the platform through the live config object instead; the CPU
# backend itself initializes lazily, so XLA_FLAGS above still applies.
if "jax" in sys.modules:
    import jax
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


@pytest.fixture(scope="session")
def data_dir():
    return DATA_DIR


@pytest.fixture(scope="session")
def ref_index(data_dir):
    """Reference-built index artifacts loaded once per session."""
    from bwamem_tpu.index import load_index
    fm, bns = load_index(os.path.join(data_dir, "genome.fa"))
    return fm, bns

# smaller fixed lane count for tests: full-width (512) kernels take
# minutes of XLA CPU compile on first run; shapes stay fixed so the
# one-compile-per-kernel property is preserved
os.environ.setdefault("BWAMEM_TPU_LANES", "64")
os.environ.setdefault("BWAMEM_TPU_WAVE", "64")
os.environ.setdefault("BWAMEM_TPU_SA_SLICE", "4096")
