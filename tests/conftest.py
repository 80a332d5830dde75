"""Test configuration: force JAX onto a virtual 8-device CPU backend.

Multi-chip sharding is validated on a CPU-backed fake mesh
(`--xla_force_host_platform_device_count=8`) as real multi-chip hardware is
not available in CI; bench runs use the real TPU chip separately.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The image preloads jax via sitecustomize with JAX_PLATFORMS=axon latched
# into the config, so the env var alone is not enough — update the config too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# The same persistent XLA compile cache the CLIs use (utils/jaxcache.py):
# the suite's cost is dominated by tiny-model XLA compiles, which are
# identical run to run — repeat suite runs on a developer host skip them.
# Disable with STORM_TPU_JAX_CACHE=0 for a cold-compile timing run.
from storm_tpu.utils.jaxcache import enable_jax_compilation_cache  # noqa: E402

enable_jax_compilation_cache()
