"""Test configuration.

Tests run CPU-only on a virtual 8-device mesh so multi-chip sharding
compiles and executes without TPU hardware (SURVEY §4: JAX backend
portability is the fake backend).  The axon TPU-tunnel plugin (injected via
PYTHONPATH) routes compiles through a remote relay — stripped here so test
compiles stay local.  Must run before jax is imported anywhere.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# keep the axon remote-TPU plugin out of CPU test runs
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
os.environ["PYTHONPATH"] = ":".join(
    p for p in os.environ.get("PYTHONPATH", "").split(":") if ".axon_site" not in p
)

# persistent XLA compile cache: repeated test runs skip recompiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache_cpu")

# The axon sitecustomize may have imported jax at interpreter startup with
# JAX_PLATFORMS=axon latched — env mutation above is then too late.  As
# long as no backend has been initialized yet (sitecustomize only imports),
# jax.config can still repoint the platform.
if "jax" in sys.modules:
    import jax

    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
