"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set platform flags before jax is imported anywhere.
"""

import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
import sys

sys.path.insert(0, _REPO)

# Persistent compile cache: XLA-CPU compiles of the unrolled window/census
# graphs take tens of seconds on this host; cache them across test runs.
# (The env-var spelling is not honored in this JAX build, so set the config
# programmatically.)
import jax

# The env-var spellings (JAX_PLATFORMS / JAX_COMPILATION_CACHE_DIR) are not
# honored by this JAX build, so force both programmatically.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
