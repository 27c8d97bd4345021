"""Test config: force CPU backend with 8 virtual devices so sharding tests run
without TPU hardware.

NOTE: this environment's sitecustomize imports jax and registers the 'axon'
TPU-tunnel backend before pytest starts, so env vars alone are too late —
jax.config.update is the reliable override.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# persistent XLA compile cache: CPU test compiles dominate the suite
# (CLAUDE.md); repeat runs reuse compiled modules across processes
_cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_test_cache",
)
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
try:
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
except Exception:
    pass  # older jax: flag absent
