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
