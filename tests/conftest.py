"""Test configuration: run everything on a virtual 8-device CPU mesh.

The axon sitecustomize registers a remote-TPU backend and overrides the
JAX_PLATFORMS env var, so we must force the CPU platform via
jax.config *after* import (and set XLA flags before backend init).
This is the TPU-native stand-in for multi-chip testing (SURVEY.md §4).
"""

import os
import sys

prev = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (prev + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache for the CPU test programs (separate from the
# TPU relay cache .jax_cache/): the fast lane recompiles the same tiny
# walk/trainer/oracle programs on every run — cache hits cut repeat-run
# wall time on this one-core box (round-4 fast-lane diet). Keyed by HLO
# hash, so staleness cannot produce wrong results, only misses.
_cpu_cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache_cpu")
os.makedirs(_cpu_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cpu_cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
