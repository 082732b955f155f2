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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
