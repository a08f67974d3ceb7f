"""Test harness: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize pre-imports JAX and force-selects the tunnelled
'axon' TPU backend via ``jax.config.update`` (so env vars alone don't stick).
Tests must run on local CPU — fast, deterministic, 8 virtual devices for
sharding tests — so we override the config back after import.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# repo root importable regardless of how pytest was invoked
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
assert jax.devices()[0].platform == "cpu"
