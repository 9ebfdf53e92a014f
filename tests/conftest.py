"""Test harness configuration.

Tests run hermetically on the CPU backend with 8 virtual XLA devices so the
sharding layer (mesh + shard_map + halo exchange) is exercised without TPU
hardware — the strategy SURVEY.md section 4 prescribes for the distributed
coverage the reference never had. Benchmarks (bench.py) use the real chip.

Note: this environment pre-imports jax via sitecustomize, so JAX_PLATFORMS
in os.environ is read before any test code runs; the platform must be forced
through jax.config instead.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
