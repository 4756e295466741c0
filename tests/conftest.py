"""Test harness configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths
(mesh/pjit) execute without TPU hardware — the strategy SURVEY.md §4 calls
for. The XLA flag must be set before the CPU backend initializes; the
platform override must go through jax.config because the environment's
'axon' PJRT plugin takes precedence over the JAX_PLATFORMS env var.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
