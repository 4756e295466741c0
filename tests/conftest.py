"""Test harness configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths
(mesh/pjit) execute without TPU hardware — the strategy SURVEY.md §4 calls
for. The XLA flag must be set before the CPU backend initializes; the
platform override must go through jax.config because the environment's
'axon' PJRT plugin takes precedence over the JAX_PLATFORMS env var.

Hardware sessions: ``WAVENET_TPU_TESTS_ON_TPU=1 python -m pytest
tests/ -k on_tpu -q`` keeps the real TPU backend so the
``@pytest.mark.skipif(jax.default_backend() != "tpu")`` regression tests
(bf16 emission bitwise, prefetch-resume deadlock) actually execute —
without it the CPU override below makes them permanently skipped.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

if not os.environ.get("WAVENET_TPU_TESTS_ON_TPU"):
    jax.config.update("jax_platforms", "cpu")

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    The XLA:CPU JIT has been observed to segfault intermittently inside
    ``backend_compile_and_load`` once a single process accumulates a few
    hundred live compiled programs (three crashes at the ~65% mark of the
    full suite, different tests each time, every one standalone-green —
    the Python stacks bottom out in the LLVM JIT, not in this repo).
    Clearing per module keeps the live-executable population bounded at
    one module's worth; the recompiles cost ~a minute across the suite."""
    yield
    jax.clear_caches()
