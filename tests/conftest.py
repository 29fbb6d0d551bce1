"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on a forced 8-device CPU host platform (the driver separately
dry-run-compiles the multi-chip path via __graft_entry__.dryrun_multichip).

The environment registers a TPU PJRT plugin via sitecustomize before any
user code runs and pins JAX_PLATFORMS=axon, so plain env vars set here are
too late / overridden — force the platform through jax.config instead.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

assert len(jax.devices()) == 8, f"expected 8 CPU devices, got {jax.devices()}"


@pytest.fixture
def rng():
    return np.random.default_rng(0)
