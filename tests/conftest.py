"""Test config: force CPU with an 8-device virtual mesh.

The container's sitecustomize imports jax and registers the axon TPU plugin at
interpreter startup, so env vars are too late — use jax.config directly.
Multi-chip sharding paths are validated on the virtual mesh; real-TPU runs
happen in bench.py / the driver's dryrun.
"""

import os
import random

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")

import pytest


@pytest.fixture
def rng():
    return random.Random(0xC0FFEE)
