"""Test config: force CPU with an 8-device virtual mesh before jax import.

Multi-chip sharding paths are validated on the virtual mesh; real-TPU runs
happen in bench.py / the driver's dryrun.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import random

import pytest


@pytest.fixture
def rng():
    return random.Random(0xC0FFEE)
