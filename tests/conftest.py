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
# Persistent compilation cache: big traces (MSM/NTT/prover) compile once ever.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import pytest


@pytest.fixture
def rng():
    return random.Random(0xC0FFEE)
