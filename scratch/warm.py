"""Warm interactive TPU session: run under `python -i` in tmux.

Imports everything, fires one trivial Pallas kernel to pay the per-process
tunnel warmup, then leaves a REPL with helpers in scope.
"""

import sys, time, random

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kogarashi_tpu import constants as C
from kogarashi_tpu.curves import G1, G2, GRUMPKIN
from kogarashi_tpu.fields import mont_pallas as M
from kogarashi_tpu.fields.spec import FQ, FR, ints_to_limbs
from kogarashi_tpu.ops import ec_pallas as E
from kogarashi_tpu.ops import msm_pallas as MP

I32 = jnp.int32
U32 = jnp.uint32

print("warming pallas...", flush=True)
t0 = time.time()
_out = pl.pallas_call(
    lambda a, o: o.__setitem__(slice(None), a[:] * 2),
    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
)(jnp.ones((8, 128), jnp.int32))
np.asarray(_out)
print(f"READY ({time.time()-t0:.0f}s warmup)", flush=True)


def run(path):
    """Execute a python file in this process's globals (iterate without restarts)."""
    with open(path) as f:
        src = f.read()
    exec(compile(src, path, "exec"), globals())
