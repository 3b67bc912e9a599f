import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from jax.experimental import pallas as pl

print("backend:", jax.default_backend(), flush=True)

def k(a_ref, o_ref):
    o_ref[:] = a_ref[:] * 2

x = jnp.ones((8, 128), jnp.int32)
t0 = time.time()
out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32))(x)
h = np.asarray(out)
print("trivial pallas ok:", h[0, 0], f"{time.time()-t0:.1f}s", flush=True)

from kogarashi_tpu.fields import mont_pallas as M
from kogarashi_tpu.fields.spec import FQ
K = M.MontConsts.make(FQ)

def k2(a_ref, b_ref, o_ref):
    o_ref[:] = M.mm(a_ref[:], b_ref[:], K)

a = jnp.ones((16, 8, 128), jnp.int32)
t0 = time.time()
out = pl.pallas_call(k2, out_shape=jax.ShapeDtypeStruct((16, 8, 128), jnp.int32))(a, a)
h = np.asarray(out)
print(f"mm kernel ok: {time.time()-t0:.1f}s", flush=True)
