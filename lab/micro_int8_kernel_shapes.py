import os, time, functools, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax, jax.numpy as jnp, numpy as np
from scal_sdt_tpu.ops.adam8_fused import adam8_fused_update
shape = sys.argv[1]
if shape == "wide":
    lead, minor = 128000, 6656
elif shape == "tall":
    lead, minor = 1664000, 256
else:
    lead, minor = 13000*256, 256  # same grid count as wide, nb=1
nb = -(-minor // 256)
g = jax.jit(lambda k: jax.random.normal(k, (lead, minor), jnp.float32))(jax.random.PRNGKey(0))
q1 = jnp.zeros((lead, nb*256), jnp.int8); s1 = jnp.zeros((lead, nb), jnp.float32)
q2 = jnp.zeros((lead, nb*256), jnp.int8); s2 = jnp.zeros((lead, nb), jnp.float32)
@functools.partial(jax.jit, donate_argnums=(1,2,3,4))
def f(g, q1, s1, q2, s2):
    return adam8_fused_update(g, q1, s1, q2, s2, jnp.float32(10.), jnp.float32(1000.), b1=0.9, b2=0.999, eps=1e-8)
out, q1, s1, q2, s2 = f(g, q1, s1, q2, s2)
float(np.asarray(out).ravel()[0])
t0=time.perf_counter(); N=5
for _ in range(N):
    out, q1, s1, q2, s2 = f(g, q1, s1, q2, s2)
float(np.asarray(out).ravel()[0])
print(f"{shape} ({lead}x{minor}): {(time.perf_counter()-t0)/N*1e3:.1f} ms")
