import os, time, functools, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax, jax.numpy as jnp, numpy as np
import optax
from scal_sdt_tpu.models.unet import UNetConfig, unet_param_shapes
from scal_sdt_tpu.training.quantized import _leaf_view, scale_by_adam_8bit

mode = sys.argv[1]  # plain | tx8
shapes = unet_param_shapes(UNetConfig.sd15())
small = {}
for k, s in shapes.items():
    lead, minor, nb = _leaf_view(s)
    if not (lead > 1 and lead * minor >= (1 << 18)):
        small[k] = s
print(f"{len(small)} small leaves, {sum(int(np.prod(s)) for s in small.values())/1e6:.1f}M params")

rng = np.random.RandomState(0)
grads = {k: jnp.asarray(rng.randn(*s).astype(np.float32) * 1e-3) for k, s in small.items()}
params = {k: jnp.zeros(s, jnp.float32) for k, s in small.items()}
tx = optax.scale_by_adam() if mode == "plain" else scale_by_adam_8bit()
state = jax.jit(tx.init)(params)
del params

@functools.partial(jax.jit, donate_argnums=(1,))
def upd(grads, state):
    return tx.update(grads, state)

k0 = next(iter(small))
for _ in range(2):
    u, state = upd(grads, state); float(np.asarray(u[k0]).ravel()[0])
t0 = time.perf_counter(); N = 20
for _ in range(N):
    u, state = upd(grads, state)
float(np.asarray(u[k0]).ravel()[0])
print(f"small-only {mode}: {(time.perf_counter()-t0)/N*1e3:.1f} ms")
