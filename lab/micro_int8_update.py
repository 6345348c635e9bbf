import os, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax, jax.numpy as jnp, numpy as np
from scal_sdt_tpu.models.unet import UNetConfig, unet_param_shapes
from scal_sdt_tpu.training.quantized import scale_by_adam_8bit

shapes = unet_param_shapes(UNetConfig.sd15())
rng = np.random.RandomState(0)
params = {k: jnp.zeros(s, jnp.float32) for k, s in shapes.items()}
tx = scale_by_adam_8bit()
state = jax.jit(tx.init)(params)
del params
grads = {k: jnp.asarray(rng.randn(*s).astype(np.float32) * 1e-3) for k, s in shapes.items()}

@functools.partial(jax.jit, donate_argnums=(1,))
def upd(grads, state):
    return tx.update(grads, state)

for _ in range(2):
    u, state = upd(grads, state); float(np.asarray(u["conv_in.weight"]).ravel()[0])
t0=time.perf_counter(); N=20
for _ in range(N):
    u, state = upd(grads, state)
float(np.asarray(u["conv_in.weight"]).ravel()[0])
print(f"int8 update (fused={os.environ.get('SSDT_INT8_FUSED','1')},min={os.environ.get('SSDT_INT8_FUSED_MIN','262144')}): {(time.perf_counter()-t0)/N*1e3:.1f} ms")
