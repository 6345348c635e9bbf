import os, time, functools, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax, jax.numpy as jnp, numpy as np
from scal_sdt_tpu.models.unet import UNetConfig, unet_param_shapes
from scal_sdt_tpu.training.quantized import _leaf_view
from scal_sdt_tpu.ops.adam8_fused import adam8_fused_update, BLOCK

mode = sys.argv[1]  # big | bigdedup | group
shapes = unet_param_shapes(UNetConfig.sd15())
big = []
for k, s in shapes.items():
    lead, minor, nb = _leaf_view(s)
    n = int(np.prod(s))
    if lead > 1 and n >= (1 << 18):
        big.append((k, (lead, minor), nb))

if mode == "bigdedup":
    seen = set(); big = [b for b in big if not (b[1] in seen or seen.add(b[1]))]
    print(f"distinct shapes: {len(big)}")

if mode == "group":
    # one call per distinct minor: stack along lead
    from collections import defaultdict
    groups = defaultdict(list)
    for k, (lead, minor), nb in big:
        groups[minor].append((k, lead))
    print(f"groups: {len(groups)}")
    rng = np.random.RandomState(0)
    gr = {m: jnp.asarray(rng.randn(sum(l for _, l in v), m).astype(np.float32) * 1e-3)
          for m, v in groups.items()}
    st = {m: (jnp.zeros((g.shape[0], -(-m // 256) * BLOCK), jnp.int8),
              jnp.zeros((g.shape[0], -(-m // 256)), jnp.float32),
              jnp.zeros((g.shape[0], -(-m // 256) * BLOCK), jnp.int8),
              jnp.zeros((g.shape[0], -(-m // 256)), jnp.float32))
          for m, g in gr.items()}

    @functools.partial(jax.jit, donate_argnums=(1,))
    def upd(gr, st):
        out, nst = {}, {}
        for m, g in gr.items():
            q1, s1, q2, s2 = st[m]
            o, a, b, c, d = adam8_fused_update(g, q1, s1, q2, s2,
                jnp.float32(10.0), jnp.float32(1000.0), b1=0.9, b2=0.999, eps=1e-8)
            out[m] = o; nst[m] = (a, b, c, d)
        return out, nst

    for _ in range(2):
        out, st = upd(gr, st); float(np.asarray(out[1280]).ravel()[0])
    t0 = time.perf_counter(); N = 20
    for _ in range(N):
        out, st = upd(gr, st)
    float(np.asarray(out[1280]).ravel()[0])
    print(f"group ({len(gr)} calls): {(time.perf_counter()-t0)/N*1e3:.1f} ms")
    sys.exit()

rng = np.random.RandomState(0)
gr = {k: jnp.asarray(rng.randn(*shp).astype(np.float32) * 1e-3) for k, shp, nb in big}
st = {k: (jnp.zeros((shp[0], nb * BLOCK), jnp.int8),
          jnp.zeros((shp[0], nb), jnp.float32),
          jnp.zeros((shp[0], nb * BLOCK), jnp.int8),
          jnp.zeros((shp[0], nb), jnp.float32)) for k, shp, nb in big}

@functools.partial(jax.jit, donate_argnums=(1,))
def upd(gr, st):
    out, nst = {}, {}
    for k, g in gr.items():
        q1, s1, q2, s2 = st[k]
        o, a, b, c, d = adam8_fused_update(g, q1, s1, q2, s2,
            jnp.float32(10.0), jnp.float32(1000.0), b1=0.9, b2=0.999, eps=1e-8)
        out[k] = o; nst[k] = (a, b, c, d)
    return out, nst

k0 = big[0][0]
for _ in range(2):
    out, st = upd(gr, st); float(np.asarray(out[k0]).ravel()[0])
t0 = time.perf_counter(); N = 20
for _ in range(N):
    out, st = upd(gr, st)
float(np.asarray(out[k0]).ravel()[0])
print(f"{mode} ({len(big)} calls): {(time.perf_counter()-t0)/N*1e3:.1f} ms")
