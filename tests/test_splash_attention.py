"""Splash-attention wrapper: block picking (CPU) + kernel numerics (TPU).

The numeric tests self-skip off-TPU (the kernel only lowers on TPU); they
were also driven on the real v5e chip this round (fwd <=2e-3 abs, grads
<=1.5e-2 rel vs the XLA reference at bf16 — see PERF_NOTES.md).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scal_sdt_tpu.ops.splash import pick_block

on_tpu = jax.default_backend() == "tpu"


def test_pick_block_divisible():
    assert pick_block(4096, 1024) == 1024
    assert pick_block(1024, 1024) == 1024
    assert pick_block(2048, 512) == 512


def test_pick_block_non_divisible_falls_through():
    # ARB bucket lengths are multiples of 64, not always of a usable block
    assert pick_block(4032, 1024) is None     # 63*64: only 64 divides
    assert pick_block(4480, 512) == 128       # 35*128: a small block divides
    assert pick_block(1344, 512) is None


def test_pick_block_minimum_128():
    assert pick_block(384, 512) == 128
    assert pick_block(100, 512) is None


@pytest.mark.skipif(not on_tpu, reason="splash kernel lowers on TPU only")
@pytest.mark.parametrize("shape", [(2, 8, 1024, 40), (1, 8, 2048, 80)])
def test_splash_matches_xla_on_tpu(shape):
    from scal_sdt_tpu.ops.attention import _attention_xla
    from scal_sdt_tpu.ops.splash import splash_attention

    b, h, l, d = shape
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, shape, jnp.bfloat16) for kk in ks)
    scale = d ** -0.5
    o1 = jax.jit(lambda q, k, v: splash_attention(q, k, v, scale, 512, 512)
                 .astype(jnp.float32))(q, k, v)
    o2 = jax.jit(lambda q, k, v: _attention_xla(q, k, v, scale)
                 .astype(jnp.float32))(q, k, v)
    assert float(jnp.max(jnp.abs(o1 - o2))) < 5e-3


@pytest.mark.skipif(not on_tpu, reason="splash kernel lowers on TPU only")
def test_padded_splash_matches_xla_on_tpu():
    from scal_sdt_tpu.ops.attention import _attention_xla
    from scal_sdt_tpu.ops.splash import splash_attention_padded

    b, h, l, d = 1, 8, 1344, 40    # not divisible by any usable block
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q, k, v = (jax.random.normal(kk, (b, h, l, d), jnp.bfloat16) for kk in ks)
    scale = d ** -0.5
    o1 = jax.jit(lambda q, k, v: splash_attention_padded(q, k, v, scale, 512)
                 .astype(jnp.float32))(q, k, v)
    o2 = jax.jit(lambda q, k, v: _attention_xla(q, k, v, scale)
                 .astype(jnp.float32))(q, k, v)
    assert float(jnp.max(jnp.abs(o1 - o2))) < 5e-3
