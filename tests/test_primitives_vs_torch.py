"""Numerical parity of functional primitives against torch ops.

The UNet/VAE/CLIP forward passes are compositions of these primitives with
torch-layout weights, so primitive-level parity + structure tests
(param-count exactness vs diffusers/transformers) gives model-level parity
without diffusers being installed in this image.
"""

import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from scal_sdt_tpu.models import functional as fn

RTOL = 2e-5
ATOL = 2e-5


def _np(x):
    return np.asarray(x)


def test_linear_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(3, 7, 16).astype(np.float32)
    w = rng.randn(24, 16).astype(np.float32)
    b = rng.randn(24).astype(np.float32)
    p = {"m.weight": jnp.asarray(w), "m.bias": jnp.asarray(b)}
    ours = _np(fn.linear(p, "m", jnp.asarray(x)))
    theirs = F.linear(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("stride,padding", [(1, 1), (2, 1), (1, 0)])
def test_conv2d_matches_torch(stride, padding):
    rng = np.random.RandomState(1)
    x = rng.randn(2, 8, 8, 6).astype(np.float32)          # NHWC
    w = rng.randn(12, 6, 3, 3).astype(np.float32)          # OIHW
    b = rng.randn(12).astype(np.float32)
    p = {"c.weight": jnp.asarray(w), "c.bias": jnp.asarray(b)}
    ours = _np(fn.conv2d(p, "c", jnp.asarray(x), stride=stride, padding=padding))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    theirs = F.conv2d(xt, torch.from_numpy(w), torch.from_numpy(b),
                      stride=stride, padding=padding).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=RTOL, atol=ATOL)


def test_group_norm_matches_torch():
    rng = np.random.RandomState(2)
    x = rng.randn(2, 5, 5, 32).astype(np.float32)
    w = rng.randn(32).astype(np.float32)
    b = rng.randn(32).astype(np.float32)
    p = {"n.weight": jnp.asarray(w), "n.bias": jnp.asarray(b)}
    ours = _np(fn.group_norm(p, "n", jnp.asarray(x), groups=8, eps=1e-5))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    theirs = F.group_norm(xt, 8, torch.from_numpy(w), torch.from_numpy(b), eps=1e-5)
    theirs = theirs.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_layer_norm_matches_torch():
    rng = np.random.RandomState(3)
    x = rng.randn(4, 7, 24).astype(np.float32)
    w = rng.randn(24).astype(np.float32)
    b = rng.randn(24).astype(np.float32)
    p = {"n.weight": jnp.asarray(w), "n.bias": jnp.asarray(b)}
    ours = _np(fn.layer_norm(p, "n", jnp.asarray(x)))
    theirs = F.layer_norm(torch.from_numpy(x), (24,), torch.from_numpy(w), torch.from_numpy(b)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_gelu_variants_match_torch():
    x = np.linspace(-4, 4, 101, dtype=np.float32)
    np.testing.assert_allclose(
        _np(fn.gelu(jnp.asarray(x))), F.gelu(torch.from_numpy(x)).numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        _np(fn.quick_gelu(jnp.asarray(x))),
        (torch.from_numpy(x) * torch.sigmoid(1.702 * torch.from_numpy(x))).numpy(),
        rtol=1e-5, atol=1e-6)


def test_attention_matches_torch_sdpa():
    from scal_sdt_tpu.ops.attention import multi_head_attention

    rng = np.random.RandomState(4)
    b, lq, lk, heads, dim = 2, 16, 9, 4, 32
    q = rng.randn(b, lq, dim).astype(np.float32)
    k = rng.randn(b, lk, dim).astype(np.float32)
    v = rng.randn(b, lk, dim).astype(np.float32)
    ours = _np(multi_head_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), heads))

    def split(x, l):
        return torch.from_numpy(x).reshape(b, l, heads, dim // heads).permute(0, 2, 1, 3)

    theirs = F.scaled_dot_product_attention(split(q, lq), split(k, lk), split(v, lk))
    theirs = theirs.permute(0, 2, 1, 3).reshape(b, lq, dim).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_causal_attention_matches_torch():
    from scal_sdt_tpu.ops.attention import multi_head_attention

    rng = np.random.RandomState(5)
    b, l, heads, dim = 2, 11, 2, 16
    q = rng.randn(b, l, dim).astype(np.float32)
    k = rng.randn(b, l, dim).astype(np.float32)
    v = rng.randn(b, l, dim).astype(np.float32)
    ours = _np(multi_head_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), heads, causal=True))

    def split(x):
        return torch.from_numpy(x).reshape(b, l, heads, dim // heads).permute(0, 2, 1, 3)

    theirs = F.scaled_dot_product_attention(split(q), split(k), split(v), is_causal=True)
    theirs = theirs.permute(0, 2, 1, 3).reshape(b, l, dim).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_timestep_embedding_matches_diffusers_formula():
    # Independent reimplementation of get_timestep_embedding for SD settings.
    t = np.array([0, 1, 999], dtype=np.float32)
    dim = 320
    half = dim // 2
    freqs = np.exp(-np.log(10000.0) * np.arange(half, dtype=np.float32) / half)
    args = t[:, None] * freqs[None, :]
    expected = np.concatenate([np.cos(args), np.sin(args)], axis=-1)  # flip_sin_to_cos
    ours = _np(fn.timestep_embedding(jnp.asarray(t), dim))
    # atol covers fp32 sin/cos range-reduction differences at large t
    np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=2e-4)
