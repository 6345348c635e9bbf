"""Analytic FLOP counter (utils/flops.py) — MFU numerator for bench.py."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import pytest
from jax import lax

sys.path.insert(0, str(Path(__file__).parent))

from scal_sdt_tpu.utils.flops import count_matmul_conv_flops, train_step_flops


def test_matmul_exact():
    a = jax.ShapeDtypeStruct((4, 8), jnp.float32)
    b = jax.ShapeDtypeStruct((8, 16), jnp.float32)
    assert count_matmul_conv_flops(lambda a, b: a @ b, a, b) == 2 * 4 * 8 * 16


def test_batched_dot_general_exact():
    a = jax.ShapeDtypeStruct((3, 5, 7), jnp.float32)
    b = jax.ShapeDtypeStruct((3, 7, 11), jnp.float32)
    f = count_matmul_conv_flops(lambda a, b: jnp.einsum("bmk,bkn->bmn", a, b),
                                a, b)
    assert f == 2 * 3 * 5 * 7 * 11


def test_conv_exact():
    x = jax.ShapeDtypeStruct((2, 8, 8, 3), jnp.float32)
    k = jax.ShapeDtypeStruct((3, 3, 3, 5), jnp.float32)
    f = count_matmul_conv_flops(
        lambda x, k: lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")),
        x, k)
    assert f == 2 * (2 * 8 * 8 * 5) * 9 * 3


def test_scan_multiplies_by_length():
    a = jax.ShapeDtypeStruct((4, 4), jnp.float32)

    def fn(a):
        def body(c, _):
            return c @ c, None

        out, _ = lax.scan(body, a, None, length=7)
        return out

    assert count_matmul_conv_flops(fn, a) == 7 * 2 * 4 * 4 * 4


def test_jit_and_grad_traverse():
    a = jax.ShapeDtypeStruct((6, 6), jnp.float32)
    fwd = count_matmul_conv_flops(lambda a: (a @ a).sum(), a)
    bwd = count_matmul_conv_flops(jax.jit(jax.grad(lambda a: (a @ a).sum())), a)
    assert fwd == 2 * 6 ** 3
    # d(a@a)/da contributes two matmuls
    assert bwd >= 2 * fwd


def test_unet_train_step_flops_scales_with_batch():
    from scal_sdt_tpu.models.unet import UNetConfig

    cfg = UNetConfig.tiny()
    f1 = train_step_flops(cfg, batch=1, latent_hw=16)
    f4 = train_step_flops(cfg, batch=4, latent_hw=16)
    assert f1 > 0
    assert f4 == pytest.approx(4 * f1, rel=1e-9)


def test_sd15_step_flops_magnitude():
    """SD1.5 full step at batch 8, 64² latents: published per-image UNet
    forward counts are ~0.6-0.9 TFLOPs (677 GFLOPs @ 512² is the commonly
    cited figure); 3x fwd x batch 8 puts the step in the 14-25 TFLOPs band."""
    from scal_sdt_tpu.models.unet import UNetConfig

    f = train_step_flops(UNetConfig.sd15(), batch=8, latent_hw=64)
    assert 14e12 < f < 25e12, f
