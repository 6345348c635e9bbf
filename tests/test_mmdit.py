"""MMDiT (SD3-family) parity vs the independent torch oracle.

Same strategy as the UNet/SDXL families (tests/test_full_model_parity.py):
no SD3 weights or diffusers exist offline, so the JAX model is checked
against a from-scratch torch implementation of the published architecture
(arXiv:2403.03206; diffusers SD3Transformer2DModel naming) over the SAME
random parameters, plus a shape-template regression against the published
SD3-Medium parameter count.
"""

import numpy as np
import pytest
import torch

from scal_sdt_tpu.models.mmdit import (
    MMDiTConfig, init_mmdit_params, mmdit_apply, mmdit_param_shapes,
)

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from lab.torch_parity import mmdit_forward  # noqa: E402


def _to_torch(params):
    return {k: torch.from_numpy(np.asarray(v)) for k, v in params.items()}


def test_sd3_medium_param_count():
    shapes = mmdit_param_shapes(MMDiTConfig.sd3_medium())
    total = sum(int(np.prod(s)) for s in shapes.values())
    pos = int(np.prod(shapes["pos_embed.pos_embed"]))
    # ~2.03B learnable (the published "2B MMDiT"), + the fixed sincos table
    assert total - pos == 2_028_328_000
    # one qkv column must shard under tensor parallelism
    from scal_sdt_tpu.parallel.mesh import tp_dim

    assert tp_dim("unet.transformer_blocks.0.attn.to_q.weight",
                  shapes["transformer_blocks.0.attn.to_q.weight"], 2) == 0
    assert tp_dim("unet.transformer_blocks.0.attn.add_q_proj.weight",
                  shapes["transformer_blocks.0.attn.add_q_proj.weight"], 2) == 0


@pytest.mark.parametrize("qk_norm,dual", [(None, ()), ("rms_norm", ()),
                                          ("rms_norm", (0, 1))])
def test_mmdit_forward_parity_vs_torch(qk_norm, dual):
    import jax
    import jax.numpy as jnp

    config = MMDiTConfig(sample_size=8, patch_size=2, in_channels=4,
                         out_channels=4, num_layers=3, attention_head_dim=8,
                         num_attention_heads=2, joint_attention_dim=24,
                         pooled_projection_dim=20, pos_embed_max_size=12,
                         qk_norm=qk_norm, dual_attention_layers=dual)
    params = init_mmdit_params(jax.random.PRNGKey(0), config)
    # non-trivial qk-norm scales (init is ones)
    if qk_norm:
        rng = np.random.RandomState(3)
        for k in list(params):
            if ".norm_q." in k or ".norm_k." in k or ".norm_added" in k:
                params[k] = jnp.asarray(
                    1.0 + 0.3 * rng.randn(*params[k].shape), jnp.float32)

    rng = np.random.RandomState(0)
    latents = rng.randn(2, 8, 8, 4).astype(np.float32)
    context = rng.randn(2, 11, 24).astype(np.float32)
    pooled = rng.randn(2, 20).astype(np.float32)
    timesteps = np.asarray([37.0, 911.5], np.float32)

    out = np.asarray(mmdit_apply(params, jnp.asarray(latents),
                                 jnp.asarray(timesteps), jnp.asarray(context),
                                 jnp.asarray(pooled), config))
    out_torch = mmdit_forward(
        _to_torch(params), torch.from_numpy(latents).permute(0, 3, 1, 2),
        torch.from_numpy(timesteps), torch.from_numpy(context),
        torch.from_numpy(pooled), config)
    np.testing.assert_allclose(out, out_torch.permute(0, 2, 3, 1).numpy(),
                               rtol=2e-4, atol=2e-5)


def test_mmdit_pre_only_final_block_shapes():
    shapes = mmdit_param_shapes(MMDiTConfig.tiny())
    last = max(int(k.split(".")[1]) for k in shapes
               if k.startswith("transformer_blocks."))
    assert f"transformer_blocks.{last}.attn.to_add_out.weight" not in shapes
    assert f"transformer_blocks.{last}.ff_context.net.0.proj.weight" not in shapes
    # 2-param continuous adaLN on the final context stream
    d = MMDiTConfig.tiny().inner_dim
    assert shapes[f"transformer_blocks.{last}.norm1_context.linear.weight"] == (2 * d, d)
