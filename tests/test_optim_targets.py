"""Optim-target resolution on real SD1.5 param names.

Checks the exact selection semantics of the reference's module-tree specs
(modules/utils/torch/module.py:14-63) resolved over flat param keys: the
shipped specs must pick out the same module sets (full UNet / LoRA attn+ff /
Custom Diffusion KV-only).
"""

from scal_sdt_tpu.conf import load_optim_target
from scal_sdt_tpu.models.clip import CLIPTextConfig, clip_param_shapes
from scal_sdt_tpu.models.unet import UNetConfig, unet_param_shapes
from scal_sdt_tpu.training.optim_targets import resolve_optim_target

UNET_KEYS = list(unet_param_shapes(UNetConfig.sd15()))
CLIP_KEYS = list(clip_param_shapes(CLIPTextConfig.vit_l()))


def test_full_unet_selects_everything():
    res = resolve_optim_target(load_optim_target("full_unet"), UNET_KEYS, CLIP_KEYS)
    assert sorted(res["unet"].trainable) == sorted(UNET_KEYS)
    assert not res["text_encoder"].any_trainable
    assert not res["unet"].lora


def test_custom_diffusion_selects_cross_attn_kv_only():
    res = resolve_optim_target(load_optim_target("custom_diffusion"), UNET_KEYS, CLIP_KEYS)
    keys = res["unet"].trainable
    assert keys, "custom_diffusion selected nothing"
    for k in keys:
        assert ".attn2." in k, k
        assert k.endswith("to_k.weight") or k.endswith("to_v.weight"), k
    # 7 selected blocks: down 0-2 (2 attns each), mid (1), up 1-3 (3 each) = 16 attn modules
    assert len(keys) == 16 * 2


def test_lora_spec_targets_and_groups():
    res = resolve_optim_target(load_optim_target("lora"), UNET_KEYS, CLIP_KEYS)
    unet = res["unet"]
    assert unet.lora, "lora spec produced no unet LoRA modules"
    for path, spec in unet.lora.items():
        assert spec.rank == 16 and spec.alpha == 1
        leaf = path.rsplit(".", 1)[-1]
        assert leaf in {"to_q", "to_k", "to_v", "0", "proj", "proj_in", "proj_out", "net"} \
            or path.endswith("ff.net.2"), path
    # trainable keys are only LoRA factors
    assert all(k.endswith(".lora_A") or k.endswith(".lora_B") for k in unet.trainable)

    te = res["text_encoder"]
    assert te.lora
    for path in te.lora:
        assert path.startswith("text_model.encoder.layers."), path
    # per-component optimizer overrides flow into groups
    unet_lrs = {g.optimizer.get("lr") for g in unet.groups}
    te_lrs = {g.optimizer.get("lr") for g in te.groups}
    assert unet_lrs == {5e-4}
    assert te_lrs == {5e-3}

    # 16 attn modules x (attn1+attn2) x 4 projections... known totals:
    # down blocks 0-2: 2 attns each = 6; mid: 1; up 1-3: 3 each = 9 -> 16 transformer blocks
    # per block: attn1(4) + attn2(4) + ff(2) = 10 linear + proj_in/proj_out per attention module (2)
    assert len(unet.lora) == 16 * 10 + 16 * 2


def test_lora_no_te_leaves_text_encoder_frozen():
    res = resolve_optim_target(load_optim_target("lora_no-te"), UNET_KEYS, CLIP_KEYS)
    assert res["unet"].lora
    assert not res["text_encoder"].any_trainable


def test_lora_factor_shapes_and_kohya_export():
    import numpy as np
    import jax

    from scal_sdt_tpu.cli.ckpt_tool import to_kohya_format
    from scal_sdt_tpu.training.lora import init_lora_params

    res = resolve_optim_target(load_optim_target("lora_custom_diffusion"), UNET_KEYS, CLIP_KEYS)
    base = {k: np.zeros(unet_param_shapes(UNetConfig.sd15())[k], np.float32)
            for k in UNET_KEYS}
    lora = init_lora_params(jax.random.PRNGKey(0), base, res["unet"].lora)
    # rank-16 factors on 2D linears
    some = next(iter(res["unet"].lora))
    assert lora[f"{some}.lora_A"].shape[0] == 16
    assert lora[f"{some}.lora_B"].shape[1] == 16
    assert lora[f"{some}.lora_alpha"].dtype.name == "int32"

    kohya = to_kohya_format({k: np.asarray(v) for k, v in lora.items()}, "lora_unet")
    downs = [k for k in kohya if k.endswith(".lora_down.weight")]
    ups = [k for k in kohya if k.endswith(".lora_up.weight")]
    alphas = [k for k in kohya if k.endswith(".alpha")]
    assert len(downs) == len(ups) == len(alphas) == len(res["unet"].lora)
    assert all(k.startswith("lora_unet_") and "." not in k.split(".")[0].replace("lora_unet", "x")
               for k in downs)
    sample = "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn2_to_k.lora_down.weight"
    assert sample in kohya
