"""Shared test fixtures: tiny models, synthetic image datasets, tiny configs."""

from __future__ import annotations

from pathlib import Path

import numpy as np

from scal_sdt_tpu.conf import Config, load_with_defaults, merge, default
from scal_sdt_tpu.convert.loader import LoadedModels
from scal_sdt_tpu.diffusion.schedule import NoiseSchedule
from scal_sdt_tpu.models.clip import CLIPTextConfig, init_clip_params
from scal_sdt_tpu.models.unet import UNetConfig, init_unet_params
from scal_sdt_tpu.models.vae import VAEConfig, init_vae_params


def tiny_models(seed: int = 0, vocab_size: int = 49408) -> LoadedModels:
    import jax

    unet_config = UNetConfig.tiny()
    vae_config = VAEConfig.tiny()
    clip_config = CLIPTextConfig(
        vocab_size=vocab_size, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, max_position_embeddings=77)
    rng = jax.random.PRNGKey(seed)
    r1, r2, r3 = jax.random.split(rng, 3)
    to_np = lambda d: {k: np.asarray(v) for k, v in d.items()}
    return LoadedModels(
        unet=to_np(init_unet_params(r1, unet_config)),
        unet_config=unet_config,
        vae=to_np(init_vae_params(r2, vae_config)),
        vae_config=vae_config,
        clip=to_np(init_clip_params(r3, clip_config)),
        clip_config=clip_config,
        schedule=NoiseSchedule(),
    )


def tiny_sdxl_models(seed: int = 0, vocab_size: int = 49408) -> LoadedModels:
    """SDXL-shaped tiny pair: text_time UNet + two text towers (tower 2
    with a pooled projection head matching the UNet's text_embeds width)."""
    import jax

    unet_config = UNetConfig.tiny_sdxl()
    vae_config = VAEConfig.tiny()
    # concat(penult1, penult2) must equal cross_attention_dim (64): 32 + 32
    clip_config = CLIPTextConfig(
        vocab_size=vocab_size, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, max_position_embeddings=77)
    clip2_config = CLIPTextConfig(
        vocab_size=vocab_size, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, max_position_embeddings=77,
        hidden_act="gelu", projection_dim=32)
    rng = jax.random.PRNGKey(seed)
    r1, r2, r3, r4 = jax.random.split(rng, 4)
    to_np = lambda d: {k: np.asarray(v) for k, v in d.items()}
    return LoadedModels(
        unet=to_np(init_unet_params(r1, unet_config)),
        unet_config=unet_config,
        vae=to_np(init_vae_params(r2, vae_config)),
        vae_config=vae_config,
        clip=to_np(init_clip_params(r3, clip_config)),
        clip_config=clip_config,
        schedule=NoiseSchedule(),
        clip2=to_np(init_clip_params(r4, clip2_config)),
        clip2_config=clip2_config,
    )


def tiny_sd3_models(seed: int = 0, vocab_size: int = 49408,
                    with_t5: bool = True) -> LoadedModels:
    """SD3-shaped tiny triple: MMDiT + two projected CLIP towers + T5.

    Dims satisfy the SD3 conditioning contract: concat(clip hidden) <=
    joint_attention_dim == t5 d_model; pooled_projection_dim == concat of
    the two projection_dims."""
    import jax

    from scal_sdt_tpu.diffusion.flow import FlowSchedule
    from scal_sdt_tpu.models.mmdit import MMDiTConfig, init_mmdit_params
    from scal_sdt_tpu.models.t5 import T5Config, init_t5_params

    mmdit_config = MMDiTConfig(
        sample_size=8, patch_size=2, in_channels=4, out_channels=4,
        num_layers=2, attention_head_dim=8, num_attention_heads=2,
        joint_attention_dim=32, pooled_projection_dim=24,
        pos_embed_max_size=12)
    vae_config = VAEConfig(block_out_channels=(16, 32), layers_per_block=1,
                           norm_num_groups=8, scaling_factor=1.5305,
                           shift_factor=0.0609)
    clip_kwargs = dict(vocab_size=vocab_size, hidden_size=16,
                       intermediate_size=32, num_hidden_layers=2,
                       num_attention_heads=2, max_position_embeddings=77,
                       projection_dim=12)
    clip_config = CLIPTextConfig(**clip_kwargs)
    clip2_config = CLIPTextConfig(**{**clip_kwargs, "hidden_act": "gelu"})
    t5_config = T5Config(vocab_size=vocab_size, d_model=32, d_kv=8, d_ff=48,
                         num_layers=2, num_heads=2,
                         feed_forward_proj="gated-gelu")
    rng = jax.random.PRNGKey(seed)
    r1, r2, r3, r4, r5 = jax.random.split(rng, 5)
    to_np = lambda d: {k: np.asarray(v) for k, v in d.items()}
    return LoadedModels(
        unet=to_np(init_mmdit_params(r1, mmdit_config)),
        unet_config=None,
        vae=to_np(init_vae_params(r2, vae_config)),
        vae_config=vae_config,
        clip=to_np(init_clip_params(r3, clip_config)),
        clip_config=clip_config,
        schedule=FlowSchedule(shift=3.0),
        clip2=to_np(init_clip_params(r4, clip2_config)),
        clip2_config=clip2_config,
        mmdit_config=mmdit_config,
        t5=to_np(init_t5_params(r5, t5_config)) if with_t5 else None,
        t5_config=t5_config if with_t5 else None,
    )


def write_diffusers_dir(models: LoadedModels, path: Path,
                        scheduler_overrides: dict | None = None) -> Path:
    """Write LoadedModels out as a diffusers-layout directory, so tests can
    exercise the real load path (convert/loader.load_diffusers_dir) including
    scheduler_config.json -> NoiseSchedule wiring."""
    import json

    from scal_sdt_tpu.utils.state import save_state_dict

    path = Path(path)
    if models.is_sd3:
        return _write_sd3_diffusers_dir(models, path, scheduler_overrides)
    u, v, c = models.unet_config, models.vae_config, models.clip_config
    spec = {
        "unet": (models.unet, {
            "in_channels": u.in_channels, "out_channels": u.out_channels,
            "block_out_channels": list(u.block_out_channels),
            "layers_per_block": u.layers_per_block,
            "num_attention_heads": u.num_attention_heads,
            "cross_attention_dim": u.cross_attention_dim,
            "down_block_types": list(u.down_block_types),
            "up_block_types": list(u.up_block_types),
            "norm_num_groups": u.norm_num_groups,
            "sample_size": u.sample_size,
            **({"transformer_layers_per_block":
                    list(u.transformer_layers_per_block)
                    if isinstance(u.transformer_layers_per_block, (list, tuple))
                    else u.transformer_layers_per_block,
                "use_linear_projection": u.use_linear_projection,
                "addition_embed_type": u.addition_embed_type,
                "addition_time_embed_dim": u.addition_time_embed_dim,
                "projection_class_embeddings_input_dim":
                    u.projection_class_embeddings_input_dim}
               if u.addition_embed_type else {}),
        }),
        "vae": (models.vae, {
            "in_channels": v.in_channels, "out_channels": v.out_channels,
            "latent_channels": v.latent_channels,
            "block_out_channels": list(v.block_out_channels),
            "layers_per_block": v.layers_per_block,
            "norm_num_groups": v.norm_num_groups,
            "scaling_factor": v.scaling_factor,
        }),
        "text_encoder": (models.clip, {
            "vocab_size": c.vocab_size, "hidden_size": c.hidden_size,
            "intermediate_size": c.intermediate_size,
            "num_hidden_layers": c.num_hidden_layers,
            "num_attention_heads": c.num_attention_heads,
            "max_position_embeddings": c.max_position_embeddings,
        }),
    }
    if models.clip2 is not None:
        c2 = models.clip2_config
        spec["text_encoder_2"] = (models.clip2, {
            "vocab_size": c2.vocab_size, "hidden_size": c2.hidden_size,
            "intermediate_size": c2.intermediate_size,
            "num_hidden_layers": c2.num_hidden_layers,
            "num_attention_heads": c2.num_attention_heads,
            "max_position_embeddings": c2.max_position_embeddings,
            "hidden_act": c2.hidden_act,
            "projection_dim": c2.projection_dim,
            "eos_token_id": c2.eos_token_id,
        })
    for comp, (state, cfg) in spec.items():
        d = path / comp
        d.mkdir(parents=True, exist_ok=True)
        save_state_dict({k: np.asarray(val) for k, val in state.items()},
                        d / "diffusion_pytorch_model.safetensors")
        (d / "config.json").write_text(json.dumps(cfg))
    sched_dir = path / "scheduler"
    sched_dir.mkdir(parents=True, exist_ok=True)
    sched = {
        "num_train_timesteps": models.schedule.num_train_timesteps,
        "beta_start": models.schedule.beta_start,
        "beta_end": models.schedule.beta_end,
        "beta_schedule": models.schedule.beta_schedule,
        "prediction_type": models.schedule.prediction_type,
        "steps_offset": models.schedule.steps_offset,
        "clip_sample": models.schedule.clip_sample,
        "set_alpha_to_one": models.schedule.set_alpha_to_one,
    }
    sched.update(scheduler_overrides or {})
    (sched_dir / "scheduler_config.json").write_text(json.dumps(sched))
    return path


def _write_sd3_diffusers_dir(models: LoadedModels, path: Path,
                             scheduler_overrides: dict | None = None) -> Path:
    import json

    from scal_sdt_tpu.utils.state import save_state_dict

    m, v = models.mmdit_config, models.vae_config

    def clip_cfg(c):
        return {
            "vocab_size": c.vocab_size, "hidden_size": c.hidden_size,
            "intermediate_size": c.intermediate_size,
            "num_hidden_layers": c.num_hidden_layers,
            "num_attention_heads": c.num_attention_heads,
            "max_position_embeddings": c.max_position_embeddings,
            "hidden_act": c.hidden_act, "projection_dim": c.projection_dim,
            "eos_token_id": c.eos_token_id,
        }

    spec = {
        "transformer": (models.unet, {
            "sample_size": m.sample_size, "patch_size": m.patch_size,
            "in_channels": m.in_channels, "out_channels": m.out_channels,
            "num_layers": m.num_layers,
            "attention_head_dim": m.attention_head_dim,
            "num_attention_heads": m.num_attention_heads,
            "joint_attention_dim": m.joint_attention_dim,
            "pooled_projection_dim": m.pooled_projection_dim,
            "pos_embed_max_size": m.pos_embed_max_size,
            **({"qk_norm": m.qk_norm} if m.qk_norm else {}),
        }),
        "vae": (models.vae, {
            "in_channels": v.in_channels, "out_channels": v.out_channels,
            "latent_channels": v.latent_channels,
            "block_out_channels": list(v.block_out_channels),
            "layers_per_block": v.layers_per_block,
            "norm_num_groups": v.norm_num_groups,
            "scaling_factor": v.scaling_factor,
            "shift_factor": v.shift_factor,
        }),
        "text_encoder": (models.clip, clip_cfg(models.clip_config)),
        "text_encoder_2": (models.clip2, clip_cfg(models.clip2_config)),
    }
    if models.t5 is not None:
        t = models.t5_config
        spec["text_encoder_3"] = (models.t5, {
            "vocab_size": t.vocab_size, "d_model": t.d_model,
            "d_kv": t.d_kv, "d_ff": t.d_ff, "num_layers": t.num_layers,
            "num_heads": t.num_heads,
            "relative_attention_num_buckets": t.relative_attention_num_buckets,
            "relative_attention_max_distance": t.relative_attention_max_distance,
            "feed_forward_proj": t.feed_forward_proj,
        })
    for comp, (state, cfg) in spec.items():
        d = path / comp
        d.mkdir(parents=True, exist_ok=True)
        save_state_dict({k: np.asarray(val) for k, val in state.items()},
                        d / "diffusion_pytorch_model.safetensors")
        (d / "config.json").write_text(json.dumps(cfg))
    sched_dir = path / "scheduler"
    sched_dir.mkdir(parents=True, exist_ok=True)
    sched = {
        "_class_name": "FlowMatchEulerDiscreteScheduler",
        "num_train_timesteps": models.schedule.num_train_timesteps,
        "shift": models.schedule.shift,
    }
    sched.update(scheduler_overrides or {})
    (sched_dir / "scheduler_config.json").write_text(json.dumps(sched))
    return path


def make_image_dataset(tmp_path: Path, n: int = 8, size=(64, 48)) -> Path:
    """Write n small PNGs with .txt captions."""
    from PIL import Image

    d = tmp_path / "data"
    d.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(n):
        arr = rng.randint(0, 255, (size[1], size[0], 3), np.uint8)
        Image.fromarray(arr).save(d / f"img_{i}.png")
        (d / f"img_{i}.txt").write_text(f"a photo number {i}")
    return d


def tiny_config(data_dir: Path, output_dir: Path, **overrides) -> Config:
    cfg = default()
    user = Config({
        "model": None,
        "output_dir": str(output_dir),
        "batch_size": 2,
        "seed": 42,
        "data": {
            "resolution": 32,
            "concepts": [{"instance_set": {"path": str(data_dir), "prompt": "{TXT_PROMPT}"}}],
        },
        "trainer": {
            "precision": 32,
            "max_epochs": 1,
            "mesh": {"data": 2, "fsdp": 4},
        },
        "optimizer": {
            "name": "adamw",
            "params": {"lr": 1e-4, "beta1": 0.9, "beta2": 0.999,
                       "weight_decay": 1e-2, "eps": 1e-8},
            "lr_scale": {"enabled": False},
        },
        "checkpoint": {"filename": "step{step}", "every_n_epochs": None},
    })
    return merge(cfg, user, Config(overrides))


def make_t5_tokenizer_file(path: Path) -> Path:
    """Synthetic T5-style Unigram tokenizer.json (HF `tokenizers` format):
    Metaspace pre-tokenization, </s> (id 1) appended, <pad> id 0 — the same
    contract as the real SD3 tokenizer_3 assets."""
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, processors

    pieces = [("<pad>", 0.0), ("</s>", 0.0), ("<unk>", -10.0)]
    words = ["a", "photo", "number", "of", "the", "cat", "dog", "and"]
    pieces += [(f"▁{w}", -float(i + 1)) for i, w in enumerate(words)]
    pieces += [(ch, -20.0) for ch in
               "abcdefghijklmnopqrstuvwxyz0123456789▁"]
    tok = Tokenizer(models.Unigram(pieces, unk_id=2))
    tok.pre_tokenizer = pre_tokenizers.Metaspace()
    tok.decoder = decoders.Metaspace()
    tok.post_processor = processors.TemplateProcessing(
        single="$A </s>", pair="$A </s> $B </s>",
        special_tokens=[("</s>", 1)])
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tok.save(str(path))
    return path
