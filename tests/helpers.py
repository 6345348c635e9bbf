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
