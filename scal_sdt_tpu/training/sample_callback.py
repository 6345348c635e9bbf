"""In-training sampling (reference: modules/sample_callback.py).

Every ``sampling.interval_steps`` optimizer steps, process zero generates
``num_samples`` images per configured concept with the jitted DDIM loop and
writes PNGs to ``run_dir/samples/<step>/``, optionally logging a gallery to
WandB. LoRA factors in the live param dict are consumed directly by the
UNet forward, so samples always reflect the current adapters.
"""

from __future__ import annotations

import logging
from pathlib import Path

import jax
import numpy as np

from ..diffusion.sampler import SamplerSpec, sample_images
from ..models.functional import sub_params
from .step import TE2_PREFIX, TE_PREFIX, UNET_PREFIX, VAE_PREFIX

logger = logging.getLogger("sampling")


class SampleCallback:
    def __init__(self, sample_dir: Path):
        self.sample_dir = Path(sample_dir)

    def __call__(self, trainer, global_step: int):
        sampling = trainer.config.get("sampling")
        if (sampling is None or not sampling.get("concepts")
                or global_step % int(sampling.interval_steps) != 0
                or jax.process_index() != 0):
            return

        from PIL import Image

        merged = trainer.merged_inference_params()
        unet_params = sub_params(merged, UNET_PREFIX)
        vae_params = sub_params(merged, VAE_PREFIX)
        clip_params = sub_params(merged, TE_PREFIX)
        clip2_params = (sub_params(merged, TE2_PREFIX)
                        if trainer.models.clip2 is not None else None)
        from ..training.step import TE3_PREFIX

        t5_params = (sub_params(merged, TE3_PREFIX)
                     if getattr(trainer.models, "t5", None) is not None
                     else None)

        spec = SamplerSpec(
            unet_config=trainer.models.unet_config,
            vae_config=trainer.models.vae_config,
            clip_config=trainer.models.clip_config,
            schedule=trainer.models.schedule,
            clip_stop_at_layer=int(trainer.config.get("clip_stop_at_layer", 1)),
            clip2_config=trainer.models.clip2_config,
            mmdit_config=trainer.models.mmdit_config,
            t5_config=(trainer.models.t5_config
                       if getattr(trainer.models, "t5", None) is not None
                       else None),
        )

        save_dir = self.sample_dir / str(global_step)
        save_dir.mkdir(parents=True, exist_ok=True)
        batch_size = int(sampling.get("batch_size", 1))
        galleries = {}

        for ci, concept in enumerate(sampling.concepts):
            remaining = int(concept.get("num_samples", 1))
            seed = int(concept.get("seed", 0))
            images = []
            while remaining > 0:
                n = min(batch_size, remaining)
                out = sample_images(
                    unet_params, vae_params, clip_params, trainer.tokenizer,
                    prompts=[concept.prompt] * n,
                    negative_prompt=concept.get("negative_prompt", ""),
                    spec=spec,
                    steps=int(concept.get("steps", 28)),
                    cfg_scale=float(concept.get("cfg_scale", 7.5)),
                    width=int(concept.get("width", 512)),
                    height=int(concept.get("height", 512)),
                    rng=jax.random.fold_in(jax.random.PRNGKey(seed), len(images)),
                    method=concept.get("method", sampling.get("method", "ddim")),
                    guidance_rescale=float(concept.get(
                        "guidance_rescale",
                        sampling.get("guidance_rescale", 0.0))),
                    clip2_params=clip2_params,
                    t5_params=t5_params,
                    tokenizer_3=trainer.pipeline.tokenizer_3,
                )
                images.extend(out)
                remaining -= n
            for j, img in enumerate(images):
                Image.fromarray(np.asarray(img)).save(save_dir / f"{ci}-{j}.png")
            galleries[concept.prompt] = images
        logger.info(f"Wrote samples for step {global_step} to {save_dir}")

        for kind, w in trainer._writers:
            if kind == "wandb" and (trainer.config.loggers.get("wandb") or {}).get("sample"):
                import wandb

                w.log({"samples": {p[:230]: [wandb.Image(np.asarray(x)) for x in imgs]
                                   for p, imgs in galleries.items()}}, step=global_step)
