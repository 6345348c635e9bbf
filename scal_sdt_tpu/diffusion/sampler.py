"""DDIM sampling with classifier-free guidance, as one `lax.scan` program.

TPU-native replacement for the diffusers ``StableDiffusionPipeline`` the
reference samples with (``/root/reference/modules/sample_callback.py``,
``gen_class_imgs.py``): tokenize/encode prompts, scan the denoising loop
(CFG pair batched into one UNet call), VAE-decode. The whole loop compiles
to a single XLA executable per (batch, size, steps) triple.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.clip import CLIPTextConfig, clip_text_apply
from ..models.functional import Params
from ..models.unet import UNetConfig, unet_apply
from ..models.vae import VAEConfig, decoder_apply
from .schedule import NoiseSchedule


def ddim_timesteps(schedule: NoiseSchedule, num_inference_steps: int) -> np.ndarray:
    """'leading' spacing with steps_offset, diffusers DDIMScheduler semantics."""
    step_ratio = schedule.num_train_timesteps // num_inference_steps
    ts = (np.arange(0, num_inference_steps) * step_ratio).round().astype(np.int64)[::-1]
    return ts + schedule.steps_offset


@dataclasses.dataclass(frozen=True)
class SamplerSpec:
    unet_config: UNetConfig
    vae_config: VAEConfig
    clip_config: CLIPTextConfig
    schedule: NoiseSchedule
    clip_stop_at_layer: int = 1
    dtype: jnp.dtype = jnp.bfloat16


def _pred_to_eps_x0(pred, x, t, schedule: NoiseSchedule):
    acp = jnp.asarray(schedule.alphas_cumprod)
    sa = jnp.sqrt(acp)[t].astype(x.dtype)
    sb = jnp.sqrt(1.0 - acp)[t].astype(x.dtype)
    if schedule.prediction_type == "epsilon":
        eps = pred
        x0 = (x - sb * eps) / sa
    elif schedule.prediction_type == "v":
        x0 = sa * x - sb * pred
        eps = sb * x + sa * pred
    elif schedule.prediction_type == "sample":
        x0 = pred
        eps = (x - sa * x0) / sb
    else:
        raise ValueError(schedule.prediction_type)
    return eps, x0


@partial(jax.jit, static_argnames=("spec", "num_steps", "cfg_scale", "height", "width", "batch"))
def ddim_sample_latents(unet_params: Params, cond: jnp.ndarray, uncond: jnp.ndarray,
                        rng: jax.Array, spec: SamplerSpec, num_steps: int,
                        cfg_scale: float, height: int, width: int, batch: int) -> jnp.ndarray:
    """Run the DDIM loop, returns final latents (B, h/8, w/8, 4) unscaled."""
    schedule = spec.schedule
    ts = jnp.asarray(ddim_timesteps(schedule, num_steps), jnp.int32)
    acp = jnp.asarray(schedule.alphas_cumprod)
    final_acp = jnp.asarray(1.0) if schedule.set_alpha_to_one else acp[0]

    # spatial factor = 2^(levels-1): 8 for SD VAEs, smaller for tiny test VAEs
    f = 2 ** (len(spec.vae_config.block_out_channels) - 1)
    shape = (batch, height // f, width // f, spec.unet_config.in_channels)
    x = jax.random.normal(rng, shape, dtype=spec.dtype)

    context = jnp.concatenate([uncond, cond], axis=0).astype(spec.dtype)

    def step(x, t):
        prev_t = t - schedule.num_train_timesteps // num_steps
        pair = jnp.concatenate([x, x], axis=0)
        t_b = jnp.full((2 * batch,), t, jnp.int32)
        pred = unet_apply(unet_params, pair, t_b, context, spec.unet_config)
        pred_u, pred_c = jnp.split(pred, 2, axis=0)
        pred = pred_u + cfg_scale * (pred_c - pred_u)

        eps, x0 = _pred_to_eps_x0(pred, x, t, schedule)
        if schedule.clip_sample:
            x0 = jnp.clip(x0, -1.0, 1.0)
        acp_prev = jnp.where(prev_t >= 0, acp[jnp.maximum(prev_t, 0)], final_acp).astype(x.dtype)
        x_prev = jnp.sqrt(acp_prev) * x0 + jnp.sqrt(1.0 - acp_prev) * eps
        return x_prev, ()

    x, _ = jax.lax.scan(step, x, ts)
    return x


def sample_images(unet_params: Params, vae_params: Params, clip_params: Params,
                  tokenizer, prompts: list[str], negative_prompt: str,
                  spec: SamplerSpec, steps: int = 28, cfg_scale: float = 7.5,
                  width: int = 512, height: int = 512,
                  seed: Optional[int] = None, rng: Optional[jax.Array] = None) -> np.ndarray:
    """Full text->image path. Returns uint8 (B, H, W, 3)."""
    if rng is None:
        rng = jax.random.PRNGKey(0 if seed is None else seed)
    batch = len(prompts)

    ids = jnp.asarray(tokenizer(prompts))
    neg_ids = jnp.asarray(tokenizer([negative_prompt] * batch))
    cast = lambda p: {k: v.astype(spec.dtype) if jnp.issubdtype(jnp.asarray(v).dtype, jnp.floating) else jnp.asarray(v)
                      for k, v in p.items()}
    clip_c = cast(clip_params)
    cond = clip_text_apply(clip_c, ids, spec.clip_config, spec.clip_stop_at_layer)
    uncond = clip_text_apply(clip_c, neg_ids, spec.clip_config, spec.clip_stop_at_layer)

    latents = ddim_sample_latents(cast(unet_params), cond, uncond, rng, spec,
                                  steps, float(cfg_scale), height, width, batch)

    images = decoder_apply(cast(vae_params), latents / spec.vae_config.scaling_factor,
                           spec.vae_config)
    images = (jnp.clip(images.astype(jnp.float32), -1, 1) + 1.0) * 127.5
    return np.asarray(images).astype(np.uint8)
