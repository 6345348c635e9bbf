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
    """Inference timestep ladder, diffusers scheduler semantics.

    'leading' (SD default): arange * ratio + steps_offset. 'trailing'
    (recommended for zero-terminal-SNR models, arXiv:2305.08891 §3.2):
    descending from T so sampling starts at the pure-noise step T-1.
    """
    T = schedule.num_train_timesteps
    if schedule.timestep_spacing == "trailing":
        ts = np.round(np.arange(T, 0, -T / num_inference_steps)).astype(np.int64) - 1
        return ts
    step_ratio = T // num_inference_steps
    ts = (np.arange(0, num_inference_steps) * step_ratio).round().astype(np.int64)[::-1]
    return ts + schedule.steps_offset


@dataclasses.dataclass(frozen=True)
class SamplerSpec:
    unet_config: Optional[UNetConfig]
    vae_config: VAEConfig
    clip_config: CLIPTextConfig
    schedule: NoiseSchedule
    clip_stop_at_layer: int = 1
    dtype: jnp.dtype = jnp.bfloat16
    # SDXL/SD3 second text tower (pooled projection); None for SD1.x/2.x
    clip2_config: Optional[CLIPTextConfig] = None
    # SD3 family: MMDiT denoiser + optional T5 tower; schedule is a
    # FlowSchedule there and sampling always runs the flow-Euler ODE.
    mmdit_config: Optional[object] = None
    t5_config: Optional[object] = None

    @property
    def sdxl(self) -> bool:
        return (self.unet_config is not None
                and self.unet_config.addition_embed_type == "text_time")

    @property
    def sd3(self) -> bool:
        return self.mmdit_config is not None


def _cfg_combine(pred_u, pred_c, cfg_scale: float, guidance_rescale: float):
    """Classifier-free guidance with optional rescale (arXiv:2305.08891 §3.4,
    diffusers ``rescale_noise_cfg``): re-match the CFG'd prediction's
    per-sample std to the conditional prediction's, then lerp by phi.
    Recommended ~0.7 with zero-terminal-SNR v-prediction models."""
    pred = pred_u + cfg_scale * (pred_c - pred_u)
    if guidance_rescale > 0.0:
        axes = tuple(range(1, pred.ndim))
        std_c = jnp.std(pred_c, axis=axes, keepdims=True)
        std_cfg = jnp.std(pred, axis=axes, keepdims=True)
        rescaled = pred * (std_c / jnp.maximum(std_cfg, 1e-8))
        pred = guidance_rescale * rescaled + (1.0 - guidance_rescale) * pred
    return pred


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


@partial(jax.jit, static_argnames=("spec", "num_steps", "cfg_scale", "height",
                                   "width", "batch", "t_start_index",
                                   "guidance_rescale"))
def ddim_sample_latents(unet_params: Params, cond: jnp.ndarray, uncond: jnp.ndarray,
                        rng: jax.Array, spec: SamplerSpec, num_steps: int,
                        cfg_scale: float, height: int, width: int, batch: int,
                        init_latents: Optional[jnp.ndarray] = None,
                        t_start_index: int = 0,
                        guidance_rescale: float = 0.0,
                        added_cond: Optional[dict] = None) -> jnp.ndarray:
    """Run the DDIM loop, returns final latents (B, h/8, w/8, 4) unscaled.

    img2img: pass scaled ``init_latents`` + ``t_start_index`` (the index
    into the timestep ladder to start from; strength s maps to
    ``int(num_steps * (1 - s))``) — the init is q-sampled to that level.
    """
    schedule = spec.schedule
    ts = jnp.asarray(ddim_timesteps(schedule, num_steps), jnp.int32)[t_start_index:]
    acp = jnp.asarray(schedule.alphas_cumprod)
    final_acp = jnp.asarray(1.0) if schedule.set_alpha_to_one else acp[0]

    # spatial factor = 2^(levels-1): 8 for SD VAEs, smaller for tiny test VAEs
    f = 2 ** (len(spec.vae_config.block_out_channels) - 1)
    shape = (batch, height // f, width // f, spec.unet_config.in_channels)
    noise = jax.random.normal(rng, shape, dtype=spec.dtype)
    if init_latents is None:
        x = noise
    else:
        x = schedule.add_noise(init_latents.astype(spec.dtype), noise,
                               jnp.full((batch,), ts[0], jnp.int32))

    context = jnp.concatenate([uncond, cond], axis=0).astype(spec.dtype)

    def step(x, t):
        prev_t = t - schedule.num_train_timesteps // num_steps
        pair = jnp.concatenate([x, x], axis=0)
        t_b = jnp.full((2 * batch,), t, jnp.int32)
        pred = unet_apply(unet_params, pair, t_b, context, spec.unet_config,
                          added_cond=added_cond)
        pred_u, pred_c = jnp.split(pred, 2, axis=0)
        pred = _cfg_combine(pred_u, pred_c, cfg_scale, guidance_rescale)

        eps, x0 = _pred_to_eps_x0(pred, x, t, schedule)
        if schedule.clip_sample:
            x0 = jnp.clip(x0, -1.0, 1.0)
        acp_prev = jnp.where(prev_t >= 0, acp[jnp.maximum(prev_t, 0)], final_acp).astype(x.dtype)
        x_prev = jnp.sqrt(acp_prev) * x0 + jnp.sqrt(1.0 - acp_prev) * eps
        return x_prev, ()

    x, _ = jax.lax.scan(step, x, ts)
    return x


def _denoised_from_pred(x, sig, pred, prediction_type: str):
    """Model prediction -> denoised x0 in k-diffusion sigma space
    (x = x0 + sigma*eps; the UNet saw x / sqrt(sigma^2+1))."""
    if prediction_type == "epsilon":
        return x - sig * pred
    if prediction_type == "v":
        return x / (sig ** 2 + 1.0) - pred * sig / jnp.sqrt(sig ** 2 + 1.0)
    raise ValueError(f"sigma-space samplers do not support "
                     f"prediction_type={prediction_type!r}")


@partial(jax.jit, static_argnames=("spec", "num_steps", "cfg_scale", "height",
                                   "width", "batch", "ancestral",
                                   "t_start_index", "guidance_rescale"))
def euler_sample_latents(unet_params: Params, cond: jnp.ndarray, uncond: jnp.ndarray,
                         rng: jax.Array, spec: SamplerSpec, num_steps: int,
                         cfg_scale: float, height: int, width: int, batch: int,
                         ancestral: bool = False,
                         init_latents: Optional[jnp.ndarray] = None,
                         t_start_index: int = 0,
                         guidance_rescale: float = 0.0,
                         added_cond: Optional[dict] = None) -> jnp.ndarray:
    """Euler / Euler-ancestral (k-diffusion style on the discrete VP sigmas,
    diffusers EulerDiscreteScheduler semantics) — the WebUI ecosystem's
    default samplers, beyond reference parity. One lax.scan program.

    Sigma-space convention: x = x0 + sigma*eps; the UNet consumes
    x / sqrt(sigma^2+1) at the discrete timestep of that sigma.
    """
    schedule = spec.schedule
    if schedule.prediction_type == "sample":
        raise ValueError("euler samplers do not support prediction_type=sample")
    ts = jnp.asarray(ddim_timesteps(schedule, num_steps), jnp.int32)[t_start_index:]
    # zero-terminal-SNR models have abar[T-1] == 0 (sigma = inf); clamp to
    # 2^-24 exactly like diffusers' EulerDiscreteScheduler ZTSNR handling
    acp = jnp.maximum(jnp.asarray(schedule.alphas_cumprod), 2.0 ** -24
                      ).astype(jnp.float32)
    sigmas = jnp.sqrt((1.0 - acp[ts]) / acp[ts])
    sigmas_next = jnp.concatenate([sigmas[1:], jnp.zeros((1,))])

    f = 2 ** (len(spec.vae_config.block_out_channels) - 1)
    shape = (batch, height // f, width // f, spec.unet_config.in_channels)
    rng, init_rng = jax.random.split(rng)
    if init_latents is None:
        # init_noise_sigma: the VP sample at T is N(0,1); in sigma space
        # that is sqrt(sigma_max^2 + 1) * N(0,1)
        x = (jax.random.normal(init_rng, shape, jnp.float32)
             * jnp.sqrt(sigmas[0] ** 2 + 1.0))
    else:
        # img2img: x = x0 + sigma_start * eps (k-diffusion convention)
        x = (init_latents.astype(jnp.float32)
             + jax.random.normal(init_rng, shape, jnp.float32) * sigmas[0])

    context = jnp.concatenate([uncond, cond], axis=0).astype(spec.dtype)

    def step(carry, inp):
        x, rng = carry
        t, sig, sig_n = inp
        x_in = (x / jnp.sqrt(sig ** 2 + 1.0)).astype(spec.dtype)
        pair = jnp.concatenate([x_in, x_in], axis=0)
        t_b = jnp.full((2 * batch,), t, jnp.int32)
        pred = unet_apply(unet_params, pair, t_b, context, spec.unet_config,
                          added_cond=added_cond)
        pred_u, pred_c = jnp.split(pred.astype(jnp.float32), 2, axis=0)
        pred = _cfg_combine(pred_u, pred_c, cfg_scale, guidance_rescale)

        denoised = _denoised_from_pred(x, sig, pred, schedule.prediction_type)

        d = (x - denoised) / sig
        if ancestral:
            var = sig_n ** 2 * (sig ** 2 - sig_n ** 2) / sig ** 2
            sig_up = jnp.sqrt(var)
            sig_down = jnp.sqrt(sig_n ** 2 - var)
            rng, noise_rng = jax.random.split(rng)
            noise = jax.random.normal(noise_rng, x.shape, jnp.float32)
            x = x + d * (sig_down - sig) + noise * sig_up
        else:
            x = x + d * (sig_n - sig)
        return (x, rng), ()

    (x, _), _ = jax.lax.scan(step, (x, rng), (ts, sigmas, sigmas_next))
    # sigma 0 reached: x IS the denoised latent
    return x.astype(spec.dtype)


@partial(jax.jit, static_argnames=("spec", "num_steps", "cfg_scale", "height",
                                   "width", "batch", "t_start_index",
                                   "guidance_rescale"))
def dpmpp_2m_sample_latents(unet_params: Params, cond: jnp.ndarray,
                            uncond: jnp.ndarray, rng: jax.Array,
                            spec: SamplerSpec, num_steps: int,
                            cfg_scale: float, height: int, width: int,
                            batch: int,
                            init_latents: Optional[jnp.ndarray] = None,
                            t_start_index: int = 0,
                            guidance_rescale: float = 0.0,
                            added_cond: Optional[dict] = None) -> jnp.ndarray:
    """DPM-Solver++(2M) (arXiv:2211.01095; k-diffusion ``sample_dpmpp_2m``) —
    the WebUI ecosystem's favourite fast deterministic sampler (good quality
    at 15-25 steps). Second-order multistep on log-sigma: one UNet call per
    step, reusing the previous step's denoised estimate. One lax.scan.
    """
    schedule = spec.schedule
    ts = jnp.asarray(ddim_timesteps(schedule, num_steps), jnp.int32)[t_start_index:]
    # zero-terminal-SNR models have abar[T-1] == 0 (sigma = inf); clamp to
    # 2^-24 exactly like diffusers' EulerDiscreteScheduler ZTSNR handling
    acp = jnp.maximum(jnp.asarray(schedule.alphas_cumprod), 2.0 ** -24
                      ).astype(jnp.float32)
    sigmas = jnp.sqrt((1.0 - acp[ts]) / acp[ts])
    sigmas_next = jnp.concatenate([sigmas[1:], jnp.zeros((1,))])
    n = ts.shape[0]

    f = 2 ** (len(spec.vae_config.block_out_channels) - 1)
    shape = (batch, height // f, width // f, spec.unet_config.in_channels)
    rng, init_rng = jax.random.split(rng)
    if init_latents is None:
        x = (jax.random.normal(init_rng, shape, jnp.float32)
             * jnp.sqrt(sigmas[0] ** 2 + 1.0))
    else:
        x = (init_latents.astype(jnp.float32)
             + jax.random.normal(init_rng, shape, jnp.float32) * sigmas[0])

    context = jnp.concatenate([uncond, cond], axis=0).astype(spec.dtype)

    def step(carry, inp):
        x, old_denoised, sig_prev = carry
        t, sig, sig_n, i = inp
        x_in = (x / jnp.sqrt(sig ** 2 + 1.0)).astype(spec.dtype)
        pair = jnp.concatenate([x_in, x_in], axis=0)
        t_b = jnp.full((2 * batch,), t, jnp.int32)
        pred = unet_apply(unet_params, pair, t_b, context, spec.unet_config,
                          added_cond=added_cond)
        pred_u, pred_c = jnp.split(pred.astype(jnp.float32), 2, axis=0)
        pred = _cfg_combine(pred_u, pred_c, cfg_scale, guidance_rescale)
        denoised = _denoised_from_pred(x, sig, pred, schedule.prediction_type)

        # t(sigma) = -log(sigma); at the final step sigma_next = 0 so
        # h = inf and exp(-h)/expm1(-h) hit their exact limits (0 / -1):
        # x becomes denoised_d with no special-casing needed.
        tt, tn = -jnp.log(sig), -jnp.log(sig_n)
        h = tn - tt
        # second-order correction uses the previous denoised estimate;
        # first step (i == 0) has none and the final step (sigma_next == 0,
        # h = inf) degenerates -> plain first-order step in both cases,
        # matching k-diffusion's `old_denoised is None or sigmas[i+1] == 0`
        second = (i > 0) & (sig_n > 0.0)
        h_last = tt + jnp.log(sig_prev)
        r_safe = jnp.where(second, h_last / h, 1.0)
        c = 1.0 / (2.0 * r_safe)
        denoised_d = jnp.where(second,
                               (1.0 + c) * denoised - c * old_denoised,
                               denoised)
        x = (sig_n / sig) * x - jnp.expm1(-h) * denoised_d
        return (x, denoised, sig), ()

    (x, _, _), _ = jax.lax.scan(
        step, (x, jnp.zeros_like(x), sigmas[0]),
        (ts, sigmas, sigmas_next, jnp.arange(n)))
    return x.astype(spec.dtype)


@partial(jax.jit, static_argnames=("spec", "num_steps", "cfg_scale", "height",
                                   "width", "batch", "t_start_index",
                                   "guidance_rescale"))
def flow_euler_sample_latents(mmdit_params: Params, cond: jnp.ndarray,
                              uncond: jnp.ndarray, pooled: jnp.ndarray,
                              pooled_u: jnp.ndarray, rng: jax.Array,
                              spec: SamplerSpec, num_steps: int,
                              cfg_scale: float, height: int, width: int,
                              batch: int,
                              init_latents: Optional[jnp.ndarray] = None,
                              t_start_index: int = 0,
                              guidance_rescale: float = 0.0) -> jnp.ndarray:
    """Flow-matching Euler ODE for the SD3 family (diffusers
    FlowMatchEulerDiscreteScheduler.step): x <- x + (sigma_next - sigma) * v,
    with the CFG pair batched through the MMDiT like the DDPM samplers."""
    from ..models.mmdit import mmdit_apply

    f = 2 ** (len(spec.vae_config.block_out_channels) - 1)
    h_lat, w_lat = height // f, width // f
    c_lat = spec.mmdit_config.in_channels

    sigmas = spec.schedule.sampling_sigmas(num_steps).astype(spec.dtype)
    rng, noise_rng = jax.random.split(rng)
    noise = jax.random.normal(noise_rng, (batch, h_lat, w_lat, c_lat),
                              spec.dtype)
    if init_latents is None:
        x = noise  # sigma(0) = 1: pure noise
    else:
        sig0 = sigmas[t_start_index]
        x = (1.0 - sig0) * init_latents.astype(spec.dtype) + sig0 * noise

    cond_all = jnp.concatenate([uncond, cond], axis=0).astype(spec.dtype)
    pooled_all = jnp.concatenate([pooled_u, pooled], axis=0).astype(spec.dtype)

    def step(x, inp):
        sig, sig_next = inp
        t = jnp.full((2 * batch,), sig * spec.schedule.num_train_timesteps,
                     jnp.float32)
        x_pair = jnp.concatenate([x, x], axis=0)
        v = mmdit_apply(mmdit_params, x_pair, t, cond_all, pooled_all,
                        spec.mmdit_config)
        v_u, v_c = jnp.split(v, 2, axis=0)
        v = _cfg_combine(v_u, v_c, cfg_scale, guidance_rescale)
        return x + (sig_next - sig) * v.astype(x.dtype), None

    x, _ = jax.lax.scan(step, x, (sigmas[t_start_index:-1],
                                  sigmas[t_start_index + 1:]))
    return x.astype(spec.dtype)


SAMPLER_METHODS = ("ddim", "euler", "euler_a", "dpmpp_2m", "flow_euler")


def sample_images(unet_params: Params, vae_params: Params, clip_params: Params,
                  tokenizer, prompts: list[str], negative_prompt: str,
                  spec: SamplerSpec, steps: int = 28, cfg_scale: float = 7.5,
                  width: int = 512, height: int = 512,
                  seed: Optional[int] = None, rng: Optional[jax.Array] = None,
                  method: str = "ddim",
                  init_image: Optional[np.ndarray] = None,
                  strength: float = 0.75,
                  guidance_rescale: float = 0.0,
                  clip2_params: Optional[Params] = None,
                  t5_params: Optional[Params] = None,
                  tokenizer_3=None) -> np.ndarray:
    """Full text->image path. Returns uint8 (B, H, W, 3).

    img2img: ``init_image`` is (H, W, 3) or (B, H, W, 3) float in [-1, 1];
    ``strength`` in (0, 1] controls how much of the denoising ladder runs
    (1.0 = ignore the init entirely, like diffusers Img2ImgPipeline).

    SDXL: pass ``clip2_params`` (the pooled-projection tower). Conditioning
    follows diffusers' SDXL encode_prompt: concat of both towers' raw
    penultimate hidden states, pooled embeds from tower 2, size ids at the
    target resolution with zero crop offsets.
    """
    if rng is None:
        rng = jax.random.PRNGKey(0 if seed is None else seed)
    batch = len(prompts)

    ids = jnp.asarray(tokenizer(prompts))
    neg_ids = jnp.asarray(tokenizer([negative_prompt] * batch))
    cast = lambda p: {k: v.astype(spec.dtype) if jnp.issubdtype(jnp.asarray(v).dtype, jnp.floating) else jnp.asarray(v)
                      for k, v in p.items()}
    clip_c = cast(clip_params)
    added_cond = None
    pooled_pair = None
    if spec.sd3:
        # SD3 conditioning (diffusers SD3 encode_prompt): both projected
        # CLIP towers' penultimate states concat on features, zero-pad to
        # the joint width, T5 states (when the tower exists) concat on
        # sequence; pooled = concat of both projected pooled embeds.
        if clip2_params is None:
            raise ValueError("SD3 sampling requires clip2_params")
        from ..models.clip import clip_text_encode_sdxl, eos_positions

        clip2_c = cast(clip2_params)
        t5_c = cast(t5_params) if t5_params is not None else None
        if t5_c is not None and tokenizer_3 is None:
            raise ValueError("SD3 model has a T5 tower: pass tokenizer_3")

        def encode_sd3(ids_, prompts_):
            penult1, pooled1 = clip_text_encode_sdxl(clip_c, ids_,
                                                     spec.clip_config)
            first_eos = eos_positions(ids_, spec.clip_config.eos_token_id)
            pos = jnp.arange(ids_.shape[1])[None, :]
            ids2 = jnp.where(pos > first_eos[:, None], 0, ids_)
            penult2, pooled2 = clip_text_encode_sdxl(clip2_c, ids2,
                                                     spec.clip2_config)
            emb = jnp.concatenate([penult1, penult2], axis=-1)
            joint = spec.mmdit_config.joint_attention_dim
            emb = jnp.pad(emb, ((0, 0), (0, 0), (0, joint - emb.shape[-1])))
            if t5_c is not None:
                from ..models.t5 import t5_encoder_apply

                t5_ids = jnp.asarray(tokenizer_3(prompts_))
                t5_emb = t5_encoder_apply(t5_c, t5_ids, spec.t5_config)
                emb = jnp.concatenate(
                    [emb.astype(spec.dtype), t5_emb.astype(spec.dtype)],
                    axis=1)
            pooled = jnp.concatenate([pooled1, pooled2], axis=-1)
            return emb.astype(spec.dtype), pooled.astype(spec.dtype)

        cond, pooled_c = encode_sd3(ids, prompts)
        uncond, pooled_u = encode_sd3(neg_ids, [negative_prompt] * batch)
        pooled_pair = (pooled_c, pooled_u)
    elif spec.sdxl:
        if clip2_params is None:
            raise ValueError("SDXL sampling requires clip2_params "
                             "(the text_encoder_2 tower)")
        from ..models.clip import clip_text_encode_sdxl, eos_positions

        clip2_c = cast(clip2_params)

        def encode(ids_):
            penult1, _ = clip_text_encode_sdxl(clip_c, ids_, spec.clip_config)
            first_eos = eos_positions(ids_, spec.clip_config.eos_token_id)
            pos = jnp.arange(ids_.shape[1])[None, :]
            ids2 = jnp.where(pos > first_eos[:, None], 0, ids_)
            penult2, pooled = clip_text_encode_sdxl(clip2_c, ids2,
                                                    spec.clip2_config)
            return jnp.concatenate([penult1, penult2], axis=-1), pooled

        cond, pooled_c = encode(ids)
        uncond, pooled_u = encode(neg_ids)
        time_ids = jnp.tile(
            jnp.asarray([height, width, 0, 0, height, width], jnp.float32),
            (2 * batch, 1))
        added_cond = {
            "text_embeds": jnp.concatenate([pooled_u, pooled_c],
                                           axis=0).astype(spec.dtype),
            "time_ids": time_ids,
        }
    else:
        cond = clip_text_apply(clip_c, ids, spec.clip_config, spec.clip_stop_at_layer)
        uncond = clip_text_apply(clip_c, neg_ids, spec.clip_config, spec.clip_stop_at_layer)

    init_latents, t_start = None, 0
    if init_image is not None:
        from ..models.vae import encoder_apply, sample_latents

        img = jnp.asarray(init_image, jnp.float32)
        if img.ndim == 3:
            img = img[None]
        img = jnp.broadcast_to(img, (batch,) + img.shape[1:])
        rng, vae_rng = jax.random.split(rng)
        moments = encoder_apply(cast(vae_params), img.astype(spec.dtype),
                                spec.vae_config)
        init_latents = sample_latents(moments, vae_rng,
                                      spec.vae_config.scaling_factor,
                                      spec.vae_config.shift_factor)
        t_start = min(int(steps * (1.0 - float(strength))), steps - 1)

    if spec.sd3:
        # the SD3 family always samples with the flow-matching Euler ODE
        # (diffusers routes every SD3 pipeline through FlowMatchEuler)
        if method not in ("flow_euler", "ddim"):
            raise ValueError(
                f"SD3 models sample with method 'flow_euler' (got {method!r})")
        pooled_c, pooled_u = pooled_pair
        latents = flow_euler_sample_latents(
            cast(unet_params), cond, uncond, pooled_c, pooled_u, rng, spec,
            steps, float(cfg_scale), height, width, batch,
            init_latents=init_latents, t_start_index=t_start,
            guidance_rescale=float(guidance_rescale))
    elif method == "ddim":
        latents = ddim_sample_latents(cast(unet_params), cond, uncond, rng, spec,
                                      steps, float(cfg_scale), height, width, batch,
                                      init_latents=init_latents,
                                      t_start_index=t_start,
                                      guidance_rescale=float(guidance_rescale),
                                      added_cond=added_cond)
    elif method in ("euler", "euler_a"):
        latents = euler_sample_latents(cast(unet_params), cond, uncond, rng, spec,
                                       steps, float(cfg_scale), height, width,
                                       batch, ancestral=method == "euler_a",
                                       init_latents=init_latents,
                                       t_start_index=t_start,
                                       guidance_rescale=float(guidance_rescale),
                                      added_cond=added_cond)
    elif method == "dpmpp_2m":
        latents = dpmpp_2m_sample_latents(cast(unet_params), cond, uncond, rng,
                                          spec, steps, float(cfg_scale), height,
                                          width, batch,
                                          init_latents=init_latents,
                                          t_start_index=t_start,
                                          guidance_rescale=float(guidance_rescale),
                                      added_cond=added_cond)
    else:
        raise ValueError(f"Unknown sampler method {method!r}; "
                         f"choose from {SAMPLER_METHODS}")

    images = decoder_apply(
        cast(vae_params),
        latents / spec.vae_config.scaling_factor
        + spec.vae_config.shift_factor,
        spec.vae_config)
    images = (jnp.clip(images.astype(jnp.float32), -1, 1) + 1.0) * 127.5
    return np.asarray(images).astype(np.uint8)
