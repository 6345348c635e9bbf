"""The pjit-sharded training step: the TPU-native core of the framework.

Fuses everything the reference does per batch across Lightning hooks
(``/root/reference/modules/model.py:318-348`` and friends) into ONE compiled
XLA program: optional VAE encode, optional CLIP encode with CFG-dropout,
DDPM q-sample, UNet forward/backward, per-group AdamW update, LR schedule,
and EMA update. Gradient all-reduce over the data axis is emitted by XLA as
a ``psum`` over ICI — no NCCL, no DDP strategy, no host round-trips.

Precision policy: master params fp32, compute in bf16 (``trainer.precision``;
16 maps to bf16 on TPU — no loss scaling needed), loss/statistics fp32.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..conf import Config
from ..diffusion.schedule import NoiseSchedule
from ..models.clip import CLIPTextConfig, clip_text_apply, clip_text_encode_sdxl
from ..models.functional import LORA_DROPOUT_RNG, Params
from ..models.unet import UNetConfig, unet_apply
from ..models.vae import VAEConfig, encoder_apply, sample_latents
from .ema import EMAState, ema_init, ema_update

# Checkpoint key namespaces, matching the reference's Lightning state-dict
# layout (modules/model.py:378-391) so every ckpt tool is format-compatible.
UNET_PREFIX = "unet"                       # the denoiser (UNet or SD3 MMDiT)
TE_PREFIX = "condition_model.encoder"
TE2_PREFIX = "condition_model.encoder_2"   # SDXL/SD3 pooled-projection tower
TE3_PREFIX = "condition_model.encoder_3"   # SD3 T5 tower
VAE_PREFIX = "vae"


def component_prefix(component: str) -> str:
    return {"unet": UNET_PREFIX, "text_encoder": TE_PREFIX,
            "text_encoder_2": TE2_PREFIX,
            "text_encoder_3": TE3_PREFIX}[component]


class TrainState(NamedTuple):
    step: jnp.ndarray                 # int32 scalar
    trainable: Params                 # prefixed flat dict (fp32 masters)
    opt_state: Any
    ema: Optional[EMAState]           # over trainable unet params
    rng: jax.Array


@dataclasses.dataclass(frozen=True)
class StepSpec:
    """Static configuration closed over by the jitted step."""
    unet_config: UNetConfig
    clip_config: CLIPTextConfig
    vae_config: VAEConfig
    schedule: NoiseSchedule
    compute_dtype: Any
    clip_stop_at_layer: int = 1
    remat: object = False     # False | True | 'high' | 'top' (see unet_apply)
    uncond_enabled: bool = False
    uncond_p: float = 0.1
    uncond_mode: str = "zeros"        # 'zeros' | 'eos'
    prior_preservation: bool = False
    prior_loss_weight: float = 1.0
    train_text_encoder: bool = False
    # modern training-quality knobs (beyond reference parity; config `loss:`)
    min_snr_gamma: Optional[float] = None   # arXiv:2303.09556
    noise_offset: float = 0.0               # per-channel DC noise offset
    # pyramid/multi-resolution noise (kohya naming): mix in upsampled
    # low-frequency noise octaves, discount^i each, then renormalize
    multires_noise_iterations: int = 0
    multires_noise_discount: float = 0.25
    # SDXL dual-encoder config (None for SD1.x/2.x). The conditioning is
    # concat(penult_1, penult_2) with pooled projected embeds + size ids
    # through the UNet's text_time addition embedding.
    clip2_config: Optional[CLIPTextConfig] = None
    # SD3 family (rectified flow): the denoiser is an MMDiT, conditioning is
    # concat(CLIP-L, CLIP-G) penultimate states zero-padded to the T5 width
    # and (optionally) concatenated with T5 embeds along the sequence, plus
    # the concatenated pooled projections (diffusers SD3 encode_prompt).
    mmdit_config: Optional[Any] = None
    t5_config: Optional[Any] = None

    @property
    def sdxl(self) -> bool:
        return (self.unet_config is not None
                and self.unet_config.addition_embed_type == "text_time")

    @property
    def sd3(self) -> bool:
        return self.mmdit_config is not None

    @classmethod
    def from_config(cls, config: Config, unet_config: Optional[UNetConfig],
                    clip_config: CLIPTextConfig, vae_config: VAEConfig,
                    train_text_encoder: bool,
                    schedule: Optional[NoiseSchedule] = None,
                    clip2_config: Optional[CLIPTextConfig] = None,
                    mmdit_config=None, t5_config=None) -> "StepSpec":
        precision = config.trainer.get("precision", "bf16")
        compute = jnp.float32 if str(precision) == "32" else jnp.bfloat16
        return cls(
            unet_config=unet_config,
            clip_config=clip_config,
            vae_config=vae_config,
            # The loaded scheduler config decides the training target
            # (epsilon/sample/v) and beta range — reference
            # modules/model.py:306-314 reads prediction_type from the
            # pipeline's scheduler, so a v-prediction model must train v here.
            schedule=schedule if schedule is not None else NoiseSchedule(),
            compute_dtype=compute,
            clip_stop_at_layer=int(config.get("clip_stop_at_layer", 1)),
            remat=(config.get("gradient_checkpointing", False)
                   if config.get("gradient_checkpointing")
                   in (True, False, "high", "top")
                   else bool(config.get("gradient_checkpointing"))),
            uncond_enabled=bool(config.uncond.get("enabled", False)),
            uncond_p=float(config.uncond.get("p", 0.1)),
            uncond_mode=config.uncond.get("cond", "zeros"),
            prior_preservation=bool(config.prior_preservation.get("enabled", False)),
            prior_loss_weight=float(config.prior_preservation.get("prior_loss_weight", 1.0)),
            train_text_encoder=train_text_encoder,
            min_snr_gamma=(float(config.loss.min_snr_gamma)
                           if (config.get("loss") or {}).get("min_snr_gamma")
                           else None),
            noise_offset=float((config.get("loss") or {}).get("noise_offset")
                               or 0.0),
            multires_noise_iterations=int(
                (config.get("loss") or {}).get("multires_noise_iterations")
                or 0),
            multires_noise_discount=float(
                (config.get("loss") or {}).get("multires_noise_discount")
                or 0.25),
            clip2_config=clip2_config,
            mmdit_config=mmdit_config,
            t5_config=t5_config,
        )


def _merged_component(trainable: Params, frozen: Params, prefix: str, dtype) -> Params:
    """Component view of frozen+trainable, cast to compute dtype.

    LoRA alpha scalars stay as-is (consumed as scale factors).
    """
    cut = len(prefix) + 1
    out: Params = {}
    for source in (frozen, trainable):
        for k, v in source.items():
            if k.startswith(prefix + "."):
                key = k[cut:]
                out[key] = v.astype(dtype) if jnp.issubdtype(v.dtype, jnp.floating) else v
    return out


def _multires_noise(rng: jax.Array, noise: jnp.ndarray, iterations: int,
                    discount: float) -> jnp.ndarray:
    """Pyramid noise (kohya multires_noise): add bilinearly-upsampled noise
    octaves at halved resolutions, weight discount^i, renormalize each sample
    to unit std. Static python loop — shapes are compile-time constants."""
    b, h, w, c = noise.shape
    total = noise
    for i in range(1, iterations + 1):
        hi, wi = max(1, h // (2 ** i)), max(1, w // (2 ** i))
        rng, k = jax.random.split(rng)
        octave = jax.random.normal(k, (b, hi, wi, c), noise.dtype)
        total = total + (discount ** i) * jax.image.resize(
            octave, noise.shape, "bilinear")
        if hi == 1 and wi == 1:
            break
    std = jnp.std(total.astype(jnp.float32), axis=(1, 2, 3), keepdims=True)
    return (total / jnp.maximum(std, 1e-8).astype(noise.dtype))


def compute_loss(trainable: Params, frozen: Params, batch: dict, rng: jax.Array,
                 spec: StepSpec) -> tuple[jnp.ndarray, dict]:
    """The reference's training_step body (modules/model.py:318-348) as a pure fn.

    batch keys (device arrays, fixed shapes per bucket):
      'latents' (B,h,w,4) pre-scaled  OR  'images' (B,H,W,3) in [-1,1]
      'conds'   (B,L,D)               OR  'input_ids' (B,L) int32
      'uncond_ids' (1,L) int32 — empty-prompt ids (for uncond.cond='eos')
      'pooled' (B,D2) — SDXL cache fast path (required with 'conds' there)
      'size_cond' (B,4) int32 — SDXL per-image [orig_h, orig_w, top, left]
    """
    dt = spec.compute_dtype
    rng_latent, rng_uncond, rng_noise, rng_t, rng_lora = jax.random.split(rng, 5)

    # --- latents -----------------------------------------------------------
    if "latents" in batch:
        latents = batch["latents"].astype(dt)
    else:
        vae_params = _merged_component(trainable, frozen, VAE_PREFIX, dt)
        moments = encoder_apply(vae_params, batch["images"].astype(dt), spec.vae_config)
        latents = sample_latents(moments, rng_latent,
                                 spec.vae_config.scaling_factor,
                                 spec.vae_config.shift_factor)

    # --- conditioning ------------------------------------------------------
    added_cond = None
    pooled_cond = None
    if "conds" in batch:
        conds = batch["conds"].astype(dt)
        if spec.sd3:
            # SD3 cache fast path: {id}.cond = full prompt embeds (clip
            # padded + t5 seq-concat), {id}.pooled = concat pooled
            pooled_cond = batch["pooled"].astype(dt)
        elif spec.sdxl:
            # SDXL cache fast path: {id}.cond holds the concatenated
            # penultimate states, {id}.pooled the projected tower-2 embed
            f = 2 ** (len(spec.vae_config.block_out_channels) - 1)
            h_img, w_img = latents.shape[1] * f, latents.shape[2] * f
            time_ids = jnp.tile(
                jnp.asarray([h_img, w_img, 0, 0, h_img, w_img], jnp.float32),
                (latents.shape[0], 1))
            added_cond = {"text_embeds": batch["pooled"].astype(dt),
                          "time_ids": time_ids}
    elif spec.sd3:
        # SD3 triple-encoder conditioning (diffusers SD3 encode_prompt):
        # both CLIP towers' penultimate states concat on features, zero-pad
        # to the T5/joint width, then T5 states concat on SEQUENCE; pooled =
        # concat of both projected pooled embeds. T5 is optional (the
        # published medium checkpoints run with or without it).
        te_params = _merged_component(trainable, frozen, TE_PREFIX, dt)
        te_params[LORA_DROPOUT_RNG] = rng_lora
        te2_params = _merged_component(trainable, frozen, TE2_PREFIX, dt)
        te2_params[LORA_DROPOUT_RNG] = rng_lora
        input_ids = batch["input_ids"]
        if spec.uncond_enabled and spec.uncond_mode == "eos":
            uncond_ids = jnp.broadcast_to(batch["uncond_ids"], input_ids.shape)
            drop = jax.random.uniform(rng_uncond) < spec.uncond_p
            input_ids = jnp.where(drop, uncond_ids, input_ids)
        penult1, pooled1 = clip_text_encode_sdxl(te_params, input_ids,
                                                 spec.clip_config)
        from ..models.clip import eos_positions

        first_eos = eos_positions(input_ids, spec.clip_config.eos_token_id)
        pos = jnp.arange(input_ids.shape[1])[None, :]
        ids2 = jnp.where(pos > first_eos[:, None], 0, input_ids)
        penult2, pooled2 = clip_text_encode_sdxl(te2_params, ids2,
                                                 spec.clip2_config)
        clip_embed = jnp.concatenate([penult1, penult2], axis=-1)
        joint_dim = spec.mmdit_config.joint_attention_dim
        clip_embed = jnp.pad(
            clip_embed, ((0, 0), (0, 0), (0, joint_dim - clip_embed.shape[-1])))
        if spec.t5_config is not None:
            from ..models.t5 import t5_encoder_apply

            te3_params = _merged_component(trainable, frozen, TE3_PREFIX, dt)
            t5_ids = batch["t5_ids"]
            if spec.uncond_enabled and spec.uncond_mode == "eos" \
                    and "t5_uncond_ids" in batch:
                t5_un = jnp.broadcast_to(batch["t5_uncond_ids"], t5_ids.shape)
                t5_ids = jnp.where(drop, t5_un, t5_ids)
            t5_embed = t5_encoder_apply(te3_params, t5_ids,
                                        spec.t5_config).astype(dt)
            conds = jnp.concatenate([clip_embed.astype(dt), t5_embed], axis=1)
        else:
            conds = clip_embed.astype(dt)
        pooled_cond = jnp.concatenate([pooled1, pooled2], axis=-1).astype(dt)
        if spec.uncond_enabled and spec.uncond_mode == "zeros":
            drop = jax.random.uniform(rng_uncond) < spec.uncond_p
            conds = jnp.where(drop, jnp.zeros_like(conds), conds)
            pooled_cond = jnp.where(drop, jnp.zeros_like(pooled_cond),
                                    pooled_cond)
    elif spec.sdxl:
        # SDXL dual-encoder conditioning (diffusers SDXL encode_prompt):
        # both towers' raw penultimate hidden states concatenated on the
        # feature axis; pooled projected embedding from tower 2; size/crop
        # ids through the UNet's text_time embedding. v1 uses the batch's
        # target size with zero crop offsets as the micro-conditioning.
        te_params = _merged_component(trainable, frozen, TE_PREFIX, dt)
        te_params[LORA_DROPOUT_RNG] = rng_lora
        te2_params = _merged_component(trainable, frozen, TE2_PREFIX, dt)
        te2_params[LORA_DROPOUT_RNG] = rng_lora
        input_ids = batch["input_ids"]
        if spec.uncond_enabled and spec.uncond_mode == "eos":
            uncond_ids = jnp.broadcast_to(batch["uncond_ids"], input_ids.shape)
            drop = jax.random.uniform(rng_uncond) < spec.uncond_p
            input_ids = jnp.where(drop, uncond_ids, input_ids)
        penult1, _ = clip_text_encode_sdxl(te_params, input_ids, spec.clip_config)
        # tokenizer_2 pads with 0 after the first EOS (tokenizer 1 pads
        # with EOS); reproduce that for the second tower
        from ..models.clip import eos_positions

        first_eos = eos_positions(input_ids, spec.clip_config.eos_token_id)
        pos = jnp.arange(input_ids.shape[1])[None, :]
        ids2 = jnp.where(pos > first_eos[:, None], 0, input_ids)
        penult2, pooled = clip_text_encode_sdxl(te2_params, ids2,
                                                spec.clip2_config)
        conds = jnp.concatenate([penult1, penult2], axis=-1).astype(dt)
        if spec.uncond_enabled and spec.uncond_mode == "zeros":
            drop = jax.random.uniform(rng_uncond) < spec.uncond_p
            conds = jnp.where(drop, jnp.zeros_like(conds), conds)
            pooled = jnp.where(drop, jnp.zeros_like(pooled), pooled)
        f = 2 ** (len(spec.vae_config.block_out_channels) - 1)
        h_img, w_img = latents.shape[1] * f, latents.shape[2] * f
        if "size_cond" in batch:
            # per-image [orig_h, orig_w, crop_top, crop_left] from the
            # dataset + the static target size (diffusers SDXL trainer
            # time_ids layout)
            target = jnp.tile(jnp.asarray([h_img, w_img], jnp.float32),
                              (latents.shape[0], 1))
            time_ids = jnp.concatenate(
                [batch["size_cond"].astype(jnp.float32), target], axis=-1)
        else:
            time_ids = jnp.tile(
                jnp.asarray([h_img, w_img, 0, 0, h_img, w_img], jnp.float32),
                (latents.shape[0], 1))
        added_cond = {"text_embeds": pooled.astype(dt), "time_ids": time_ids}
    else:
        te_params = _merged_component(trainable, frozen, TE_PREFIX, dt)
        te_params[LORA_DROPOUT_RNG] = rng_lora
        input_ids = batch["input_ids"]
        if spec.uncond_enabled and spec.uncond_mode == "eos":
            uncond_ids = jnp.broadcast_to(batch["uncond_ids"], input_ids.shape)
            drop = jax.random.uniform(rng_uncond) < spec.uncond_p
            input_ids = jnp.where(drop, uncond_ids, input_ids)
        conds = clip_text_apply(te_params, input_ids, spec.clip_config,
                                spec.clip_stop_at_layer)
        if spec.uncond_enabled and spec.uncond_mode == "zeros":
            drop = jax.random.uniform(rng_uncond) < spec.uncond_p
            conds = jnp.where(drop, jnp.zeros_like(conds), conds)

    # --- q-sample + UNet + MSE against the schedule target -----------------
    bsz = latents.shape[0]
    noise = jax.random.normal(rng_noise, latents.shape, dtype=dt)
    if spec.noise_offset:
        # per-(sample, channel) DC offset: lets the model learn very dark /
        # very bright images (the zero-mean q-sample otherwise anchors the
        # mean; crosslabs' noise-offset trick, beyond reference parity)
        rng_noise, rng_off = jax.random.split(rng_noise)
        noise = noise + spec.noise_offset * jax.random.normal(
            rng_off, (bsz, 1, 1, latents.shape[-1]), dtype=dt)
    if spec.multires_noise_iterations > 0:
        rng_noise, rng_mn = jax.random.split(rng_noise)
        noise = _multires_noise(rng_mn, noise, spec.multires_noise_iterations,
                                spec.multires_noise_discount)
    # DDPM: uniform integer draw; flow (SD3): logit-normal sigma draw —
    # both live on the schedule object (diffusion/schedule.py, flow.py).
    timesteps = spec.schedule.sample_timesteps(rng_t, bsz)
    noisy = spec.schedule.add_noise(latents, noise, timesteps)

    unet_params = _merged_component(trainable, frozen, UNET_PREFIX, dt)
    unet_params[LORA_DROPOUT_RNG] = rng_lora
    if spec.sd3:
        from ..models.mmdit import mmdit_apply

        pred = mmdit_apply(unet_params, noisy, timesteps, conds, pooled_cond,
                           spec.mmdit_config)
    else:
        pred = unet_apply(unet_params, noisy, timesteps, conds,
                          spec.unet_config, remat=spec.remat,
                          added_cond=added_cond)

    target = spec.schedule.training_target(latents, noise, timesteps)
    per_elem = jnp.square(pred.astype(jnp.float32) - target.astype(jnp.float32))
    if spec.min_snr_gamma is not None:
        w = spec.schedule.min_snr_weight(timesteps, spec.min_snr_gamma)
        per_elem = per_elem * w.astype(jnp.float32)[:, None, None, None]

    if spec.prior_preservation:
        # collate appends class items after instance items (reference
        # modules/dataset/__init__.py:79-88, loss split modules/model.py:338-340)
        inst, prior = jnp.split(per_elem, 2, axis=0)
        loss = inst.mean() + spec.prior_loss_weight * prior.mean()
    else:
        loss = per_elem.mean()

    return loss, {"train_loss": loss}


# Trainable sets at or below this many elements get the single-program step
# (grad + update fused). The split-program design exists for one reason: XLA's
# scheduler pathologically serializes an 859M-param optimizer update fused
# into the UNet backward (~50x, see below). Adapter-scale trainables (LoRA
# ~6M, custom-diffusion KV ~19M) don't trip it, and the second dispatch is
# pure overhead for them — on a relay-attached TPU each extra program costs
# tens of ms of host latency per step (PERF_NOTES.md round-3 LoRA finding).
FUSE_UPDATE_MAX_ELEMS = 64 * 1024 * 1024


def make_train_step(spec: StepSpec, tx: optax.GradientTransformation,
                    lr_fn, ema_enabled: bool, donate: bool = True,
                    pack_spec=None, fuse_update: Optional[bool] = None):
    """Build the train step: (state, frozen, batch) -> (state, metrics).

    Two XLA programs by default, dispatched back-to-back: (1) forward/backward
    producing bf16 gradients, (2) optimizer + EMA update. Keeping them
    separate avoids an XLA scheduling pathology where fusing the 859M-param
    optimizer update into the UNet backward program slowed the combined step
    ~50x (measured: grad 340 ms + update 42 ms separately vs 17 s fused on
    v5e); the extra dispatch costs microseconds of device time.

    For SMALL trainable sets (LoRA / custom-diffusion / TI) the pathology
    doesn't apply and the extra dispatch dominates instead, so the first call
    decides per `fuse_update` (None = auto by trainable size) and emits ONE
    fused program.
    """

    dt = spec.compute_dtype
    # Mixed precision: differentiate wrt a bf16 compute copy built INSIDE the
    # grad program, not the fp32 masters — gradients then live in bf16
    # (halves gradient HBM; the optimizer's moment math still runs in fp32).
    # The cast is fused by XLA into its consumers, so it costs read traffic
    # only, never residency: a *persistent* bf16 copy was measured to add
    # 1.7 GB steady-state and OOM the 16 GB chip at batch 8, for a ~2 ms
    # traffic win. Transient-and-fused is the right trade.
    use_compute = dt != jnp.float32

    def _cast_compute(trainable: Params) -> Params:
        return {
            k: v.astype(dt) if jnp.issubdtype(v.dtype, jnp.floating) else v
            for k, v in trainable.items()
        }

    # Small-leaf slab packing (training/packing.py): the state's trainable
    # dict may hold hundreds of tiny leaves packed into a few 1-D slabs.
    # Gradients are taken wrt the PACKED compute copy; `unpack` (custom VJP)
    # restores natural shapes for the model and concatenates the cotangents
    # back into slab gradients, so the optimizer/EMA/apply all run on the
    # packed representation — one kernel per slab instead of one per leaf.
    def _loss_packed(compute: Params, frozen: Params, batch: dict,
                     rng: jax.Array, spec: StepSpec):
        from .packing import unpack

        return compute_loss(unpack(compute, pack_spec), frozen, batch, rng, spec)

    loss_fn = compute_loss if pack_spec is None else _loss_packed

    @jax.jit
    def grad_step(trainable: Params, frozen: Params, batch: dict,
                  rng: jax.Array, step: jnp.ndarray):
        rng_i = jax.random.fold_in(rng, step)
        compute = _cast_compute(trainable) if use_compute else trainable
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, metrics), grads = grad_fn(compute, frozen, batch, rng_i, spec)
        return grads, metrics

    def _apply_update(trainable: Params, opt_state, ema, step, rng,
                      grads: Params):
        updates, opt_state = tx.update(grads, opt_state, trainable)
        ema_dither: dict = {}
        ema_is_bf16 = (ema_enabled and ema is not None
                       and any(v.dtype == jnp.bfloat16
                               for v in ema.shadow.values()))
        if any(v.dtype == jnp.bfloat16 for v in trainable.values()):
            # bf16 masters (optimizer.master_dtype: bf16): the per-step
            # update is far below the bf16 ulp, so a plain cast-add would
            # freeze training — add in fp32 and STOCHASTIC-round back
            # (unbiased, same machinery as the bf16 EMA shadow). Halves
            # master HBM and kills the fp32->bf16 compute-cast traffic.
            # Dither is the counter-hash (fused VPU compute, no draw): the
            # r4 unsafe_rbg draws cost ~27 ms/step across the SR sites.
            # When a bf16 EMA shadow also updates this step, one u32 hash
            # serves both SR sites: high half -> master, low half -> EMA.
            import zlib

            from .ema import (cheap_dither_u32, stochastic_round_bf16_bits,
                              stochastic_round_bf16_cheap)

            new = {}
            for k in sorted(trainable):
                p, u = trainable[k], updates[k]
                if p.dtype != jnp.bfloat16:
                    new[k] = (p + u.astype(p.dtype)).astype(p.dtype)
                    continue
                p32u = p.astype(jnp.float32) + u.astype(jnp.float32)
                if ema_is_bf16 and k.startswith(UNET_PREFIX + ".") \
                        and k in ema.shadow:
                    h = cheap_dither_u32(p.shape, step,
                                         zlib.crc32(k.encode()) ^ 0xE3A0001)
                    new[k] = stochastic_round_bf16_bits(p32u, h >> 16)
                    ema_dither[k] = (h & jnp.uint32(0xFFFF))
                else:
                    new[k] = stochastic_round_bf16_cheap(
                        p32u, step, zlib.crc32(k.encode()) ^ 0xE3A0001)
            trainable = new
        else:
            trainable = jax.tree.map(
                lambda p, u: (p + u.astype(p.dtype)).astype(p.dtype),
                trainable, updates)

        if ema_enabled and ema is not None:
            unet_trainable = {k: v for k, v in trainable.items()
                              if k.startswith(UNET_PREFIX + ".")}
            # counter-hash dither for the bf16-shadow SR store; keys whose
            # master-SR already hashed this step reuse that hash's low half
            ema = ema_update(ema, unet_trainable, step=step,
                             dither=ema_dither or None)

        lr = lr_fn(step)
        new_state = TrainState(
            step=step + 1,
            trainable=trainable,
            opt_state=opt_state,
            ema=ema,
            rng=rng,
        )
        return new_state, lr

    # Donate the state parts (masters/moments/EMA update in place) AND the
    # grads: unused for plain bf16-moment runs (one compile-time warning),
    # but the int8 flat-buffer optimizer aliases the dead grads into its
    # flat/stacked bf16 buffers — part of fitting int8 mode in 16 GB.
    @partial(jax.jit, donate_argnums=(0, 1, 2, 5) if donate else ())
    def update_step(trainable: Params, opt_state, ema, step, rng, grads: Params):
        return _apply_update(trainable, opt_state, ema, step, rng, grads)

    # One fused program: grad + optimizer + EMA. Same math as the split pair
    # (grad_step's jaxpr is inlined); donates the whole state.
    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def fused_step(state: TrainState, frozen: Params, batch: dict):
        rng_i = jax.random.fold_in(state.rng, state.step)
        compute = _cast_compute(state.trainable) if use_compute else state.trainable
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, metrics), grads = grad_fn(compute, frozen, batch, rng_i, spec)
        new_state, lr = _apply_update(state.trainable, state.opt_state,
                                      state.ema, state.step, state.rng, grads)
        metrics = dict(metrics)
        metrics["lr"] = lr
        return new_state, metrics

    def _fuse_for(trainable: Params) -> bool:
        if fuse_update is not None:
            return fuse_update
        n = sum(int(v.size) for v in trainable.values())
        return n <= FUSE_UPDATE_MAX_ELEMS

    def train_step(state: TrainState, frozen: Params, batch: dict):
        if _fuse_for(state.trainable):
            return fused_step(state, frozen, batch)
        grads, metrics = grad_step(state.trainable, frozen, batch,
                                   state.rng, state.step)
        state, lr = update_step(state.trainable, state.opt_state, state.ema,
                                state.step, state.rng, grads)
        metrics = dict(metrics)
        metrics["lr"] = lr
        return state, metrics

    def aot_lower(state, frozen: Params, batch: dict):
        """Lower (without executing) the batch-shape-dependent program for
        AOT bucket warmup: accepts ShapeDtypeStructs. Compiling the result
        populates the persistent XLA compile cache so the first real step
        at each ARB bucket shape is a disk hit, not a cold compile
        (SURVEY §7.3(2); replaces the reference's `benchmark=not arb`
        dodge, /root/reference/train.py:106). The update program is
        batch-shape-independent and compiles once on the first real step."""
        if _fuse_for(state.trainable):
            return fused_step.lower(state, frozen, batch)
        return grad_step.lower(state.trainable, frozen, batch,
                               state.rng, state.step)

    train_step.aot_lower = aot_lower
    return train_step


def init_train_state(rng: jax.Array, trainable: Params, tx: optax.GradientTransformation,
                     ema_enabled: bool, ema_decay: float,
                     ema_dtype=jnp.float32) -> TrainState:
    # Jitted as one program — optimizer/EMA init is hundreds of zeros_like
    # leaves, and eager per-leaf dispatch is slow on remote-attached TPUs.
    def build(trainable, rng):
        ema = None
        if ema_enabled:
            unet_trainable = {k: v for k, v in trainable.items()
                              if k.startswith(UNET_PREFIX + ".")}
            ema = ema_init(unet_trainable, ema_decay, dtype=ema_dtype)
        return TrainState(
            step=jnp.asarray(0, jnp.int32),
            trainable=trainable,
            opt_state=tx.init(trainable),
            ema=ema,
            rng=rng,
        )

    # Donate the incoming trainable buffers: otherwise the caller's reference
    # plus the state's copy double 3.4 GB of masters on a 16 GB chip.
    return jax.jit(build, donate_argnums=(0,))(trainable, rng)
