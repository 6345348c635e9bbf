"""MMDiT (SD3-family rectified-flow transformer) over a flat param dict.

Third model family, beyond the reference's scope entirely (MooerFoes/scal-sdt
is SD1.x-only, ``/root/reference/modules/model.py:96-133``): the multimodal
diffusion transformer of Stable Diffusion 3 (arXiv:2403.03206 — two streams,
joint attention, adaLN-zero conditioning on timestep + pooled text).

Parameter names and tensor layouts follow diffusers'
``SD3Transformer2DModel`` state dict (torch Linear ``(out, in)``; patch-embed
conv OIHW) so checkpoints, optim-target specs, and LoRA tooling address SD3
weights by their canonical names — the same design as ``unet.py``. Real-weight
numerical validation is pending actual SD3 checkpoints (none exist in this
offline image); the architecture is parity-tested against an independent
torch oracle (``tests/test_mmdit.py``) and the SD3-Medium shape template
reproduces the published ~2.0B MMDiT parameter count.

TPU-first: NHWC latents; the joint attention runs through ``ops.attention``
(splash kernel on long sequences, head sharding under tensor parallelism);
adaLN projections are plain MXU matmuls; patchify is one strided conv.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import multi_head_attention
from .functional import Params, linear, timestep_embedding

# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class MMDiTConfig:
    sample_size: int = 128            # latent grid (pixels/8)
    patch_size: int = 2
    in_channels: int = 16
    out_channels: int = 16
    num_layers: int = 24
    attention_head_dim: int = 64
    num_attention_heads: int = 24
    joint_attention_dim: int = 4096   # prompt-embed width (T5-XXL / padded CLIP)
    pooled_projection_dim: int = 2048  # concat(CLIP-L, CLIP-bigG) pooled
    pos_embed_max_size: int = 192
    # SD3.5 adds per-head RMS q/k norms ('rms_norm'); SD3-Medium has none.
    qk_norm: str | None = None
    # SD3.5-Medium (MMDiT-X): these block indices carry a SECOND, latent-only
    # self-attention (attn2) fed by a 9-chunk adaLN (diffusers
    # SD35AdaLayerNormZeroX + dual_attention_layers).
    dual_attention_layers: tuple[int, ...] = ()

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @classmethod
    def sd3_medium(cls) -> "MMDiTConfig":
        # stabilityai/stable-diffusion-3-medium transformer/config.json
        return cls()

    @classmethod
    def tiny(cls) -> "MMDiTConfig":
        return cls(sample_size=8, patch_size=2, in_channels=4, out_channels=4,
                   num_layers=2, attention_head_dim=8, num_attention_heads=2,
                   joint_attention_dim=24, pooled_projection_dim=20,
                   pos_embed_max_size=12)

    @classmethod
    def from_json(cls, d: dict) -> "MMDiTConfig":
        return cls(
            sample_size=int(d.get("sample_size", 128)),
            patch_size=int(d.get("patch_size", 2)),
            in_channels=int(d.get("in_channels", 16)),
            out_channels=int(d.get("out_channels", d.get("in_channels", 16))),
            num_layers=int(d.get("num_layers", 24)),
            attention_head_dim=int(d.get("attention_head_dim", 64)),
            num_attention_heads=int(d.get("num_attention_heads", 24)),
            joint_attention_dim=int(d.get("joint_attention_dim", 4096)),
            pooled_projection_dim=int(d.get("pooled_projection_dim", 2048)),
            pos_embed_max_size=int(d.get("pos_embed_max_size", 192)),
            qk_norm=d.get("qk_norm"),
            dual_attention_layers=tuple(d.get("dual_attention_layers") or ()),
        )


# --- building blocks ---------------------------------------------------------


def _layer_norm_noaffine(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _ada_ln_zero(p: Params, name: str, x: jnp.ndarray, temb: jnp.ndarray):
    """AdaLayerNormZero: LN(x)*(1+scale)+shift plus attn/mlp gates.

    diffusers chunk order: shift_msa, scale_msa, gate_msa, shift_mlp,
    scale_mlp, gate_mlp (models/normalization.py AdaLayerNormZero).
    """
    emb = linear(p, f"{name}.linear", jax.nn.silu(temb))
    parts = jnp.split(emb[:, None, :], 6, axis=-1)
    shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = parts
    normed = _layer_norm_noaffine(x) * (1.0 + scale_msa) + shift_msa
    return normed, gate_msa, shift_mlp, scale_mlp, gate_mlp


def _ada_ln_zero_x(p: Params, name: str, x: jnp.ndarray, temb: jnp.ndarray):
    """SD35AdaLayerNormZeroX (dual-attention blocks): one LN, TWO
    shift/scale/gate triples — the second modulation feeds the latent-only
    attn2 stream. diffusers chunk order: shift_msa, scale_msa, gate_msa,
    shift_mlp, scale_mlp, gate_mlp, shift_msa2, scale_msa2, gate_msa2."""
    emb = linear(p, f"{name}.linear", jax.nn.silu(temb))
    (shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp,
     shift_msa2, scale_msa2, gate_msa2) = jnp.split(emb[:, None, :], 9, axis=-1)
    base = _layer_norm_noaffine(x)
    normed = base * (1.0 + scale_msa) + shift_msa
    normed2 = base * (1.0 + scale_msa2) + shift_msa2
    return (normed, gate_msa, shift_mlp, scale_mlp, gate_mlp,
            normed2, gate_msa2)


def _ada_ln_continuous(p: Params, name: str, x: jnp.ndarray,
                       temb: jnp.ndarray) -> jnp.ndarray:
    """AdaLayerNormContinuous: LN(x)*(1+scale)+shift.

    diffusers chunk order: scale, shift (models/normalization.py
    AdaLayerNormContinuous.forward).
    """
    emb = linear(p, f"{name}.linear", jax.nn.silu(temb))
    scale, shift = jnp.split(emb[:, None, :], 2, axis=-1)
    return _layer_norm_noaffine(x) * (1.0 + scale) + shift


def _gelu_tanh_ff(p: Params, name: str, x: jnp.ndarray) -> jnp.ndarray:
    """diffusers FeedForward(activation_fn='gelu-approximate')."""
    h = linear(p, f"{name}.net.0.proj", x)
    h = jax.nn.gelu(h, approximate=True)
    return linear(p, f"{name}.net.2", h)


def _maybe_rms_head_norm(p: Params, name: str, x: jnp.ndarray,
                         num_heads: int) -> jnp.ndarray:
    """SD3.5 per-head RMSNorm on q/k (diffusers attn.norm_q/.norm_k)."""
    w = p.get(f"{name}.weight")
    if w is None:
        return x
    b, l, c = x.shape
    d = c // num_heads
    xh = x.reshape(b, l, num_heads, d).astype(jnp.float32)
    xh = xh * jax.lax.rsqrt(jnp.mean(jnp.square(xh), axis=-1, keepdims=True) + 1e-6)
    return (xh * w.astype(jnp.float32)).reshape(b, l, c).astype(x.dtype)


def _joint_block(p: Params, pre: str, hidden: jnp.ndarray, context: jnp.ndarray,
                 temb: jnp.ndarray, config: MMDiTConfig, pre_only: bool,
                 dual: bool = False):
    """One JointTransformerBlock: joint attention over [hidden; context].

    `pre_only` (final block): the context stream contributes q/k/v but its
    attention output is discarded — no to_add_out / ff_context, and its norm
    is the 2-parameter continuous adaLN (diffusers context_pre_only).
    `dual` (SD3.5-Medium MMDiT-X): an extra latent-only self-attention
    (attn2) residual between the joint attention and the MLP.
    """
    h = config.num_attention_heads

    if dual:
        (n_h, gate_msa, shift_mlp, scale_mlp, gate_mlp,
         n_h2, gate_msa2) = _ada_ln_zero_x(p, f"{pre}.norm1", hidden, temb)
    else:
        n_h, gate_msa, shift_mlp, scale_mlp, gate_mlp = _ada_ln_zero(
            p, f"{pre}.norm1", hidden, temb)
    if pre_only:
        n_c = _ada_ln_continuous(p, f"{pre}.norm1_context", context, temb)
        c_gates = None
    else:
        n_c, c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp = _ada_ln_zero(
            p, f"{pre}.norm1_context", context, temb)
        c_gates = (c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp)

    q = _maybe_rms_head_norm(p, f"{pre}.attn.norm_q",
                             linear(p, f"{pre}.attn.to_q", n_h), h)
    k = _maybe_rms_head_norm(p, f"{pre}.attn.norm_k",
                             linear(p, f"{pre}.attn.to_k", n_h), h)
    v = linear(p, f"{pre}.attn.to_v", n_h)
    qc = _maybe_rms_head_norm(p, f"{pre}.attn.norm_added_q",
                              linear(p, f"{pre}.attn.add_q_proj", n_c), h)
    kc = _maybe_rms_head_norm(p, f"{pre}.attn.norm_added_k",
                              linear(p, f"{pre}.attn.add_k_proj", n_c), h)
    vc = linear(p, f"{pre}.attn.add_v_proj", n_c)

    lh = hidden.shape[1]
    # joint sequence: latent tokens first, then context (diffusers
    # JointAttnProcessor concatenation order)
    q_all = jnp.concatenate([q, qc], axis=1)
    k_all = jnp.concatenate([k, kc], axis=1)
    v_all = jnp.concatenate([v, vc], axis=1)
    attn = multi_head_attention(q_all, k_all, v_all, h)
    attn_h, attn_c = attn[:, :lh], attn[:, lh:]

    hidden = hidden + gate_msa * linear(p, f"{pre}.attn.to_out.0", attn_h)
    if dual:
        q2 = _maybe_rms_head_norm(p, f"{pre}.attn2.norm_q",
                                  linear(p, f"{pre}.attn2.to_q", n_h2), h)
        k2 = _maybe_rms_head_norm(p, f"{pre}.attn2.norm_k",
                                  linear(p, f"{pre}.attn2.to_k", n_h2), h)
        v2 = linear(p, f"{pre}.attn2.to_v", n_h2)
        attn2 = multi_head_attention(q2, k2, v2, h)
        hidden = hidden + gate_msa2 * linear(p, f"{pre}.attn2.to_out.0", attn2)
    n2 = _layer_norm_noaffine(hidden) * (1.0 + scale_mlp) + shift_mlp
    hidden = hidden + gate_mlp * _gelu_tanh_ff(p, f"{pre}.ff", n2)

    if pre_only:
        return hidden, context
    c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp = c_gates
    context = context + c_gate_msa * linear(p, f"{pre}.attn.to_add_out", attn_c)
    n2c = _layer_norm_noaffine(context) * (1.0 + c_scale_mlp) + c_shift_mlp
    context = context + c_gate_mlp * _gelu_tanh_ff(p, f"{pre}.ff_context", n2c)
    return hidden, context


def cropped_pos_embed(pos: jnp.ndarray, h_p: int, w_p: int,
                      max_size: int) -> jnp.ndarray:
    """Center-crop the (1, max*max, D) table to the (h_p, w_p) patch grid
    (diffusers PatchEmbed.cropped_pos_embed)."""
    d = pos.shape[-1]
    if h_p > max_size or w_p > max_size:
        raise ValueError(
            f"Latent patch grid {h_p}x{w_p} exceeds the model's sincos "
            f"pos_embed table ({max_size}x{max_size}): the requested "
            "resolution is larger than this MMDiT supports (raise "
            "pos_embed_max_size / mmdit_pos_embed_max_size or sample "
            "smaller)")
    grid = pos.reshape(max_size, max_size, d)
    top = (max_size - h_p) // 2
    left = (max_size - w_p) // 2
    return grid[top:top + h_p, left:left + w_p].reshape(1, h_p * w_p, d)


def mmdit_apply(params: Params, latents: jnp.ndarray, timesteps: jnp.ndarray,
                context: jnp.ndarray, pooled: jnp.ndarray,
                config: MMDiTConfig) -> jnp.ndarray:
    """latents: (B, H, W, C_in) NHWC; timesteps: (B,) float in [0, 1000];
    context: (B, L, joint_attention_dim); pooled: (B, pooled_projection_dim).
    Returns the predicted flow velocity, (B, H, W, C_out)."""
    p = params
    dt = latents.dtype
    b, h_img, w_img, _ = latents.shape
    ps = config.patch_size
    h_p, w_p = h_img // ps, w_img // ps

    # patchify: one strided conv (pos_embed.proj, OIHW), then flatten
    x = jax.lax.conv_general_dilated(
        latents, p["pos_embed.proj.weight"].astype(dt),
        window_strides=(ps, ps), padding="VALID",
        dimension_numbers=("NHWC", "OIHW", "NHWC"))
    x = x + p["pos_embed.proj.bias"].astype(dt)
    x = x.reshape(b, h_p * w_p, config.inner_dim)
    x = x + cropped_pos_embed(p["pos_embed.pos_embed"], h_p, w_p,
                              config.pos_embed_max_size).astype(dt)

    # timestep + pooled-text embedding (CombinedTimestepTextProjEmbeddings)
    t_freq = timestep_embedding(timesteps, 256, flip_sin_to_cos=True,
                                downscale_freq_shift=0.0, dtype=dt)
    t_emb = linear(p, "time_text_embed.timestep_embedder.linear_1", t_freq)
    t_emb = linear(p, "time_text_embed.timestep_embedder.linear_2",
                   jax.nn.silu(t_emb))
    y_emb = linear(p, "time_text_embed.text_embedder.linear_1",
                   pooled.astype(dt))
    y_emb = linear(p, "time_text_embed.text_embedder.linear_2",
                   jax.nn.silu(y_emb))
    temb = t_emb + y_emb

    c = linear(p, "context_embedder", context.astype(dt))

    for i in range(config.num_layers):
        x, c = _joint_block(p, f"transformer_blocks.{i}", x, c, temb, config,
                            pre_only=(i == config.num_layers - 1),
                            dual=(i in config.dual_attention_layers))

    x = _ada_ln_continuous(p, "norm_out", x, temb)
    x = linear(p, "proj_out", x)  # (B, Lh, ps*ps*C_out)

    # unpatchify (diffusers order: h w p1 p2 c)
    x = x.reshape(b, h_p, w_p, ps, ps, config.out_channels)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h_img, w_img,
                                              config.out_channels)
    return x


# --- parameter templates -----------------------------------------------------


def sincos_pos_embed_2d(dim: int, size: int) -> np.ndarray:
    """(1, size*size, dim) fixed 2-D sin-cos table (diffusers
    get_2d_sincos_pos_embed, grid order (h, w), concat [h-emb, w-emb])."""
    def one_dim(positions: np.ndarray) -> np.ndarray:
        half = dim // 4
        omega = 1.0 / (10000.0 ** (np.arange(half, dtype=np.float64) / half))
        out = np.einsum("p,f->pf", positions.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    grid_h, grid_w = np.meshgrid(np.arange(size, dtype=np.float64),
                                 np.arange(size, dtype=np.float64),
                                 indexing="ij")
    emb = np.concatenate([one_dim(grid_h), one_dim(grid_w)], axis=1)
    return emb[None].astype(np.float32)


def mmdit_param_shapes(config: MMDiTConfig) -> dict[str, tuple[int, ...]]:
    d = config.inner_dim
    ps, cin, cout = config.patch_size, config.in_channels, config.out_channels
    shapes: dict[str, tuple[int, ...]] = {
        "pos_embed.proj.weight": (d, cin, ps, ps),
        "pos_embed.proj.bias": (d,),
        "pos_embed.pos_embed": (1, config.pos_embed_max_size ** 2, d),
        "time_text_embed.timestep_embedder.linear_1.weight": (d, 256),
        "time_text_embed.timestep_embedder.linear_1.bias": (d,),
        "time_text_embed.timestep_embedder.linear_2.weight": (d, d),
        "time_text_embed.timestep_embedder.linear_2.bias": (d,),
        "time_text_embed.text_embedder.linear_1.weight":
            (d, config.pooled_projection_dim),
        "time_text_embed.text_embedder.linear_1.bias": (d,),
        "time_text_embed.text_embedder.linear_2.weight": (d, d),
        "time_text_embed.text_embedder.linear_2.bias": (d,),
        "context_embedder.weight": (d, config.joint_attention_dim),
        "context_embedder.bias": (d,),
        "norm_out.linear.weight": (2 * d, d),
        "norm_out.linear.bias": (2 * d,),
        "proj_out.weight": (ps * ps * cout, d),
        "proj_out.bias": (ps * ps * cout,),
    }
    head_dim = config.attention_head_dim
    for i in range(config.num_layers):
        pre = f"transformer_blocks.{i}"
        pre_only = i == config.num_layers - 1
        dual = i in config.dual_attention_layers
        nh = 9 if dual else 6
        shapes[f"{pre}.norm1.linear.weight"] = (nh * d, d)
        shapes[f"{pre}.norm1.linear.bias"] = (nh * d,)
        if dual:
            for proj in ("to_q", "to_k", "to_v"):
                shapes[f"{pre}.attn2.{proj}.weight"] = (d, d)
                shapes[f"{pre}.attn2.{proj}.bias"] = (d,)
            shapes[f"{pre}.attn2.to_out.0.weight"] = (d, d)
            shapes[f"{pre}.attn2.to_out.0.bias"] = (d,)
            if config.qk_norm:
                shapes[f"{pre}.attn2.norm_q.weight"] = (head_dim,)
                shapes[f"{pre}.attn2.norm_k.weight"] = (head_dim,)
        nc = 2 if pre_only else 6
        shapes[f"{pre}.norm1_context.linear.weight"] = (nc * d, d)
        shapes[f"{pre}.norm1_context.linear.bias"] = (nc * d,)
        for proj in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj",
                     "add_v_proj"):
            shapes[f"{pre}.attn.{proj}.weight"] = (d, d)
            shapes[f"{pre}.attn.{proj}.bias"] = (d,)
        if config.qk_norm:
            for n in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
                shapes[f"{pre}.attn.{n}.weight"] = (head_dim,)
        shapes[f"{pre}.attn.to_out.0.weight"] = (d, d)
        shapes[f"{pre}.attn.to_out.0.bias"] = (d,)
        shapes[f"{pre}.ff.net.0.proj.weight"] = (4 * d, d)
        shapes[f"{pre}.ff.net.0.proj.bias"] = (4 * d,)
        shapes[f"{pre}.ff.net.2.weight"] = (d, 4 * d)
        shapes[f"{pre}.ff.net.2.bias"] = (d,)
        if not pre_only:
            shapes[f"{pre}.attn.to_add_out.weight"] = (d, d)
            shapes[f"{pre}.attn.to_add_out.bias"] = (d,)
            shapes[f"{pre}.ff_context.net.0.proj.weight"] = (4 * d, d)
            shapes[f"{pre}.ff_context.net.0.proj.bias"] = (4 * d,)
            shapes[f"{pre}.ff_context.net.2.weight"] = (d, 4 * d)
            shapes[f"{pre}.ff_context.net.2.bias"] = (d,)
    return shapes


def init_mmdit_params(rng: jax.Array, config: MMDiTConfig,
                      dtype=jnp.float32) -> Params:
    shapes = mmdit_param_shapes(config)

    def init(key):
        params: Params = {}
        keys = jax.random.split(key, len(shapes))
        for k, (name, shape) in zip(keys, sorted(shapes.items())):
            if name == "pos_embed.pos_embed":
                params[name] = jnp.asarray(
                    sincos_pos_embed_2d(config.inner_dim,
                                        config.pos_embed_max_size), dtype)
            elif name.endswith((".norm_q.weight", ".norm_k.weight",
                                ".norm_added_q.weight",
                                ".norm_added_k.weight")):  # qk RMSNorm scales
                params[name] = jnp.ones(shape, dtype)
            elif name.endswith(".bias"):
                params[name] = jnp.zeros(shape, dtype)
            else:
                fan_in = shape[-1] if len(shape) == 2 else int(np.prod(shape[1:]))
                params[name] = (jax.random.normal(k, shape, dtype)
                                * (fan_in ** -0.5) * 0.5)
        return params

    return jax.jit(init)(rng)
