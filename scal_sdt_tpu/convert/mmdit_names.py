"""MMDiT (SD3-family) state-dict bijection: sgm single-file <-> diffusers.

SD3/SD3.5 single-file checkpoints (the WebUI/ComfyUI distribution format)
store the MMDiT under ``model.diffusion_model.*`` in the sgm reference
implementation's naming (``joint_blocks.{i}.x_block/context_block``, fused
``attn.qkv``), text towers under ``text_encoders.{clip_l,clip_g,t5xxl}.*``
(already transformers layout), and the 16-channel VAE under
``first_stage_model.*``. Our canonical naming is diffusers'
``SD3Transformer2DModel`` (models/mmdit.py), so loading/publishing needs the
bijection below — a semantic transcription of diffusers'
``scripts/convert_sd3_to_diffusers.py`` (fused-qkv chunk, the
``swap_scale_shift`` half-swap on the two continuous adaLN heads).

Beyond-reference capability: the torch reference is SD1.x-only
(``/root/reference/modules/convert/sd_to_diffusers.py:583-586``).
"""

from __future__ import annotations

import re
from typing import Iterable

import numpy as np

__all__ = [
    "convert_mmdit_state_sgm_to_df",
    "convert_mmdit_state_df_to_sgm",
    "mmdit_config_from_sgm_state",
]

# sgm name (relative to model.diffusion_model.) <-> diffusers name, for the
# non-block tensors. adaLN heads that need the half-swap are handled apart.
_TOP_LEVEL = [
    ("x_embedder.proj.weight", "pos_embed.proj.weight"),
    ("x_embedder.proj.bias", "pos_embed.proj.bias"),
    ("pos_embed", "pos_embed.pos_embed"),
    ("t_embedder.mlp.0.weight", "time_text_embed.timestep_embedder.linear_1.weight"),
    ("t_embedder.mlp.0.bias", "time_text_embed.timestep_embedder.linear_1.bias"),
    ("t_embedder.mlp.2.weight", "time_text_embed.timestep_embedder.linear_2.weight"),
    ("t_embedder.mlp.2.bias", "time_text_embed.timestep_embedder.linear_2.bias"),
    ("y_embedder.mlp.0.weight", "time_text_embed.text_embedder.linear_1.weight"),
    ("y_embedder.mlp.0.bias", "time_text_embed.text_embedder.linear_1.bias"),
    ("y_embedder.mlp.2.weight", "time_text_embed.text_embedder.linear_2.weight"),
    ("y_embedder.mlp.2.bias", "time_text_embed.text_embedder.linear_2.bias"),
    ("context_embedder.weight", "context_embedder.weight"),
    ("context_embedder.bias", "context_embedder.bias"),
    ("final_layer.linear.weight", "proj_out.weight"),
    ("final_layer.linear.bias", "proj_out.bias"),
]

# per-block suffix pairs (sgm, diffusers) that copy straight through.
# Fused qkv and the pre_only context adaLN are handled separately.
_BLOCK_DIRECT = [
    ("x_block.attn.proj.weight", "attn.to_out.0.weight"),
    ("x_block.attn.proj.bias", "attn.to_out.0.bias"),
    # SD3.5-Medium dual-attention (MMDiT-X) latent-only second attention
    ("x_block.attn2.proj.weight", "attn2.to_out.0.weight"),
    ("x_block.attn2.proj.bias", "attn2.to_out.0.bias"),
    ("x_block.attn2.ln_q.weight", "attn2.norm_q.weight"),
    ("x_block.attn2.ln_k.weight", "attn2.norm_k.weight"),
    ("context_block.attn.proj.weight", "attn.to_add_out.weight"),
    ("context_block.attn.proj.bias", "attn.to_add_out.bias"),
    ("x_block.attn.ln_q.weight", "attn.norm_q.weight"),
    ("x_block.attn.ln_k.weight", "attn.norm_k.weight"),
    ("context_block.attn.ln_q.weight", "attn.norm_added_q.weight"),
    ("context_block.attn.ln_k.weight", "attn.norm_added_k.weight"),
    ("x_block.adaLN_modulation.1.weight", "norm1.linear.weight"),
    ("x_block.adaLN_modulation.1.bias", "norm1.linear.bias"),
    ("x_block.mlp.fc1.weight", "ff.net.0.proj.weight"),
    ("x_block.mlp.fc1.bias", "ff.net.0.proj.bias"),
    ("x_block.mlp.fc2.weight", "ff.net.2.weight"),
    ("x_block.mlp.fc2.bias", "ff.net.2.bias"),
    ("context_block.mlp.fc1.weight", "ff_context.net.0.proj.weight"),
    ("context_block.mlp.fc1.bias", "ff_context.net.0.proj.bias"),
    ("context_block.mlp.fc2.weight", "ff_context.net.2.weight"),
    ("context_block.mlp.fc2.bias", "ff_context.net.2.bias"),
]

_QKV = [("x_block.attn.qkv", "attn.to_q", "attn.to_k", "attn.to_v"),
        ("context_block.attn.qkv",
         "attn.add_q_proj", "attn.add_k_proj", "attn.add_v_proj"),
        ("x_block.attn2.qkv", "attn2.to_q", "attn2.to_k", "attn2.to_v")]


def _swap_scale_shift(w: np.ndarray) -> np.ndarray:
    """sgm continuous-adaLN heads emit [shift, scale]; diffusers
    AdaLayerNormContinuous emits [scale, shift] (convert_sd3_to_diffusers.py
    swap_scale_shift). Involution — the same swap converts both ways."""
    w = np.asarray(w)
    half = w.shape[0] // 2
    return np.concatenate([w[half:], w[:half]], axis=0)


def _count_blocks(names: Iterable[str], pat: str) -> int:
    rx = re.compile(pat)
    idx = [int(m.group(1)) for n in names if (m := rx.match(n))]
    return max(idx) + 1 if idx else 0


def _infer_inner_dim(state: dict) -> int | None:
    """MMDiT width d from any projection touching d. adaLN heads, attention
    projections, and the x_embedder take d as the contracting dim
    (in_features, shape[1]); the fc2-style MLP out-projections map 4d->d, so
    d is their OUT dim (shape[0]) — using shape[1] there would read 4d and
    poison the bias-only continuous-adaLN detection (ADVICE r4)."""
    for k, v in state.items():
        if k.endswith((".adaLN_modulation.1.weight", "norm1.linear.weight",
                       "norm1_context.linear.weight", "attn.to_q.weight",
                       "attn.qkv.weight")):
            return int(np.asarray(v).shape[1])
        if k.endswith(("ff.net.2.weight", "mlp.fc2.weight")):
            return int(np.asarray(v).shape[0])
    return None


def _ctx_adaln_is_continuous(state: dict, wkey: str, bkey: str,
                             inner_dim: int | None, fallback: bool) -> bool:
    """True iff the block's context adaLN head is the 2-chunk continuous
    variant (the context_pre_only final block) rather than 6-chunk
    AdaLayerNormZero — decided structurally from the head's own output dim
    (2*d vs 6*d), NOT by block index, so partial trainable-only states whose
    highest saved block is not the model's true final block convert
    correctly. Falls back to the index heuristic only for a bias-only head
    with no width-bearing tensor anywhere in the state."""
    if wkey in state:
        w = np.asarray(state[wkey])
        return int(w.shape[0]) == 2 * int(w.shape[1])
    if bkey in state and inner_dim:
        return int(np.asarray(state[bkey]).shape[0]) == 2 * inner_dim
    return fallback


def convert_mmdit_state_sgm_to_df(state: dict) -> dict:
    """sgm MMDiT state (keys relative to ``model.diffusion_model.``) ->
    diffusers ``SD3Transformer2DModel`` naming (our canonical names)."""
    n = _count_blocks(state, r"joint_blocks\.(\d+)\.")
    if n == 0:
        raise ValueError("No joint_blocks.* keys: not an sgm MMDiT state")
    out: dict = {}
    consumed = set()

    def take(sgm_name):
        consumed.add(sgm_name)
        return state[sgm_name]

    for sgm, df in _TOP_LEVEL:
        if sgm in state:
            out[df] = take(sgm)
    # pos_embed may be stored (max*max, d); canonical is (1, max*max, d)
    if "pos_embed.pos_embed" in out and np.asarray(out["pos_embed.pos_embed"]).ndim == 2:
        out["pos_embed.pos_embed"] = np.asarray(out["pos_embed.pos_embed"])[None]
    for suffix in ("weight", "bias"):
        k = f"final_layer.adaLN_modulation.1.{suffix}"
        if k in state:
            out[f"norm_out.linear.{suffix}"] = _swap_scale_shift(take(k))

    inner_dim = _infer_inner_dim(state)
    for i in range(n):
        pre_sgm, pre_df = f"joint_blocks.{i}.", f"transformer_blocks.{i}."
        for sgm_suf, df_suf in _BLOCK_DIRECT:
            k = pre_sgm + sgm_suf
            if k in state:
                out[pre_df + df_suf] = take(k)
        for sgm_suf, q, kk, v in _QKV:
            for wb in ("weight", "bias"):
                k = f"{pre_sgm}{sgm_suf}.{wb}"
                if k in state:
                    parts = np.split(np.asarray(take(k)), 3, axis=0)
                    out[f"{pre_df}{q}.{wb}"] = parts[0]
                    out[f"{pre_df}{kk}.{wb}"] = parts[1]
                    out[f"{pre_df}{v}.{wb}"] = parts[2]
        # context_pre_only (2-chunk continuous) adaLN is stored [shift,
        # scale] in sgm -> [scale, shift] in diffusers; decided by the
        # head's own 2*d-vs-6*d output dim, not by block index
        pre_only = _ctx_adaln_is_continuous(
            state, f"{pre_sgm}context_block.adaLN_modulation.1.weight",
            f"{pre_sgm}context_block.adaLN_modulation.1.bias",
            inner_dim, i == n - 1)
        for wb in ("weight", "bias"):
            k = f"{pre_sgm}context_block.adaLN_modulation.1.{wb}"
            if k in state:
                val = take(k)
                out[f"{pre_df}norm1_context.linear.{wb}"] = (
                    _swap_scale_shift(val) if pre_only else val)

    leftover = [k for k in state if k not in consumed]
    if leftover:
        preview = ", ".join(sorted(leftover)[:8])
        raise ValueError(
            f"sgm MMDiT state has {len(leftover)} unconsumed keys "
            f"(first: {preview})")
    return out


def convert_mmdit_state_df_to_sgm(state: dict) -> dict:
    """Inverse: diffusers ``SD3Transformer2DModel`` naming -> sgm single-file
    naming (relative to ``model.diffusion_model.``). Accepts partial states
    (e.g. trainable-only checkpoints) as long as fused-qkv triples are whole."""
    n = _count_blocks(state, r"transformer_blocks\.(\d+)\.")
    out: dict = {}
    consumed = set()

    for sgm, df in _TOP_LEVEL:
        if df in state:
            out[sgm] = state[df]
            consumed.add(df)
    for suffix in ("weight", "bias"):
        k = f"norm_out.linear.{suffix}"
        if k in state:
            out[f"final_layer.adaLN_modulation.1.{suffix}"] = _swap_scale_shift(state[k])
            consumed.add(k)

    inner_dim = _infer_inner_dim(state)
    for i in range(n):
        pre_sgm, pre_df = f"joint_blocks.{i}.", f"transformer_blocks.{i}."
        for sgm_suf, df_suf in _BLOCK_DIRECT:
            k = pre_df + df_suf
            if k in state:
                out[pre_sgm + sgm_suf] = state[k]
                consumed.add(k)
        for sgm_suf, q, kk, v in _QKV:
            for wb in ("weight", "bias"):
                names = [f"{pre_df}{p}.{wb}" for p in (q, kk, v)]
                present = [nm for nm in names if nm in state]
                if not present:
                    continue
                if len(present) != 3:
                    raise ValueError(
                        f"Partial fused-qkv triple at {pre_df}attn "
                        f"({len(present)}/3 of {q}/{kk}/{v}.{wb}): cannot "
                        "emit the sgm fused tensor")
                out[f"{pre_sgm}{sgm_suf}.{wb}"] = np.concatenate(
                    [np.asarray(state[nm]) for nm in names], axis=0)
                consumed.update(names)
        # structural 2*d-vs-6*d decision (see sgm->df direction): a partial
        # state's highest block need not be the model's final block
        pre_only = _ctx_adaln_is_continuous(
            state, f"{pre_df}norm1_context.linear.weight",
            f"{pre_df}norm1_context.linear.bias",
            inner_dim, i == n - 1)
        for wb in ("weight", "bias"):
            k = f"{pre_df}norm1_context.linear.{wb}"
            if k in state:
                val = state[k]
                out[f"{pre_sgm}context_block.adaLN_modulation.1.{wb}"] = (
                    _swap_scale_shift(val) if pre_only else val)
                consumed.add(k)

    leftover = [k for k in state if k not in consumed]
    if leftover:
        preview = ", ".join(sorted(leftover)[:8])
        raise ValueError(
            f"diffusers MMDiT state has {len(leftover)} unconsumed keys "
            f"(first: {preview})")
    return out


def mmdit_config_from_sgm_state(state: dict, head_dim: int = 64,
                                pos_embed_max_size: int | None = None):
    """Infer MMDiTConfig from an sgm-layout MMDiT state dict's shapes
    (single-file checkpoints carry no config.json). Head dim 64 is fixed
    across all SD3/SD3.5 releases; the override exists for miniature test
    fixtures. ``pos_embed_max_size`` overrides the sincos-grid size for
    checkpoints stripped of the fixed buffer (else it is read from the
    buffer's shape, defaulting to SD3-Medium's 192 with a warning)."""
    from ..models.mmdit import MMDiTConfig

    xw = np.asarray(state["x_embedder.proj.weight"])
    d, cin, ps = int(xw.shape[0]), int(xw.shape[1]), int(xw.shape[2])
    if d % head_dim != 0:
        raise ValueError(
            f"MMDiT width {d} is not divisible by head_dim {head_dim}; the "
            "head count cannot be inferred from a single-file checkpoint — "
            "pass head_dim explicitly")
    n = _count_blocks(state, r"joint_blocks\.(\d+)\.")
    if "pos_embed" in state:
        pos = np.asarray(state["pos_embed"])
        max_size = int(round(float(pos.shape[-2]) ** 0.5))
        if pos_embed_max_size is not None and pos_embed_max_size != max_size:
            raise ValueError(
                f"pos_embed_max_size override {pos_embed_max_size} conflicts "
                f"with the checkpoint's own sincos table ({max_size})")
    elif pos_embed_max_size is not None:
        max_size = int(pos_embed_max_size)
    else:
        # the sincos table is a fixed (non-persistent in some exports)
        # buffer; SD3-Medium's published crop size
        max_size = 192
        import logging

        logging.getLogger(__name__).warning(
            "sgm MMDiT state has no pos_embed buffer; defaulting "
            "pos_embed_max_size=192 (SD3-Medium). Pass "
            "mmdit_pos_embed_max_size in the config / --pos-embed-max-size "
            "if this is a different variant.")
    cout = int(np.asarray(state["final_layer.linear.weight"]).shape[0]) // (ps * ps)
    return MMDiTConfig(
        patch_size=ps, in_channels=cin, out_channels=cout, num_layers=n,
        attention_head_dim=head_dim, num_attention_heads=d // head_dim,
        joint_attention_dim=int(np.asarray(state["context_embedder.weight"]).shape[1]),
        pooled_projection_dim=int(np.asarray(state["y_embedder.mlp.0.weight"]).shape[1]),
        pos_embed_max_size=max_size,
        qk_norm=("rms_norm" if "joint_blocks.0.x_block.attn.ln_q.weight" in state
                 else None),
        dual_attention_layers=tuple(
            i for i in range(n)
            if f"joint_blocks.{i}.x_block.attn2.qkv.weight" in state),
    )
