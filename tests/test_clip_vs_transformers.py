"""Full-model CLIP text encoder parity against transformers' torch implementation.

Builds a randomly-initialised torch CLIPTextModel (no network access needed),
imports its state dict into our flat param format, and compares hidden states
— including the CLIP-skip truncation semantics of the reference
(/root/reference/modules/text_encoders.py:80-82).
"""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from scal_sdt_tpu.models.clip import CLIPTextConfig, clip_text_apply


def _build_pair(num_layers=3, hidden_act="quick_gelu"):
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=1000, hidden_size=64, intermediate_size=128,
        num_hidden_layers=num_layers, num_attention_heads=4,
        max_position_embeddings=77, hidden_act=hidden_act,
    )
    torch.manual_seed(0)
    model = transformers.CLIPTextModel(hf_cfg).eval()
    params = {k: jnp.asarray(v.numpy()) for k, v in model.state_dict().items()
              if "position_ids" not in k}
    ours_cfg = CLIPTextConfig(vocab_size=1000, hidden_size=64, intermediate_size=128,
                              num_hidden_layers=num_layers, num_attention_heads=4,
                              hidden_act=hidden_act)
    return model, params, ours_cfg


def test_clip_gelu_parity_sd2_style():
    # SD2.x text encoders use hidden_act='gelu' (OpenCLIP-derived weights in
    # transformers CLIP layout) rather than SD1.x's quick_gelu.
    model, params, cfg = _build_pair(hidden_act="gelu")
    ids = np.array([[1, 4, 6, 2] + [0] * 73], dtype=np.int64)
    with torch.no_grad():
        theirs = model(torch.from_numpy(ids)).last_hidden_state.numpy()
    ours = np.asarray(clip_text_apply(params, jnp.asarray(ids.astype(np.int32)), cfg))
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def test_clip_last_hidden_state_parity():
    model, params, cfg = _build_pair()
    ids = np.array([[1, 5, 7, 9, 2] + [0] * 72], dtype=np.int64)
    with torch.no_grad():
        theirs = model(torch.from_numpy(ids)).last_hidden_state.numpy()
    ours = np.asarray(clip_text_apply(params, jnp.asarray(ids.astype(np.int32)), cfg))
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def test_clip_skip_matches_truncated_model():
    # Reference semantics: stop_at_layer=2 == a model constructed with one
    # fewer hidden layer (weights of the dropped layer unused).
    model, params, cfg = _build_pair(num_layers=3)
    hf_cfg = model.config
    hf_cfg.num_hidden_layers = 2
    truncated = transformers.CLIPTextModel(hf_cfg).eval()
    truncated.load_state_dict(model.state_dict(), strict=False)
    # re-copy shared weights for the 2 remaining layers + embeddings + final LN
    sd = {k: v for k, v in model.state_dict().items() if "layers.2" not in k}
    truncated.load_state_dict(sd, strict=False)

    ids = np.array([[1, 11, 22, 2] + [0] * 73], dtype=np.int64)
    with torch.no_grad():
        theirs = truncated(torch.from_numpy(ids)).last_hidden_state.numpy()
    ours = np.asarray(clip_text_apply(params, jnp.asarray(ids.astype(np.int32)), cfg, stop_at_layer=2))
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)
