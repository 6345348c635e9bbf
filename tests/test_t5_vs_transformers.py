"""T5 encoder numerical parity vs transformers (torch CPU), both FF variants.

Closes the reference's CLIP+T5 ensemble gap
(/root/reference/modules/text_encoders.py:137-147): the T5 member is now a
real JAX implementation, not just concat plumbing.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scal_sdt_tpu.models.t5 import (
    T5Config,
    init_t5_params,
    t5_encoder_apply,
    t5_param_shapes,
)

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")


def _hf_config(cfg: T5Config):
    return transformers.T5Config(
        vocab_size=cfg.vocab_size, d_model=cfg.d_model, d_kv=cfg.d_kv,
        d_ff=cfg.d_ff, num_layers=cfg.num_layers, num_heads=cfg.num_heads,
        relative_attention_num_buckets=cfg.relative_attention_num_buckets,
        relative_attention_max_distance=cfg.relative_attention_max_distance,
        feed_forward_proj=cfg.feed_forward_proj, dropout_rate=0.0,
        is_encoder_decoder=False, use_cache=False)


@pytest.mark.parametrize("ff", ["relu", "gated-gelu"])
def test_t5_encoder_matches_transformers(ff):
    cfg = T5Config(vocab_size=128, d_model=32, d_kv=8, d_ff=64,
                   num_layers=2, num_heads=4, feed_forward_proj=ff)
    torch.manual_seed(0)
    model = transformers.T5EncoderModel(_hf_config(cfg)).eval()

    state = {k: v.numpy().copy() for k, v in model.state_dict().items()}
    # our shape template must cover exactly the encoder tensors
    ours = set(t5_param_shapes(cfg))
    theirs = {k for k in state if k.startswith(("shared.", "encoder."))
              and "embed_tokens" not in k}
    assert ours == theirs, ours ^ theirs

    ids = np.array([[3, 5, 7, 11, 2, 0, 0, 0],
                    [13, 17, 19, 23, 29, 31, 37, 2]], np.int64)
    with torch.no_grad():
        ref = model(torch.from_numpy(ids)).last_hidden_state.numpy()

    out = np.asarray(t5_encoder_apply(
        {k: jnp.asarray(v) for k, v in state.items()},
        jnp.asarray(ids.astype(np.int32)), cfg))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_t5_param_template_and_init():
    cfg = T5Config.tiny()
    params = init_t5_params(jax.random.PRNGKey(0), cfg)
    assert set(params) == set(t5_param_shapes(cfg))
    out = t5_encoder_apply(params, jnp.zeros((2, 16), jnp.int32), cfg)
    assert out.shape == (2, 16, cfg.d_model)
    assert np.isfinite(np.asarray(out)).all()


def test_clip_t5_ensemble_concats_along_sequence():
    """EnsembleTextEncoder semantics: (B, L_clip + L_t5, D) with projections
    to a common width (reference text_encoders.py:126-147)."""
    from scal_sdt_tpu.models.clip import CLIPTextConfig, clip_text_apply, init_clip_params
    from scal_sdt_tpu.text.ensemble import EncoderEntry, encode_ensemble
    from scal_sdt_tpu.models.functional import Params

    proj_dim = 48
    clip_cfg = CLIPTextConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                              num_hidden_layers=2, num_attention_heads=2,
                              max_position_embeddings=16)
    t5_cfg = T5Config.tiny()
    rng = jax.random.PRNGKey(0)
    r1, r2, r3, r4 = jax.random.split(rng, 4)
    clip_params: Params = dict(init_clip_params(r1, clip_cfg))
    t5_params: Params = dict(init_t5_params(r2, t5_cfg))

    def add_projection(params, rng, in_dim, prefix):
        params[f"{prefix}.0.weight"] = jax.random.normal(rng, (proj_dim, in_dim)) * 0.02
        params[f"{prefix}.1.weight"] = jnp.ones((proj_dim,))
        params[f"{prefix}.1.bias"] = jnp.zeros((proj_dim,))

    add_projection(clip_params, r3, clip_cfg.hidden_size, "projection")
    add_projection(t5_params, r4, t5_cfg.d_model, "projection")

    def tok_clip(prompts):
        return np.full((len(prompts), 8), 5, np.int32)

    def tok_t5(prompts):
        return np.full((len(prompts), 12), 7, np.int32)

    entries = [
        EncoderEntry(clip_params,
                     lambda p, ids: clip_text_apply(p, ids, clip_cfg, stop_at_layer=2),
                     tok_clip, projection_prefix="projection"),
        EncoderEntry(t5_params,
                     lambda p, ids: t5_encoder_apply(p, ids, t5_cfg),
                     tok_t5, projection_prefix="projection"),
    ]
    z = encode_ensemble(entries, ["a", "b"])
    assert z.shape == (2, 8 + 12, proj_dim)
    assert np.isfinite(np.asarray(z)).all()
