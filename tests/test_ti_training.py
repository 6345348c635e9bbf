"""Textual-inversion training (text/ti.py) — beyond reference parity.

The reference only consumes pre-trained embeddings; here the placeholder
vectors are a first-class trainable leaf with their own optimizer group.
"""

import numpy as np
import pytest

from scal_sdt_tpu.text.ti import (
    TRAINED_EXTRA_KEY, TITokenSpec, export_embeddings,
    register_ti_tokens_for_inference, setup_ti_training)
from scal_sdt_tpu.text.tokenizer import HashTokenizer
from scal_sdt_tpu.training.step import TE_PREFIX
from scal_sdt_tpu.training.trainer import Trainer

from helpers import make_image_dataset, tiny_config, tiny_models


def test_setup_registers_tokens_and_inits_from_word():
    models = tiny_models()
    tok = HashTokenizer()
    vocab = models.clip_config.vocab_size
    clip, meta = setup_ti_training(
        dict(models.clip), tok,
        [TITokenSpec("my-cat", vectors_per_token=3, init="cat"),
         TITokenSpec("style-x", vectors_per_token=1)], seed=0)
    extra = clip[TRAINED_EXTRA_KEY]
    assert extra.shape == (4, models.clip_config.hidden_size)
    assert meta == [{"keyword": "my-cat", "n_vectors": 3},
                    {"keyword": "style-x", "n_vectors": 1}]
    # keyword expands to 3 placeholder ids >= vocab_size
    ids = np.asarray(tok(["a photo of my-cat sitting"]))[0]
    assert (ids >= vocab).sum() == 3
    # init="cat": rows equal the base embedding row(s) of "cat"
    cat_ids = np.asarray(tok(["cat"]))[0]
    pad = cat_ids[-1]
    content = [int(i) for i in cat_ids[1:] if i != pad]
    seed_vec = np.asarray(models.clip[
        "text_model.embeddings.token_embedding.weight"])[content].mean(axis=0)
    np.testing.assert_allclose(extra[0], seed_vec, rtol=1e-6)
    np.testing.assert_allclose(extra[1], seed_vec, rtol=1e-6)
    # random-init row differs
    assert np.abs(extra[3] - seed_vec).max() > 0


def test_clip_forward_uses_trained_extra():
    import jax
    import jax.numpy as jnp

    from scal_sdt_tpu.models.clip import clip_text_apply

    models = tiny_models()
    tok = HashTokenizer()
    clip, _ = setup_ti_training(dict(models.clip), tok,
                                [TITokenSpec("my-cat", 2)], seed=0)
    ids = jnp.asarray(tok(["my-cat"]))
    params = {k: jnp.asarray(v) for k, v in clip.items()}
    out1 = clip_text_apply(params, ids, models.clip_config)
    params[TRAINED_EXTRA_KEY] = params[TRAINED_EXTRA_KEY] + 1.0
    out2 = clip_text_apply(params, ids, models.clip_config)
    assert np.abs(np.asarray(out1) - np.asarray(out2)).max() > 0


def _ti_dataset(tmp_path, keyword="my-cat"):
    data = make_image_dataset(tmp_path, n=4)
    for txt in data.glob("*.txt"):
        txt.write_text(f"a photo of {keyword}")
    return data


def test_ti_e2e_trains_only_embedding_rows(tmp_path):
    data = _ti_dataset(tmp_path)
    cfg = tiny_config(data, tmp_path / "out", custom_embeddings={
        "enabled": False, "path": None,
        "train": {"enabled": True, "lr": 1e-2,
                  "tokens": [{"keyword": "my-cat", "vectors_per_token": 2,
                              "init": "photo"}]},
    })
    trainer = Trainer(cfg, tmp_path / "out" / "run", models=tiny_models(),
                      tokenizer=HashTokenizer())
    key = f"{TE_PREFIX}.{TRAINED_EXTRA_KEY}"
    before = np.asarray(trainer.natural_trainable()[key]).copy()
    trainer.fit(max_steps_override=2)
    after = np.asarray(trainer.natural_trainable()[key])
    assert np.abs(after - before).max() > 0, "TI vectors did not train"
    # frozen table untouched (it lives in the frozen branch)
    assert f"{TE_PREFIX}.text_model.embeddings.token_embedding.weight" \
        in trainer.frozen

    # checkpoint carries the leaf + metadata; export round-trips
    path = trainer.ckpt.save(trainer.state, trainer.frozen,
                             {"step": 2, "epoch": 0, "train_loss": 0.1},
                             pack_spec=trainer.pack_spec,
                             extra_meta={"ti_tokens": trainer.ti_meta})
    from scal_sdt_tpu.training.checkpoint import load_checkpoint_tensors

    tensors, meta = load_checkpoint_tensors(path)
    assert key in tensors
    assert meta["ti_tokens"] == [{"keyword": "my-cat", "n_vectors": 2}]

    out_dir = tmp_path / "emb"
    written = export_embeddings(np.asarray(tensors[key]), meta["ti_tokens"],
                                out_dir)
    assert [p.name for p in written] == ["my-cat.safetensors"]

    # the exported file loads through the CONSUMPTION path (a1111 layout)
    from scal_sdt_tpu.text.embeddings import CustomEmbedding

    emb = CustomEmbedding.load(written[0])
    assert emb.keyword == "my-cat"
    assert emb.vectors.shape == (2, after.shape[1])
    np.testing.assert_allclose(emb.vectors, after, rtol=1e-6)


def test_ti_rejects_cached_conditions(tmp_path):
    data = _ti_dataset(tmp_path)
    cfg = tiny_config(data, tmp_path / "out",
                      data={"cache": str(tmp_path / "cache.st")},
                      custom_embeddings={
                          "enabled": False, "path": None,
                          "train": {"enabled": True,
                                    "tokens": [{"keyword": "my-cat"}]}})
    with pytest.raises(ValueError, match="cache"):
        Trainer(cfg, tmp_path / "out" / "run", models=tiny_models(),
                tokenizer=HashTokenizer())


def test_register_for_inference():
    tok = HashTokenizer()
    base_vocab = tok.vocab_size  # add_tokens grows vocab_size
    register_ti_tokens_for_inference(tok, [{"keyword": "my-cat",
                                            "n_vectors": 2}])
    ids = np.asarray(tok(["my-cat"]))[0]
    assert (ids >= base_vocab).sum() == 2
