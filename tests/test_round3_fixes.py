"""Regression tests for round-3 verdict/advice items.

- LoRA dropout is applied during training (VERDICT #6; reference loralib
  lora_dropout, /root/reference/modules/lora.py:21) — previously parsed and
  silently ignored.
- Cache build never drops tail entries (VERDICT #7; the reference gathers
  everything its sampler yields, /root/reference/cache.py:25-41).
- pick_block handles non-power-of-two env preferences (ADVICE low).
"""

import numpy as np
import pytest

from scal_sdt_tpu.text.tokenizer import HashTokenizer
from scal_sdt_tpu.training.trainer import Trainer

from helpers import make_image_dataset, tiny_config, tiny_models


# --------------------------------------------------------------------------
# pick_block: non-power-of-two preferred values (from env sweeps)
# --------------------------------------------------------------------------

def test_pick_block_rounds_preferred_to_power_of_two():
    from scal_sdt_tpu.ops.splash import pick_block

    # 768 must probe 512/256/128, not 768/384/192
    assert pick_block(4096, 768) == 512
    assert pick_block(4096, 1536) == 1024
    assert pick_block(4096, 1024) == 1024  # pow2 unchanged
    assert pick_block(100, 768) is None


# --------------------------------------------------------------------------
# LoRA dropout
# --------------------------------------------------------------------------

def _lora_cfg(data, out, dropout: float):
    spec = {"rank": 4, "alpha": 1, "dropout": dropout}
    return tiny_config(data, out, **{
        "optim_target": {
            "unet": {"targets": [{
                "index": ["down_blocks.0"],
                "recurse_conf": {"lora": dict(spec)},
                "targets": [{
                    "index": ["attentions"],
                    "targets": [{
                        "targets": [{
                            "index": ["transformer_blocks"],
                            "targets": [{
                                "targets": [{
                                    "index": ["attn1"],
                                    "targets": [{"index": ["to_q", "to_k"]}],
                                }],
                            }],
                        }],
                    }],
                }],
            }]},
        },
    })


def _fit_lora_b(tmp, name: str, dropout: float) -> dict:
    data = make_image_dataset(tmp, n=4)
    cfg = _lora_cfg(data, tmp / name, dropout)
    trainer = Trainer(cfg, tmp / name / "run", models=tiny_models(),
                      tokenizer=HashTokenizer())
    trainer.fit(max_steps_override=1)
    return {k: np.asarray(v) for k, v in trainer.natural_trainable().items()
            if k.endswith(".lora_B")}


def test_lora_dropout_changes_training(tmp_path):
    """dB = dy (A dropout(x))^T: a nonzero rate must perturb the first
    update, and runs with the same seed+rate must stay deterministic."""
    b_plain = _fit_lora_b(tmp_path, "d0", 0.0)
    b_drop = _fit_lora_b(tmp_path, "d1", 0.9)
    b_drop2 = _fit_lora_b(tmp_path, "d2", 0.9)

    diff = max(float(np.abs(b_plain[k] - b_drop[k]).max()) for k in b_plain)
    assert diff > 0, "dropout=0.9 produced identical updates to dropout=0"
    for k in b_drop:
        np.testing.assert_array_equal(b_drop[k], b_drop2[k])


def test_lora_dropout_off_at_inference():
    """No rng in the param dict (sampling/export path) -> no dropout."""
    import jax
    import jax.numpy as jnp

    from scal_sdt_tpu.models.functional import (
        LORA_DROPOUT_RNG, linear, set_lora_dropout_rates)

    p = {
        "l.weight": jnp.zeros((8, 8)),
        "l.lora_A": jax.random.normal(jax.random.PRNGKey(0), (4, 8)),
        "l.lora_B": jax.random.normal(jax.random.PRNGKey(1), (8, 4)),
        "l.lora_alpha": jnp.asarray(4, jnp.int32),
    }
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8))
    baseline = linear(p, "l", x)
    try:
        set_lora_dropout_rates({"l": 0.5})
        assert jnp.allclose(linear(p, "l", x), baseline)  # no rng -> identity
        p_rng = dict(p)
        p_rng[LORA_DROPOUT_RNG] = jax.random.PRNGKey(3)
        dropped = linear(p_rng, "l", x)
        assert not jnp.allclose(dropped, baseline)
    finally:
        set_lora_dropout_rates({})


# --------------------------------------------------------------------------
# Cache tail entries (reference caches every sampler-yielded id)
# --------------------------------------------------------------------------

def test_cache_cli_keeps_tail_entries(tmp_path, monkeypatch):
    """5 images at batch 2: the final odd image must still be cached."""
    from click.testing import CliRunner

    import scal_sdt_tpu.cli.cache as cache_cli
    import scal_sdt_tpu.convert.loader as loader_mod
    import scal_sdt_tpu.text.tokenizer as tok_mod
    from scal_sdt_tpu.data.datasets import LatentCache
    from scal_sdt_tpu import conf

    data = make_image_dataset(tmp_path, n=5)
    cache_path = tmp_path / "built.safetensors"
    cfg = tiny_config(data, tmp_path / "out")
    cfg.data["cache"] = str(cache_path)
    cfg_path = tmp_path / "cfg.yaml"
    conf.save(cfg, cfg_path)

    models = tiny_models()
    monkeypatch.setattr(loader_mod, "load_components", lambda config: models)
    monkeypatch.setattr(tok_mod, "resolve_tokenizer",
                        lambda config, **kw: HashTokenizer())

    result = CliRunner().invoke(
        cache_cli.main, ["--config", str(cfg_path), "--batch-size", "2"])
    assert result.exit_code == 0, result.output or str(result.exception)
    cache = LatentCache(cache_path)
    assert cache.total_entries == 5
    for i in range(5):
        assert cache.latent(i, 0).shape == (16, 16, 4)
        assert cache.cond(i).shape == (77, 32)


# --------------------------------------------------------------------------
# Deterministic data randomness + mid-epoch resume (VERDICT #9; the reference
# gets both from pl.seed_everything + Lightning loop restore)
# --------------------------------------------------------------------------

def test_per_item_draws_deterministic_and_epoch_varying(tmp_path):
    from scal_sdt_tpu.data.datasets import Concept, ImagePromptDataset, Index

    make_image_dataset(tmp_path, n=2)
    ds = ImagePromptDataset([Concept(tmp_path / "data", "x")], seed=7)
    idx = Index(0, (32, 32))

    ds.epoch = 0
    a1 = ds[idx].image
    a2 = ds[idx].image
    np.testing.assert_array_equal(a1, a2)  # same (seed, epoch, item) -> same crop

    ds.epoch = 1
    b = ds[idx].image
    assert np.abs(a1 - b).max() > 0  # crops vary across epochs

    ds2 = ImagePromptDataset([Concept(tmp_path / "data", "x")], seed=7)
    ds2.epoch = 0
    np.testing.assert_array_equal(ds2[idx].image, a1)  # cross-instance replay


def test_mid_epoch_resume_matches_continuous_run(tmp_path):
    """Stop at step 3 (mid-epoch), resume, run to 6: params must equal a
    continuous 6-step run bit-for-bit — no replayed or skipped data."""
    data = make_image_dataset(tmp_path, n=8)

    def fresh(name):
        cfg = tiny_config(data, tmp_path / name)
        cfg.trainer["max_epochs"] = 2
        return Trainer(cfg, tmp_path / name / "run", models=tiny_models(),
                       tokenizer=HashTokenizer())

    continuous = fresh("cont")
    continuous.fit(max_steps_override=6)

    stopped = fresh("split")
    stopped.fit(max_steps_override=3)
    assert stopped.batch_in_epoch == 3
    ckpts = list((tmp_path / "split" / "run").glob("*.safetensors"))
    assert ckpts, "no checkpoint written at stop"

    resumed = fresh("split2")
    resumed.resume(ckpts[0])
    assert resumed.epoch_cursor == 0 and resumed.batch_in_epoch == 3
    resumed.fit(max_steps_override=6)

    cont_nat, res_nat = continuous.natural_trainable(), resumed.natural_trainable()
    for k in cont_nat:
        np.testing.assert_array_equal(
            np.asarray(cont_nat[k]), np.asarray(res_nat[k]), err_msg=k)


def test_multihost_cache_padding_covers_all_ids(tmp_path):
    """7 images, 2 ranks, batch 2: ranks pad to the same batch count and the
    merged cache covers every id exactly once."""
    from scal_sdt_tpu.cli.cache import (
        assemble_cache, build_local_shard, merge_shards)

    data = make_image_dataset(tmp_path, n=7)
    cfg = tiny_config(data, tmp_path / "out")
    models = tiny_models()
    tokenizer = HashTokenizer()

    shards = [
        build_local_shard(cfg, models, tokenizer, no_conds=False,
                          aug_group_size=1, batch_size=2,
                          world_size=2, global_rank=r)
        for r in range(2)
    ]
    # both ranks padded to the same entry count (gather alignment)
    assert shards[0]["ids"].shape == shards[1]["ids"].shape

    def fake_allgather(arr, _shards=shards):
        key = next(k for k, v in _shards[0].items()
                   if v is not None and np.asarray(v).shape == np.asarray(arr).shape
                   and np.array_equal(np.asarray(v), np.asarray(arr)))
        return np.stack([np.asarray(s[key]) for s in _shards])

    merged = merge_shards(shards[0], world_size=2, allgather=fake_allgather)
    cache, meta = assemble_cache(merged)
    assert meta["entries"] == list(range(7))
    assert meta["total_entries"] == 7
    for i in range(7):
        assert f"{i}.latent.0" in cache
        assert f"{i}.cond" in cache
