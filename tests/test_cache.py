"""Latent/cond cache: file format round-trip + cache-backed training fast path."""

import json

import numpy as np
import pytest

from scal_sdt_tpu.data.datasets import LatentCache
from scal_sdt_tpu.text.tokenizer import HashTokenizer
from scal_sdt_tpu.training.trainer import Trainer
from scal_sdt_tpu.utils.state import save_state_dict

from helpers import make_image_dataset, tiny_config, tiny_models


def _write_cache(path, n=8, latent_hw=4, cond_dim=32, aug_groups=2):
    rng = np.random.RandomState(0)
    tensors, sizes = {}, {}
    for i in range(n):
        for g in range(aug_groups):
            key = f"{i}.latent.{g}"
            tensors[key] = rng.randn(latent_hw, latent_hw, 4).astype(np.float32)
            sizes[key] = [latent_hw, latent_hw, 4]
        tensors[f"{i}.cond"] = rng.randn(77, cond_dim).astype(np.float32)
    meta = {"sizes": sizes, "entries": list(range(n)), "total_entries": n,
            "aug_group_size": aug_groups}
    save_state_dict(tensors, path, metadata={"json": json.dumps(meta)})
    return path


def test_latent_cache_reader(tmp_path):
    path = _write_cache(tmp_path / "cache.safetensors")
    cache = LatentCache(path)
    assert cache.aug_group_size == 2
    assert cache.total_entries == 8
    assert cache.latent(3, 1).shape == (4, 4, 4)
    assert cache.cond(3).shape == (77, 32)


def test_cache_backed_training(tmp_path):
    data = make_image_dataset(tmp_path, n=8)
    cache_path = _write_cache(tmp_path / "cache.safetensors", latent_hw=16)
    cfg = tiny_config(data, tmp_path / "out")
    cfg.data["cache"] = str(cache_path)

    trainer = Trainer(cfg, tmp_path / "out" / "run", models=tiny_models(),
                      tokenizer=HashTokenizer())
    metrics = trainer.fit(max_steps_override=2)
    assert np.isfinite(metrics["train_loss"])


def test_cache_builder_cli_roundtrip(tmp_path, monkeypatch):
    """Drive the cache CLI end-to-end with tiny injected models."""
    from click.testing import CliRunner

    import scal_sdt_tpu.cli.cache as cache_cli
    import scal_sdt_tpu.convert.loader as loader_mod
    import scal_sdt_tpu.text.tokenizer as tok_mod

    data = make_image_dataset(tmp_path, n=4)
    cache_path = tmp_path / "built.safetensors"
    cfg = tiny_config(data, tmp_path / "out")
    cfg.data["cache"] = str(cache_path)
    cfg_path = tmp_path / "cfg.yaml"
    from scal_sdt_tpu import conf

    conf.save(cfg, cfg_path)

    models = tiny_models()
    monkeypatch.setattr(loader_mod, "load_components", lambda config: models)
    monkeypatch.setattr(tok_mod, "resolve_tokenizer",
                        lambda config, **kw: HashTokenizer())

    result = CliRunner().invoke(
        cache_cli.main, ["--config", str(cfg_path), "--batch-size", "2"])
    assert result.exit_code == 0, result.output or str(result.exception)
    cache = LatentCache(cache_path)
    assert cache.total_entries == 4
    assert cache.aug_group_size == 1
    # tiny VAE downsamples 32 -> 16
    assert cache.latent(0, 0).shape == (16, 16, 4)
    assert cache.cond(0).shape == (77, 32)


def test_multihost_cache_gather(tmp_path):
    """Two process shards merge into ONE complete cache written by rank 0
    (reference all-gathers latents/ids, /root/reference/cache.py:25-41;
    round 1 wrote per-process partial caches to the same path)."""
    import jax.numpy as jnp

    from scal_sdt_tpu.cli.cache import assemble_cache, build_local_shard, merge_shards
    from scal_sdt_tpu.models.clip import clip_text_apply

    data = make_image_dataset(tmp_path, n=8)
    cfg = tiny_config(data, tmp_path / "out")
    models = tiny_models()
    tokenizer = HashTokenizer()

    shards = [
        build_local_shard(cfg, models, tokenizer, no_conds=False,
                          aug_group_size=1, batch_size=2,
                          world_size=2, global_rank=r)
        for r in range(2)
    ]
    # ranks own disjoint stride slices of the id space
    assert sorted(np.concatenate([s["ids"] for s in shards]).tolist()) == list(range(8))

    # emulate process_allgather: stack this rank's array with the peer's
    def fake_allgather(arr, _shards=shards, _rank=[0]):
        key = next(k for k, v in _shards[0].items()
                   if v is not None and np.asarray(v).shape == np.asarray(arr).shape
                   and np.array_equal(np.asarray(v), np.asarray(arr)))
        return np.stack([np.asarray(s[key]) for s in _shards])

    merged = merge_shards(shards[0], world_size=2, allgather=fake_allgather)
    cache, meta = assemble_cache(merged)

    assert meta["entries"] == list(range(8))
    assert meta["total_entries"] == 8
    for i in range(8):
        assert f"{i}.latent.0" in cache
        assert f"{i}.cond" in cache
        assert cache[f"{i}.latent.0"].shape == (16, 16, 4)

    # conds are deterministic: must equal a direct CLIP encode of the prompt
    ids_r1 = shards[1]["ids"]
    direct = np.asarray(clip_text_apply(
        {k: jnp.asarray(v) for k, v in models.clip.items()},
        jnp.asarray(tokenizer([f"a photo number {int(ids_r1[0])}"])),
        models.clip_config, 1))
    np.testing.assert_allclose(cache[f"{int(ids_r1[0])}.cond"], direct[0],
                               rtol=2e-5, atol=2e-5)
