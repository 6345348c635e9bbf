"""Caption regularization (data.caption) + pyramid noise (loss.multires_*)."""

import random

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scal_sdt_tpu.data.datasets import Concept, ImagePromptDataset, Index
from scal_sdt_tpu.training.step import _multires_noise

from helpers import make_image_dataset


def _dataset(tmp_path, caption_config, n=4, prompt="{TXT_PROMPT}"):
    data_dir = make_image_dataset(tmp_path, n=n)
    for txt in data_dir.glob("*.txt"):
        txt.write_text("first tag, second tag, third tag, fourth tag")
    return ImagePromptDataset([Concept(str(data_dir), prompt)],
                              caption_config=caption_config, seed=7)


def test_caption_disabled_is_identity(tmp_path):
    ds = _dataset(tmp_path, {"dropout": 0.0, "tag_shuffle": False,
                             "tag_dropout": 0.0, "keep_tokens": 0})
    item = ds[Index(0, (32, 32))]
    assert item.prompt == "first tag, second tag, third tag, fourth tag"
    # identical image draws as a dataset built with no caption config at all
    ds_none = _dataset(tmp_path, None)
    np.testing.assert_array_equal(item.image, ds_none[Index(0, (32, 32))].image)


def test_caption_dropout_blanks_some(tmp_path):
    ds = _dataset(tmp_path, {"dropout": 0.5})
    prompts = []
    for epoch in range(16):
        ds.epoch = epoch
        prompts.append(ds[Index(0, (32, 32))].prompt)
    assert "" in prompts
    assert "first tag, second tag, third tag, fourth tag" in prompts


def test_tag_shuffle_keeps_tokens_and_set(tmp_path):
    ds = _dataset(tmp_path, {"tag_shuffle": True, "keep_tokens": 1})
    seen = set()
    for epoch in range(12):
        ds.epoch = epoch
        p = ds[Index(0, (32, 32))].prompt
        tags = p.split(", ")
        assert tags[0] == "first tag"          # pinned
        assert sorted(tags) == ["first tag", "fourth tag", "second tag",
                                "third tag"]   # a permutation, nothing lost
        seen.add(p)
    assert len(seen) > 1                       # it actually shuffles


def test_tag_dropout_drops_tail_only(tmp_path):
    ds = _dataset(tmp_path, {"tag_dropout": 0.5, "keep_tokens": 2})
    lens = set()
    for epoch in range(16):
        ds.epoch = epoch
        tags = ds[Index(0, (32, 32))].prompt.split(", ")
        assert tags[:2] == ["first tag", "second tag"]
        lens.add(len(tags))
    assert min(lens) < 4                       # something was dropped


def test_caption_deterministic_per_epoch(tmp_path):
    a = _dataset(tmp_path, {"tag_shuffle": True, "dropout": 0.3})
    b = _dataset(tmp_path, {"tag_shuffle": True, "dropout": 0.3})
    for epoch in (0, 3):
        a.epoch = b.epoch = epoch
        assert a[Index(1, (32, 32))].prompt == b[Index(1, (32, 32))].prompt


def test_multires_noise_unit_std_and_low_freq():
    rng = jax.random.PRNGKey(0)
    base = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 4), jnp.float32)
    out = _multires_noise(rng, base, iterations=4, discount=0.5)
    assert out.shape == base.shape
    stds = np.asarray(out).std(axis=(1, 2, 3))
    np.testing.assert_allclose(stds, 1.0, atol=1e-3)
    # pyramid noise has more low-frequency energy: neighbouring pixels
    # correlate more than in white noise
    def neighbour_corr(x):
        x = np.asarray(x, np.float64)
        a, b = x[:, :-1].ravel(), x[:, 1:].ravel()
        return np.corrcoef(a, b)[0, 1]
    assert neighbour_corr(out) > neighbour_corr(base) + 0.05


def test_multires_noise_in_training_loss():
    """compute_loss runs with the knob on and changes the sampled noise."""
    from scal_sdt_tpu.training.step import StepSpec, compute_loss
    import dataclasses
    from helpers import tiny_models

    m = tiny_models()
    spec = StepSpec(unet_config=m.unet_config, clip_config=m.clip_config,
                    vae_config=m.vae_config, schedule=m.schedule,
                    compute_dtype=jnp.float32)
    batch = {
        "latents": jnp.asarray(
            np.random.RandomState(0).randn(2, 4, 4, 4), jnp.float32),
        "conds": jnp.zeros((2, 77, m.unet_config.cross_attention_dim),
                           jnp.float32),
    }
    frozen = {f"unet.{k}": v for k, v in m.unet.items()}
    rng = jax.random.PRNGKey(0)
    loss0, _ = compute_loss({}, frozen, batch, rng, spec)
    spec_mn = dataclasses.replace(spec, multires_noise_iterations=3,
                                  multires_noise_discount=0.4)
    loss1, _ = compute_loss({}, frozen, batch, rng, spec_mn)
    assert np.isfinite(loss0) and np.isfinite(loss1)
    assert abs(float(loss0) - float(loss1)) > 0
