"""DreamBooth prior-preservation, CFG-dropout, and prediction-type objectives."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scal_sdt_tpu.conf import Config
from scal_sdt_tpu.text.tokenizer import HashTokenizer
from scal_sdt_tpu.training.step import StepSpec, compute_loss, TE_PREFIX, UNET_PREFIX, VAE_PREFIX
from scal_sdt_tpu.training.trainer import Trainer

from helpers import make_image_dataset, tiny_config, tiny_models


def test_dreambooth_training_with_prior_preservation(tmp_path):
    instance = make_image_dataset(tmp_path / "inst", n=4)
    class_dir = make_image_dataset(tmp_path / "cls", n=4)
    cfg = tiny_config(instance, tmp_path / "out")
    cfg["prior_preservation"] = {"enabled": True, "prior_loss_weight": 0.7}
    cfg.data["concepts"] = [{
        "instance_set": {"path": str(instance), "prompt": "sks thing"},
        "class_set": {"path": str(class_dir), "prompt": "thing"},
    }]
    trainer = Trainer(cfg, tmp_path / "out" / "run", models=tiny_models(),
                      tokenizer=HashTokenizer())
    metrics = trainer.fit(max_steps_override=2)
    assert np.isfinite(metrics["train_loss"])


def _spec(models, **kw):
    base = dict(
        unet_config=models.unet_config, clip_config=models.clip_config,
        vae_config=models.vae_config, schedule=models.schedule,
        compute_dtype=jnp.float32)
    base.update(kw)
    return StepSpec(**base)


def _params(models):
    trainable = {f"{UNET_PREFIX}.{k}": jnp.asarray(v) for k, v in models.unet.items()}
    frozen = {}
    frozen.update({f"{TE_PREFIX}.{k}": jnp.asarray(v) for k, v in models.clip.items()})
    frozen.update({f"{VAE_PREFIX}.{k}": jnp.asarray(v) for k, v in models.vae.items()})
    return trainable, frozen


def test_prior_loss_weight_applied():
    models = tiny_models()
    trainable, frozen = _params(models)
    rng = jax.random.PRNGKey(0)
    batch = {
        "latents": jnp.ones((4, 8, 8, 4)) * 0.1,
        "conds": jnp.zeros((4, 77, models.unet_config.cross_attention_dim)),
    }
    # loss(w) = instance_mean + w * prior_mean is affine in w
    losses = []
    for w in (0.0, 1.0, 2.0):
        spec = _spec(models, prior_preservation=True, prior_loss_weight=w)
        l, _ = compute_loss(trainable, frozen, batch, rng, spec)
        losses.append(float(l))
    l0, l1, l2 = losses
    prior_mean = l1 - l0
    assert prior_mean > 0
    np.testing.assert_allclose(l2 - l1, prior_mean, rtol=1e-4)


@pytest.mark.parametrize("pred_type", ["epsilon", "sample", "v"])
def test_prediction_types_give_finite_losses(pred_type):
    models = tiny_models()
    trainable, frozen = _params(models)
    schedule = dataclasses.replace(models.schedule, prediction_type=pred_type)
    spec = _spec(models, schedule=schedule)
    batch = {
        "latents": jnp.ones((2, 8, 8, 4)) * 0.1,
        "conds": jnp.zeros((2, 77, models.unet_config.cross_attention_dim)),
    }
    loss, _ = compute_loss(trainable, frozen, batch, jax.random.PRNGKey(1), spec)
    assert np.isfinite(float(loss))


def test_uncond_dropout_zeros_mode():
    """With p=1 and cond='zeros' the conds must be zeroed for the UNet."""
    models = tiny_models(vocab_size=49408)
    trainable, frozen = _params(models)
    tok = HashTokenizer()
    ids = jnp.asarray(tok(["some prompt", "another"]))
    batch = {"latents": jnp.ones((2, 8, 8, 4)) * 0.1, "input_ids": ids,
             "uncond_ids": jnp.asarray(tok([""]))}
    rng = jax.random.PRNGKey(3)

    spec_drop = _spec(models, uncond_enabled=True, uncond_p=1.0, uncond_mode="zeros")
    l_drop, _ = compute_loss(trainable, frozen, batch, rng, spec_drop)

    # manually zeroed conds must give the identical loss with same rng
    zero_batch = {"latents": batch["latents"],
                  "conds": jnp.zeros((2, 77, models.unet_config.cross_attention_dim))}
    spec_plain = _spec(models)
    l_manual, _ = compute_loss(trainable, frozen, zero_batch, rng, spec_plain)
    np.testing.assert_allclose(float(l_drop), float(l_manual), rtol=1e-5)

    # p=0 keeps real conds -> different loss
    spec_keep = _spec(models, uncond_enabled=True, uncond_p=0.0, uncond_mode="zeros")
    l_keep, _ = compute_loss(trainable, frozen, batch, rng, spec_keep)
    assert abs(float(l_keep) - float(l_drop)) > 1e-8


def test_uncond_dropout_eos_mode():
    models = tiny_models(vocab_size=49408)
    trainable, frozen = _params(models)
    tok = HashTokenizer()
    batch = {"latents": jnp.ones((2, 8, 8, 4)) * 0.1,
             "input_ids": jnp.asarray(tok(["x", "y"])),
             "uncond_ids": jnp.asarray(tok([""]))}
    rng = jax.random.PRNGKey(4)
    spec = _spec(models, uncond_enabled=True, uncond_p=1.0, uncond_mode="eos")
    l_eos, _ = compute_loss(trainable, frozen, batch, rng, spec)

    empty_batch = {"latents": batch["latents"],
                   "input_ids": jnp.asarray(tok(["", ""]))}
    l_manual, _ = compute_loss(trainable, frozen, empty_batch, rng, _spec(models))
    np.testing.assert_allclose(float(l_eos), float(l_manual), rtol=1e-5)
