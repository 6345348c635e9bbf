"""Round-2 regression tests: VERDICT/ADVICE round-1 findings.

1. prediction_type from the model's scheduler config must flow through the
   REAL path (diffusers dir on disk -> load_components -> Trainer -> StepSpec)
   and change the training target (reference modules/model.py:306-314).
2. Optim targets that train the text encoder must resolve to the trainable
   dict's checkpoint namespace ('condition_model.encoder.*') — round 1
   crashed with KeyError in optax.multi_transform's label fn (ADVICE high).
"""

import numpy as np
import pytest

from scal_sdt_tpu.text.tokenizer import HashTokenizer
from scal_sdt_tpu.training.trainer import Trainer

from helpers import make_image_dataset, tiny_config, tiny_models, write_diffusers_dir


# --------------------------------------------------------------- prediction_type


@pytest.fixture(scope="module")
def v_pred_dir(tmp_path_factory):
    """A diffusers-layout model dir whose scheduler says prediction_type: v."""
    tmp = tmp_path_factory.mktemp("vpred")
    models = tiny_models()
    write_diffusers_dir(models, tmp / "model",
                        scheduler_overrides={"prediction_type": "v_prediction"})
    return tmp


def test_v_prediction_reaches_train_step_via_real_load_path(v_pred_dir):
    tmp = v_pred_dir
    data = make_image_dataset(tmp, n=4)
    cfg = tiny_config(data, tmp / "out", model=str(tmp / "model"))
    trainer = Trainer(cfg, tmp / "out" / "run", tokenizer=HashTokenizer())
    # diffusers spells it 'v_prediction'; our canonical short name is 'v'
    assert trainer.spec.schedule.prediction_type in ("v", "v_prediction")
    assert trainer.spec.schedule.training_target(
        np.ones((1, 2, 2, 1), np.float32), np.ones((1, 2, 2, 1), np.float32),
        np.asarray([500])) is not None
    metrics = trainer.fit(max_steps_override=1)
    assert np.isfinite(metrics["train_loss"])


def test_v_target_actually_differs_from_epsilon():
    """Same rng, same batch: v-spec loss != epsilon-spec loss."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from scal_sdt_tpu.conf import Config, default, merge
    from scal_sdt_tpu.diffusion.schedule import NoiseSchedule
    from scal_sdt_tpu.training.step import StepSpec, UNET_PREFIX, TE_PREFIX, VAE_PREFIX, compute_loss

    models = tiny_models()
    cfg = merge(default(), Config({"trainer": {"precision": 32}}))
    spec_eps = StepSpec.from_config(cfg, models.unet_config, models.clip_config,
                                    models.vae_config, train_text_encoder=False,
                                    schedule=NoiseSchedule(prediction_type="epsilon"))
    spec_v = dataclasses.replace(spec_eps, schedule=NoiseSchedule(prediction_type="v"))

    trainable = {f"{UNET_PREFIX}.{k}": jnp.asarray(v) for k, v in models.unet.items()}
    frozen = {f"{TE_PREFIX}.{k}": jnp.asarray(v) for k, v in models.clip.items()}
    frozen.update({f"{VAE_PREFIX}.{k}": jnp.asarray(v) for k, v in models.vae.items()})
    batch = {
        "images": jnp.zeros((2, 32, 32, 3), jnp.float32) + 0.1,
        "input_ids": jnp.full((2, 77), 49406, jnp.int32),
    }
    rng = jax.random.PRNGKey(7)
    loss_eps, _ = compute_loss(trainable, frozen, batch, rng, spec_eps)
    loss_v, _ = compute_loss(trainable, frozen, batch, rng, spec_v)
    assert float(loss_eps) != float(loss_v)


# ----------------------------------------------------- text-encoder training


TE_LORA_TARGET = {
    "unet": {"targets": [{
        "index": ["down_blocks.0"],
        "recurse_conf": {"lora": {"rank": 4, "alpha": 1, "dropout": 0.0}},
        "targets": [{
            "index": ["attentions"],
            "targets": [{"targets": [{
                "index": ["transformer_blocks"],
                "targets": [{"targets": [{
                    "index": ["attn1", "attn2"],
                    "targets": [{"index": ["to_q", "to_v"]}],
                }]}],
            }]}],
        }],
    }]},
    "text_encoder": {"targets": [{
        "index": ["text_model.encoder.layers"],
        "recurse_conf": {
            "lora": {"rank": 4, "alpha": 1, "dropout": 0.0},
            "optimizer": {"lr": 5e-3, "weight_decay": 2e-3},
        },
        "targets": [{"targets": [
            {"index": ["self_attn"],
             "targets": [{"index": ["k_proj", "v_proj", "q_proj", "out_proj"]}]},
            {"index": ["mlp"], "targets": [{"index": ["fc1", "fc2"]}]},
        ]}],
    }]},
}


@pytest.fixture(scope="module")
def te_trained(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("te_lora")
    data = make_image_dataset(tmp, n=8)
    cfg = tiny_config(data, tmp / "out", optim_target=TE_LORA_TARGET)
    trainer = Trainer(cfg, tmp / "out" / "run", models=tiny_models(),
                      tokenizer=HashTokenizer())
    metrics = trainer.fit(max_steps_override=2)
    return trainer, metrics


def test_text_encoder_lora_trains_without_keyerror(te_trained):
    """Round-1 bug: group_labels used 'text_encoder.' while the trainable dict
    uses 'condition_model.encoder.' -> KeyError at Trainer init."""
    trainer, metrics = te_trained
    assert np.isfinite(metrics["train_loss"])
    te_keys = [k for k in trainer.natural_trainable()
               if k.startswith("condition_model.encoder.")]
    assert te_keys, "no text-encoder params selected as trainable"
    assert all(k.endswith((".lora_A", ".lora_B")) for k in te_keys)


def test_text_encoder_lora_factors_update(te_trained):
    trainer, _ = te_trained
    natural = trainer.natural_trainable()
    a_keys = [k for k in natural
              if k.startswith("condition_model.encoder.") and k.endswith(".lora_A")]
    moved = sum(
        float(np.abs(np.asarray(natural[k.replace(".lora_A", ".lora_B")])).max()) > 0
        for k in a_keys)
    assert moved > 0, "text-encoder LoRA B factors never moved from zero"
