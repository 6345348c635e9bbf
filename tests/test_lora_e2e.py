"""LoRA fine-tune end-to-end: only factors train, forward uses the delta,
checkpoint is KB-scale, kohya export round-trips.
"""

import numpy as np
import pytest

from scal_sdt_tpu.text.tokenizer import HashTokenizer
from scal_sdt_tpu.training.trainer import Trainer

from helpers import make_image_dataset, tiny_config, tiny_models


@pytest.fixture(scope="module")
def lora_trained(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("lora_e2e")
    data = make_image_dataset(tmp, n=8)
    cfg = tiny_config(data, tmp / "out", **{
        "optim_target": {
            "lora": {"rank": 4, "alpha": 1, "dropout": 0.0},
            "unet": {"targets": [{
                "index": ["down_blocks.0", "up_blocks.1"],
                "recurse_conf": {"lora": {"rank": 4, "alpha": 1, "dropout": 0.0}},
                "targets": [{
                    "index": ["attentions"],
                    "targets": [{
                        "targets": [{
                            "index": ["transformer_blocks"],
                            "targets": [{
                                "targets": [{
                                    "index": ["attn1", "attn2"],
                                    "targets": [{"index": ["to_q", "to_k", "to_v", "to_out.0"]}],
                                }],
                            }],
                        }],
                    }],
                }],
            }]},
        },
    })
    trainer = Trainer(cfg, tmp / "out" / "run", models=tiny_models(),
                      tokenizer=HashTokenizer())
    metrics = trainer.fit(max_steps_override=2)
    return trainer, metrics, tmp


def test_only_lora_factors_train(lora_trained):
    trainer, metrics, _ = lora_trained
    assert np.isfinite(metrics["train_loss"])
    for k in trainer.natural_trainable():
        assert k.endswith(".lora_A") or k.endswith(".lora_B"), k
    # base weights stay in frozen, alphas stored alongside
    assert any(k.endswith(".lora_alpha") for k in trainer.frozen)


def test_lora_b_moves_from_zero(lora_trained):
    trainer, _, _ = lora_trained
    natural = trainer.natural_trainable()
    b_keys = [k for k in natural if k.endswith(".lora_B")]
    moved = sum(float(np.abs(np.asarray(natural[k])).max()) > 0
                for k in b_keys)
    assert moved > 0, "no lora_B left zero-init after training"


def test_lora_checkpoint_is_small_and_kohya_exports(lora_trained):
    trainer, _, tmp = lora_trained
    path = trainer.ckpt.save(trainer.state, trainer.frozen,
                             {"step": 2, "epoch": 0, "train_loss": 1.0})
    assert path.stat().st_size < 5 * 1024 * 1024  # KB/MB scale, not model scale

    from scal_sdt_tpu.cli.ckpt_tool import TE_CKPT_PREFIX, UNET_CKPT_PREFIX, to_kohya_format
    from scal_sdt_tpu.utils.state import load_state_dict, replace_prefix

    state = load_state_dict(path)
    kohya = to_kohya_format(replace_prefix(state, UNET_CKPT_PREFIX), "lora_unet")
    n_modules = len([k for k in kohya if k.endswith(".lora_down.weight")])
    assert n_modules == len([k for k in state if k.endswith(".lora_A")])
    assert all(k.endswith((".lora_down.weight", ".lora_up.weight", ".alpha"))
               for k in kohya)


def test_lora_delta_affects_forward(lora_trained):
    import jax
    import jax.numpy as jnp

    from scal_sdt_tpu.models.functional import sub_params
    from scal_sdt_tpu.models.unet import unet_apply

    trainer, _, _ = lora_trained
    merged = trainer.merged_inference_params()
    unet_params = sub_params(merged, "unet")
    base_params = {k: v for k, v in unet_params.items() if ".lora_" not in k}

    x = jnp.ones((1, 8, 8, 4))
    t = jnp.array([10])
    ctx = jnp.ones((1, 77, trainer.models.unet_config.cross_attention_dim))
    cfg = trainer.models.unet_config
    with_lora = unet_apply(unet_params, x, t, ctx, cfg)
    without = unet_apply(base_params, x, t, ctx, cfg)
    assert float(jnp.abs(with_lora - without).max()) > 0
