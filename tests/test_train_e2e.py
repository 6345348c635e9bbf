"""End-to-end training on an 8-device virtual mesh (data=2 x fsdp=4).

Covers what the reference cannot test at all (it has no tests and no fake
backend): the full config -> trainer -> sharded jitted step -> checkpoint ->
resume path, on tiny models.
"""

import numpy as np
import pytest

from scal_sdt_tpu.text.tokenizer import HashTokenizer
from scal_sdt_tpu.training.trainer import Trainer

from helpers import make_image_dataset, tiny_config, tiny_models


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    data = make_image_dataset(tmp, n=8)
    cfg = tiny_config(data, tmp / "out")
    trainer = Trainer(cfg, tmp / "out" / "run", models=tiny_models(),
                      tokenizer=HashTokenizer())
    metrics = trainer.fit(max_steps_override=3)
    return trainer, metrics, tmp


def test_loss_finite_and_logged(trained):
    trainer, metrics, _ = trained
    assert np.isfinite(metrics["train_loss"])
    assert metrics["lr"] > 0
    assert trainer.global_step == 3


def test_full_unet_target_trains_all_unet_params(trained):
    trainer, _, _ = trained
    # packed slabs keep the component namespace (unet.__slab__.*)
    assert all(k.startswith("unet.") for k in trainer.state.trainable)
    n_unet = len([k for k in trainer.models.unet])
    assert len(trainer.natural_trainable()) == n_unet
    # frozen holds VAE + text encoder
    assert any(k.startswith("vae.") for k in trainer.frozen)
    assert any(k.startswith("condition_model.encoder.") for k in trainer.frozen)


def test_params_actually_update(trained):
    trainer, _, _ = trained
    before = trainer.models.unet["conv_out.weight"]
    after = np.asarray(trainer.natural_trainable()["unet.conv_out.weight"])
    assert np.abs(before - after).max() > 0


def test_checkpoint_save_and_resume(trained):
    trainer, _, tmp = trained
    path = trainer.ckpt.save(trainer.state, trainer.frozen,
                             {"step": trainer.global_step, "epoch": 0, "train_loss": 0.5},
                             pack_spec=trainer.pack_spec)
    assert path.exists()

    from scal_sdt_tpu.training.checkpoint import load_checkpoint_tensors, restore_train_state

    tensors, meta = load_checkpoint_tensors(path)
    assert meta["step"] == trainer.global_step
    # on-disk names are always natural (never slab keys)
    assert set(tensors.keys()) == set(trainer.natural_trainable().keys())
    assert not any("__slab__" in k for k in tensors)

    # fresh trainer, restore, verify state equality
    data = tmp / "data"
    cfg = tiny_config(data, tmp / "out2")
    fresh = Trainer(cfg, tmp / "out2" / "run", models=tiny_models(seed=1),
                    tokenizer=HashTokenizer())
    fresh.resume(path)
    assert fresh.global_step == trainer.global_step
    np.testing.assert_allclose(
        np.asarray(fresh.natural_trainable()["unet.conv_out.weight"]),
        np.asarray(trainer.natural_trainable()["unet.conv_out.weight"]), rtol=0, atol=0)
