"""SD3 (MMDiT + rectified flow) family: schedule math, loader round-trip,
and the fused train step on the virtual mesh.

Third model family, beyond the torch reference's SD1.x scope
(/root/reference/modules/model.py:96-133). MMDiT forward parity lives in
tests/test_mmdit.py; this file covers the training vertical.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from helpers import tiny_sd3_models, write_diffusers_dir  # noqa: E402

from scal_sdt_tpu.diffusion.flow import FlowSchedule


def test_flow_schedule_math():
    s = FlowSchedule(shift=3.0)
    # endpoints: sigma(0)=0 (pure data), sigma(N)=1 (pure noise)
    x0 = jnp.ones((2, 4, 4, 1))
    eps = jnp.full((2, 4, 4, 1), -1.0)
    t0 = jnp.zeros((2,))
    tN = jnp.full((2,), float(s.num_train_timesteps))
    np.testing.assert_allclose(np.asarray(s.add_noise(x0, eps, t0)), 1.0)
    np.testing.assert_allclose(np.asarray(s.add_noise(x0, eps, tN)), -1.0)
    # target is the constant velocity eps - x0
    np.testing.assert_allclose(
        np.asarray(s.training_target(x0, eps, t0)), -2.0)
    # shift moves mass toward higher sigma: sigma(u) >= u
    u = jnp.linspace(0.01, 0.99, 17)
    assert np.all(np.asarray(s.shifted_sigma(u)) >= np.asarray(u))
    # logit-normal draws are strictly inside (0, N) and float
    ts = s.sample_timesteps(jax.random.PRNGKey(0), 512)
    assert ts.dtype == jnp.float32
    assert float(ts.min()) > 0.0 and float(ts.max()) < s.num_train_timesteps
    # sampling ladder: monotone decreasing, ends at exactly 0
    sig = np.asarray(s.sampling_sigmas(8))
    assert sig[0] == pytest.approx(1.0) and sig[-1] == 0.0
    assert np.all(np.diff(sig) < 0)


def test_sd3_diffusers_dir_round_trip(tmp_path):
    from scal_sdt_tpu.convert.loader import load_diffusers_dir

    models = tiny_sd3_models()
    write_diffusers_dir(models, tmp_path / "sd3")
    loaded = load_diffusers_dir(tmp_path / "sd3")
    assert loaded.is_sd3 and not loaded.is_sdxl
    assert loaded.unet_config is None
    assert isinstance(loaded.schedule, FlowSchedule)
    assert loaded.schedule.shift == 3.0
    assert loaded.mmdit_config == models.mmdit_config
    assert loaded.t5_config == models.t5_config
    assert loaded.vae_config.shift_factor == pytest.approx(0.0609)
    assert set(loaded.unet) == set(models.unet)
    assert set(loaded.t5) == set(models.t5)
    # second tower must carry the projection head
    assert loaded.clip2_config.projection_dim == 12


@pytest.mark.parametrize("with_t5", [True, False])
def test_sd3_train_step(with_t5):
    from scal_sdt_tpu.conf import Config, default, load_optim_target, merge
    from scal_sdt_tpu.parallel.mesh import batch_sharding, make_mesh, shard_params
    from scal_sdt_tpu.training.optim_targets import group_labels, resolve_optim_target
    from scal_sdt_tpu.training.optimizers import build_optimizer
    from scal_sdt_tpu.training.step import (
        StepSpec, TE2_PREFIX, TE3_PREFIX, TE_PREFIX, UNET_PREFIX, VAE_PREFIX,
        init_train_state, make_train_step,
    )

    models = tiny_sd3_models(with_t5=with_t5)
    config = merge(default(), Config({
        "batch_size": 4,
        "trainer": {"precision": 32, "mesh": {"data": 2, "fsdp": 1}},
        "uncond": {"enabled": True, "p": 0.1, "cond": "zeros"},
        "optimizer": {
            "name": "adamw",
            "params": {"lr": 1e-3, "beta1": 0.9, "beta2": 0.999,
                       "weight_decay": 1e-2, "eps": 1e-8},
            "lr_scale": {"enabled": False},
        },
    }))
    resolutions = resolve_optim_target(load_optim_target("full_unet"),
                                       models.unet.keys(), models.clip.keys())
    labels = group_labels(resolutions)
    overrides = {f"g{i}": g.optimizer
                 for i, g in enumerate(resolutions["unet"].groups)}
    trainable_names = set(resolutions["unet"].trainable)
    trainable = {f"{UNET_PREFIX}.{k}": np.asarray(v, np.float32)
                 for k, v in models.unet.items() if k in trainable_names}
    frozen = {f"{UNET_PREFIX}.{k}": np.asarray(v)
              for k, v in models.unet.items() if k not in trainable_names}
    frozen.update({f"{TE_PREFIX}.{k}": np.asarray(v)
                   for k, v in models.clip.items()})
    frozen.update({f"{TE2_PREFIX}.{k}": np.asarray(v)
                   for k, v in models.clip2.items()})
    if with_t5:
        frozen.update({f"{TE3_PREFIX}.{k}": np.asarray(v)
                       for k, v in models.t5.items()})
    frozen.update({f"{VAE_PREFIX}.{k}": np.asarray(v)
                   for k, v in models.vae.items()})

    tx, lr_fn = build_optimizer(config, labels, overrides, 10, 1)
    spec = StepSpec.from_config(
        config, None, models.clip_config, models.vae_config,
        train_text_encoder=False, schedule=models.schedule,
        clip2_config=models.clip2_config, mmdit_config=models.mmdit_config,
        t5_config=models.t5_config if with_t5 else None)
    assert spec.sd3 and not spec.sdxl
    step_fn = make_train_step(spec, tx, lr_fn, ema_enabled=False, donate=True)

    rng = np.random.RandomState(0)
    batch_np = {
        "images": rng.uniform(-1, 1, (4, 16, 16, 3)).astype(np.float32),
        "input_ids": rng.randint(0, 1000, (4, 77)).astype(np.int32),
    }
    if with_t5:
        batch_np["t5_ids"] = rng.randint(0, 1000, (4, 16)).astype(np.int32)

    mesh = make_mesh(data=2, fsdp=1, devices=jax.devices()[:2])
    with mesh:
        t_dev = shard_params(mesh, trainable)
        f_dev = shard_params(mesh, frozen)
        state = init_train_state(jax.random.PRNGKey(0), t_dev, tx,
                                 ema_enabled=False, ema_decay=0.999)
        bs = batch_sharding(mesh)
        batch = {k: jax.device_put(v, bs) for k, v in batch_np.items()}
        probe = f"{UNET_PREFIX}.transformer_blocks.0.attn.to_q.weight"
        before = np.asarray(state.trainable[probe]).copy()
        losses = []
        for _ in range(3):
            state, metrics = step_fn(state, f_dev, batch)
            losses.append(float(np.asarray(metrics["train_loss"])))
        after = np.asarray(state.trainable[probe])
    assert all(np.isfinite(l) for l in losses)
    # gradients must reach the joint-attention weights through the flow loss
    assert np.abs(after - before).max() > 1e-6


def test_flow_rejects_min_snr():
    s = FlowSchedule()
    with pytest.raises(NotImplementedError):
        s.min_snr_weight(jnp.zeros((2,)), 5.0)


def test_sd3_trainer_end_to_end(tmp_path):
    """Full Trainer loop on the virtual mesh: tiny SD3 dir loaded off disk,
    T5 tokenizer resolved from tokenizer_3/, flow loss optimized,
    checkpoint written."""
    from helpers import (
        make_image_dataset, make_t5_tokenizer_file, tiny_config,
        tiny_sd3_models, write_diffusers_dir,
    )
    from scal_sdt_tpu.convert.loader import load_diffusers_dir
    from scal_sdt_tpu.text.tokenizer import HashTokenizer
    from scal_sdt_tpu.training.trainer import Trainer

    model_dir = write_diffusers_dir(tiny_sd3_models(), tmp_path / "sd3")
    make_t5_tokenizer_file(model_dir / "tokenizer_3" / "tokenizer.json")
    data = make_image_dataset(tmp_path, n=4, size=(16, 16))
    cfg = tiny_config(data, tmp_path / "out",
                      model=str(model_dir), batch_size=2,
                      data={"resolution": 16})
    models = load_diffusers_dir(model_dir)
    trainer = Trainer(cfg, tmp_path / "out" / "run", models=models,
                      tokenizer=HashTokenizer())
    metrics = trainer.fit(max_steps_override=2)
    assert np.isfinite(metrics["train_loss"])
    assert trainer.spec.sd3
    assert trainer.pipeline.tokenizer_3 is not None
    # T5 tower is conditioning-only: frozen, never trainable
    from scal_sdt_tpu.training.step import TE3_PREFIX

    assert any(k.startswith(TE3_PREFIX + ".") for k in trainer.frozen)
    assert not any(k.startswith(TE3_PREFIX + ".")
                   for k in trainer.state.trainable)


def test_sd3_sampling_end_to_end(tmp_path):
    """flow-Euler text->image on the tiny SD3 triple (with and without the
    T5 tower), plus img2img."""
    from helpers import make_t5_tokenizer_file, tiny_sd3_models
    from scal_sdt_tpu.diffusion.sampler import SamplerSpec, sample_images
    from scal_sdt_tpu.text.tokenizer import HashTokenizer, T5TokenizerWrapper

    tok3 = T5TokenizerWrapper.from_file(
        make_t5_tokenizer_file(tmp_path / "t5" / "tokenizer.json"),
        max_length=16)

    for with_t5 in (True, False):
        models = tiny_sd3_models(with_t5=with_t5)
        spec = SamplerSpec(
            unet_config=None, vae_config=models.vae_config,
            clip_config=models.clip_config, schedule=models.schedule,
            clip2_config=models.clip2_config,
            mmdit_config=models.mmdit_config,
            t5_config=models.t5_config if with_t5 else None,
            dtype=jnp.float32)
        assert spec.sd3
        imgs = sample_images(
            models.unet, models.vae, models.clip, HashTokenizer(),
            ["a photo of the cat"], "", spec, steps=3, cfg_scale=5.0,
            width=16, height=16, seed=0, method="flow_euler",
            clip2_params=models.clip2,
            t5_params=models.t5 if with_t5 else None,
            tokenizer_3=tok3 if with_t5 else None)
        assert imgs.shape == (1, 16, 16, 3) and imgs.dtype == np.uint8

    # img2img re-noises from the ladder midpoint
    init = np.zeros((16, 16, 3), np.float32)
    imgs2 = sample_images(
        models.unet, models.vae, models.clip, HashTokenizer(),
        ["a photo"], "", spec, steps=4, cfg_scale=5.0, width=16, height=16,
        seed=1, method="flow_euler", init_image=init, strength=0.5,
        clip2_params=models.clip2)
    assert imgs2.shape == (1, 16, 16, 3)


def test_sd3_lora_target_resolution_and_step():
    """lora_sd3 spec: LoRA factors injected into every joint-block
    projection that exists (the final pre_only block has no
    to_add_out/ff_context — the spec must tolerate that), base frozen."""
    from scal_sdt_tpu.conf import Config, default, load_optim_target, merge
    from scal_sdt_tpu.training.lora import init_lora_params
    from scal_sdt_tpu.training.optim_targets import resolve_optim_target

    models = tiny_sd3_models(with_t5=False)
    res = resolve_optim_target(load_optim_target("lora_sd3"),
                               models.unet.keys(), models.clip.keys())
    lora_paths = set(res["unet"].lora)
    assert "transformer_blocks.0.attn.add_q_proj" in lora_paths
    assert "transformer_blocks.0.ff_context.net.0.proj" in lora_paths
    # final block is pre_only: context-out projections absent
    assert "transformer_blocks.1.attn.to_add_out" not in lora_paths
    assert "transformer_blocks.1.attn.to_q" in lora_paths
    # trainable = lora factors only
    assert all(".lora_" in k for k in res["unet"].trainable)
    assert not res["text_encoder"].any_trainable

    lora = init_lora_params(jax.random.PRNGKey(0), models.unet,
                            res["unet"].lora)
    assert any(k.endswith(".lora_A") for k in lora)


def test_sd3_cache_build_and_cached_training(tmp_path):
    """cache.py's builder writes SD3 conds (clip-padded + t5) + pooled;
    the trainer's cached fast path consumes them."""
    from helpers import (
        make_image_dataset, make_t5_tokenizer_file, tiny_config,
        tiny_sd3_models, write_diffusers_dir,
    )
    import json

    from safetensors.numpy import save_file

    from scal_sdt_tpu.cli.cache import assemble_cache, build_local_shard
    from scal_sdt_tpu.convert.loader import load_diffusers_dir
    from scal_sdt_tpu.text.tokenizer import HashTokenizer
    from scal_sdt_tpu.training.trainer import Trainer

    model_dir = write_diffusers_dir(tiny_sd3_models(), tmp_path / "sd3")
    make_t5_tokenizer_file(model_dir / "tokenizer_3" / "tokenizer.json")
    data = make_image_dataset(tmp_path, n=4, size=(16, 16))
    cache_path = tmp_path / "cache.safetensors"
    cfg = tiny_config(data, tmp_path / "out", model=str(model_dir),
                      batch_size=2, data={"resolution": 16,
                                          "cache": str(cache_path)})
    models = load_diffusers_dir(model_dir)
    shard = build_local_shard(cfg, models, HashTokenizer(), no_conds=False,
                              aug_group_size=1, batch_size=2, world_size=1,
                              global_rank=0)
    assert shard["pooled"] is not None
    # conds = 77 clip tokens padded to joint width + 77 t5 tokens
    assert shard["conds"].shape[1:] == (
        154, models.mmdit_config.joint_attention_dim)
    cache, metadata = assemble_cache(shard)
    save_file(cache, str(cache_path), metadata={"json": json.dumps(metadata)})

    trainer = Trainer(cfg, tmp_path / "out" / "run", models=models,
                      tokenizer=HashTokenizer())
    metrics = trainer.fit(max_steps_override=2)
    assert np.isfinite(metrics["train_loss"])


def test_sd3_kohya_lora_export_naming():
    """SD3 LoRA factors export through the generic kohya path with
    diffusers-flat names (lora_unet_transformer_blocks_*), the dialect
    kohya's sd-scripts SD3 branch reads."""
    from scal_sdt_tpu.cli.ckpt_tool import to_kohya_format

    state = {
        "transformer_blocks.0.attn.to_q.lora_A": np.zeros((4, 16), np.float32),
        "transformer_blocks.0.attn.to_q.lora_B": np.zeros((16, 4), np.float32),
        "transformer_blocks.0.attn.add_q_proj.lora_A": np.zeros((4, 16), np.float32),
        "transformer_blocks.0.attn.add_q_proj.lora_B": np.zeros((16, 4), np.float32),
    }
    out = to_kohya_format(state, "lora_unet", fallback_alpha=1)
    assert "lora_unet_transformer_blocks_0_attn_to_q.lora_down.weight" in out
    assert "lora_unet_transformer_blocks_0_attn_add_q_proj.lora_up.weight" in out
    assert "lora_unet_transformer_blocks_0_attn_to_q.alpha" in out


def test_sd3_prune_emits_diffusers_transformer(tmp_path):
    """prune on an SD3 full-FT checkpoint publishes the diffusers
    transformer layout (no LDM bijection exists for MMDiT)."""
    from safetensors import safe_open

    from scal_sdt_tpu.cli.ckpt_tool import main as ckpt_main
    from scal_sdt_tpu.utils.state import save_state_dict

    models = tiny_sd3_models(with_t5=False)
    ckpt = tmp_path / "run.safetensors"
    save_state_dict({f"unet.{k}": np.asarray(v)
                     for k, v in models.unet.items()}, ckpt)
    out = tmp_path / "transformer.safetensors"
    from click.testing import CliRunner

    res = CliRunner().invoke(ckpt_main,
                             ["prune", str(ckpt), str(out), "--unet-dtype",
                              "fp16"])
    assert res.exit_code == 0, res.output
    with safe_open(str(out), "numpy") as f:
        keys = set(f.keys())
        assert "pos_embed.proj.weight" in keys
        assert "transformer_blocks.0.attn.to_q.weight" in keys
        assert f.get_tensor("proj_out.weight").dtype == np.float16
    assert set(models.unet) == keys


def test_pos_embed_buffer_never_trainable():
    """full_unet over an MMDiT must not select the fixed sincos positional
    table (a torch BUFFER in diffusers, not a parameter)."""
    from scal_sdt_tpu.conf import load_optim_target
    from scal_sdt_tpu.training.optim_targets import resolve_optim_target

    models = tiny_sd3_models(with_t5=False)
    res = resolve_optim_target(load_optim_target("full_unet"),
                               models.unet.keys(), models.clip.keys())
    assert "pos_embed.pos_embed" not in res["unet"].trainable
    assert "pos_embed.proj.weight" in res["unet"].trainable
