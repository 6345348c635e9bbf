"""Round-2 batch B: remaining VERDICT/ADVICE round-1 findings.

1. Checkpoint retention state persists across CheckpointManager recreation
   (resume), so pre-existing checkpoints are pruned (VERDICT weak #8).
2. LDM->diffusers conversion errors on unconsumed keys instead of silently
   loading an incomplete model, and splits legacy fused-qkv AttentionBlock
   tensors with the reference's per-head math (VERDICT missing #4,
   /root/reference/modules/convert/sd_to_diffusers.py:124-172).
3. Auto batch-size search logic: power + binsearch (VERDICT missing #7,
   /root/reference/train.py:127-130).
4. prune --text-encoder falls back to a pristine CLIP-L source
   (/root/reference/ckpt_tool.py:128-133).
"""

import json

import numpy as np
import pytest
from click.testing import CliRunner

from scal_sdt_tpu.convert.sd_names import (
    convert_unet_state_ldm_to_df,
    convert_vae_state_ldm_to_df,
    split_fused_qkv,
    unet_name_map,
)
from scal_sdt_tpu.models.unet import UNetConfig, unet_param_shapes
from scal_sdt_tpu.models.vae import VAEConfig, vae_param_shapes
from scal_sdt_tpu.training.tuner import search_batch_size
from scal_sdt_tpu.utils.state import load_state_dict, save_state_dict


# ------------------------------------------------------------- retention


def _tiny_state():
    import jax

    from scal_sdt_tpu.training.step import TrainState

    return TrainState(
        step=jax.numpy.asarray(0),
        trainable={"unet.conv_in.weight": jax.numpy.ones((2,))},
        opt_state=(), ema=None, rng=jax.random.PRNGKey(0))


def test_retention_persists_across_manager_recreation(tmp_path):
    from scal_sdt_tpu.training.checkpoint import CheckpointManager

    cfg = {"filename": "s{step}", "save_top_k": 2, "monitor": "train_loss",
           "mode": "min", "every_n_train_steps": 1}
    state = _tiny_state()

    mgr = CheckpointManager(tmp_path, cfg)
    p1 = mgr.save(state, {}, {"step": 1, "train_loss": 0.5})
    p2 = mgr.save(state, {}, {"step": 2, "train_loss": 0.3})
    assert p1.exists() and p2.exists()
    assert (tmp_path / "retention.json").exists()

    # simulate resume: a NEW manager must know about the old checkpoints
    mgr2 = CheckpointManager(tmp_path, cfg)
    p3 = mgr2.save(state, {}, {"step": 3, "train_loss": 0.1})
    # worst of the three (0.5) must have been pruned, best two kept
    assert not p1.exists()
    assert p2.exists() and p3.exists()


def test_retention_ignores_externally_deleted_files(tmp_path):
    from scal_sdt_tpu.training.checkpoint import CheckpointManager

    cfg = {"filename": "s{step}", "save_top_k": 1, "monitor": "train_loss",
           "mode": "min"}
    state = _tiny_state()
    mgr = CheckpointManager(tmp_path, cfg)
    p1 = mgr.save(state, {}, {"step": 1, "train_loss": 0.5})
    p1.unlink()
    mgr2 = CheckpointManager(tmp_path, cfg)  # must not crash
    assert mgr2._saved == []


# ----------------------------------------------------- strict conversion


def test_unet_ldm_to_df_errors_on_unconsumed_keys():
    cfg = UNetConfig.tiny()
    names = list(unet_param_shapes(cfg))
    name_map = unet_name_map(cfg, names)
    ldm_state = {v: np.zeros((1,), np.float32) for v in name_map.values()}
    out = convert_unet_state_ldm_to_df(ldm_state, cfg)
    assert set(out) == set(names)

    ldm_state["input_blocks.99.0.bogus.weight"] = np.zeros((1,), np.float32)
    with pytest.raises(ValueError, match="not consumed"):
        convert_unet_state_ldm_to_df(ldm_state, cfg)
    # non-strict keeps the old drop behaviour
    out = convert_unet_state_ldm_to_df(ldm_state, cfg, strict=False)
    assert set(out) == set(names)


def test_vae_ldm_to_df_errors_on_unconsumed_but_allows_loss_subtree():
    from scal_sdt_tpu.convert.sd_names import vae_name_map

    cfg = VAEConfig.tiny()
    names = list(vae_param_shapes(cfg))
    name_map = vae_name_map(cfg, names)
    ldm_state = {v: np.zeros((1,), np.float32) for v in name_map.values()}
    # standalone first-stage checkpoints carry LPIPS/discriminator state
    ldm_state["loss.logvar"] = np.zeros((1,), np.float32)
    ldm_state["model_ema.decay"] = np.zeros((1,), np.float32)
    out = convert_vae_state_ldm_to_df(ldm_state, cfg)
    assert set(out) == set(names)

    ldm_state["encoder.down.9.block.9.conv9.weight"] = np.zeros((1,), np.float32)
    with pytest.raises(ValueError, match="not consumed"):
        convert_vae_state_ldm_to_df(ldm_state, cfg)


def test_split_fused_qkv_matches_reference_math():
    """Reconstruct the reference's per-head interleaved fused layout from
    known q/k/v and check the split recovers them as linear weights."""
    rng = np.random.RandomState(0)
    channels, num_head_channels = 32, 8
    num_heads = channels // num_head_channels
    per_head = channels // num_heads
    q = rng.randn(channels, channels, 1).astype(np.float32)
    k = rng.randn(channels, channels, 1).astype(np.float32)
    v = rng.randn(channels, channels, 1).astype(np.float32)
    qb = rng.randn(channels).astype(np.float32)
    kb = rng.randn(channels).astype(np.float32)
    vb = rng.randn(channels).astype(np.float32)

    # fused rows are per-head blocks of [q_head, k_head, v_head]
    def interleave(a, b, c):
        blocks = []
        for h in range(num_heads):
            sl = slice(h * per_head, (h + 1) * per_head)
            blocks += [a[sl], b[sl], c[sl]]
        return np.concatenate(blocks, axis=0)

    state = {
        "middle_block.1.qkv.weight": interleave(q, k, v),
        "middle_block.1.qkv.bias": interleave(qb, kb, vb),
        "middle_block.1.proj_out.weight": rng.randn(channels, channels, 1).astype(np.float32),
    }
    out = split_fused_qkv(state, num_head_channels=num_head_channels)
    np.testing.assert_allclose(out["middle_block.1.q.weight"], q[:, :, 0])
    np.testing.assert_allclose(out["middle_block.1.k.weight"], k[:, :, 0])
    np.testing.assert_allclose(out["middle_block.1.v.weight"], v[:, :, 0])
    np.testing.assert_allclose(out["middle_block.1.q.bias"], qb)
    np.testing.assert_allclose(out["middle_block.1.v.bias"], vb)
    # conv1d proj -> linear
    assert out["middle_block.1.proj_out.weight"].ndim == 2


# --------------------------------------------------------------- tuner


def _capacity_trial(capacity, log=None):
    def trial(bs):
        if log is not None:
            log.append(bs)
        return bs <= capacity
    return trial


def test_power_search_doubles_until_failure():
    log = []
    assert search_batch_size(_capacity_trial(11, log), init_bs=1, mode="power") == 8
    assert log == [1, 2, 4, 8, 16]


def test_binsearch_refines_between_success_and_failure():
    assert search_batch_size(_capacity_trial(11), init_bs=1, mode="binsearch") == 11
    assert search_batch_size(_capacity_trial(8), init_bs=2, mode="binsearch") == 8
    assert search_batch_size(_capacity_trial(97), init_bs=3, mode="binsearch") == 97


def test_search_returns_zero_when_nothing_fits():
    assert search_batch_size(_capacity_trial(0), init_bs=1, mode="power") == 0


def test_search_respects_max_bs_and_max_trials():
    log = []
    assert search_batch_size(_capacity_trial(10**9, log), init_bs=1,
                             mode="power", max_trials=3) == 4
    assert search_batch_size(_capacity_trial(10**9), init_bs=4,
                             mode="power", max_bs=16) == 16


def test_tune_batch_size_disabled_passthrough():
    from scal_sdt_tpu.conf import Config
    from scal_sdt_tpu.training.tuner import tune_batch_size

    cfg = Config({"batch_size": 7, "trainer": {"auto_scale_batch_size": False}})
    assert tune_batch_size(cfg, "unused.yaml") == 7


# ------------------------------------------------- prune pristine CLIP


def test_prune_text_encoder_pristine_fallback(tmp_path):
    from scal_sdt_tpu.cli import ckpt_tool

    unet_keys = list(unet_param_shapes(UNetConfig.sd15()))
    ckpt = tmp_path / "train.safetensors"
    save_state_dict({f"unet.{k}": np.zeros((2,), np.float32) for k in unet_keys},
                    ckpt, metadata={"json": json.dumps({"step": 1})})

    # pristine source WITHOUT the text_model. prefix (auto-prefixed)
    pristine = tmp_path / "clip.safetensors"
    save_state_dict({
        "embeddings.token_embedding.weight": np.ones((4, 2), np.float32),
        "embeddings.position_ids": np.zeros((1, 4), np.int64),
    }, pristine)

    out = tmp_path / "pruned.safetensors"
    result = CliRunner().invoke(ckpt_tool.main, [
        "prune", str(ckpt), str(out), "--text-encoder",
        "--pristine-te", str(pristine)])
    assert result.exit_code == 0, result.output
    state = load_state_dict(out)
    key = "cond_stage_model.transformer.text_model.embeddings.token_embedding.weight"
    assert key in state
    assert not any(k.endswith("position_ids") for k in state)


def test_prune_text_encoder_no_source_errors(tmp_path, monkeypatch):
    from scal_sdt_tpu.cli import ckpt_tool

    monkeypatch.setenv("HF_HUB_OFFLINE", "1")
    monkeypatch.setenv("HF_HOME", str(tmp_path / "nohome"))
    unet_keys = list(unet_param_shapes(UNetConfig.sd15()))
    ckpt = tmp_path / "train.safetensors"
    save_state_dict({f"unet.{k}": np.zeros((2,), np.float32) for k in unet_keys},
                    ckpt, metadata={"json": json.dumps({"step": 1})})
    result = CliRunner().invoke(ckpt_tool.main, [
        "prune", str(ckpt), str(tmp_path / "o.safetensors"), "--text-encoder"])
    assert result.exit_code != 0


# --------------------------------------------------------- _to_host


def test_to_host_single_host_passthrough():
    import jax.numpy as jnp

    from scal_sdt_tpu.training.checkpoint import _to_host

    x = jnp.arange(6.0).reshape(2, 3)
    out = _to_host(x)
    assert isinstance(out, np.ndarray)
    np.testing.assert_allclose(out, np.arange(6.0).reshape(2, 3))
