"""The real-weights loss-parity harness (lab/loss_parity.py) is itself
tested (VERDICT r3 item 9): fabricate a tiny "pretrained" checkpoint on
disk, run the unmodified entry point end-to-end, and compare against the
independent torch oracle — so when real SD1.5 weights appear, the
one-command path (`python -m lab.loss_parity <path>`) is known-good."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
sys.path.insert(0, str(Path(__file__).parent.parent))

from helpers import tiny_models, write_diffusers_dir


def test_harness_end_to_end_diffusers_dir(tmp_path):
    model_dir = write_diffusers_dir(tiny_models(), tmp_path / "model")

    from lab.loss_parity import run

    out = tmp_path / "batch.npz"
    result = run(str(model_dir), batch=2, res=64, out=str(out),
                 oracle="torch")
    assert np.isfinite(result["loss_ours"])
    # fp32 forward: the two implementations agree far inside the 1e-3
    # acceptance band (BASELINE.md)
    assert result["delta"] < 1e-5, result

    saved = np.load(out)
    assert saved["latents"].shape == (2, 8, 8, 4)
    assert float(saved["loss_ours"]) == pytest.approx(result["loss_ours"])


def test_harness_single_file_checkpoint(tmp_path):
    """The harness also takes LDM single-file checkpoints (the layout real
    SD1.5 distributions use)."""
    from scal_sdt_tpu.convert.sd_names import (
        convert_unet_state_df_to_ldm,
        convert_vae_state_df_to_ldm,
    )
    from scal_sdt_tpu.utils.state import save_state_dict

    models = tiny_models()
    state = {}
    for k, v in convert_unet_state_df_to_ldm(
            {k: np.asarray(v) for k, v in models.unet.items()},
            models.unet_config).items():
        state[f"model.diffusion_model.{k}"] = v
    for k, v in convert_vae_state_df_to_ldm(
            {k: np.asarray(v) for k, v in models.vae.items()},
            models.vae_config).items():
        state[f"first_stage_model.{k}"] = v
    for k, v in models.clip.items():
        state[f"cond_stage_model.transformer.{k}"] = np.asarray(v)
    path = tmp_path / "tiny_sd.safetensors"
    save_state_dict(state, path)

    # single-file load derives the architecture from an LDM yaml (default:
    # real SD1.5); describe the tiny fixture in CompVis terms
    ldm_yaml = tmp_path / "tiny-inference.yaml"
    ldm_yaml.write_text("""
model:
  params:
    linear_start: 0.00085
    linear_end: 0.012
    timesteps: 1000
    unet_config:
      params:
        in_channels: 4
        out_channels: 4
        model_channels: 32
        channel_mult: [1, 2]
        num_res_blocks: 1
        num_heads: 2
        context_dim: 32
        attention_resolutions: [1]
    first_stage_config:
      params:
        ddconfig:
          in_channels: 3
          out_ch: 3
          z_channels: 4
          ch: 16
          ch_mult: [1, 2]
          num_res_blocks: 1
          num_groups: 8
""")
    from lab.loss_parity import run

    result = run(str(path), batch=2, res=64, out=None, oracle="torch",
                 ldm_config=str(ldm_yaml))
    assert result["delta"] < 1e-5
