"""Standalone sampling CLI (cli/sample.py) — a capability the reference
lacks entirely (it samples only inside training or class-image generation).
"""

from pathlib import Path

import numpy as np
import pytest
from click.testing import CliRunner

from helpers import tiny_models, write_diffusers_dir


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("sample_cli")
    return write_diffusers_dir(tiny_models(), tmp / "tiny-sd")


def test_sample_cli_writes_images(model_dir, tmp_path):
    from scal_sdt_tpu.cli.sample import main

    out = tmp_path / "imgs"
    result = CliRunner().invoke(main, [
        "--model", str(model_dir),
        "--prompt", "a red square", "--prompt", "a blue circle",
        "--steps", "2", "--width", "32", "--height", "32",
        "--num", "2", "--tokenizer", "hash", "--out", str(out),
    ], catch_exceptions=False)
    assert result.exit_code == 0, result.output
    files = sorted(out.glob("*.png"))
    assert len(files) == 4  # 2 prompts x 2 reps
    from PIL import Image

    arr = np.asarray(Image.open(files[0]))
    assert arr.shape == (32, 32, 3)


def test_sample_cli_overlays_training_checkpoint(model_dir, tmp_path):
    """--ckpt merges trainable tensors over the base (LoRA factors ride the
    same path and are consumed as runtime deltas by the UNet forward)."""
    from scal_sdt_tpu.cli.sample import main
    from scal_sdt_tpu.utils.state import save_state_dict

    models = tiny_models()
    k = next(iter(models.unet))
    ckpt = tmp_path / "step1.safetensors"
    save_state_dict(
        {f"unet.{k}": np.asarray(models.unet[k]) + 1.0}, ckpt)

    out_base = tmp_path / "base"
    out_ft = tmp_path / "ft"
    common = ["--model", str(model_dir), "--prompt", "x", "--steps", "1",
              "--width", "32", "--height", "32", "--tokenizer", "hash"]
    r1 = CliRunner().invoke(main, common + ["--out", str(out_base)],
                            catch_exceptions=False)
    r2 = CliRunner().invoke(main, common + ["--ckpt", str(ckpt),
                                            "--out", str(out_ft)],
                            catch_exceptions=False)
    assert r1.exit_code == 0 and r2.exit_code == 0
    from PIL import Image

    a = np.asarray(Image.open(next(iter(sorted(out_base.glob("*.png"))))))
    b = np.asarray(Image.open(next(iter(sorted(out_ft.glob("*.png"))))))
    assert a.shape == b.shape
    assert np.any(a != b), "checkpoint overlay did not change the output"
