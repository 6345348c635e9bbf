"""HF-hub-id model loading (VERDICT r3 'missing' item 2; reference
modules/model.py:81-93 accepts hub ids via from_pretrained).

Offline resolution from the local HF cache is tested by fabricating a
cache in the real snapshot layout; the network path only runs when egress
exists (never in this image)."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

from helpers import tiny_models, write_diffusers_dir


def _fabricate_hf_cache(hf_home: Path, repo_id: str, model_dir: Path) -> None:
    """Lay `model_dir` out as a locally-cached HF snapshot of `repo_id`."""
    import shutil

    org, name = repo_id.split("/")
    repo = hf_home / "hub" / f"models--{org}--{name}"
    rev = "0" * 40
    (repo / "refs").mkdir(parents=True)
    (repo / "refs" / "main").write_text(rev)
    shutil.copytree(model_dir, repo / "snapshots" / rev)


def _point_hub_cache(monkeypatch, hf_home: Path) -> None:
    """Redirect the HF cache for this test. huggingface_hub freezes HF_HOME
    into module constants at import time, so when another test already
    imported it (e.g. via transformers) the env var alone is ignored —
    patch the constants that snapshot_download actually reads."""
    monkeypatch.setenv("HF_HOME", str(hf_home))
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")
    from huggingface_hub import constants

    cache = str(hf_home / "hub")
    monkeypatch.setattr(constants, "HF_HUB_CACHE", cache, raising=False)
    monkeypatch.setattr(constants, "HUGGINGFACE_HUB_CACHE", cache,
                        raising=False)


def test_hub_id_resolves_from_local_cache(tmp_path, monkeypatch):
    model_dir = write_diffusers_dir(tiny_models(), tmp_path / "model")
    hf_home = tmp_path / "hf"
    _fabricate_hf_cache(hf_home, "acme/tiny-sd", model_dir)
    _point_hub_cache(monkeypatch, hf_home)

    from scal_sdt_tpu.conf import Config
    from scal_sdt_tpu.convert.loader import load_components

    models = load_components(Config({"model": "acme/tiny-sd", "vae": None,
                                     "ldm_config": None}))
    ref = tiny_models()
    assert models.unet_config == ref.unet_config
    for k, v in ref.unet.items():
        np.testing.assert_array_equal(np.asarray(models.unet[k]),
                                      np.asarray(v), err_msg=k)


def test_hub_id_not_cached_actionable_error(tmp_path, monkeypatch):
    _point_hub_cache(monkeypatch, tmp_path / "empty_hf")

    from scal_sdt_tpu.conf import Config
    from scal_sdt_tpu.convert.loader import load_components

    with pytest.raises(FileNotFoundError, match="neither a local path"):
        load_components(Config({"model": "acme/does-not-exist", "vae": None,
                                "ldm_config": None}))


def test_non_hub_name_error(tmp_path):
    from scal_sdt_tpu.conf import Config
    from scal_sdt_tpu.convert.loader import load_components

    with pytest.raises(FileNotFoundError, match="not a hub id"):
        load_components(Config({"model": str(tmp_path / "missing_dir"),
                                "vae": None, "ldm_config": None}))
