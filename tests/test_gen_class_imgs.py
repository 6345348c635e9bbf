"""gen_class_imgs CLI end-to-end (VERDICT r4 item 7).

Reference: /root/reference/gen_class_imgs.py:24-116 — square and
ARB-matched target size distributions, delta accounting against existing
MD5-named class images, and idempotency (a second run generates nothing).
"""

import hashlib

import numpy as np
import pytest
from click.testing import CliRunner

from helpers import make_image_dataset, tiny_config, tiny_models, write_diffusers_dir


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("gen_cls")
    return write_diffusers_dir(tiny_models(), tmp / "tiny-sd")


def _write_config(tmp_path, model_dir, instance_dir, class_dir, *,
                  num_target=4, arb=False, resolution=32):
    from scal_sdt_tpu.conf import Config, default, merge, save

    cfg = merge(default(), Config({
        "model": str(model_dir),
        "tokenizer": "hash",
        "output_dir": str(tmp_path / "out"),
        "seed": 77,
        "prior_preservation": {"enabled": True, "prior_loss_weight": 1.0},
        "data": {
            "resolution": resolution,
            "concepts": [{
                "instance_set": {"path": str(instance_dir),
                                 "prompt": "a sks thing"},
                "class_set": {
                    "path": str(class_dir),
                    "prompt": "a thing",
                    "auto_generate": {
                        "enabled": True,
                        "num_target": num_target,
                        "steps": 2,
                        "cfg_scale": 4.0,
                        "batch_size": 2,
                    },
                },
            }],
        },
        "aspect_ratio_bucket": {"enabled": arb},
    }))
    path = tmp_path / "gen.yaml"
    save(cfg, path)
    return path


def test_square_generation_md5_naming_and_idempotency(tmp_path, model_dir):
    from PIL import Image

    from scal_sdt_tpu.cli.gen_class_imgs import main

    instance = make_image_dataset(tmp_path, n=4, size=(32, 32))
    class_dir = tmp_path / "class"
    cfg = _write_config(tmp_path, model_dir, instance, class_dir, num_target=4)

    result = CliRunner().invoke(main, ["--config", str(cfg)],
                                catch_exceptions=False)
    assert result.exit_code == 0, result.output
    files = sorted(class_dir.glob("*.png"))
    assert len(files) == 4
    for f in files:
        arr = np.asarray(Image.open(f))
        assert arr.shape == (32, 32, 3)
        # MD5 naming contract (ckpt-tool-independent dedup across runs)
        assert f.stem == hashlib.md5(arr.tobytes()).hexdigest()

    # second run: target distribution already satisfied -> generates nothing
    before = {f.name for f in files}
    result = CliRunner().invoke(main, ["--config", str(cfg)],
                                catch_exceptions=False)
    assert result.exit_code == 0, result.output
    assert {f.name for f in class_dir.glob("*.png")} == before


def test_delta_accounting_is_fraction_based(tmp_path, model_dir):
    """Reference delta semantics (gen_class_imgs.py:60-68): the diff is on
    size FRACTIONS. 2 existing images at the target size + 2 at an off
    size -> current[target]=0.5, delta=0.5 -> round(4*0.5)=2 new target-size
    images. And a class dir already 100% at the target size generates 0."""
    from PIL import Image

    from scal_sdt_tpu.cli.gen_class_imgs import main

    instance = make_image_dataset(tmp_path, n=4, size=(32, 32))
    class_dir = tmp_path / "class"
    class_dir.mkdir()
    rs = np.random.RandomState(3)
    for size in ((32, 32), (32, 32), (16, 16), (16, 16)):
        arr = rs.randint(0, 255, (size[1], size[0], 3), np.uint8)
        Image.fromarray(arr).save(
            class_dir / f"{hashlib.md5(arr.tobytes()).hexdigest()}.png")

    cfg = _write_config(tmp_path, model_dir, instance, class_dir, num_target=4)
    result = CliRunner().invoke(main, ["--config", str(cfg)],
                                catch_exceptions=False)
    assert result.exit_code == 0, result.output
    sizes = [Image.open(f).size for f in class_dir.glob("*.png")]
    assert len(sizes) == 6  # 4 pre-existing + 2 generated
    assert sizes.count((32, 32)) == 4


def test_arb_target_matches_instance_bucket_distribution(tmp_path, model_dir):
    """With ARB on, generated sizes follow the instance set's bucket
    distribution (reference get_arb_size_dist, gen_class_imgs.py:42-57)."""
    from PIL import Image

    from scal_sdt_tpu.cli.gen_class_imgs import get_arb_size_dist, main

    # landscape-ish instance images -> non-square dominant bucket
    instance = make_image_dataset(tmp_path, n=4, size=(48, 32))
    class_dir = tmp_path / "class_arb"
    cfg = _write_config(tmp_path, model_dir, instance, class_dir,
                        num_target=4, arb=True)

    from scal_sdt_tpu.conf import load_with_defaults

    conf = load_with_defaults(str(cfg))
    dist = get_arb_size_dist(instance, conf.data.resolution,
                             conf.aspect_ratio_bucket)
    expected_counts = {size: round(4 * p) for size, p in dist.items() if p > 0}
    assert expected_counts, "instance set fit no ARB bucket"

    result = CliRunner().invoke(main, ["--config", str(cfg)],
                                catch_exceptions=False)
    assert result.exit_code == 0, result.output

    got: dict = {}
    for f in class_dir.glob("*.png"):
        w, h = Image.open(f).size
        got[(w, h)] = got.get((w, h), 0) + 1
    assert got == {s: c for s, c in expected_counts.items() if c > 0}, (
        got, expected_counts)


def test_disabled_auto_generate_is_skipped(tmp_path, model_dir):
    from scal_sdt_tpu.cli.gen_class_imgs import main
    from scal_sdt_tpu.conf import load, save

    instance = make_image_dataset(tmp_path, n=2, size=(32, 32))
    class_dir = tmp_path / "class_off"
    cfg_path = _write_config(tmp_path, model_dir, instance, class_dir)
    conf = load(cfg_path)
    conf.data.concepts[0].class_set.auto_generate.enabled = False
    save(conf, cfg_path)

    result = CliRunner().invoke(main, ["--config", str(cfg_path)],
                                catch_exceptions=False)
    assert result.exit_code == 0, result.output
    assert not class_dir.exists() or not list(class_dir.glob("*.png"))
