"""Native C++ image pipeline vs PIL reference."""

import numpy as np
import pytest
from PIL import Image

from scal_sdt_tpu.native import image as native_image

pytestmark = pytest.mark.skipif(
    not native_image.available(), reason="native library not built (make -C native)")


def _write_test_images(tmp_path):
    rng = np.random.RandomState(0)
    arr = rng.randint(0, 255, (96, 128, 3), np.uint8)
    png = tmp_path / "t.png"
    jpg = tmp_path / "t.jpg"
    Image.fromarray(arr).save(png)
    Image.fromarray(arr).save(jpg, quality=95)
    return arr, png, jpg


def test_image_size_probe(tmp_path):
    _, png, jpg = _write_test_images(tmp_path)
    assert native_image.image_size(png) == (128, 96)
    assert native_image.image_size(jpg) == (128, 96)


def test_decode_output_contract(tmp_path):
    _, png, jpg = _write_test_images(tmp_path)
    for p in (png, jpg):
        out = native_image.decode_resize_crop(p, 64, 48, 0.5, 0.5)
        assert out is not None
        assert out.shape == (48, 64, 3)
        assert out.dtype == np.float32
        assert out.min() >= -1.0 and out.max() <= 1.0


def test_matches_pil_lanczos_closely(tmp_path):
    arr, png, _ = _write_test_images(tmp_path)
    out = native_image.decode_resize_crop(png, 64, 48, 0.5, 0.5)

    img = Image.fromarray(arr)
    # cover resize to (64, 48): scale = max(64/128, 48/96) = 0.5 -> (64, 48)
    ref = img.resize((64, 48), Image.LANCZOS)
    ref = np.asarray(ref, np.float32) / 255.0 * 2 - 1

    diff = np.abs(out - ref)
    # different Lanczos implementations; must agree closely on average
    assert diff.mean() < 0.03, diff.mean()
    assert np.corrcoef(out.ravel(), ref.ravel())[0, 1] > 0.99


def test_dataset_uses_native_path(tmp_path):
    from scal_sdt_tpu.data.datasets import Concept, ImagePromptDataset, Index

    arr, png, _ = _write_test_images(tmp_path)
    (tmp_path / "t.txt").write_text("caption")
    ds = ImagePromptDataset([Concept(tmp_path, "{TXT_PROMPT}")], center_crop=True)
    item = ds[Index(0, (64, 64))]
    assert item.image.shape == (64, 64, 3)
    assert item.prompt == "caption"
