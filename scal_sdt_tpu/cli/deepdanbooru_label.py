"""Auto-captioning with DeepDanbooru (reference: deepdanbooru_label.py).

Runs the DeepDanbooru TF tagger over an image directory and writes per-image
``.txt`` prompt files consumable via the ``{TXT_PROMPT}`` placeholder.

Requires the ``deepdanbooru`` package and a local model directory containing
``project.json`` (this environment has no network egress, so the reference's
auto-download is replaced by a required ``--model-path``).
"""

from __future__ import annotations

import logging
import re
from pathlib import Path

import click
import numpy as np

from ..data.images import list_images, read_image

logger = logging.getLogger("deepdanbooru")

_RE_SPECIAL = re.compile(r"([\\()])")


def load_model(model_path: Path):
    try:
        import deepdanbooru as dd
    except ImportError as e:
        raise click.UsageError(
            "The 'deepdanbooru' package is not installed. "
            "Install it (and tensorflow) to use this tool.") from e
    if not (model_path / "project.json").exists():
        raise click.UsageError(
            f"No DeepDanbooru project at {model_path} — download "
            "deepdanbooru-v3-20211112-sgd-e28 and extract it there.")
    tags = dd.project.load_tags_from_project(str(model_path))
    model = dd.project.load_model_from_project(str(model_path), compile_model=False)
    return model, tags


def format_tags(tags, probs, threshold: float, alpha_sort: bool,
                use_spaces: bool, use_escape: bool,
                include_ranks: bool) -> str:
    """Pure tag selection + formatting (reference deepdanbooru_label.py
    semantics: threshold filter, rating:* exclusion, probability or
    alphabetic order, underscore->space, ()\\ escaping, optional
    (tag:prob) ranks). Split from the TF preprocessing so it is testable
    without tensorflow/deepdanbooru installed."""
    found = [(tag, float(p)) for tag, p in zip(tags, probs)
             if p >= threshold and not tag.startswith("rating:")]
    found.sort(key=lambda t: t[0] if alpha_sort else -t[1])

    parts = []
    for tag, p in found:
        if use_spaces:
            tag = tag.replace("_", " ")
        if use_escape:
            tag = _RE_SPECIAL.sub(r"\\\1", tag)
        parts.append(f"({tag}:{p:.3f})" if include_ranks else tag)
    return ", ".join(parts)


def _preprocess(pil_image, width: int, height: int) -> np.ndarray:
    """AREA-resample to fit (width, height) preserving aspect, pad, scale to
    [0,1] — DeepDanbooru's canonical input transform (TF required)."""
    import deepdanbooru as dd
    import tensorflow as tf

    image = np.array(pil_image)
    image = tf.image.resize(image, size=(height, width),
                            method=tf.image.ResizeMethod.AREA,
                            preserve_aspect_ratio=True).numpy()
    return dd.image.transform_and_pad_image(image, width, height) / 255.0


def tag_image(model, tags, pil_image, threshold: float, alpha_sort: bool,
              use_spaces: bool, use_escape: bool, include_ranks: bool,
              preprocess=None) -> str:
    width, height = model.input_shape[2], model.input_shape[1]
    # late-bound default so tests can monkeypatch module-level _preprocess
    image = (preprocess or _preprocess)(pil_image, width, height)
    probs = model.predict(image[np.newaxis, ...])[0]
    return format_tags(tags, probs, threshold, alpha_sort, use_spaces,
                       use_escape, include_ranks)


@click.command()
@click.argument("image_dir", type=click.Path(exists=True, file_okay=False, path_type=Path))
@click.option("--model-path", type=click.Path(exists=True, file_okay=False, path_type=Path),
              required=True, help="DeepDanbooru project directory (contains project.json).")
@click.option("--threshold", type=float, default=0.5)
@click.option("--alpha-sort", is_flag=True)
@click.option("--no-spaces", is_flag=True, help="Keep underscores in tags.")
@click.option("--no-escape", is_flag=True, help="Do not escape ( ) \\ characters.")
@click.option("--include-ranks", is_flag=True, help="Append (tag:prob) ranks.")
@click.option("--overwrite", is_flag=True, help="Overwrite existing .txt files.")
def main(image_dir: Path, model_path: Path, threshold: float, alpha_sort: bool,
         no_spaces: bool, no_escape: bool, include_ranks: bool, overwrite: bool):
    """Write DeepDanbooru tag captions next to every image in IMAGE_DIR."""
    model, tags = load_model(model_path)
    n = 0
    for path in list_images(image_dir):
        txt = path.with_suffix(".txt")
        if txt.exists() and not overwrite:
            continue
        prompt = tag_image(model, tags, read_image(path), threshold, alpha_sort,
                           not no_spaces, not no_escape, include_ranks)
        txt.write_text(prompt)
        n += 1
    logger.info(f"Labeled {n} images in {image_dir}")


if __name__ == "__main__":
    logging.basicConfig(level="INFO")
    main()
