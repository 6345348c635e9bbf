"""Offline latent/condition cache builder (reference: cache.py).

One-pass on-device VAE encode (+ CLIP encode of prompts) over the training
set, written as a single safetensors file keyed ``{id}.latent.{g}`` /
``{id}.cond`` with the reference's exact metadata schema
{sizes, entries, total_entries, aug_group_size} — the trainer's cache fast
path and the reference's file format agree byte-for-byte.

``--aug-group-size N`` stores N augmented latent variants per image;
training samples one uniformly (reference cache.py:59-62 <->
datasets.py:85-87). Same declared limitations: with ARB enabled the epoch
order is data-dependent, so augment+ARB caching is rejected.
"""

from __future__ import annotations

import json
import logging
from functools import partial
from pathlib import Path
from typing import IO

import click
import numpy as np

from ..conf import load_with_defaults
from ..data.pipeline import DataPipeline, get_dataset, get_sampler
from ..utils.state import save_state_dict

logger = logging.getLogger("cache")


@click.command()
@click.option("--config", "config_file", type=click.File("r"), required=True,
              help="Path to the training config.")
@click.option("--no-conds", is_flag=True,
              help="Do not cache conditions (useful when training the text encoder).")
@click.option("--aug-group-size", type=int, default=16,
              help="Number of augmented latent variants per entry.")
@click.option("--batch-size", type=int, default=1,
              help="Batch size for VAE and text encoder.")
def main(config_file: IO[str], no_conds: bool, aug_group_size: int, batch_size: int):
    """Generate the latent/condition cache at config entry data.cache."""
    import jax
    import jax.numpy as jnp

    from ..convert.loader import load_components
    from ..models.clip import clip_text_apply
    from ..models.vae import encoder_apply, sample_latents
    from ..text.tokenizer import resolve_tokenizer

    config = load_with_defaults(config_file)
    config["batch_size"] = batch_size

    if config.data.get("cache") is None:
        raise click.UsageError("data.cache is not set")

    if config.get("augment") is None:
        if aug_group_size != 1:
            logger.warning("Augmentation not enabled; forcing aug group size 1")
            aug_group_size = 1
    elif config.aspect_ratio_bucket.get("enabled", False):
        raise click.UsageError(
            "Caching is incompatible with ARB + augmentation together "
            "(ARB batch entry order is random)")

    models = load_components(config)
    tokenizer = resolve_tokenizer(config)

    dataset = get_dataset(config, use_cache=False)
    sampler = get_sampler(dataset, config, jax.process_count(), jax.process_index())
    pipeline = DataPipeline(dataset, sampler, batch_size, tokenizer,
                            num_workers=config.get("num_workers") or 4)

    vae_params = {k: jnp.asarray(v) for k, v in models.vae.items()}
    clip_params = {k: jnp.asarray(v) for k, v in models.clip.items()}
    stop_at_layer = int(config.get("clip_stop_at_layer", 1))

    @partial(jax.jit, static_argnames=())
    def encode_latents(images, rng):
        moments = encoder_apply(vae_params, images, models.vae_config)
        return sample_latents(moments, rng, models.vae_config.scaling_factor)

    @jax.jit
    def encode_conds(input_ids):
        return clip_text_apply(clip_params, input_ids, models.clip_config, stop_at_layer)

    cache: dict[str, np.ndarray] = {}
    sizes: dict[str, list] = {}
    ids: set = set()
    entry_count = 0
    rng = jax.random.PRNGKey(int(config.get("seed") or 0))

    for group in range(aug_group_size):
        entry_count = 0
        for batch in pipeline:
            rng, sub = jax.random.split(rng)
            latents = np.asarray(encode_latents(jnp.asarray(batch["images"]), sub))
            conds = None
            if group == 0 and not no_conds and "input_ids" in batch:
                conds = np.asarray(encode_conds(jnp.asarray(batch["input_ids"])))
            for i, id_ in enumerate(batch["ids"]):
                key = f"{id_}.latent.{group}"
                cache[key] = latents[i]
                sizes[key] = list(latents[i].shape)
                if conds is not None:
                    cache[f"{id_}.cond"] = conds[i]
                ids.add(id_)
                entry_count += 1

    for id_ in ids:
        shapes = {tuple(v.shape) for k, v in cache.items()
                  if k.startswith(f"{id_}.latent.")}
        assert len(shapes) == 1, f"Inconsistent latent shapes for id {id_}"

    metadata = {
        "sizes": sizes,
        "entries": sorted(ids),
        "total_entries": entry_count,
        "aug_group_size": aug_group_size,
    }
    out = Path(config.data.cache)
    out.parent.mkdir(parents=True, exist_ok=True)
    save_state_dict(cache, out, "safetensors",
                    metadata={"json": json.dumps(metadata)})
    logger.info(f'Saved cache ({entry_count} entries x {aug_group_size} groups) to "{out}"')


if __name__ == "__main__":
    logging.basicConfig(level="INFO")
    main()
