"""Offline latent/condition cache builder (reference: cache.py).

One-pass on-device VAE encode (+ CLIP encode of prompts) over the training
set, written as a single safetensors file keyed ``{id}.latent.{g}`` /
``{id}.cond`` with the reference's exact metadata schema
{sizes, entries, total_entries, aug_group_size} — the trainer's cache fast
path and the reference's file format agree byte-for-byte.

Multi-host: each process encodes its sampler shard, the shards are
all-gathered (``jax.experimental.multihost_utils.process_allgather``, the
ICI/DCN analogue of the reference's NCCL ``self.all_gather``,
/root/reference/cache.py:25-41), and process 0 writes ONE complete cache.
Like the reference, distributed caching requires ARB off (the per-rank batch
shapes must line up; reference cache.py:70-76 declares the same limitation).

``--aug-group-size N`` stores N augmented latent variants per image;
training samples one uniformly (reference cache.py:59-62 <->
datasets.py:85-87). Same declared limitations: with ARB enabled the epoch
order is data-dependent, so augment+ARB caching is rejected.
"""

from __future__ import annotations

import itertools
import json
import logging
from pathlib import Path
from typing import IO, Optional

import click
import numpy as np

from ..conf import Config, load_with_defaults
from ..data.pipeline import DataPipeline, get_dataset, get_sampler
from ..utils.state import save_state_dict

logger = logging.getLogger("cache")


class _PaddedSampler:
    """Pads a sampler's index stream to `total` entries by repeating its last
    index, so every dataset entry lands in a full batch (duplicates overwrite
    the same cache keys at assembly). The reference's DataLoader pads the same
    way via torch DistributedSampler; without this, up to world*batch-1 tail
    images would silently never enter the cache."""

    def __init__(self, sampler, total: int):
        self.sampler = sampler
        self.total = total

    def __iter__(self):
        last = None
        n = 0
        for idx in self.sampler:
            last = idx
            n += 1
            yield idx
        for _ in range(self.total - n):
            yield last

    def __len__(self) -> int:
        return self.total


def build_local_shard(config: Config, models, tokenizer, *,
                      no_conds: bool, aug_group_size: int, batch_size: int,
                      world_size: int, global_rank: int) -> dict:
    """Encode this process's dataset shard.

    Returns {'ids': (N,) int64, 'latents': (G, N, h, w, c) f32,
    'conds': (N, L, D) f32 or None}. Every rank is padded up to the SAME
    full-batch count (repeating its last entry), so multi-host all-gathers
    line up and no tail entry is ever dropped.
    """
    import jax
    import jax.numpy as jnp

    from ..models.clip import clip_text_apply
    from ..models.vae import encoder_apply, sample_latents

    dataset = get_dataset(config, use_cache=False)
    sampler = get_sampler(dataset, config, world_size, global_rank)
    if len(dataset) == 0:
        raise ValueError("Dataset is empty; nothing to cache")

    # Common across-rank batch count covering the largest shard: computable
    # on every rank without communication (ConstantSizeSampler gives rank r
    # ceil((N-r)/world) entries, max = ceil(N/world)).
    max_shard = -(-len(dataset) // world_size)
    n_batches = -(-max_shard // batch_size)
    target = n_batches * batch_size
    pad = target - len(sampler)
    if pad:
        logger.info(f"Rank {global_rank}: padding shard of {len(sampler)} "
                    f"entries with {pad} repeats to fill {n_batches} batches")
    sampler = _PaddedSampler(sampler, target)
    tokenizer_3 = None
    if getattr(models, "t5", None) is not None and not no_conds:
        from ..text.tokenizer import resolve_t5_tokenizer

        tokenizer_3 = resolve_t5_tokenizer(config)
        if tokenizer_3 is None:
            raise ValueError(
                "SD3 model has a T5 tower: caching conditions needs "
                "tokenizer_3/tokenizer.json (or pass --no-conds)")
    pipeline = DataPipeline(dataset, sampler, batch_size, tokenizer,
                            num_workers=config.get("num_workers") or 4,
                            tokenizer_3=tokenizer_3)

    # Params are passed as jit ARGUMENTS, not closures: a closed-over
    # param dict is baked into the lowered module as constants, and the
    # remote-compile tunnel rejects the ~0.5 GB payload of a full CLIP
    # tower (HTTP 413; found by the SD1.5-scale workload-4 run).
    vae_params = {k: jnp.asarray(v) for k, v in models.vae.items()}
    clip_params = {k: jnp.asarray(v) for k, v in models.clip.items()}
    stop_at_layer = int(config.get("clip_stop_at_layer", 1))

    @jax.jit
    def _encode_latents(vp, images, rng):
        moments = encoder_apply(vp, images, models.vae_config)
        return sample_latents(moments, rng, models.vae_config.scaling_factor,
                              models.vae_config.shift_factor)

    def encode_latents(images, rng):
        return _encode_latents(vae_params, images, rng)

    if models.is_sd3:
        from ..models.clip import clip_text_encode_sdxl, eos_positions

        clip2_params = {k: jnp.asarray(v) for k, v in models.clip2.items()}
        t5_params = ({k: jnp.asarray(v) for k, v in models.t5.items()}
                     if models.t5 is not None else None)

        @jax.jit
        def _encode_conds(cp, cp2, t5p, input_ids, t5_ids=None):
            # SD3 conditioning, matching training/step.py's live path:
            # concat of both projected towers' penultimate states zero-padded
            # to the joint width (+ T5 seq-concat), pooled concat
            penult1, pooled1 = clip_text_encode_sdxl(cp, input_ids,
                                                     models.clip_config)
            first_eos = eos_positions(input_ids,
                                      models.clip_config.eos_token_id)
            pos = jnp.arange(input_ids.shape[1])[None, :]
            ids2 = jnp.where(pos > first_eos[:, None], 0, input_ids)
            penult2, pooled2 = clip_text_encode_sdxl(cp2, ids2,
                                                     models.clip2_config)
            emb = jnp.concatenate([penult1, penult2], axis=-1)
            joint = models.mmdit_config.joint_attention_dim
            emb = jnp.pad(emb, ((0, 0), (0, 0), (0, joint - emb.shape[-1])))
            if t5p is not None:
                from ..models.t5 import t5_encoder_apply

                t5_emb = t5_encoder_apply(t5p, t5_ids, models.t5_config)
                emb = jnp.concatenate([emb, t5_emb], axis=1)
            return emb, jnp.concatenate([pooled1, pooled2], axis=-1)

        def encode_conds(input_ids, t5_ids=None):
            return _encode_conds(clip_params, clip2_params, t5_params,
                                 input_ids, t5_ids)
    elif models.is_sdxl:
        from ..models.clip import clip_text_encode_sdxl, eos_positions

        clip2_params = {k: jnp.asarray(v) for k, v in models.clip2.items()}

        @jax.jit
        def _encode_conds(cp, cp2, input_ids):
            # dual-encoder SDXL conditioning, matching the live-encode path
            # in training/step.py: concat penultimate states + pooled
            penult1, _ = clip_text_encode_sdxl(cp, input_ids,
                                               models.clip_config)
            first_eos = eos_positions(input_ids,
                                      models.clip_config.eos_token_id)
            pos = jnp.arange(input_ids.shape[1])[None, :]
            ids2 = jnp.where(pos > first_eos[:, None], 0, input_ids)
            penult2, pooled = clip_text_encode_sdxl(cp2, ids2,
                                                    models.clip2_config)
            return jnp.concatenate([penult1, penult2], axis=-1), pooled

        def encode_conds(input_ids):
            return _encode_conds(clip_params, clip2_params, input_ids)
    else:
        @jax.jit
        def _encode_conds(cp, input_ids):
            conds = clip_text_apply(cp, input_ids,
                                    models.clip_config, stop_at_layer)
            return conds, None

        def encode_conds(input_ids):
            return _encode_conds(clip_params, input_ids)

    rng = jax.random.PRNGKey(int(config.get("seed") or 0))
    # latents are kept as per-image arrays (list of N per group), NOT one
    # concatenated block: ARB batches have per-bucket spatial shapes, and
    # the cache file schema is per-id anyway ({id}.latent.{g} with its own
    # shape). A same-shape concatenation here crashed single-process
    # ARB+cache builds (found by lab/workload4_arb.py).
    groups: list[list[np.ndarray]] = []
    ids: Optional[np.ndarray] = None
    conds: Optional[np.ndarray] = None
    pooled: Optional[np.ndarray] = None
    for group in range(aug_group_size):
        lat_images: list[np.ndarray] = []
        id_batches, cond_batches, pooled_batches = [], [], []
        for batch in itertools.islice(iter(pipeline), n_batches):
            rng, sub = jax.random.split(rng)
            lat_images.extend(
                np.asarray(encode_latents(jnp.asarray(batch["images"]), sub)))
            id_batches.append(np.asarray(batch["ids"], np.int64))
            if group == 0 and not no_conds and "input_ids" in batch:
                if models.is_sd3 and "t5_ids" in batch:
                    c, p = encode_conds(jnp.asarray(batch["input_ids"]),
                                        jnp.asarray(batch["t5_ids"]))
                else:
                    c, p = encode_conds(jnp.asarray(batch["input_ids"]))
                cond_batches.append(np.asarray(c))
                if p is not None:
                    pooled_batches.append(np.asarray(p))
        group_ids = np.concatenate(id_batches)
        if ids is None:
            ids = group_ids
        elif not np.array_equal(ids, group_ids):
            raise AssertionError("Sampler order changed between aug groups")
        groups.append(lat_images)
        if cond_batches:
            conds = np.concatenate(cond_batches)
        if pooled_batches:
            pooled = np.concatenate(pooled_batches)

    return {"ids": ids, "latents": groups, "conds": conds,
            "pooled": pooled}


def merge_shards(shard: dict, world_size: int, allgather=None) -> dict:
    """All-gather per-rank shards into the full (ids, latents, conds).

    ``allgather`` maps an array to a (world, ...)-stacked array; defaults to
    ``multihost_utils.process_allgather``. Identity for world_size == 1.
    """
    if world_size <= 1:
        return shard
    if allgather is None:
        from jax.experimental.multihost_utils import process_allgather

        allgather = process_allgather

    ids = np.asarray(allgather(shard["ids"]))              # (P, N)
    # multihost caching requires ARB off (enforced in main), so all
    # per-image latents share one shape and stack cleanly for the gather
    latents = np.asarray(allgather(
        np.stack([np.stack(g) for g in shard["latents"]])))  # (P, G, N, ...)
    out = {
        "ids": ids.reshape(-1),
        "latents": np.concatenate(
            [latents[p] for p in range(latents.shape[0])], axis=1),
        "conds": None,
    }
    if shard["conds"] is not None:
        conds = np.asarray(allgather(shard["conds"]))      # (P, N, L, D)
        out["conds"] = conds.reshape(-1, *conds.shape[2:])
    out["pooled"] = None
    if shard.get("pooled") is not None:
        pooled = np.asarray(allgather(shard["pooled"]))    # (P, N, D2)
        out["pooled"] = pooled.reshape(-1, *pooled.shape[2:])
    return out


def assemble_cache(merged: dict) -> tuple[dict, dict]:
    """(tensors, metadata) in the reference's exact file schema."""
    ids = merged["ids"]
    # list of G lists of per-image arrays (single process; ARB shapes may
    # differ per image) OR a (G, N, h, w, c) array (multihost gather path)
    latents = merged["latents"]
    conds = merged["conds"]
    aug_group_size = len(latents)

    cache: dict[str, np.ndarray] = {}
    sizes: dict[str, list] = {}
    for group in range(aug_group_size):
        for i, id_ in enumerate(ids):
            key = f"{int(id_)}.latent.{group}"
            cache[key] = np.asarray(latents[group][i])
            sizes[key] = list(cache[key].shape)
    if conds is not None:
        for i, id_ in enumerate(ids):
            cache[f"{int(id_)}.cond"] = conds[i]
    if merged.get("pooled") is not None:
        for i, id_ in enumerate(ids):
            cache[f"{int(id_)}.pooled"] = merged["pooled"][i]

    # Padding repeats ids; the per-key overwrites above already dedup the
    # tensors, and total_entries must be the UNIQUE count (it is consumed as
    # the dataset length by the cache-backed training path).
    entries = sorted({int(i) for i in ids})
    metadata = {
        "sizes": sizes,
        "entries": entries,
        "total_entries": len(entries),
        "aug_group_size": aug_group_size,
    }
    return cache, metadata


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

    from ..utils.compile_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    from ..convert.loader import load_components
    from ..text.tokenizer import resolve_tokenizer

    config = load_with_defaults(config_file)
    config["batch_size"] = batch_size

    if config.data.get("cache") is None:
        raise click.UsageError("data.cache is not set")

    arb = config.aspect_ratio_bucket.get("enabled", False)
    if config.get("augment") is None:
        if aug_group_size != 1:
            logger.warning("Augmentation not enabled; forcing aug group size 1")
            aug_group_size = 1
    elif arb:
        raise click.UsageError(
            "Caching is incompatible with ARB + augmentation together "
            "(ARB batch entry order is random)")

    world = jax.process_count()
    if world > 1 and arb:
        raise click.UsageError(
            "Distributed caching requires ARB off (per-rank batch shapes "
            "must align; the reference declares the same limitation)")

    models = load_components(config)
    tokenizer = resolve_tokenizer(config, allow_hash=no_conds)

    shard = build_local_shard(
        config, models, tokenizer, no_conds=no_conds,
        aug_group_size=aug_group_size, batch_size=batch_size,
        world_size=world, global_rank=jax.process_index())
    merged = merge_shards(shard, world)

    if jax.process_index() != 0:
        logger.info("Non-zero process: shard contributed, rank 0 writes")
        return

    cache, metadata = assemble_cache(merged)
    out = Path(config.data.cache)
    out.parent.mkdir(parents=True, exist_ok=True)
    save_state_dict(cache, out, "safetensors",
                    metadata={"json": json.dumps(metadata)})
    logger.info(f'Saved cache ({metadata["total_entries"]} entries x '
                f'{metadata["aug_group_size"]} groups) to "{out}"')


if __name__ == "__main__":
    logging.basicConfig(level="INFO")
    main()
