"""Textual-inversion TRAINING (beyond reference parity).

The reference only *consumes* pre-trained embeddings
(``/root/reference/modules/text_encoders.py:44-123``); training them needs a
separate tool in its ecosystem. Here TI training is first-class: trained
placeholder vectors live in a dedicated trainable leaf
(``...token_embedding.trained_extra``) appended below the frozen token table
inside ``clip_text_apply`` — gradients flow ONLY into the new vectors, the
base table stays frozen structurally (it lives in the frozen branch), and
the tiny leaf rides the normal checkpoint/resume/packing machinery.

Config::

    custom_embeddings:
      train:
        enabled: true
        lr: 5.0e-3                    # own optimizer group
        tokens:
          - keyword: my-cat           # appears in captions
            vectors_per_token: 4
            init: cat                 # seed from this word's embedding(s)

Export with ``ckpt_tool embedding RUN.safetensors OUT_DIR`` — one
a1111-layout safetensors per keyword, loadable by this framework's own
``custom_embeddings.path`` consumption and by WebUI.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Optional, Sequence

import numpy as np

from .embeddings import TOKEN_EMBEDDING_KEY, CustomEmbedding

logger = logging.getLogger("ti")

TRAINED_EXTRA_KEY = "text_model.embeddings.token_embedding.trained_extra"


@dataclasses.dataclass(frozen=True)
class TITokenSpec:
    keyword: str
    vectors_per_token: int = 1
    init: Optional[str] = None  # word to seed from; None -> small random


def parse_ti_specs(train_config) -> list[TITokenSpec]:
    specs = []
    for entry in train_config.get("tokens") or []:
        specs.append(TITokenSpec(
            keyword=str(entry["keyword"]),
            vectors_per_token=int(entry.get("vectors_per_token", 1)),
            init=entry.get("init"),
        ))
    if not specs:
        raise ValueError("custom_embeddings.train.enabled with no tokens")
    return specs


def _init_vectors(spec: TITokenSpec, table: np.ndarray, tokenizer,
                  rng: np.random.RandomState) -> np.ndarray:
    d = table.shape[1]
    if spec.init:
        ids = np.asarray(tokenizer([spec.init]))[0]
        # CLIP layout: [bos, content..., eos, eos...] — the pad value is the
        # trailing id; strip bos and everything equal to the pad/eos run
        pad = ids[-1]
        content = [int(i) for i in ids[1:] if i != pad]
        if content:
            seed = np.asarray(table)[content].mean(axis=0)
            return np.tile(seed, (spec.vectors_per_token, 1)).astype(np.float32)
        logger.warning(f'TI "{spec.keyword}": init word {spec.init!r} '
                       f"tokenized to nothing; falling back to random init")
    return (rng.randn(spec.vectors_per_token, d) * 0.01).astype(np.float32)


def setup_ti_training(clip_params: dict, tokenizer,
                      specs: Sequence[TITokenSpec],
                      seed: int = 0) -> tuple[dict, list[dict]]:
    """Register placeholder tokens + prompt expansions, return params with
    the ``trained_extra`` leaf and the export metadata
    ``[{keyword, n_vectors}, ...]`` (row ranges follow list order)."""
    rng = np.random.RandomState(seed)
    table = np.asarray(clip_params[TOKEN_EMBEDDING_KEY])

    blocks, meta = [], []
    for spec in specs:
        emb = CustomEmbedding(spec.keyword,
                              np.zeros((spec.vectors_per_token, table.shape[1]),
                                       np.float32))
        n_added = tokenizer.add_tokens(emb.tokens)
        assert n_added == len(emb.tokens), \
            f'TI "{spec.keyword}": token collision ({n_added}/{len(emb.tokens)} added)'
        tokenizer.add_expansion(emb.keyword_regex, emb.keyword_replacement)
        blocks.append(_init_vectors(spec, table, tokenizer, rng))
        meta.append({"keyword": spec.keyword, "n_vectors": spec.vectors_per_token})
        logger.info(f'TI training "{spec.keyword}": {spec.vectors_per_token} '
                    f"vector(s), init={spec.init or 'random'}")

    out = dict(clip_params)
    out[TRAINED_EXTRA_KEY] = np.concatenate(blocks, axis=0)
    return out, meta


def register_ti_tokens_for_inference(tokenizer, ti_meta: Sequence[dict]) -> None:
    """Re-register placeholder tokens/expansions from checkpoint metadata so
    prompts with trained keywords resolve at inference (sample.py --ckpt)."""
    for entry in ti_meta:
        emb = CustomEmbedding(entry["keyword"],
                              np.zeros((int(entry["n_vectors"]), 1), np.float32))
        tokenizer.add_tokens(emb.tokens)
        tokenizer.add_expansion(emb.keyword_regex, emb.keyword_replacement)


def export_embeddings(extra: np.ndarray, ti_meta: Sequence[dict],
                      out_dir) -> list:
    """Slice the trained_extra rows per keyword into a1111-layout
    safetensors files (single ``emb_params`` tensor)."""
    from pathlib import Path

    from ..utils.state import save_state_dict

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    written, off = [], 0
    for entry in ti_meta:
        n = int(entry["n_vectors"])
        path = out_dir / f"{entry['keyword']}.safetensors"
        save_state_dict({"emb_params": np.asarray(extra[off:off + n])}, path)
        written.append(path)
        off += n
    if off != len(extra):
        raise ValueError(f"ti_tokens metadata covers {off} rows, "
                         f"checkpoint has {len(extra)}")
    return written
