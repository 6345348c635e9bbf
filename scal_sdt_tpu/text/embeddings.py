"""Textual-inversion embedding consumption.

Reference: ``CustomEmbedding`` + ``init_custom_embeddings``
(``/root/reference/modules/text_encoders.py:44-123``): load ``.pt`` (or
safetensors) embedding files, register per-vector placeholder tokens, extend
the (frozen) token-embedding matrix, and regex-expand the keyword in prompts
into the placeholder-token run.

Here the embedding matrix extension is a pure param-dict transform (returns a
new ``token_embedding.weight``), and keyword expansion registers rewrites on
the tokenizer — no monkeypatching.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Sequence

import numpy as np

from ..utils.state import infer_format

TOKEN_EMBEDDING_KEY = "text_model.embeddings.token_embedding.weight"


class CustomEmbedding:
    def __init__(self, keyword: str, vectors: np.ndarray):
        assert " " not in keyword, f'Embedding "{keyword}": name cannot contain spaces'
        self.keyword = keyword
        self.vectors = np.asarray(vectors, np.float32)
        self.tokens = [f"emb-{keyword}-{i}" for i in range(len(self.vectors))]
        self.keyword_regex = re.compile(rf"(?:^|(?<=\s|,)){re.escape(keyword)}(?=,|\s|$)")
        self.keyword_replacement = " ".join(self.tokens)

    def expand_keyword(self, text: str) -> str:
        return self.keyword_regex.sub(self.keyword_replacement, text)

    @classmethod
    def load(cls, path: Path) -> "CustomEmbedding":
        path = Path(path)
        fmt = infer_format(path)
        if fmt == "pt":
            import torch

            state = torch.load(path, map_location="cpu", weights_only=False)
            embs = list(state["string_to_param"].values())
            assert len(embs) == 1, f'Embedding "{path.stem}": expected one entry, got {len(embs)}'
            vectors = embs[0].detach().float().numpy()
        elif fmt == "safetensors":
            from safetensors import safe_open

            with safe_open(str(path), framework="numpy") as f:
                keys = list(f.keys())
                # a1111 safetensors embeddings store a single tensor
                vectors = f.get_tensor(keys[0])
        else:
            raise ValueError(f"Unsupported embedding file: {path}")
        return cls(path.stem, np.atleast_2d(vectors))


def load_embeddings_dir(path) -> list[CustomEmbedding]:
    embs = []
    for p in sorted(Path(path).iterdir()):
        if infer_format(p) is not None:
            embs.append(CustomEmbedding.load(p))
    return embs


def install_custom_embeddings(clip_params: dict, tokenizer,
                              embeddings: Sequence[CustomEmbedding]) -> dict:
    """Register placeholder tokens + prompt rewrites on the tokenizer and
    return params with the extended (frozen) embedding matrix."""
    if not embeddings:
        return clip_params
    tokens = [t for e in embeddings for t in e.tokens]
    n_added = tokenizer.add_tokens(tokens)
    assert n_added == len(tokens), f"Added {n_added} tokens, expected {len(tokens)}"
    for e in embeddings:
        tokenizer.add_expansion(e.keyword_regex, e.keyword_replacement)

    table = np.asarray(clip_params[TOKEN_EMBEDDING_KEY])
    extra = np.concatenate([e.vectors for e in embeddings], axis=0).astype(table.dtype)
    assert extra.shape[1] == table.shape[1], \
        f"Embedding dim {extra.shape[1]} != model dim {table.shape[1]}"
    out = dict(clip_params)
    out[TOKEN_EMBEDDING_KEY] = np.concatenate([table, extra], axis=0)
    return out
