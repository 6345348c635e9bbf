"""Our CLIP-BPE tokenizer vs transformers.CLIPTokenizer on the same vocab.

The reference depends on transformers for tokenization
(/root/reference/modules/text_encoders.py:34-41); we own a CLIP-BPE
implementation (text/bpe.py) and hold it to byte-identical ids against
transformers over a synthetic vocab/merges built from the real byte-unicode
table. (No real CLIP vocab ships in this offline image; the algorithm — word
split regex, byte remapping, ranked merging, </w> markers, truncation and
EOS padding — is vocab-independent.)
"""

import json
import re

import numpy as np
import pytest

from scal_sdt_tpu.text.bpe import CLIPBPETokenizer, bytes_to_unicode
from scal_sdt_tpu.text.tokenizer import CLIPTokenizerWrapper


MERGES = [
    ("t", "h"), ("th", "e</w>"), ("a", "n"), ("an", "d</w>"), ("i", "n"),
    ("h", "e</w>"), ("o", "f</w>"), ("in", "g</w>"), ("e", "r</w>"),
    ("o", "n"), ("a", "t"), ("e", "n"), ("o", "r"), ("t", "o</w>"),
    ("i", "s</w>"), ("c", "at</w>"), ("d", "o"), ("do", "g</w>"),
    ("p", "h"), ("ph", "o"), ("pho", "t"), ("phot", "o</w>"),
    ("1", "9"), ("'", "s</w>"),
]


@pytest.fixture(scope="module")
def vocab_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("clip_vocab")
    symbols = list(bytes_to_unicode().values())
    vocab = {}
    for s in symbols:
        vocab[s] = len(vocab)
    for s in symbols:
        vocab[s + "</w>"] = len(vocab)
    for a, b in MERGES:
        vocab[a + b] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    (d / "vocab.json").write_text(json.dumps(vocab), encoding="utf-8")
    (d / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in MERGES),
        encoding="utf-8")
    return d


@pytest.fixture(scope="module")
def both(vocab_dir):
    ours = CLIPBPETokenizer.from_dir(vocab_dir)
    theirs = CLIPTokenizerWrapper.from_path(vocab_dir)
    return ours, theirs


PROMPTS = [
    "a photo of the cat",
    "A PHOTO OF THE DOG, masterpiece, best quality",
    "the dog's toy and the cat's 1999 adventure",
    "  weird   spacing\tand\nnewlines  ",
    "punctuation!?: (parens) [brackets] <angle>, semi;colons",
    "numbers 12345 and the word thing",
    "",
    "café au lait",
    "a-hyphenated-word and under_score",
]


def test_ids_match_transformers(both):
    ours, theirs = both
    np.testing.assert_array_equal(ours(PROMPTS), theirs(PROMPTS))


def test_truncation_matches(both):
    ours, theirs = both
    long_prompt = " ".join(["the cat and the dog"] * 40)
    np.testing.assert_array_equal(ours([long_prompt]), theirs([long_prompt]))
    assert ours([long_prompt]).shape == (1, 77)


def test_bos_eos_and_eos_padding(both):
    ours, _ = both
    row = ours(["the cat"])[0]
    assert row[0] == ours.bos_id
    assert row[-1] == ours.eos_id
    content = [i for i in row[1:] if i != ours.eos_id]
    assert len(content) >= 2  # 'the' + 'cat' merged tokens


def test_added_tokens_and_expansion_match(both):
    ours, theirs = both
    tokens = ["emb-sks-0", "emb-sks-1"]
    assert ours.add_tokens(tokens) == 2
    theirs.add_tokens(tokens)
    pat = re.compile(r"(?:^|(?<=\s|,))sks(?=,|\s|$)")
    ours.add_expansion(pat, "emb-sks-0 emb-sks-1")
    theirs.add_expansion(pat, "emb-sks-0 emb-sks-1")
    prompts = ["a photo of sks cat", "sks", "the sks, and the cat"]
    np.testing.assert_array_equal(ours(prompts), theirs(prompts))
    # added ids sit past the vocab, same numbering as transformers
    assert ours.vocab_size == theirs.vocab_size


def test_hash_fallback_requires_opt_in(tmp_path):
    from scal_sdt_tpu.conf import Config, default, merge
    from scal_sdt_tpu.text.tokenizer import HashTokenizer, resolve_tokenizer

    cfg = merge(default(), Config({"model": None}))
    with pytest.raises(RuntimeError, match="tokenizer"):
        resolve_tokenizer(cfg)
    assert isinstance(resolve_tokenizer(cfg, allow_hash=True), HashTokenizer)
    cfg2 = merge(default(), Config({"model": None, "tokenizer": "hash"}))
    assert isinstance(resolve_tokenizer(cfg2), HashTokenizer)


def test_native_bpe_is_the_default_resolution(vocab_dir):
    from scal_sdt_tpu.conf import Config, default, merge
    from scal_sdt_tpu.text.tokenizer import resolve_tokenizer

    cfg = merge(default(), Config({"model": None, "tokenizer": str(vocab_dir)}))
    tok = resolve_tokenizer(cfg)
    assert isinstance(tok, CLIPBPETokenizer)
    cfg_tf = merge(default(), Config({"model": None, "tokenizer": str(vocab_dir),
                                      "tokenizer_backend": "transformers"}))
    assert isinstance(resolve_tokenizer(cfg_tf), CLIPTokenizerWrapper)
