"""DDIM sampler semantics + textual-inversion embedding consumption."""

import numpy as np
import jax
import jax.numpy as jnp

from scal_sdt_tpu.diffusion.sampler import SamplerSpec, ddim_timesteps, sample_images
from scal_sdt_tpu.diffusion.schedule import NoiseSchedule
from scal_sdt_tpu.text.embeddings import (
    TOKEN_EMBEDDING_KEY,
    CustomEmbedding,
    install_custom_embeddings,
)
from scal_sdt_tpu.text.tokenizer import HashTokenizer

from helpers import tiny_models


def test_ddim_timestep_spacing():
    s = NoiseSchedule()  # steps_offset=1
    ts = ddim_timesteps(s, 20)
    assert len(ts) == 20
    assert ts[0] == 951 and ts[-1] == 1  # leading spacing + offset
    assert all(np.diff(ts) == -50)


def test_sample_images_end_to_end_tiny():
    models = tiny_models()
    spec = SamplerSpec(
        unet_config=models.unet_config, vae_config=models.vae_config,
        clip_config=models.clip_config, schedule=models.schedule,
        dtype=jnp.float32,
    )
    tok = HashTokenizer()
    out = sample_images(models.unet, models.vae, models.clip, tok,
                        prompts=["a thing", "another"], negative_prompt="bad",
                        spec=spec, steps=4, cfg_scale=3.0, width=32, height=32,
                        seed=7)
    # tiny VAE upsamples latents x2 (not x8): output is (h/8)*2
    # tiny VAE has 2 levels -> spatial factor 2: 32px request = 32px out
    assert out.shape == (2, 32, 32, 3)
    assert out.dtype == np.uint8


def test_custom_embedding_expansion_and_table_extension():
    models = tiny_models()
    tok = HashTokenizer()
    vectors = np.random.RandomState(0).randn(3, 32).astype(np.float32)
    emb = CustomEmbedding("mychar", vectors)
    assert emb.tokens == ["emb-mychar-0", "emb-mychar-1", "emb-mychar-2"]
    assert emb.expand_keyword("a photo of mychar, smiling") == \
        "a photo of emb-mychar-0 emb-mychar-1 emb-mychar-2, smiling"
    # no substring false-positives
    assert emb.expand_keyword("mycharm is great") == "mycharm is great"

    old_vocab = models.clip[TOKEN_EMBEDDING_KEY].shape[0]
    new_params = install_custom_embeddings(dict(models.clip), tok, [emb])
    table = new_params[TOKEN_EMBEDDING_KEY]
    assert table.shape[0] == old_vocab + 3
    np.testing.assert_allclose(table[-3:], vectors, rtol=1e-6)

    # tokenizer now expands the keyword and maps placeholder tokens to the
    # appended rows
    ids = tok(["mychar portrait"])
    assert ids[0, 1] == old_vocab      # emb-mychar-0
    assert ids[0, 2] == old_vocab + 1
    assert ids[0, 3] == old_vocab + 2


def test_custom_embedding_load_pt(tmp_path):
    import torch

    vec = torch.randn(2, 32)
    torch.save({"string_to_param": {"*": vec}}, tmp_path / "mytoken.pt")
    emb = CustomEmbedding.load(tmp_path / "mytoken.pt")
    assert emb.keyword == "mytoken"
    assert emb.vectors.shape == (2, 32)
    np.testing.assert_allclose(emb.vectors, vec.numpy(), rtol=1e-6)
