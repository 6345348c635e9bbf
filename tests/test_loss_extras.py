"""Min-SNR loss weighting + noise offset (training/step.py `loss:` config).

Beyond reference parity — the reference trains plain MSE only.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scal_sdt_tpu.conf import Config, default, merge
from scal_sdt_tpu.diffusion.schedule import NoiseSchedule
from scal_sdt_tpu.models.clip import CLIPTextConfig
from scal_sdt_tpu.models.vae import VAEConfig
from scal_sdt_tpu.training.step import StepSpec, compute_loss

from helpers import tiny_models


def test_min_snr_weight_formulas():
    t = jnp.asarray([0, 100, 500, 999])
    for pred, expect in (
        ("epsilon", lambda snr, g: np.minimum(snr, g) / snr),
        ("v", lambda snr, g: np.minimum(snr, g) / (snr + 1.0)),
        ("sample", lambda snr, g: np.minimum(snr, g)),
    ):
        s = NoiseSchedule(prediction_type=pred)
        acp = np.asarray(s.alphas_cumprod)[np.asarray(t)]
        snr = acp / (1 - acp)
        np.testing.assert_allclose(np.asarray(s.min_snr_weight(t, 5.0)),
                                   expect(snr, 5.0), rtol=1e-5)


def _spec(models, **loss):
    cfg = merge(default(), Config({"loss": loss,
                                   "trainer": {"precision": 32}}))
    return StepSpec.from_config(cfg, models.unet_config, models.clip_config,
                                models.vae_config, train_text_encoder=False)


def _loss(spec, models, seed=0):
    from scal_sdt_tpu.training.step import UNET_PREFIX

    trainable = {f"{UNET_PREFIX}.{k}": jnp.asarray(v, jnp.float32)
                 for k, v in models.unet.items()}
    rng = np.random.RandomState(3)
    batch = {
        "latents": jnp.asarray(rng.randn(2, 8, 8, models.unet_config.in_channels),
                               jnp.float32),
        "conds": jnp.asarray(rng.randn(2, 77, models.unet_config.cross_attention_dim),
                             jnp.float32),
    }
    loss, _ = compute_loss(trainable, {}, batch, jax.random.PRNGKey(seed), spec)
    return float(loss)


def test_min_snr_changes_loss():
    models = tiny_models()
    base = _loss(_spec(models), models)
    weighted = _loss(_spec(models, min_snr_gamma=5.0), models)
    assert np.isfinite(base) and np.isfinite(weighted)
    assert weighted != base
    # min-SNR weights are <= 1 for epsilon prediction -> loss can only drop
    assert weighted < base


def test_noise_offset_changes_loss():
    models = tiny_models()
    base = _loss(_spec(models), models)
    offset = _loss(_spec(models, noise_offset=0.5), models)
    assert np.isfinite(offset)
    assert offset != base


def test_loss_extras_default_off():
    models = tiny_models()
    spec = _spec(models)
    assert spec.min_snr_gamma is None
    assert spec.noise_offset == 0.0
