"""DPM-Solver++(2M) sampler + CFG guidance rescale (diffusion/sampler.py).

The 2M coefficients are validated against an independent numpy
transcription of the k-diffusion ``sample_dpmpp_2m`` algorithm
(arXiv:2211.01095) driven by the same closed-form fake UNet.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import scal_sdt_tpu.diffusion.sampler as sampler_mod
from scal_sdt_tpu.diffusion.sampler import (
    SamplerSpec, _cfg_combine, ddim_timesteps, dpmpp_2m_sample_latents,
    sample_images)
from scal_sdt_tpu.diffusion.schedule import NoiseSchedule

from helpers import tiny_models


def _spec(prediction_type="epsilon"):
    m = tiny_models()
    schedule = NoiseSchedule(prediction_type=prediction_type)
    return SamplerSpec(unet_config=m.unet_config, vae_config=m.vae_config,
                       clip_config=m.clip_config, schedule=schedule,
                       dtype=jnp.float32), m


def _run_dpmpp(spec, unet_fn, monkeypatch, steps=8, batch=1, seed=0):
    monkeypatch.setattr(sampler_mod, "unet_apply", unet_fn)
    cond = jnp.zeros((batch, 77, spec.unet_config.cross_attention_dim))
    return np.asarray(dpmpp_2m_sample_latents.__wrapped__(
        {}, cond, cond, jax.random.PRNGKey(seed), spec, steps, 1.0,
        32, 32, batch))


def _sigmas(schedule, steps):
    ts = ddim_timesteps(schedule, steps)
    acp = np.asarray(schedule.alphas_cumprod, np.float64)
    return ts, np.sqrt((1 - acp[ts]) / acp[ts])


def _init_x(spec, steps, shape, seed=0):
    _, sig = _sigmas(spec.schedule, steps)
    _, init_rng = jax.random.split(jax.random.PRNGKey(seed))
    return np.asarray(jax.random.normal(init_rng, shape)) * np.sqrt(sig[0] ** 2 + 1)


def test_dpmpp_zero_eps_is_identity(monkeypatch):
    """eps == 0 -> denoised == x every step -> x never moves."""
    spec, _ = _spec()
    zero_unet = lambda p, x, t, c, cfg, **kw: jnp.zeros_like(x)
    out = _run_dpmpp(spec, zero_unet, monkeypatch)
    x0 = _init_x(spec, 8, out.shape)
    np.testing.assert_allclose(out, x0, rtol=1e-5)


def test_dpmpp_constant_denoised_converges_exactly(monkeypatch):
    """A model whose denoised estimate is a constant C: every exponential
    step is exact, so the final latent is C regardless of step count."""
    spec, _ = _spec()
    C = 0.37
    acp = jnp.asarray(spec.schedule.alphas_cumprod, jnp.float32)

    def unet(p, x_in, t, c, cfg, **kw):
        a = acp[t[0]]
        sig = jnp.sqrt((1.0 - a) / a)
        x = x_in * jnp.sqrt(sig ** 2 + 1.0)
        return (x - C) / sig  # eps such that x - sig*eps == C

    for steps in (3, 8):
        out = _run_dpmpp(spec, unet, monkeypatch, steps=steps)
        np.testing.assert_allclose(out, np.full_like(out, C), rtol=0, atol=1e-4)


def test_dpmpp_matches_kdiffusion_reference(monkeypatch):
    """Full trajectory vs an independent numpy transcription of
    k-diffusion sample_dpmpp_2m, fake UNet eps = 0.3*x_in + 0.1."""
    spec, _ = _spec()
    fake = lambda p, x, t, c, cfg, **kw: 0.3 * x + 0.1
    steps = 8
    out = _run_dpmpp(spec, fake, monkeypatch, steps=steps)

    ts, sig = _sigmas(spec.schedule, steps)
    sigmas = np.concatenate([sig, [0.0]])
    x = _init_x(spec, steps, out.shape).astype(np.float64)

    old_denoised = None
    for i in range(len(sigmas) - 1):
        s, s_n = sigmas[i], sigmas[i + 1]
        x_in = x / np.sqrt(s ** 2 + 1)
        eps = 0.3 * x_in + 0.1
        denoised = x - s * eps
        t, t_next = -np.log(s), -np.log(s_n) if s_n > 0 else np.inf
        h = t_next - t
        if old_denoised is None or s_n == 0:
            d = denoised
        else:
            h_last = t - (-np.log(sigmas[i - 1]))
            r = h_last / h
            d = (1 + 1 / (2 * r)) * denoised - (1 / (2 * r)) * old_denoised
        x = (s_n / s) * x - np.expm1(-h) * d
        old_denoised = denoised

    np.testing.assert_allclose(out, x, rtol=2e-5, atol=1e-6)


def test_dpmpp_v_prediction_finite(monkeypatch):
    spec, _ = _spec("v")
    zero_unet = lambda p, x, t, c, cfg, **kw: jnp.zeros_like(x)
    out = _run_dpmpp(spec, zero_unet, monkeypatch, steps=4)
    assert np.isfinite(out).all()


def test_dpmpp_rejects_sample_prediction(monkeypatch):
    spec, _ = _spec("sample")
    zero_unet = lambda p, x, t, c, cfg, **kw: jnp.zeros_like(x)
    with pytest.raises(ValueError, match="sample"):
        _run_dpmpp(spec, zero_unet, monkeypatch)


def test_cfg_combine_rescale_math():
    rng = np.random.RandomState(0)
    pred_u = jnp.asarray(rng.randn(2, 4, 4, 3), jnp.float32)
    pred_c = jnp.asarray(rng.randn(2, 4, 4, 3) * 2.0, jnp.float32)

    plain = np.asarray(_cfg_combine(pred_u, pred_c, 7.5, 0.0))
    np.testing.assert_allclose(
        plain, np.asarray(pred_u) + 7.5 * np.asarray(pred_c - pred_u), rtol=1e-6)

    full = np.asarray(_cfg_combine(pred_u, pred_c, 7.5, 1.0))
    # phi=1: per-sample std matches the conditional prediction's std
    std_c = np.asarray(pred_c).std(axis=(1, 2, 3))
    np.testing.assert_allclose(full.std(axis=(1, 2, 3)), std_c, rtol=1e-4)

    half = np.asarray(_cfg_combine(pred_u, pred_c, 7.5, 0.5))
    np.testing.assert_allclose(half, 0.5 * full + 0.5 * plain, rtol=1e-5)


@pytest.mark.parametrize("method", ["ddim", "euler", "dpmpp_2m"])
def test_guidance_rescale_changes_output(method):
    from scal_sdt_tpu.text.tokenizer import HashTokenizer

    spec, m = _spec()
    kwargs = dict(spec=spec, steps=3, cfg_scale=7.5, width=32, height=32,
                  seed=7, method=method)
    base = sample_images(m.unet, m.vae, m.clip, HashTokenizer(),
                         ["a test"], "", **kwargs)
    resc = sample_images(m.unet, m.vae, m.clip, HashTokenizer(),
                         ["a test"], "", guidance_rescale=0.7, **kwargs)
    assert base.shape == resc.shape == (1, 32, 32, 3)
    assert np.any(base != resc)


def test_dpmpp_end_to_end_and_img2img():
    from scal_sdt_tpu.text.tokenizer import HashTokenizer

    spec, m = _spec()
    out = sample_images(m.unet, m.vae, m.clip, HashTokenizer(),
                        ["a test prompt"], "", spec, steps=3, cfg_scale=3.0,
                        width=32, height=32, seed=7, method="dpmpp_2m")
    assert out.shape == (1, 32, 32, 3) and out.dtype == np.uint8

    init = np.random.RandomState(1).uniform(-1, 1, (32, 32, 3)).astype(np.float32)
    i2i = sample_images(m.unet, m.vae, m.clip, HashTokenizer(),
                        ["a test prompt"], "", spec, steps=4, cfg_scale=3.0,
                        width=32, height=32, seed=7, method="dpmpp_2m",
                        init_image=init, strength=0.5)
    assert i2i.shape == (1, 32, 32, 3)
    assert np.any(i2i != out)
