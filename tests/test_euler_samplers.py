"""Euler / Euler-ancestral samplers (diffusion/sampler.py).

Math checks use a monkeypatched closed-form "UNet" via the unjitted
``__wrapped__`` (the module-level jit would cache the first closure);
end-to-end checks run the real tiny model through sample_images.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import scal_sdt_tpu.diffusion.sampler as sampler_mod
from scal_sdt_tpu.diffusion.sampler import (
    SamplerSpec, ddim_timesteps, euler_sample_latents, sample_images)
from scal_sdt_tpu.diffusion.schedule import NoiseSchedule

from helpers import tiny_models


def _spec(prediction_type="epsilon"):
    m = tiny_models()
    schedule = NoiseSchedule(prediction_type=prediction_type)
    return SamplerSpec(unet_config=m.unet_config, vae_config=m.vae_config,
                       clip_config=m.clip_config, schedule=schedule,
                       dtype=jnp.float32), m


def _run_euler(spec, unet_fn, monkeypatch, ancestral=False, steps=8, batch=1):
    monkeypatch.setattr(sampler_mod, "unet_apply", unet_fn)
    cond = jnp.zeros((batch, 77, spec.unet_config.cross_attention_dim))
    return np.asarray(euler_sample_latents.__wrapped__(
        {}, cond, cond, jax.random.PRNGKey(0), spec, steps, 1.0,
        32, 32, batch, ancestral=ancestral))


def test_euler_zero_eps_is_identity(monkeypatch):
    """eps == 0 -> d == 0 -> the ODE never moves x."""
    spec, _ = _spec()
    zero_unet = lambda p, x, t, c, cfg, **kw: jnp.zeros_like(x)
    out = _run_euler(spec, zero_unet, monkeypatch)

    ts = ddim_timesteps(spec.schedule, 8)
    acp = np.asarray(spec.schedule.alphas_cumprod)
    sig_max = np.sqrt((1 - acp[ts[0]]) / acp[ts[0]])
    rng, init_rng = jax.random.split(jax.random.PRNGKey(0))
    x0 = np.asarray(jax.random.normal(init_rng, out.shape)) * np.sqrt(sig_max ** 2 + 1)
    np.testing.assert_allclose(out, x0, rtol=1e-5)


def test_euler_constant_eps_integrates_exactly(monkeypatch):
    """eps == 1 -> d == 1 -> x_final = x_init - sigma_max exactly (Euler is
    exact for a constant derivative, independent of step count)."""
    spec, _ = _spec()
    ones_unet = lambda p, x, t, c, cfg, **kw: jnp.ones_like(x)
    out8 = _run_euler(spec, ones_unet, monkeypatch, steps=8)
    out4 = _run_euler(spec, ones_unet, monkeypatch, steps=4)

    ts = ddim_timesteps(spec.schedule, 8)
    acp = np.asarray(spec.schedule.alphas_cumprod)
    sig_max8 = np.sqrt((1 - acp[ts[0]]) / acp[ts[0]])
    rng, init_rng = jax.random.split(jax.random.PRNGKey(0))
    x0 = np.asarray(jax.random.normal(init_rng, out8.shape)) * np.sqrt(sig_max8 ** 2 + 1)
    np.testing.assert_allclose(out8, x0 - sig_max8, rtol=1e-4, atol=1e-5)
    # 4-step run starts at a different sigma_max; recompute
    ts4 = ddim_timesteps(spec.schedule, 4)
    sig_max4 = np.sqrt((1 - acp[ts4[0]]) / acp[ts4[0]])
    x04 = np.asarray(jax.random.normal(init_rng, out4.shape)) * np.sqrt(sig_max4 ** 2 + 1)
    np.testing.assert_allclose(out4, x04 - sig_max4, rtol=1e-4, atol=1e-5)


def test_euler_v_prediction_denoised_formula(monkeypatch):
    """v == 0 -> denoised = x/(sig^2+1); one analytic step checked."""
    spec, _ = _spec("v")
    zero_unet = lambda p, x, t, c, cfg, **kw: jnp.zeros_like(x)
    out = _run_euler(spec, zero_unet, monkeypatch, steps=2)
    assert np.isfinite(out).all()
    # with v=0 the trajectory contracts towards 0 (denoised is a shrink of x)
    rng, init_rng = jax.random.split(jax.random.PRNGKey(0))
    ts = ddim_timesteps(spec.schedule, 2)
    acp = np.asarray(spec.schedule.alphas_cumprod)
    sig_max = np.sqrt((1 - acp[ts[0]]) / acp[ts[0]])
    x0 = np.asarray(jax.random.normal(init_rng, out.shape)) * np.sqrt(sig_max ** 2 + 1)
    assert np.abs(out).mean() < np.abs(x0).mean()


def test_euler_ancestral_adds_noise(monkeypatch):
    spec, _ = _spec()
    zero_unet = lambda p, x, t, c, cfg, **kw: jnp.zeros_like(x)
    det = _run_euler(spec, zero_unet, monkeypatch, ancestral=False)
    anc = _run_euler(spec, zero_unet, monkeypatch, ancestral=True)
    assert np.isfinite(anc).all()
    assert np.abs(det - anc).max() > 0


def test_euler_rejects_sample_prediction(monkeypatch):
    spec, _ = _spec("sample")
    zero_unet = lambda p, x, t, c, cfg, **kw: jnp.zeros_like(x)
    with pytest.raises(ValueError, match="sample"):
        _run_euler(spec, zero_unet, monkeypatch)


def test_euler_img2img_zero_eps_keeps_noised_init(monkeypatch):
    """eps == 0 -> x never moves: final = init + sigma_start * noise,
    with sigma_start read from the strength-truncated ladder."""
    spec, _ = _spec()
    zero_unet = lambda p, x, t, c, cfg, **kw: jnp.zeros_like(x)
    monkeypatch.setattr(sampler_mod, "unet_apply", zero_unet)

    steps, t_start = 8, 5  # strength ~ 0.375
    batch = 1
    init = jnp.asarray(np.random.RandomState(3).randn(1, 16, 16,
                                                      spec.unet_config.in_channels),
                       jnp.float32)
    cond = jnp.zeros((batch, 77, spec.unet_config.cross_attention_dim))
    rng = jax.random.PRNGKey(0)
    out = np.asarray(euler_sample_latents.__wrapped__(
        {}, cond, cond, rng, spec, steps, 1.0, 32, 32, batch,
        init_latents=init, t_start_index=t_start))

    ts = ddim_timesteps(spec.schedule, steps)[t_start:]
    acp = np.asarray(spec.schedule.alphas_cumprod)
    sig_start = np.sqrt((1 - acp[ts[0]]) / acp[ts[0]])
    _, init_rng = jax.random.split(rng)
    noise = np.asarray(jax.random.normal(init_rng, out.shape))
    np.testing.assert_allclose(out, np.asarray(init) + sig_start * noise,
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("method", ["ddim", "euler"])
def test_img2img_end_to_end(method):
    """Full img2img path: init image influences the output at low strength."""
    from scal_sdt_tpu.text.tokenizer import HashTokenizer

    spec, m = _spec()
    init = np.random.RandomState(1).uniform(-1, 1, (32, 32, 3)).astype(np.float32)
    kwargs = dict(spec=spec, steps=4, cfg_scale=3.0, width=32, height=32,
                  seed=7, method=method)
    out_i2i = sample_images(m.unet, m.vae, m.clip, HashTokenizer(), ["x"], "",
                            init_image=init, strength=0.5, **kwargs)
    out_txt = sample_images(m.unet, m.vae, m.clip, HashTokenizer(), ["x"], "",
                            **kwargs)
    assert out_i2i.shape == (1, 32, 32, 3)
    assert np.any(out_i2i != out_txt)


@pytest.mark.parametrize("method", ["euler", "euler_a"])
def test_sample_images_end_to_end_methods(method):
    """Real tiny UNet through the full text->image path per method."""
    from scal_sdt_tpu.text.tokenizer import HashTokenizer

    spec, m = _spec()
    out = sample_images(m.unet, m.vae, m.clip, HashTokenizer(),
                        ["a test prompt"], "", spec, steps=3, cfg_scale=3.0,
                        width=32, height=32, seed=7, method=method)
    assert out.shape == (1, 32, 32, 3)
    assert out.dtype == np.uint8


def test_unknown_method_raises():
    from scal_sdt_tpu.text.tokenizer import HashTokenizer

    spec, m = _spec()
    with pytest.raises(ValueError, match="Unknown sampler"):
        sample_images(m.unet, m.vae, m.clip, HashTokenizer(), ["x"], "",
                      spec, steps=1, method="plms")
