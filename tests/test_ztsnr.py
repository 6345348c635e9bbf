"""Zero-terminal-SNR beta rescale (arXiv:2305.08891) + schedule overrides."""

import numpy as np
import pytest

from scal_sdt_tpu.diffusion.schedule import NoiseSchedule

from helpers import tiny_models, write_diffusers_dir


def test_ztsnr_rescale_terminal_and_first_values():
    base = NoiseSchedule(prediction_type="v")
    z = NoiseSchedule(prediction_type="v", rescale_zero_terminal_snr=True)
    acp_b, acp_z = base.alphas_cumprod, z.alphas_cumprod
    assert acp_z[-1] == 0.0            # terminal SNR exactly 0
    np.testing.assert_allclose(acp_z[0], acp_b[0], rtol=1e-6)  # first kept
    assert np.all(np.diff(acp_z) < 0)  # still monotonically decreasing
    # SNR at terminal is 0 -> v-prediction min-SNR weight stays finite
    w = np.asarray(z.min_snr_weight(np.asarray([z.num_train_timesteps - 1]), 5.0))
    assert np.isfinite(w).all() and w[0] == 0.0


def test_ztsnr_requires_v_prediction():
    with pytest.raises(ValueError, match="v"):
        NoiseSchedule(prediction_type="epsilon", rescale_zero_terminal_snr=True)


def test_schedule_config_overrides_through_loader(tmp_path):
    from scal_sdt_tpu.conf import Config, default, merge
    from scal_sdt_tpu.convert.loader import load_components

    models = tiny_models()
    model_dir = write_diffusers_dir(models, tmp_path / "tiny-sd")
    cfg = merge(default(), Config({
        "model": str(model_dir),
        "schedule": {"prediction_type": "v",
                     "rescale_zero_terminal_snr": True},
    }))
    loaded = load_components(cfg)
    assert loaded.schedule.prediction_type == "v"
    assert loaded.schedule.rescale_zero_terminal_snr
    assert loaded.schedule.alphas_cumprod[-1] == 0.0


def test_diffusers_scheduler_key_respected(tmp_path):
    from scal_sdt_tpu.convert.loader import load_components
    from scal_sdt_tpu.conf import Config, default, merge

    models = tiny_models()
    model_dir = write_diffusers_dir(
        models, tmp_path / "tiny-sd",
        scheduler_overrides={"prediction_type": "v_prediction",
                             "rescale_betas_zero_snr": True})
    cfg = merge(default(), Config({"model": str(model_dir)}))
    loaded = load_components(cfg)
    assert loaded.schedule.rescale_zero_terminal_snr


def test_trailing_timestep_spacing():
    """diffusers 'trailing' semantics: starts exactly at T-1 (pure noise for
    ZTSNR models), descending, ends near 0."""
    from scal_sdt_tpu.diffusion.sampler import ddim_timesteps

    s = NoiseSchedule(prediction_type="v", timestep_spacing="trailing")
    ts = ddim_timesteps(s, 4)
    np.testing.assert_array_equal(ts, [999, 749, 499, 249])
    ts10 = ddim_timesteps(s, 10)
    assert ts10[0] == 999 and ts10[-1] == 99 and np.all(np.diff(ts10) < 0)
    # leading unchanged
    lead = ddim_timesteps(NoiseSchedule(), 4)
    np.testing.assert_array_equal(lead, [751, 501, 251, 1])


def test_ztsnr_trailing_sampling_all_methods_finite():
    """ZTSNR v-prediction + trailing spacing samples finitely through DDIM
    (terminal abar=0 handled exactly by the v parameterization) and the
    sigma-space samplers (2^-24 clamp, diffusers Euler ZTSNR parity)."""
    import jax.numpy as jnp

    from scal_sdt_tpu.diffusion.sampler import SamplerSpec, sample_images
    from scal_sdt_tpu.text.tokenizer import HashTokenizer
    from helpers import tiny_models

    m = tiny_models()
    schedule = NoiseSchedule(prediction_type="v",
                             rescale_zero_terminal_snr=True,
                             timestep_spacing="trailing")
    spec = SamplerSpec(unet_config=m.unet_config, vae_config=m.vae_config,
                       clip_config=m.clip_config, schedule=schedule,
                       dtype=jnp.float32)
    for method in ("ddim", "euler", "dpmpp_2m"):
        out = sample_images(m.unet, m.vae, m.clip, HashTokenizer(),
                            ["a test"], "", spec, steps=4, cfg_scale=5.0,
                            width=32, height=32, seed=1, method=method,
                            guidance_rescale=0.7)
        assert out.shape == (1, 32, 32, 3), method
        assert np.isfinite(out.astype(np.float64)).all(), method
