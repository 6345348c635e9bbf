"""DDPM schedule numerics vs independently-computed constants.

Reference semantics: diffusers DDIMScheduler.add_noise / get_velocity as used
in /root/reference/modules/model.py:289-316.
"""

import jax.numpy as jnp
import numpy as np

from scal_sdt_tpu.diffusion.schedule import NoiseSchedule


def test_scaled_linear_betas_endpoints():
    s = NoiseSchedule()
    betas = s.betas
    assert betas.shape == (1000,)
    np.testing.assert_allclose(betas[0], 0.00085, rtol=1e-6)
    np.testing.assert_allclose(betas[-1], 0.012, rtol=1e-6)
    # scaled_linear: sqrt(beta) is linear
    sq = np.sqrt(betas)
    diffs = np.diff(sq)
    np.testing.assert_allclose(diffs, diffs[0], rtol=1e-4)


def test_add_noise_matches_formula():
    s = NoiseSchedule()
    acp = s.alphas_cumprod
    x0 = jnp.ones((2, 4, 4, 1))
    noise = jnp.full((2, 4, 4, 1), 2.0)
    t = jnp.array([0, 999])
    out = s.add_noise(x0, noise, t)
    for b, ti in enumerate([0, 999]):
        expected = np.sqrt(acp[ti]) * 1.0 + np.sqrt(1 - acp[ti]) * 2.0
        np.testing.assert_allclose(out[b], expected, rtol=1e-5)


def test_velocity_matches_formula():
    s = NoiseSchedule(prediction_type="v")
    acp = s.alphas_cumprod
    x0 = jnp.full((1, 2, 2, 1), 3.0)
    noise = jnp.full((1, 2, 2, 1), -1.0)
    t = jnp.array([500])
    v = s.velocity(x0, noise, t)
    expected = np.sqrt(acp[500]) * -1.0 - np.sqrt(1 - acp[500]) * 3.0
    np.testing.assert_allclose(v[0], expected, rtol=1e-5)


def test_training_target_dispatch():
    x0 = jnp.zeros((1, 2, 2, 1))
    noise = jnp.ones((1, 2, 2, 1))
    t = jnp.array([10])
    assert np.allclose(NoiseSchedule(prediction_type="epsilon").training_target(x0, noise, t), noise)
    assert np.allclose(NoiseSchedule(prediction_type="sample").training_target(x0, noise, t), x0)
    v = NoiseSchedule(prediction_type="v").training_target(x0, noise, t)
    assert v.shape == x0.shape
