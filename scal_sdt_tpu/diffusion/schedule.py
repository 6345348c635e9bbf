"""DDPM noise schedule: q-sample, velocity target, and DDIM stepping constants.

TPU-native replacement for the diffusers DDIMScheduler the reference trains
with (``/root/reference/modules/model.py:289-316``): ``add_noise`` is the
forward diffusion q-sample, ``velocity`` is the v-prediction target. All
constants are precomputed host-side once and closed over by the jitted step,
so inside XLA the schedule is a pair of static gather tables.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class NoiseSchedule:
    """Continuous-constant view of a DDPM beta schedule.

    Defaults are Stable Diffusion v1's scaled-linear schedule
    (beta in [0.00085, 0.012] over 1000 steps).
    """

    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    prediction_type: str = "epsilon"  # 'epsilon' | 'sample' | 'v'
    # DDIM sampling semantics (diffusers SD1 scheduler config)
    steps_offset: int = 1
    clip_sample: bool = False
    set_alpha_to_one: bool = False
    # diffusers timestep_spacing: 'leading' (SD default) or 'trailing'
    # (recommended with zero-terminal-SNR models, arXiv:2305.08891 §3.2 —
    # sampling then actually starts from the pure-noise timestep T-1)
    timestep_spacing: str = "leading"
    # Zero-terminal-SNR beta rescale (arXiv:2305.08891; diffusers
    # rescale_betas_zero_snr): forces alphas_cumprod[T-1] -> 0 so the last
    # train timestep is pure noise. Requires v-prediction (epsilon is
    # undefined at SNR 0).
    rescale_zero_terminal_snr: bool = False

    def __post_init__(self):
        # normalize the diffusers alias so every consumer compares against
        # the canonical names ('epsilon' | 'v' | 'sample')
        if self.prediction_type == "v_prediction":
            object.__setattr__(self, "prediction_type", "v")
        if self.rescale_zero_terminal_snr and self.prediction_type == "epsilon":
            raise ValueError(
                "rescale_zero_terminal_snr requires v (or sample) prediction: "
                "at terminal SNR 0 the epsilon target carries no signal "
                "(arXiv:2305.08891 §4)")

    @property
    def betas(self) -> np.ndarray:
        n = self.num_train_timesteps
        if self.beta_schedule == "scaled_linear":
            return np.linspace(self.beta_start ** 0.5, self.beta_end ** 0.5, n, dtype=np.float64) ** 2
        if self.beta_schedule == "linear":
            return np.linspace(self.beta_start, self.beta_end, n, dtype=np.float64)
        raise ValueError(self.beta_schedule)

    @property
    def alphas_cumprod(self) -> np.ndarray:
        acp = np.cumprod(1.0 - self.betas)
        if self.rescale_zero_terminal_snr:
            # shift-and-scale sqrt(abar) so the terminal value is exactly 0
            # while the first keeps its original value (paper Alg. 1)
            s = np.sqrt(acp)
            s = (s - s[-1]) * (s[0] / (s[0] - s[-1]))
            acp = np.square(s)
        return acp.astype(np.float32)

    # -- arrays used inside jit ------------------------------------------------

    def sqrt_alphas_cumprod(self) -> jnp.ndarray:
        return jnp.asarray(np.sqrt(self.alphas_cumprod))

    def sqrt_one_minus_alphas_cumprod(self) -> jnp.ndarray:
        return jnp.asarray(np.sqrt(1.0 - self.alphas_cumprod))

    def _gather(self, table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
        v = table[t]
        return v.reshape(v.shape + (1,) * (ndim - v.ndim))

    def sample_timesteps(self, rng, bsz: int) -> jnp.ndarray:
        """Uniform integer draw over [0, N) — the reference's
        torch.randint (modules/model.py:299). The flow schedule
        (diffusion/flow.py) overrides this with the logit-normal density."""
        import jax.random

        return jax.random.randint(rng, (bsz,), 0, self.num_train_timesteps)

    def add_noise(self, x0: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        """q(x_t | x_0): sqrt(acp_t) * x0 + sqrt(1 - acp_t) * noise."""
        sa = self._gather(self.sqrt_alphas_cumprod().astype(x0.dtype), t, x0.ndim)
        sb = self._gather(self.sqrt_one_minus_alphas_cumprod().astype(x0.dtype), t, x0.ndim)
        return sa * x0 + sb * noise

    def velocity(self, x0: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        """v-prediction target: sqrt(acp_t) * eps - sqrt(1 - acp_t) * x0."""
        sa = self._gather(self.sqrt_alphas_cumprod().astype(x0.dtype), t, x0.ndim)
        sb = self._gather(self.sqrt_one_minus_alphas_cumprod().astype(x0.dtype), t, x0.ndim)
        return sa * noise - sb * x0

    def training_target(self, x0: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        if self.prediction_type == "epsilon":
            return noise
        if self.prediction_type == "sample":
            return x0
        if self.prediction_type in ("v", "v_prediction"):
            return self.velocity(x0, noise, t)
        raise ValueError(f"Unknown prediction type {self.prediction_type}")

    def snr(self, t: jnp.ndarray) -> jnp.ndarray:
        """Signal-to-noise ratio acp_t / (1 - acp_t) per timestep."""
        acp = jnp.asarray(self.alphas_cumprod)[t]
        return acp / (1.0 - acp)

    def min_snr_weight(self, t: jnp.ndarray, gamma: float) -> jnp.ndarray:
        """Per-sample Min-SNR-gamma loss weight (arXiv:2303.09556).

        epsilon: min(SNR, gamma) / SNR; v-prediction: min(SNR, gamma) /
        (SNR + 1) (the velocity target already carries an SNR+1 factor);
        sample: min(SNR, gamma) (weighting in x0 space).
        """
        snr = self.snr(t)
        clipped = jnp.minimum(snr, gamma)
        if self.prediction_type == "epsilon":
            return clipped / snr
        if self.prediction_type in ("v", "v_prediction"):
            return clipped / (snr + 1.0)
        return clipped  # sample

    @classmethod
    def from_ldm_config(cls, ldm_config, **overrides) -> "NoiseSchedule":
        params = ldm_config.model.params
        return cls(
            num_train_timesteps=int(params.get("timesteps", 1000)),
            beta_start=float(params.get("linear_start", 0.00085)),
            beta_end=float(params.get("linear_end", 0.012)),
            **overrides,
        )

    @classmethod
    def from_diffusers_scheduler_config(cls, config: dict) -> "NoiseSchedule":
        return cls(
            num_train_timesteps=int(config.get("num_train_timesteps", 1000)),
            beta_start=float(config.get("beta_start", 0.00085)),
            beta_end=float(config.get("beta_end", 0.012)),
            beta_schedule=config.get("beta_schedule", "scaled_linear"),
            prediction_type=config.get("prediction_type", "epsilon"),
            steps_offset=int(config.get("steps_offset", 1)),
            clip_sample=bool(config.get("clip_sample", False)),
            set_alpha_to_one=bool(config.get("set_alpha_to_one", False)),
            rescale_zero_terminal_snr=bool(
                config.get("rescale_betas_zero_snr", False)),
            timestep_spacing=config.get("timestep_spacing", "leading"),
        )


VAE_SCALE_FACTOR = 0.18215
