"""Rectified-flow (flow-matching) schedule for the SD3 model family.

TPU-native equivalent of diffusers' FlowMatchEulerDiscreteScheduler plus the
SD3 training-time timestep density (arXiv:2403.03206 §3.1): the forward
process is the straight interpolation x_t = (1 - sigma) x0 + sigma eps, the
training target is the constant velocity eps - x0, sigmas carry the
resolution shift sigma = shift*u / (1 + (shift-1) u), and training timesteps
are drawn logit-normally (u = sigmoid(N(mean, std))).

Duck-compatible with :class:`..diffusion.schedule.NoiseSchedule` where the
training step touches it (``sample_timesteps`` / ``add_noise`` /
``training_target`` / ``num_train_timesteps`` / ``prediction_type``) — the
step code never branches on the schedule class. Beyond the torch reference's
scope entirely (it trains DDPM epsilon/sample/v only,
``/root/reference/modules/model.py:306-314``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class FlowSchedule:
    num_train_timesteps: int = 1000
    # resolution shift (3.0 = SD3-Medium / SD3.5 default)
    shift: float = 3.0
    # logit-normal training density (paper's lognorm(0.00, 1.00))
    logit_mean: float = 0.0
    logit_std: float = 1.0
    prediction_type: str = "flow"

    def shifted_sigma(self, u: jnp.ndarray) -> jnp.ndarray:
        """u in [0, 1] -> shifted sigma in [0, 1]."""
        return self.shift * u / (1.0 + (self.shift - 1.0) * u)

    def sigma_of_t(self, t: jnp.ndarray) -> jnp.ndarray:
        """Model-facing timestep (sigma * N, float) -> sigma."""
        return t.astype(jnp.float32) / self.num_train_timesteps

    def sample_timesteps(self, rng: jax.Array, bsz: int) -> jnp.ndarray:
        """Logit-normal draw; returns FLOAT model timesteps sigma * N."""
        z = jax.random.normal(rng, (bsz,), jnp.float32)
        u = jax.nn.sigmoid(self.logit_mean + self.logit_std * z)
        return self.shifted_sigma(u) * self.num_train_timesteps

    def add_noise(self, x0: jnp.ndarray, noise: jnp.ndarray,
                  t: jnp.ndarray) -> jnp.ndarray:
        sigma = self.sigma_of_t(t).astype(x0.dtype)
        sigma = sigma.reshape(sigma.shape + (1,) * (x0.ndim - 1))
        return (1.0 - sigma) * x0 + sigma * noise

    def training_target(self, x0: jnp.ndarray, noise: jnp.ndarray,
                        t: jnp.ndarray) -> jnp.ndarray:
        # d x_t / d sigma — constant along the straight path
        return noise - x0

    def sampling_sigmas(self, num_steps: int) -> jnp.ndarray:
        """Inference sigma ladder, high -> low, with the terminal 0 appended
        (diffusers FlowMatchEulerDiscreteScheduler.set_timesteps)."""
        u = jnp.linspace(1.0, 1.0 / self.num_train_timesteps, num_steps)
        return jnp.concatenate([self.shifted_sigma(u), jnp.zeros((1,))])

    def min_snr_weight(self, t: jnp.ndarray, gamma: float) -> jnp.ndarray:
        raise NotImplementedError(
            "min_snr_gamma is a DDPM weighting; the flow schedule's "
            "logit-normal timestep density is the SD3 equivalent (remove "
            "loss.min_snr_gamma from the config)")

    @classmethod
    def from_diffusers_scheduler_config(cls, config: dict) -> "FlowSchedule":
        return cls(
            num_train_timesteps=int(config.get("num_train_timesteps", 1000)),
            shift=float(config.get("shift", 3.0)),
        )
