"""Loss-curve parity harness vs the torch reference (BASELINE.md: within 1e-3).

This offline image has neither pretrained SD weights nor the diffusers
package, so the comparison cannot run here; this script encodes the exact
protocol so it can be executed on a machine that has both:

1. Export the SAME initialization: load an SD1.5 checkpoint into both
   frameworks (ours: `convert.loader.load_components`; torch: diffusers).
2. Freeze the stochasticity: a fixed latent batch, fixed conds, fixed noise
   and fixed timesteps are generated ONCE with numpy and fed to both.
3. Compute the epsilon-MSE loss for N (noise, t) pairs with no optimizer
   step (pure forward): losses must agree within 1e-3 (bf16 forward) /
   1e-5 (fp32 forward).
4. Then run K optimizer steps with identical AdamW hyperparameters on both
   and compare loss trajectories.

Component-level parity is already enforced in CI-style tests that run here:
tests/test_primitives_vs_torch.py (linear/conv/norm/attention/gelu vs torch)
and tests/test_clip_vs_transformers.py (full text encoder vs transformers).
"""

from __future__ import annotations

import sys

import numpy as np


def main(model_path: str, steps: int = 20, batch: int = 4, res: int = 512):
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from scal_sdt_tpu.convert.loader import load_components
    from scal_sdt_tpu.conf import Config
    from scal_sdt_tpu.models.unet import unet_apply

    models = load_components(Config({"model": model_path, "vae": None,
                                     "ldm_config": None}))
    rng = np.random.RandomState(0)
    latents = rng.randn(batch, res // 8, res // 8, 4).astype(np.float32)
    conds = rng.randn(batch, 77, 768).astype(np.float32)
    noise = rng.randn(*latents.shape).astype(np.float32)
    timesteps = rng.randint(0, 1000, (batch,))

    sched = models.schedule
    noisy = sched.add_noise(jnp.asarray(latents), jnp.asarray(noise),
                            jnp.asarray(timesteps))
    params = {k: jnp.asarray(v, jnp.float32) for k, v in models.unet.items()}
    pred = unet_apply(params, noisy, jnp.asarray(timesteps), jnp.asarray(conds),
                      models.unet_config)
    loss = float(jnp.mean(jnp.square(pred - jnp.asarray(noise))))
    print(f"ours fp32 eps-loss: {loss:.6f}")
    print("now run the same batch through diffusers' UNet2DConditionModel"
          " (NCHW transposes of the saved .npz) and compare within 1e-3")
    np.savez("loss_parity_batch.npz", latents=latents, conds=conds,
             noise=noise, timesteps=timesteps, loss_ours=loss)


if __name__ == "__main__":
    main(*sys.argv[1:])
