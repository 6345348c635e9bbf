"""Text-to-image sampling throughput — the serving-side hot loop.

Measures the full jitted denoise loop (CFG pair batched, one lax.scan) +
VAE decode at SD1.5 geometry: images/min at 512x512, 20 steps, batch 4 —
the workload of ``sample.py`` / the in-training SampleCallback (reference
analogue: diffusers ``StableDiffusionPipeline.__call__``,
``/root/reference/modules/sample_callback.py:41-68``).

Host VALUE FETCH as the barrier (PERF_NOTES.md measurement protocol).
Prints ONE json line per sampler. No reference number exists (the torch
reference publishes none), so vs_baseline is null.

Env knobs: SSDT_BENCH_SAMPLE_BATCH (4), _STEPS (20), _RES (512),
_METHODS ("ddim,dpmpp_2m"), _REPS (3).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from scal_sdt_tpu.diffusion.sampler import (
        SamplerSpec, ddim_sample_latents, dpmpp_2m_sample_latents,
        euler_sample_latents)
    from scal_sdt_tpu.diffusion.schedule import NoiseSchedule
    from scal_sdt_tpu.models.clip import CLIPTextConfig
    from scal_sdt_tpu.models.unet import UNetConfig, unet_param_shapes
    from scal_sdt_tpu.models.vae import VAEConfig, decoder_apply, vae_param_shapes

    BATCH = int(os.environ.get("SSDT_BENCH_SAMPLE_BATCH", 4))
    STEPS = int(os.environ.get("SSDT_BENCH_SAMPLE_STEPS", 20))
    RES = int(os.environ.get("SSDT_BENCH_SAMPLE_RES", 512))
    REPS = int(os.environ.get("SSDT_BENCH_SAMPLE_REPS", 3))
    METHODS = os.environ.get("SSDT_BENCH_SAMPLE_METHODS", "ddim,dpmpp_2m").split(",")

    unet_config = UNetConfig.sd15()
    vae_config = VAEConfig.sd15()
    spec = SamplerSpec(unet_config=unet_config, vae_config=vae_config,
                       clip_config=CLIPTextConfig.vit_l(),
                       schedule=NoiseSchedule(), dtype=jnp.bfloat16)

    # constant-filled params: throughput does not depend on values, and
    # random-initializing 860M+84M params on the host costs minutes
    unet = {k: jnp.full(s, 0.02, jnp.bfloat16)
            for k, s in unet_param_shapes(unet_config).items()}
    vae_dec = {k: jnp.full(s, 0.02, jnp.bfloat16)
               for k, s in vae_param_shapes(vae_config).items()
               if k.startswith(("decoder.", "post_quant_conv."))}

    cond = jnp.full((BATCH, 77, 768), 0.01, jnp.bfloat16)
    uncond = jnp.zeros((BATCH, 77, 768), jnp.bfloat16)
    rng = jax.random.PRNGKey(0)

    fns = {"ddim": ddim_sample_latents,
           "euler": euler_sample_latents,
           "dpmpp_2m": dpmpp_2m_sample_latents}

    for method in METHODS:
        fn = fns[method.strip()]

        def run(key):
            latents = fn(unet, cond, uncond, key, spec, STEPS, 7.5,
                         RES, RES, BATCH)
            images = decoder_apply(vae_dec,
                                   latents / vae_config.scaling_factor,
                                   vae_config)
            return np.asarray(images)  # host fetch = true barrier

        run(rng)  # compile + layout warmup
        t0 = time.perf_counter()
        for i in range(REPS):
            out = run(jax.random.fold_in(rng, i))
        dt = time.perf_counter() - t0
        assert np.isfinite(out.astype(np.float64)).all()
        ipm = BATCH * REPS / dt * 60.0
        print(json.dumps({
            "metric": f"sample_images_per_min_{RES}_{STEPS}steps_{method.strip()}",
            "value": round(ipm, 2), "unit": "images/min",
            "vs_baseline": None, "batch": BATCH,
        }))


if __name__ == "__main__":
    main()
