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


def sanity_gate(images: np.ndarray, where: str = "sample") -> None:
    """Refuse to report a throughput number on degenerate output (VERDICT r3
    item 7): a silent numeric regression (NaN/Inf, collapsed-to-constant, or
    blown-up decode) must fail the bench, not keep it green."""
    a = np.asarray(images, np.float64)
    if not np.isfinite(a).all():
        bad = int((~np.isfinite(a)).sum())
        raise AssertionError(
            f"{where}: {bad}/{a.size} non-finite values in decoded images")
    if float(a.std()) < 1e-6:
        raise AssertionError(
            f"{where}: decoded images are constant (std={a.std():.3g})")
    if float(np.abs(a).max()) > 1e4:
        raise AssertionError(
            f"{where}: implausible decode magnitude "
            f"(max|x|={np.abs(a).max():.3g})")


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

    # SSDT_BENCH_SAMPLE_TINY=1: CPU smoke mode (tiny UNet, 8px) proving the
    # bench path incl. the sanity gate; numbers are meaningless.
    TINY = os.environ.get("SSDT_BENCH_SAMPLE_TINY") == "1"
    if TINY:
        jax.config.update("jax_platforms", "cpu")
    BATCH = int(os.environ.get("SSDT_BENCH_SAMPLE_BATCH", 2 if TINY else 4))
    STEPS = int(os.environ.get("SSDT_BENCH_SAMPLE_STEPS", 3 if TINY else 20))
    RES = int(os.environ.get("SSDT_BENCH_SAMPLE_RES", 64 if TINY else 512))
    REPS = int(os.environ.get("SSDT_BENCH_SAMPLE_REPS", 1 if TINY else 3))
    METHODS = os.environ.get("SSDT_BENCH_SAMPLE_METHODS", "ddim,dpmpp_2m").split(",")
    # SSDT_BENCH_SAMPLE_INJECT_NAN=1: poison the decode (gate self-test —
    # the bench MUST exit non-zero; used by tests/test_bench_gates.py)
    INJECT = os.environ.get("SSDT_BENCH_SAMPLE_INJECT_NAN") == "1"

    unet_config = UNetConfig.tiny() if TINY else UNetConfig.sd15()
    vae_config = (VAEConfig(block_out_channels=(8, 8), layers_per_block=1,
                            norm_num_groups=4) if TINY else VAEConfig.sd15())
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

    xdim = unet_config.cross_attention_dim
    cond = jnp.full((BATCH, 77, xdim), 0.01, jnp.bfloat16)
    uncond = jnp.zeros((BATCH, 77, xdim), jnp.bfloat16)
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
            out = np.asarray(images)  # host fetch = true barrier
            if INJECT:
                out = out.copy()
                out.flat[::97] = np.nan
            return out

        sanity_gate(run(rng), f"{method} warmup")  # compile + layout warmup
        t0 = time.perf_counter()
        for i in range(REPS):
            out = run(jax.random.fold_in(rng, i))
        dt = time.perf_counter() - t0
        sanity_gate(out, method)
        ipm = BATCH * REPS / dt * 60.0
        print(json.dumps({
            "metric": f"sample_images_per_min_{RES}_{STEPS}steps_{method.strip()}",
            "value": round(ipm, 2), "unit": "images/min",
            "vs_baseline": None, "batch": BATCH,
        }))


if __name__ == "__main__":
    main()
