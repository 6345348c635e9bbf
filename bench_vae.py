"""VAE-encode images/sec — the cache-build hot loop (BASELINE.md:29).

Measures the workload of ``cache.py`` (reference ``/root/reference/cache.py:33``:
VAE encode dominates the cache build) at SD1.5 geometry, 512x512 images:

- ``encode_only``: device-resident batches through the jitted
  encoder_apply + sample_latents, host VALUE FETCH as the barrier
  (block_until_ready acks early on remote-attached TPUs, PERF_NOTES.md).
- ``end_to_end``: the real cache-build pipeline — JPEG decode + Lanczos
  resize + crop (native C++ pipeline when built, PIL otherwise) threaded
  through DataPipeline, VAE encode, latents fetched to host.

Prints ONE json line per mode. No published reference number exists for
this metric (BASELINE.md "measured & reported"), so vs_baseline is null.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from pathlib import Path

import numpy as np


def _write_dataset(d: Path, n: int, size: int = 640) -> None:
    from PIL import Image

    rng = np.random.RandomState(0)
    for i in range(n):
        arr = rng.randint(0, 255, (size, size, 3), np.uint8)
        Image.fromarray(arr).save(d / f"img_{i}.jpg", quality=92)
        (d / f"img_{i}.txt").write_text(f"bench image {i}")


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from scal_sdt_tpu.models.vae import (
        VAEConfig, encoder_apply, init_vae_params, sample_latents)

    BATCH = int(os.environ.get("SSDT_BENCH_VAE_BATCH", 8))
    RES = int(os.environ.get("SSDT_BENCH_VAE_RES", 512))
    ITERS = int(os.environ.get("SSDT_BENCH_VAE_ITERS", 12))
    N_IMAGES = BATCH * ITERS
    dtype = jnp.dtype(os.environ.get("SSDT_BENCH_VAE_DTYPE", "float32"))

    vae_config = VAEConfig.sd15()
    params = init_vae_params(jax.random.PRNGKey(0), vae_config, dtype=dtype)

    @jax.jit
    def encode(images, rng):
        moments = encoder_apply(params, images.astype(dtype), vae_config)
        return sample_latents(moments, rng, vae_config.scaling_factor)

    rng_np = np.random.RandomState(1)
    host_batch = rng_np.uniform(-1, 1, (BATCH, RES, RES, 3)).astype(np.float32)
    dev_batch = jax.device_put(host_batch)
    key = jax.random.PRNGKey(2)

    # -- encode-only ---------------------------------------------------------
    for _ in range(3):  # warmup: compile + layout
        np.asarray(encode(dev_batch, key))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = np.asarray(encode(dev_batch, key))  # host fetch = true barrier
    dt_encode = time.perf_counter() - t0
    assert np.isfinite(out).all()
    encode_ips = BATCH * ITERS / dt_encode

    # -- end-to-end cache-build loop ----------------------------------------
    from scal_sdt_tpu.data.datasets import Concept, ImagePromptDataset
    from scal_sdt_tpu.data.pipeline import DataPipeline
    from scal_sdt_tpu.data.samplers import ConstantSizeSampler

    with tempfile.TemporaryDirectory() as tmp:
        data = Path(tmp)
        _write_dataset(data, N_IMAGES)
        dataset = ImagePromptDataset([Concept(data, "bench")], seed=0)
        sampler = ConstantSizeSampler(dataset, RES)
        pipeline = DataPipeline(dataset, sampler, BATCH, tokenizer=None,
                                num_workers=int(os.environ.get("SSDT_BENCH_VAE_WORKERS", 4)))
        # warmup epoch 0 decodes OS-cold files; measure epoch 1
        for batch in pipeline:
            np.asarray(encode(jnp.asarray(batch["images"]), key))
        t0 = time.perf_counter()
        n_done = 0
        for batch in pipeline:
            np.asarray(encode(jnp.asarray(batch["images"]), key))
            n_done += batch["images"].shape[0]
        dt_e2e = time.perf_counter() - t0
    e2e_ips = n_done / dt_e2e

    from scal_sdt_tpu.native import image as native_image

    for metric, value in (("vae_encode_images_per_sec_512", encode_ips),
                          ("cache_build_images_per_sec_512_e2e", e2e_ips)):
        print(json.dumps({
            "metric": metric, "value": round(value, 2), "unit": "images/sec",
            "vs_baseline": None,
            "native_decoder": bool(native_image.available()),
            "dtype": str(dtype),
        }))


if __name__ == "__main__":
    main()
