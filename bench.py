"""Headline benchmark: SD1.5 UNet full fine-tune train steps/sec at 512², batch 8.

Runs the real jitted training step (q-sample + UNet fwd/bwd + AdamW update +
EMA) on cached latents/conds — exactly the reference's latent-cache fast path
(modules/model.py:319-330), which is the BASELINE.json headline metric
("UNet train steps/sec/chip at 512² SD1.5"). Random-initialized weights
(no pretrained checkpoints exist in this offline image); FLOP count and
memory traffic are identical to trained weights.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is against the 4 steps/sec north-star target (BASELINE.md).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import os

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

    import jax
    import jax.numpy as jnp

    # SSDT_BENCH_TINY=1: CPU smoke mode — tiny UNet, 1 iter, proves the
    # whole bench code path (packing, optimizer, step) compiles and runs
    # without a TPU. Numbers from this mode are meaningless.
    TINY = os.environ.get("SSDT_BENCH_TINY") == "1"
    if TINY:
        jax.config.update("jax_platforms", "cpu")

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from scal_sdt_tpu.conf import Config, default, load_optim_target, merge
    from scal_sdt_tpu.models.unet import UNetConfig, init_unet_params
    from scal_sdt_tpu.parallel.mesh import batch_sharding, make_mesh, shard_params
    from scal_sdt_tpu.training.optim_targets import group_labels, resolve_optim_target
    from scal_sdt_tpu.training.optimizers import build_optimizer
    from scal_sdt_tpu.training.step import (
        StepSpec, UNET_PREFIX, init_train_state, make_train_step,
    )

    BATCH = int(os.environ.get("SSDT_BENCH_BATCH", 2 if TINY else 8))
    LATENT = 8 if TINY else 64  # 512px / 8
    WARMUP = 1 if TINY else 3
    ITERS = int(os.environ.get("SSDT_BENCH_ITERS", 2 if TINY else 20))

    if os.environ.get("SSDT_BENCH_FORCE_XLA") == "1":
        from scal_sdt_tpu.ops import attention as attention_ops

        attention_ops.FORCE_XLA = True

    # Best measured config on v5e-1: no remat + bf16 Adam moments fits in
    # 16 GB HBM and avoids all recompute (see PERF_NOTES.md for the matrix).
    # SSDT_BENCH_EMA=1 measures BASELINE workload 4's in-step EMA cost
    # (reference default is ema.enabled: false, __reserved_default__.yaml:65).
    EMA = os.environ.get("SSDT_BENCH_EMA", "0") == "1"
    # fp32 EMA + batch-8 no-remat measured OOM on the 16 GB chip; the bf16
    # stochastic-rounded shadow (ema.dtype: bf16) is the config that fits.
    EMA_DTYPE = os.environ.get("SSDT_BENCH_EMA_DTYPE", "bf16" if EMA else "fp32")
    # Master storage (optimizer.master_dtype). Default bf16 since r5: bf16
    # masters with stochastic-rounded apply halve master HBM and remove the
    # fp32 compute-cast read traffic; with the counter-hash dither (the r4
    # unsafe_rbg draw cost ~27 ms and made fp32 masters win) this config
    # measures 4.12 vs 4.04 steps/s — bf16 masters are now the recommended
    # AND fastest config. SSDT_BENCH_MASTER=fp32 measures the old default.
    MASTER = os.environ.get("SSDT_BENCH_MASTER", "bf16")

    config = merge(default(), Config({
        "batch_size": BATCH,
        "gradient_checkpointing": {"1": True, "0": False, "high": "high", "top": "top"}[
            os.environ.get("SSDT_BENCH_REMAT", "0")],
        "trainer": {"precision": "bf16", "mesh": {"data": None, "fsdp": 1}},
        "ema": {"enabled": EMA, "decay": 0.9999, "dtype": EMA_DTYPE},
        "optimizer": {
            "name": os.environ.get("SSDT_BENCH_OPT", "adamw"),
            "moment_dtype": os.environ.get("SSDT_BENCH_MOMENT", "bf16"),
            "params": {"lr": 2e-6, "beta1": 0.9, "beta2": 0.999,
                       "weight_decay": 1e-2, "eps": 1e-8},
            "lr_scale": {"enabled": False},
        },
    }))

    unet_config = UNetConfig.tiny() if TINY else UNetConfig.sd15()
    params = init_unet_params(jax.random.PRNGKey(0), unet_config, dtype=jnp.float32)

    # SSDT_BENCH_TARGET selects the optim target (BASELINE.md workloads:
    # full_unet = workload 1, lora_no-te = workload 2, custom_diffusion =
    # workload 5's training side). Non-full targets freeze the base UNet.
    TARGET = os.environ.get("SSDT_BENCH_TARGET", "full_unet")
    resolutions = resolve_optim_target(load_optim_target(TARGET), params.keys(), [])
    res = resolutions["unet"]
    if res.lora:
        from scal_sdt_tpu.training.lora import init_lora_params

        lora = init_lora_params(jax.random.PRNGKey(7), params, res.lora)
        params.update(lora)
    trainable = {}
    frozen_unet = {}
    trainable_names = set(res.trainable)
    for k, v in params.items():
        (trainable if k in trainable_names else frozen_unet)[
            f"{UNET_PREFIX}.{k}"] = v
    labels = group_labels(resolutions)
    overrides = {f"g{i}": g.optimizer for i, g in enumerate(resolutions["unet"].groups)}

    # Small-leaf slab packing (training/packing.py): default-on, like the
    # trainer. SSDT_BENCH_PACK=0 measures the unpacked baseline.
    from scal_sdt_tpu.training.packing import build_pack_spec, pack, packed_labels

    # SSDT_BENCH_PACK: 0 = off, slab = slabs only (default — measured 4.11
    # steps/s bf16 / 3.73 int8 on v5e-1), 1 = slabs+stacks (measured 3.93:
    # stacked big leaves defeat buffer donation; see PERF_NOTES.md)
    pack_mode = os.environ.get("SSDT_BENCH_PACK", "slab")
    pack_spec = None
    if pack_mode != "0":
        pack_spec = build_pack_spec(trainable, labels,
                                    stack_big=pack_mode != "slab")
        if pack_spec.nontrivial:
            # params are device-resident: jit the pack (one program, no
            # host round-trip, no per-leaf eager dispatch). DONATE the
            # unpacked leaves and drop every other reference to them —
            # without this the fp32 originals (3.2 GB for SD1.5) stay
            # resident behind the packed copy and OOM the 16 GB chip.
            donated = dict(trainable)
            trainable.clear()
            for k in list(params):
                if f"{UNET_PREFIX}.{k}" in donated:
                    del params[k]
            trainable = jax.jit(
                lambda p: pack(p, pack_spec), donate_argnums=0)(donated)
            del donated
            labels = {**{k: v for k, v in labels.items() if k in trainable},
                      **packed_labels(pack_spec)}
        else:
            pack_spec = None

    if MASTER in ("bf16", "bfloat16"):
        # donate: the fp32 originals must not stay resident behind the
        # bf16 copy (same OOM hazard as the pack above)
        trainable = jax.jit(
            lambda p: {k: v.astype(jnp.bfloat16) for k, v in p.items()},
            donate_argnums=0)(trainable)

    tx, lr_fn = build_optimizer(config, labels, overrides, steps_per_epoch=1000,
                                num_processes=jax.process_count())

    from scal_sdt_tpu.models.clip import CLIPTextConfig
    from scal_sdt_tpu.models.vae import VAEConfig

    spec = StepSpec.from_config(config, unet_config, CLIPTextConfig.vit_l(),
                                VAEConfig.sd15(), train_text_encoder=False)
    step_fn = make_train_step(spec, tx, lr_fn, ema_enabled=EMA, donate=True,
                              pack_spec=pack_spec)

    if frozen_unet:
        # frozen params are cast to bf16 at every use inside the step:
        # storing them bf16 is bit-identical for the bf16 compute policy
        # while halving their residency + per-step read traffic (the whole
        # frozen base UNet for LoRA/CD runs). Mirrors the trainer default.
        frozen_unet = jax.jit(
            lambda p: {k: v.astype(jnp.bfloat16) for k, v in p.items()},
            donate_argnums=0)(frozen_unet)

    mesh = make_mesh(fsdp=1)
    rng = np.random.RandomState(0)
    with mesh:
        trainable = shard_params(mesh, trainable)
        state = init_train_state(
            jax.random.PRNGKey(1), trainable, tx, ema_enabled=EMA,
            ema_decay=0.9999,
            ema_dtype=jnp.bfloat16 if EMA_DTYPE == "bf16" else jnp.float32)
        frozen: dict = shard_params(mesh, frozen_unet) if frozen_unet else {}
        bs = batch_sharding(mesh)
        batch = {
            "latents": jax.device_put(
                rng.randn(BATCH, LATENT, LATENT, 4).astype(np.float32), bs),
            "conds": jax.device_put(
                rng.randn(BATCH, 77, unet_config.cross_attention_dim)
                .astype(np.float32), bs),
        }

        # Warmup absorbs both compiles and the one layout-fixpoint recompile
        # (see training/step.py). Fetch VALUES as barriers: on remote-attached
        # backends block_until_ready can acknowledge before execution
        # completes; only a host transfer is a true barrier.
        for _ in range(WARMUP):
            state, metrics = step_fn(state, frozen, batch)
            float(np.asarray(metrics["train_loss"]))

        # SSDT_BENCH_PROFILE=<dir>: capture an xplane trace of the timed
        # loop (analyze with lab/xplane_ops.py). The trace adds per-step
        # overhead; do not use the resulting wall-clock as the headline.
        import contextlib

        profile_dir = os.environ.get("SSDT_BENCH_PROFILE")
        prof_ctx = (jax.profiler.trace(profile_dir) if profile_dir
                    else contextlib.nullcontext())
        # SSDT_BENCH_CALLTIME=1: also print per-iteration ENQUEUE latency
        # (python-side step_fn return time). If enqueue ≈ step time, the
        # workload is host-dispatch-bound, not device-bound.
        calltime = os.environ.get("SSDT_BENCH_CALLTIME") == "1"
        with prof_ctx:
            t0 = time.perf_counter()
            enq = []
            for _ in range(ITERS):
                t1 = time.perf_counter()
                state, metrics = step_fn(state, frozen, batch)
                enq.append(time.perf_counter() - t1)
            loss = float(np.asarray(metrics["train_loss"]))
            dt = time.perf_counter() - t0
        assert np.isfinite(loss), f"non-finite loss {loss}"
        if calltime:
            import sys

            print(f"enqueue ms per iter: "
                  f"{[round(x * 1e3, 1) for x in enq]}", file=sys.stderr)

    steps_per_sec = ITERS / dt
    headline = TARGET == "full_unet" and not TINY

    # MFU (VERDICT r3 item 6): analytic matmul+conv model FLOPs per step
    # (3x forward, remat recompute not counted per convention) over the
    # chip's bf16 peak. Makes steps/sec a judgeable efficiency claim.
    mfu = tflops_per_sec = None
    if headline:
        from scal_sdt_tpu.utils.flops import TPU_PEAK_FLOPS, train_step_flops

        step_flops = train_step_flops(unet_config, BATCH, LATENT)
        tflops_per_sec = step_flops * steps_per_sec / 1e12
        kind = jax.devices()[0].device_kind.lower()
        peak = next((v for k, v in (("v5 lite", TPU_PEAK_FLOPS["v5e"]),
                                    ("v5e", TPU_PEAK_FLOPS["v5e"]),
                                    ("v5p", TPU_PEAK_FLOPS["v5p"]),
                                    ("v6", TPU_PEAK_FLOPS["v6e"]),
                                    ("v4", TPU_PEAK_FLOPS["v4"]))
                     if k in kind), None)
        if peak is not None:
            # step_flops covers the full global batch, which is sharded over
            # every device in the mesh — divide by the aggregate peak so MFU
            # stays per-chip-meaningful on multi-chip runs (ADVICE r4)
            mfu = round(step_flops * steps_per_sec
                        / (peak * jax.device_count()), 4)

    print(json.dumps({
        "metric": ("tiny_cpu_smoke" if TINY else
                   "sd15_unet_full_finetune_train_steps_per_sec_b8_512"
                   + ("_ema" if EMA else "")
                   # suffix only non-default master storage (default is
                   # bf16 SR masters since r5 — the fastest measured config)
                   + ("_fp32master" if MASTER == "fp32" else "")
                   if TARGET == "full_unet" else
                   f"sd15_{TARGET}_train_steps_per_sec_b{BATCH}_512"),
        "value": round(steps_per_sec, 4),
        "unit": "steps/sec",
        # the >=4 target is defined for the full fine-tune only
        "vs_baseline": round(steps_per_sec / 4.0, 4) if headline else None,
        **({"mfu": mfu, "achieved_tflops_per_sec": round(tflops_per_sec, 2)}
           if tflops_per_sec is not None else {}),
    }))


if __name__ == "__main__":
    main()
