"""Per-program XLA memory analysis of the bench train step, by packing mode.

Usage: python lab/micro_pack_memory.py [pack0 slab full ...]

AOT-lowers the grad and update programs exactly as bench.py builds them
(same config/optim-target/packing wiring) and prints XLA's compiled memory
analysis (argument/output/temp/alias bytes). This attributes HBM peaks to a
packing mode without having to OOM the chip to find out — the round-3
campaign's first full-stack bench run died RESOURCE_EXHAUSTED at batch 8;
this tool exists to locate those bytes.

TPU-serialized: run alone (single-client axon tunnel, PERF_NOTES.md).
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def analyze(pack_mode: str):
    import jax
    import jax.numpy as jnp

    from scal_sdt_tpu.conf import Config, default, load_optim_target, merge
    from scal_sdt_tpu.models.clip import CLIPTextConfig
    from scal_sdt_tpu.models.unet import UNetConfig, init_unet_params
    from scal_sdt_tpu.models.vae import VAEConfig
    from scal_sdt_tpu.training.optim_targets import group_labels, resolve_optim_target
    from scal_sdt_tpu.training.optimizers import build_optimizer
    from scal_sdt_tpu.training.packing import build_pack_spec, pack, packed_labels
    from scal_sdt_tpu.training.step import StepSpec, UNET_PREFIX, make_train_step

    BATCH = int(os.environ.get("SSDT_BENCH_BATCH", 8))
    LATENT = 64

    config = merge(default(), Config({
        "batch_size": BATCH,
        "trainer": {"precision": "bf16", "mesh": {"data": None, "fsdp": 1}},
        "ema": {"enabled": False},
        "optimizer": {
            "name": "adamw",
            "moment_dtype": os.environ.get("SSDT_BENCH_MOMENT", "bf16"),
            "params": {"lr": 2e-6, "beta1": 0.9, "beta2": 0.999,
                       "weight_decay": 1e-2, "eps": 1e-8},
            "lr_scale": {"enabled": False},
        },
    }))

    unet_config = UNetConfig.sd15()
    # shapes only — no device residency needed for AOT lowering
    params = jax.eval_shape(
        lambda: init_unet_params(jax.random.PRNGKey(0), unet_config,
                                 dtype=jnp.float32))
    resolutions = resolve_optim_target(load_optim_target("full_unet"),
                                       params.keys(), [])
    res = resolutions["unet"]
    trainable = {f"{UNET_PREFIX}.{k}": v for k, v in params.items()
                 if k in set(res.trainable)}
    labels = group_labels(resolutions)
    overrides = {f"g{i}": g.optimizer for i, g in enumerate(res.groups)}

    pack_spec = None
    if pack_mode != "pack0":
        pack_spec = build_pack_spec(trainable, labels,
                                    stack_big=pack_mode == "full")
        if pack_spec.nontrivial:
            trainable = jax.eval_shape(lambda p: pack(p, pack_spec), trainable)
            labels = {**{k: v for k, v in labels.items() if k in trainable},
                      **packed_labels(pack_spec)}
        else:
            pack_spec = None

    tx, lr_fn = build_optimizer(config, labels, overrides, steps_per_epoch=1000,
                                num_processes=1)
    spec = StepSpec.from_config(config, unet_config, CLIPTextConfig.vit_l(),
                                VAEConfig.sd15(), train_text_encoder=False)
    step_fn = make_train_step(spec, tx, lr_fn, ema_enabled=False, donate=True,
                              pack_spec=pack_spec)

    grad_step = update_step = None
    for cell in step_fn.__closure__:
        v = cell.cell_contents
        name = getattr(v, "__name__", "")
        if name == "grad_step":
            grad_step = v
        elif name == "update_step":
            update_step = v
    assert grad_step is not None and update_step is not None, \
        "make_train_step closure layout changed; update this probe"

    frozen: dict = {}
    batch = {
        "latents": jax.ShapeDtypeStruct((BATCH, LATENT, LATENT, 4), jnp.float32),
        "conds": jax.ShapeDtypeStruct((BATCH, 77, unet_config.cross_attention_dim),
                                      jnp.float32),
    }
    rng_s = jax.ShapeDtypeStruct((2,), jnp.uint32)
    step_s = jax.ShapeDtypeStruct((), jnp.int32)
    grads_s, _ = jax.eval_shape(grad_step, trainable, frozen, batch, rng_s, step_s)
    opt_s = jax.eval_shape(tx.init, trainable)

    GB = 1 << 30

    def report(name, lowered):
        mem = lowered.compile().memory_analysis()
        peak = (mem.argument_size_in_bytes + mem.output_size_in_bytes
                + mem.temp_size_in_bytes - mem.alias_size_in_bytes)
        print(f"  {name:11s} args {mem.argument_size_in_bytes / GB:6.2f}  "
              f"out {mem.output_size_in_bytes / GB:6.2f}  "
              f"temp {mem.temp_size_in_bytes / GB:6.2f}  "
              f"alias {mem.alias_size_in_bytes / GB:6.2f}  "
              f"program-peak {peak / GB:6.2f} GB", flush=True)
        return peak

    p1 = report("grad_step", grad_step.lower(trainable, frozen, batch, rng_s, step_s))
    p2 = report("update_step", update_step.lower(trainable, opt_s, None,
                                                 step_s, rng_s, grads_s))
    print(f"  worst-case resident while grad runs (masters+moments+grads held) "
          f"≈ grad-peak + masters+moments not in its args", flush=True)
    return p1, p2


if __name__ == "__main__":
    modes = sys.argv[1:] or ["pack0", "slab", "full"]
    for m in modes:
        print(f"=== pack mode: {m} ===", flush=True)
        analyze(m)
