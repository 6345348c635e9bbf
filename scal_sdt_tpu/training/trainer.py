"""The training orchestrator: explicit epoch loop around the jitted step.

TPU-native replacement for the reference's ``pl.Trainer`` +
``LatentDiffusionModel`` pairing (``/root/reference/train.py`` +
``modules/model.py``): model loading, optim-target resolution, LoRA
injection, tokenizer + custom embeddings, data pipeline, mesh placement,
per-group optimizer, checkpointing/resume, metric logging and in-training
sampling — all owned here since there is no Lightning on the JAX side
(SURVEY.md §1 "key architectural fact").
"""

from __future__ import annotations

import logging
import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..conf import Config, load_optim_target
from ..data.pipeline import DataPipeline, get_dataset, get_sampler
from ..models.clip import CLIPTextConfig, init_clip_params
from ..models.unet import UNetConfig, init_unet_params
from ..models.vae import VAEConfig, init_vae_params
from ..parallel.mesh import batch_sharding, mesh_from_config, shard_params
from ..text.embeddings import install_custom_embeddings, load_embeddings_dir
from ..text.tokenizer import resolve_tokenizer
from .checkpoint import CheckpointManager, restore_train_state, save_checkpoint
from .lora import init_lora_params
from .optimizers import build_optimizer
from .optim_targets import TargetResolution, resolve_optim_target
from .step import (
    StepSpec,
    TE_PREFIX,
    TrainState,
    UNET_PREFIX,
    VAE_PREFIX,
    component_prefix,
    init_train_state,
    make_train_step,
)

logger = logging.getLogger("trainer")


def _prefixed(params: dict, prefix: str) -> dict:
    return {f"{prefix}.{k}": v for k, v in params.items()}


class Trainer:
    def __init__(self, config: Config, run_dir: Path,
                 models=None, tokenizer=None, tokenizer_3=None):
        """`models`: optional pre-loaded LoadedModels (tests inject random
        tiny models here; the CLI loads real weights). `tokenizer_3`: the T5
        tokenizer for SD3 models with a text_encoder_3 tower (resolved from
        the model dir when omitted)."""
        self.config = config
        self.run_dir = Path(run_dir)

        # pl.seed_everything analogue (reference train.py:118-119): data-path
        # randomness is per-item seeded (data/datasets.mix_seed), but stray
        # global draws (e.g. user augment plugins) get determinism too.
        import random as py_random

        _seed = int(config.get("seed") or 0)
        py_random.seed(_seed)
        np.random.seed(_seed % (2 ** 32 - 1))

        if models is None:
            from ..convert.loader import load_components

            models = load_components(config)
        self.models = models

        if tokenizer is not None:
            self.tokenizer = tokenizer
        else:
            # Cache-backed runs never consume prompt ids (conds are
            # precomputed), so the hash stand-in is harmless there.
            self.tokenizer = resolve_tokenizer(
                config, allow_hash=bool(config.data.get("cache")))

        # `xformers: false` in the reference disables memory-efficient
        # attention; here it disables the Pallas flash-attention path.
        from ..ops import attention as attention_ops

        attention_ops.FORCE_XLA = not bool(config.get("xformers", True))

        # -- custom embeddings (reference modules/model.py:209-214) ---------
        clip_params = dict(models.clip)
        if config.custom_embeddings.get("enabled", False):
            embs = load_embeddings_dir(config.custom_embeddings.path)
            logger.info(f"Loaded {len(embs)} custom embeddings")
            clip_params = install_custom_embeddings(clip_params, self.tokenizer, embs)
            object.__setattr__(models, "clip_config", CLIPTextConfig(
                **{**models.clip_config.__dict__,
                   "vocab_size": clip_params["text_model.embeddings.token_embedding.weight"].shape[0]}))

        # -- optim target resolution (modules/model.py:136-164,216-242) -----
        optim_target = load_optim_target(config.optim_target)
        self.resolutions = resolve_optim_target(
            optim_target, models.unet.keys(), clip_params.keys(),
            text_encoder_2_keys=(models.clip2.keys()
                                 if models.clip2 is not None else None))
        self.train_text_encoder = self.resolutions["text_encoder"].any_trainable

        # -- LoRA factor injection ------------------------------------------
        rng = jax.random.PRNGKey(int(config.get("seed") or 0))
        rng, lora_rng = jax.random.split(rng)
        component_params = {"unet": dict(models.unet), "text_encoder": clip_params}
        if models.clip2 is not None:
            component_params["text_encoder_2"] = dict(models.clip2)
        for comp, res in self.resolutions.items():
            if res.lora:
                lora = init_lora_params(lora_rng, component_params[comp], res.lora)
                component_params[comp].update({k: np.asarray(v) for k, v in lora.items()})
                logger.info(f"Injected {len(res.lora)} LoRA modules into {comp}")

        # LoRA dropout (loralib's lora_dropout, reference modules/lora.py:21):
        # static per-path rates; the step threads a PRNG key to activate them
        # during training only (models/functional._lora_delta).
        from ..models.functional import set_lora_dropout_rates

        lora_dropout = {path: spec.dropout
                        for res in self.resolutions.values()
                        for path, spec in res.lora.items() if spec.dropout}
        set_lora_dropout_rates(lora_dropout)
        if lora_dropout:
            logger.info(f"LoRA dropout active on {len(lora_dropout)} modules")

        # -- textual-inversion TRAINING (text/ti.py, beyond reference) ------
        self.ti_meta = None
        ti_conf = (config.custom_embeddings.get("train") or {}) \
            if config.get("custom_embeddings") else {}
        if ti_conf.get("enabled", False):
            from ..text.ti import TRAINED_EXTRA_KEY, parse_ti_specs, setup_ti_training

            if config.data.get("cache"):
                raise ValueError(
                    "custom_embeddings.train requires live text encoding; "
                    "it cannot train from a precomputed condition cache")
            specs = parse_ti_specs(ti_conf)
            component_params["text_encoder"], self.ti_meta = setup_ti_training(
                component_params["text_encoder"], self.tokenizer, specs,
                seed=int(config.get("seed") or 0))

        # -- trainable / frozen partition -----------------------------------
        trainable: dict = {}
        frozen: dict = {}
        trainable_keys = {
            f"{component_prefix(comp)}.{k}"
            for comp, res in self.resolutions.items() for k in res.trainable
        }
        if self.ti_meta:
            from ..text.ti import TRAINED_EXTRA_KEY

            trainable_keys.add(f"{TE_PREFIX}.{TRAINED_EXTRA_KEY}")
        all_params = {}
        all_params.update(_prefixed(component_params["unet"], UNET_PREFIX))
        all_params.update(_prefixed(component_params["text_encoder"], TE_PREFIX))
        all_params.update(_prefixed(dict(models.vae), VAE_PREFIX))
        if models.clip2 is not None:
            # SDXL/SD3 tower 2 trains through the same optim-target engine
            # (spec section `text_encoder_2:`); frozen when unaddressed
            from .step import TE2_PREFIX

            all_params.update(_prefixed(component_params["text_encoder_2"],
                                        TE2_PREFIX))
        if getattr(models, "t5", None) is not None:
            # SD3's T5 tower is conditioning-only here (frozen — the
            # published SD3 fine-tuning recipes keep T5 frozen)
            from .step import TE3_PREFIX

            all_params.update(_prefixed(dict(models.t5), TE3_PREFIX))
        if (models.is_sdxl or models.is_sd3) and config.data.get("cache"):
            # an SDXL/SD3 cache must carry {id}.pooled next to {id}.cond
            # (the pooled text embedding feeds the time/adaLN conditioning);
            # a cache built against an SD1.x model cannot feed these models
            from ..data.datasets import LatentCache

            probe = LatentCache(config.data.cache)
            first = probe.entries[0] if probe.entries else None
            if first is not None and probe.cond(int(first)) is not None \
                    and probe.pooled(int(first)) is None:
                raise ValueError(
                    "SDXL/SD3 training needs a cache with pooled embeddings "
                    "({id}.pooled): rebuild it with cache.py against this "
                    "model")
        for k, v in all_params.items():
            arr = np.asarray(v)
            if np.issubdtype(arr.dtype, np.floating) or str(arr.dtype) == "bfloat16":
                arr = arr.astype(np.float32)  # fp32 masters
            (trainable if k in trainable_keys else frozen)[k] = arr
        if not trainable:
            raise ValueError("Optim target selects no trainable parameters")
        logger.info(f"Trainable tensors: {len(trainable)}, frozen: {len(frozen)}")

        # Frozen params are cast to the compute dtype at every use
        # (step._merged_component), so for bf16-compute runs storing them in
        # bf16 is BIT-IDENTICAL (one round-to-nearest cast either way) while
        # halving their HBM residency and per-step read traffic — a large
        # win for adapter runs where the whole base UNet is frozen.
        # Opt out with trainer.frozen_dtype: fp32.
        precision = str(config.trainer.get("precision", "bf16"))
        compute_bf16 = precision in ("16", "bf16", "bfloat16")
        if compute_bf16 and str(config.trainer.get("frozen_dtype",
                                                   "compute")) != "fp32":
            import ml_dtypes

            frozen = {k: (v.astype(ml_dtypes.bfloat16)
                          if np.issubdtype(np.asarray(v).dtype, np.floating)
                          else v)
                      for k, v in frozen.items()}

        # -- data -----------------------------------------------------------
        dataset = get_dataset(config, use_cache=True)
        sampler = get_sampler(dataset, config,
                              jax.process_count(), jax.process_index())
        num_workers = config.get("num_workers")
        # SD3 with a T5 tower needs the third tokenizer for live text
        # encoding; cache-backed runs never tokenize.
        if tokenizer_3 is None and getattr(models, "t5", None) is not None:
            from ..text.tokenizer import resolve_t5_tokenizer

            tokenizer_3 = resolve_t5_tokenizer(config)
            if tokenizer_3 is None and not config.data.get("cache"):
                raise ValueError(
                    "SD3 model has a T5 tower (text_encoder_3) but no "
                    "tokenizer_3/tokenizer.json was found: provide one "
                    "(config key `tokenizer_3:`), train from a condition "
                    "cache, or drop the T5 tower from the model dir")
        self.pipeline = DataPipeline(
            dataset, sampler, config.batch_size, self.tokenizer,
            num_workers=num_workers if num_workers is not None else 4,
            tokenizer_3=tokenizer_3)
        steps_per_epoch = max(len(self.pipeline), 1)
        self.steps_per_epoch = steps_per_epoch

        # -- optimizer ------------------------------------------------------
        from .optim_targets import group_labels

        labels = group_labels(self.resolutions)
        overrides = {}
        g = 0
        for comp, res in self.resolutions.items():
            for group in res.groups:
                overrides[f"g{g}"] = group.optimizer
                g += 1
        if self.ti_meta:
            from ..text.ti import TRAINED_EXTRA_KEY

            # own group: TI uses a much higher lr than model fine-tuning
            # (5e-3 typical) and no weight decay
            labels[f"{TE_PREFIX}.{TRAINED_EXTRA_KEY}"] = "ti"
            overrides["ti"] = {"lr": float(ti_conf.get("lr", 5e-3)),
                               "weight_decay": 0.0}
        # -- small-leaf slab packing (training/packing.py) ------------------
        # The update program is launch-bound per leaf on TPU; packing small
        # leaves into per-(component, group) slabs turns hundreds of tiny
        # optimizer/EMA/apply kernels into a handful. Escape hatch:
        # trainer.param_packing: false.
        from .packing import DEFAULT_MIN_SLAB_SIZE, build_pack_spec, pack, packed_labels

        # The mesh must exist before packing: tensor-parallel weights keep
        # their natural shapes (packing a slab would erase their tensor-axis
        # sharding), and ops.attention's shard_map wrapper reads the active
        # mesh at trace time.
        from ..parallel.mesh import TENSOR_AXIS, set_active_mesh, tp_param_names

        self.mesh = mesh_from_config(config.trainer)
        set_active_mesh(self.mesh)

        self.pack_spec = None
        if bool(config.trainer.get("param_packing", True)):
            spec_candidate = build_pack_spec(
                trainable, labels,
                min_slab_size=int(config.trainer.get("pack_min_size")
                                  or DEFAULT_MIN_SLAB_SIZE),
                stack_big=bool(config.trainer.get("pack_stacks", False)),
                exclude=tp_param_names(trainable,
                                       self.mesh.shape[TENSOR_AXIS]))
            if spec_candidate.nontrivial:
                self.pack_spec = spec_candidate
                trainable = pack(trainable, self.pack_spec, np_out=True)
                labels = {**{k: v for k, v in labels.items() if k in trainable},
                          **packed_labels(self.pack_spec)}
                n_packed = len(self.pack_spec.packed_keys)
                logger.info(f"Packed {n_packed} leaves into "
                            f"{len(self.pack_spec.slabs)} slab(s) + "
                            f"{len(self.pack_spec.stacks)} stack(s)")

        # bf16 masters (optimizer.master_dtype: bf16, opt-in): store the
        # trainable masters themselves in bf16 — the apply step adds the
        # fp32 update with stochastic rounding (training/step.py), so
        # training does not freeze. Halves master HBM (-1.7 GB for SD1.5)
        # and removes the per-step fp32->bf16 compute-cast read traffic;
        # the reference has no analogue (its AMP keeps fp32 masters).
        self.master_dtype = str(config.optimizer.get("master_dtype", "fp32"))
        if self.master_dtype in ("bf16", "bfloat16"):
            import ml_dtypes

            trainable = {k: (np.asarray(v).astype(ml_dtypes.bfloat16)
                             if np.issubdtype(np.asarray(v).dtype, np.floating)
                             else v)
                         for k, v in trainable.items()}

        self.tx, self.lr_fn = build_optimizer(
            config, labels, overrides, steps_per_epoch, jax.process_count())

        # -- placement -------------------------------------------------------
        with self.mesh:
            self.frozen = shard_params(self.mesh, frozen)
            trainable_dev = shard_params(self.mesh, trainable)

        # -- step -----------------------------------------------------------
        self.spec = StepSpec.from_config(
            config, models.unet_config, models.clip_config, models.vae_config,
            self.train_text_encoder, schedule=models.schedule,
            clip2_config=models.clip2_config,
            mmdit_config=models.mmdit_config,
            t5_config=(models.t5_config
                       if getattr(models, "t5", None) is not None else None))
        ema_enabled = bool(config.ema.get("enabled", False))
        self.train_step = make_train_step(
            self.spec, self.tx, self.lr_fn, ema_enabled,
            donate=bool(config.trainer.get("donate_state", True)),
            pack_spec=self.pack_spec)

        rng, state_rng = jax.random.split(rng)
        self.state = init_train_state(
            state_rng, trainable_dev, self.tx, ema_enabled,
            float(config.ema.get("decay", 0.995)),
            ema_dtype=(jnp.bfloat16
                       if str(config.ema.get("dtype", "fp32")) in
                       ("bf16", "bfloat16") else jnp.float32))
        del trainable_dev  # donated into the state

        self.ckpt = CheckpointManager(self.run_dir, config.checkpoint)
        self._writers = self._build_loggers()
        self.global_step = 0
        # Epoch cursor for mid-epoch resume (Lightning restores the loop
        # mid-epoch, /root/reference/train.py:127-134; we persist
        # {epoch, batch_in_epoch} in the checkpoint and fast-forward the
        # pipeline on resume so no data is replayed or skipped).
        self.epoch_cursor = 0
        self.batch_in_epoch = 0

    # ------------------------------------------------------------------ io

    def _build_loggers(self):
        writers = []
        loggers_conf = self.config.get("loggers", {}) or {}
        if jax.process_index() == 0 and loggers_conf.get("tensorboard") is not None:
            try:
                from tensorboardX import SummaryWriter

                writers.append(("tb", SummaryWriter(str(self.run_dir / "tb"))))
            except ImportError:
                logger.warning("tensorboardX unavailable; tensorboard logging off")
        if jax.process_index() == 0 and loggers_conf.get("wandb") is not None:
            try:
                import wandb

                wandb.init(project=self.config.project, dir=str(self.run_dir))
                writers.append(("wandb", wandb))
            except ImportError:
                logger.warning("wandb unavailable; wandb logging off")
        return writers

    def _log(self, metrics: dict, step: int):
        for kind, w in self._writers:
            if kind == "tb":
                for k, v in metrics.items():
                    w.add_scalar(k, float(v), step)
            else:
                w.log(metrics, step=step)

    # ---------------------------------------------------------------- loop

    def resume(self, ckpt_path: Path):
        from .checkpoint import load_loop_state

        self.state = restore_train_state(Path(ckpt_path), self.state,
                                         pack_spec=self.pack_spec)
        self.global_step = int(np.asarray(self.state.step))
        loop = load_loop_state(Path(ckpt_path))
        if loop.get("epoch") is not None:
            self.epoch_cursor = int(loop["epoch"])
            self.batch_in_epoch = int(loop.get("batch_in_epoch") or 0)
        else:  # pre-round-3 checkpoint: epoch-boundary approximation
            self.epoch_cursor = self.global_step // max(self.steps_per_epoch, 1)
            self.batch_in_epoch = 0
        logger.info(f"Resumed at step {self.global_step} "
                    f"(epoch {self.epoch_cursor}, batch {self.batch_in_epoch})")

    def aot_warmup_buckets(self, log_fn=None) -> int:
        """Pre-compile the train step for every ARB bucket resolution
        (VERDICT r3 item 3; SURVEY §7.3(2)). The bucket set is finite and
        known up front (BucketManager.resolutions()); lowering + compiling
        each shape now writes every executable into the persistent XLA
        compile cache, so a run (or re-run) pays zero cold compiles when a
        new bucket first appears mid-epoch — the TPU-native replacement for
        the reference's `benchmark=not arb` dodge
        (/root/reference/train.py:106). Returns the number of shapes
        compiled. No-op for non-ARB (single-shape) runs."""
        manager = getattr(self.pipeline.sampler, "bucket_manager", None)
        if manager is None:
            return 0
        # only buckets that can actually produce a batch (empty buckets
        # would waste a 20-40s compile each; real 512px bucket sets have
        # ~25 resolutions of which datasets typically populate a handful)
        sizes = list(manager.resolutions(nonempty_only=True))
        if len(sizes) <= 1:
            return 0

        # Template batch: decode one real batch to learn the exact batch
        # structure (cache vs live images, pooled, tokenized ids, DreamBooth
        # doubling), then retarget only the spatial keys per bucket.
        self.pipeline._apply_epoch(self.epoch_cursor)
        idx = next(self.pipeline._index_batches(), None)
        if idx is None:
            return 0
        template = self._device_batch(self.pipeline._load_batch(idx))

        bs = batch_sharding(self.mesh)
        # VAE downsample factor from the actual architecture (2 for the tiny
        # test VAEs, 8 for SD) — a hardcoded 8 would compile latent shapes
        # that never match real batches (ADVICE r4); same derivation as
        # training/step.py
        f = 2 ** (len(self.spec.vae_config.block_out_channels) - 1)
        spatial = {"images": lambda w, h, a: (a.shape[0], h, w, a.shape[3]),
                   "latents": lambda w, h, a: (a.shape[0], h // f, w // f,
                                               a.shape[3])}
        compiled = 0
        t0 = time.perf_counter()
        with self.mesh:
            for (w, h) in sizes:
                abstract = {}
                for k, v in template.items():
                    shape = spatial[k](w, h, v) if k in spatial else v.shape
                    sharding = (v.sharding if shape == v.shape
                                else bs)
                    abstract[k] = jax.ShapeDtypeStruct(shape, v.dtype,
                                                       sharding=sharding)
                self.train_step.aot_lower(self.state, self.frozen,
                                          abstract).compile()
                compiled += 1
                if log_fn:
                    log_fn(f"AOT bucket warmup {compiled}/{len(sizes)}: "
                           f"{w}x{h}")
        logger.info(f"AOT-compiled {compiled} bucket shapes in "
                    f"{time.perf_counter() - t0:.1f}s")
        return compiled

    def _device_batch(self, batch: dict) -> dict:
        out = {}
        bs = batch_sharding(self.mesh)
        for k, v in batch.items():
            if k in ("ids", "prompts"):
                continue
            arr = np.asarray(v)
            if k in ("uncond_ids", "t5_uncond_ids"):
                out[k] = jax.device_put(arr)  # (1, L): replicated
            else:
                out[k] = jax.device_put(arr, bs)
        return out

    def fit(self, sample_callback=None, max_steps_override: Optional[int] = None,
            final_save: bool = True):
        # Preemption-safe autosave (SURVEY.md §5.3: the reference's only
        # recovery story is checkpoint/resume; we additionally checkpoint on
        # SIGTERM so TPU-VM preemptions resume exactly).
        import signal

        preempted = {"flag": False}

        def _on_sigterm(signum, frame):
            preempted["flag"] = True

        try:
            prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)
        except ValueError:  # not in main thread (tests)
            prev_handler = None

        cfg_t = self.config.trainer
        max_epochs = int(cfg_t.get("max_epochs", 1) or 1)
        max_steps = max_steps_override if max_steps_override is not None \
            else int(cfg_t.get("max_steps", -1) or -1)
        log_every = int(cfg_t.get("log_every_n_steps", 1) or 1)

        # jax.profiler trace capture, a capability the reference lacks
        # entirely (SURVEY.md §5.1): profiler: {enabled, start_step, num_steps, dir}
        prof = self.config.get("profiler", {}) or {}
        prof_enabled = bool(prof.get("enabled", False)) and jax.process_index() == 0
        prof_start = int(prof.get("start_step", 10))
        prof_steps = int(prof.get("num_steps", 5))
        prof_dir = str(prof.get("dir") or (self.run_dir / "profile"))
        prof_active = False

        epoch = self.epoch_cursor
        last_metrics: dict = {}
        # SSDT_STEP_TIMINGS=<path>: append one JSON line per logged step
        # {step, shape, dt} — used by lab/workload4_arb.py to report
        # per-ARB-bucket steps/s and detect mid-run recompile stalls from
        # the real CLI surface. Requires log_every_n_steps: 1 for per-step
        # resolution (the dt is only measured on log steps, where the host
        # metric fetch provides the timing barrier).
        import os as _os

        timings_path = _os.environ.get("SSDT_STEP_TIMINGS")
        if timings_path and jax.process_index() == 0:
            Path(timings_path).write_text("")  # truncate; lines stream below
        t0 = time.perf_counter()
        with self.mesh:
            while epoch < max_epochs:
                self.epoch_cursor = epoch
                # Mid-epoch resume: replay epoch `epoch` deterministically and
                # skip the batches the checkpointed run already consumed.
                self.pipeline.set_epoch(epoch, skip_batches=self.batch_in_epoch)
                for batch in self.pipeline:
                    if prof_enabled and not prof_active and self.global_step == prof_start:
                        jax.profiler.start_trace(prof_dir)
                        prof_active = True

                    dev_batch = self._device_batch(batch)
                    self.state, metrics = self.train_step(self.state, self.frozen, dev_batch)
                    self.global_step += 1
                    self.batch_in_epoch += 1

                    if prof_active and self.global_step >= prof_start + prof_steps:
                        jax.block_until_ready(metrics["train_loss"])
                        jax.profiler.stop_trace()
                        prof_active = False
                        logger.info(f"Wrote profiler trace to {prof_dir}")

                    if self.global_step % log_every == 0:
                        host = {k: float(np.asarray(v)) for k, v in metrics.items()}
                        dt = time.perf_counter() - t0
                        t0 = time.perf_counter()
                        host["steps_per_sec"] = 1.0 / max(dt, 1e-9)
                        last_metrics = host
                        if timings_path and jax.process_index() == 0:
                            import json as _json

                            spatial = next(
                                (tuple(int(d) for d in v.shape)
                                 for k, v in dev_batch.items()
                                 if k in ("images", "latents")), None)
                            with open(timings_path, "a") as tf:
                                tf.write(_json.dumps(
                                    {"step": self.global_step,
                                     "shape": spatial,
                                     "dt": round(dt, 5)}) + "\n")
                        self._log(host, self.global_step)
                        if self.global_step % max(log_every * 10, 10) == 0:
                            logger.info(
                                f"step {self.global_step}: "
                                f"loss={host.get('train_loss', float('nan')):.4f} "
                                f"lr={host.get('lr', 0):.2e} "
                                f"{host.get('steps_per_sec', 0):.2f} steps/s")
                        if not np.isfinite(host.get("train_loss", 0.0)):
                            raise FloatingPointError(
                                f"NaN loss at step {self.global_step}")

                    if sample_callback is not None:
                        sample_callback(self, self.global_step)

                    # _save is collective on multi-host meshes (shard gather
                    # happens on every process; only process 0 writes), so no
                    # process_index gating here.
                    if preempted["flag"]:
                        logger.warning(
                            f"SIGTERM received: autosaving at step {self.global_step}")
                        self._save(epoch, last_metrics)
                        if prev_handler is not None:
                            signal.signal(signal.SIGTERM, prev_handler)
                        return last_metrics

                    if (self.ckpt.every_n_train_steps
                            and self.global_step % int(self.ckpt.every_n_train_steps) == 0):
                        self._save(epoch, last_metrics)

                    if 0 < max_steps <= self.global_step:
                        if final_save:
                            self._save(epoch, last_metrics)
                        if prev_handler is not None:
                            signal.signal(signal.SIGTERM, prev_handler)
                        return last_metrics

                epoch += 1
                self.batch_in_epoch = 0
                self.epoch_cursor = epoch
                if (self.ckpt.every_n_epochs and epoch % int(self.ckpt.every_n_epochs) == 0):
                    self._save(epoch, last_metrics)

        if prev_handler is not None:
            signal.signal(signal.SIGTERM, prev_handler)
        return last_metrics

    def _save(self, epoch: int, metrics: dict):
        all_metrics = {"epoch": epoch, "step": self.global_step, **metrics}
        self.ckpt.save(self.state, self.frozen, all_metrics,
                       loop_state={"epoch": epoch,
                                   "batch_in_epoch": self.batch_in_epoch},
                       pack_spec=self.pack_spec,
                       extra_meta={"ti_tokens": self.ti_meta} if self.ti_meta
                       else None)

    # ------------------------------------------------------------- sampling

    def natural_trainable(self) -> dict:
        """state.trainable with packs expanded to natural per-leaf names
        (host views for pack members, device arrays for big leaves)."""
        from .packing import unpack_host

        return unpack_host(self.state.trainable, self.pack_spec)

    def merged_inference_params(self) -> dict:
        """Current frozen+trainable view for sampling/export (LoRA factors
        stay as runtime deltas; unet_apply consumes them directly).

        Unpacks ON DEVICE (one jitted program): a host unpack would fetch
        the full packed trainable (GBs) through the remote tunnel on every
        in-training sampling call."""
        merged = dict(self.frozen)
        if self.pack_spec is None:
            merged.update(self.state.trainable)
            return merged
        from .packing import unpack

        spec = self.pack_spec
        merged.update(jax.jit(lambda p: unpack(p, spec))(self.state.trainable))
        return merged
