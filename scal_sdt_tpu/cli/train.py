"""Training CLI (reference: /root/reference/train.py).

``python train.py --config cfg.yaml [--run-id ID] [--resume ckpt]``

Same run-dir layout and resume semantics: checkpoints land in
``<output_dir>/<project>/<run_id>/``, the resolved config is snapshotted to
``config.yaml`` there, and ``--resume`` reloads that snapshot next to the
checkpoint (train.py:21-26,132).
"""

from __future__ import annotations

import logging
import time
from pathlib import Path
from typing import Optional

import click

from .. import conf
from ..training.sample_callback import SampleCallback
from ..training.trainer import Trainer
from ..utils.logging import main_process_logger

logger = logging.getLogger("train")


def generate_run_id() -> str:
    return time.strftime("%y%m%d-%H%M%S")


def get_resuming_config(ckpt_path: Path):
    config_yaml = ckpt_path.parent / "config.yaml"
    if not config_yaml.is_file():
        raise FileNotFoundError("Config not found for the checkpoint specified")
    return conf.load(config_yaml)


def verify_config(config):
    """Fail-fast validation (reference train.py:34-49)."""
    concepts = config.data.concepts
    have_concepts = bool(concepts)

    if have_concepts and config.data.get("cache") is not None:
        logger.warning("Concepts are set but unused since a cache is specified")
    elif not have_concepts and config.data.get("cache") is None:
        raise ValueError("No concept found and cache file is not specified")

    if not config.prior_preservation.get("enabled", False):
        if any(c.get("class_set") is not None for c in concepts):
            logger.warning("Prior preservation disabled but a concept has a class set")
    elif not all(c.get("class_set") is not None for c in concepts):
        raise ValueError("Prior preservation enabled but not all concepts have class sets")


@click.command()
@click.option("--config", "config_path",
              type=click.Path(exists=True, dir_okay=False, path_type=Path),
              default=None, help="Path to the training config file.")
@click.option("--run-id", type=str, default=None,
              help="Run id for the checkpoint directory (default: timestamp).")
@click.option("--resume", "resume_ckpt_path",
              type=click.Path(exists=True, dir_okay=False, path_type=Path),
              default=None,
              help="Resume from this checkpoint; its run config.yaml is reloaded.")
def main(config_path: Optional[Path], run_id: Optional[str],
         resume_ckpt_path: Optional[Path]):
    # Multi-host slices: initialize the JAX distributed runtime when launched
    # under a multi-process coordinator (the analogue of the reference's
    # `trainer.num_nodes`, SURVEY.md §5.8). Single-host runs skip this.
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
        import jax

        jax.distributed.initialize()

    if config_path is not None:
        config = conf.load_with_defaults(config_path)
    elif resume_ckpt_path is not None:
        config = get_resuming_config(resume_ckpt_path)
    else:
        raise click.UsageError("Either --config or --resume must be specified")

    if run_id is None:
        run_id = generate_run_id()
    run_dir = Path(config.output_dir, config.project, run_id)
    run_dir.mkdir(parents=True, exist_ok=True)

    verify_config(config)
    logger.info(f"Run ID: {run_id}")

    # Auto batch-size tuning (reference trainer.tune(), train.py:127-130:
    # skipped when resuming). Runs BEFORE this process touches the TPU so
    # each subprocess trial gets a clean device.
    if (resume_ckpt_path is None and config_path is not None
            and config.trainer.get("auto_scale_batch_size", False)):
        import jax

        if jax.process_count() > 1:
            # Probe subprocesses cannot join the multi-host slice, and
            # per-host searches could pick different batch sizes and deadlock
            # the collectives. Skip loudly rather than desync.
            logger.warning(
                "auto_scale_batch_size is single-host only; skipping on a "
                f"{jax.process_count()}-process slice (set batch_size "
                "explicitly for multi-host runs)")
        else:
            from ..training.tuner import tune_batch_size

            config.batch_size = tune_batch_size(config, config_path)

    # Persistent XLA compile cache (utils/compile_cache.py): bounds the
    # per-bucket-shape cold-compile cost of ARB runs to the first run ever.
    # Opt out with trainer.compilation_cache: false.
    if config.trainer.get("compilation_cache", True):
        from ..utils.compile_cache import enable_persistent_compilation_cache

        cache_dir = enable_persistent_compilation_cache(
            config.trainer.get("compilation_cache_dir"))
        logger.info(f"Persistent XLA compile cache: {cache_dir}")

    trainer = Trainer(config, run_dir)
    if resume_ckpt_path is not None:
        trainer.resume(resume_ckpt_path)

    conf.save(config, run_dir / "config.yaml")

    # AOT-compile every ARB bucket shape up front (no-op for fixed-res runs)
    # so no mid-epoch stall when a new bucket first appears. Opt out with
    # trainer.aot_bucket_warmup: false.
    if config.trainer.get("aot_bucket_warmup", True):
        trainer.aot_warmup_buckets(log_fn=logger.info)

    trainer.fit(sample_callback=SampleCallback(run_dir / "samples"))


if __name__ == "__main__":
    logging.basicConfig(level="INFO")
    main()
