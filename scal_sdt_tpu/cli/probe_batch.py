"""One batch-size trial for the auto batch-size tuner.

Runs a few real train steps at ``--batch-size`` in THIS process and exits:
0 = fits, 3 = device OOM, anything else = real error. Invoked as a
subprocess by ``training.tuner`` so every trial gets a fresh TPU context
(the analogue of Lightning's in-process ``auto_scale_batch_size`` trials,
/root/reference/train.py:127-130).
"""

from __future__ import annotations

import logging
import sys
import tempfile
from pathlib import Path

import click

from .. import conf

logger = logging.getLogger("probe_batch")

OOM_MARKERS = ("RESOURCE_EXHAUSTED", "Out of memory", "out of memory",
               "Allocation failure", "OOM")


@click.command()
@click.option("--config", "config_path", required=True,
              type=click.Path(exists=True, dir_okay=False, path_type=Path))
@click.option("--batch-size", type=int, required=True)
@click.option("--steps", type=int, default=3)
def main(config_path: Path, batch_size: int, steps: int):
    config = conf.load_with_defaults(config_path)
    config.batch_size = batch_size
    # keep the trial hermetic: no loggers, no checkpoints, no sampling
    config.loggers = {}
    config.checkpoint = {}
    config.sampling = None

    from ..training.trainer import Trainer

    try:
        with tempfile.TemporaryDirectory() as run_dir:
            trainer = Trainer(config, Path(run_dir))
            # final_save=False keeps the trial hermetic: a probe must not pay
            # a multi-GB checkpoint gather per trial, and a failing save would
            # surface as a non-OOM error that aborts the whole tuning run.
            trainer.fit(max_steps_override=steps, final_save=False)
    except Exception as e:  # noqa: BLE001 - exit code IS the result
        msg = f"{type(e).__name__}: {e}"
        if any(m in msg for m in OOM_MARKERS):
            logger.info(f"batch_size={batch_size}: OOM")
            sys.exit(3)
        logger.error(msg)
        raise
    logger.info(f"batch_size={batch_size}: ok")


if __name__ == "__main__":
    logging.basicConfig(level="INFO")
    main()
