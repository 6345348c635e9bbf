"""Auto batch-size tuning (reference ``trainer.tune()`` /
``auto_scale_batch_size``, /root/reference/train.py:127-130).

Lightning's tuner runs trial steps at growing batch sizes inside the training
process and rolls the model back afterwards. On TPU that in-process approach
is wrong twice over: a state rollback would double HBM use (defeating the
probe), and a genuine allocator OOM can leave the client unusable. So each
trial runs in a SUBPROCESS — a fresh TPU context executing a few real train
steps via ``scal_sdt_tpu.cli.probe_batch`` — and the parent only parses the
exit code. Search modes match Lightning: ``power`` doubles until failure and
keeps the last success; ``binsearch`` then bisects the failure interval.
"""

from __future__ import annotations

import logging
import subprocess
import sys
from pathlib import Path
from typing import Callable, Optional

logger = logging.getLogger("tuner")

# exit codes of cli/probe_batch.py
PROBE_OK = 0
PROBE_OOM = 3


def search_batch_size(trial: Callable[[int], bool], init_bs: int = 1,
                      mode: str = "power", max_trials: int = 25,
                      max_bs: Optional[int] = None) -> int:
    """Largest batch size for which ``trial`` succeeds.

    Pure search logic (injectable ``trial`` keeps it unit-testable without a
    device). Returns 0 if even ``init_bs`` fails.
    """
    if mode not in ("power", "binsearch"):
        raise ValueError(f"Unknown auto_scale_batch_size mode: {mode!r}")

    best = 0
    bs = max(int(init_bs), 1)
    failed_at: Optional[int] = None
    for _ in range(max_trials):
        if max_bs is not None and bs > max_bs:
            break
        logger.info(f"Batch-size probe: trying {bs}")
        if trial(bs):
            best = bs
            bs *= 2
        else:
            failed_at = bs
            break

    if mode == "binsearch" and failed_at is not None and best > 0:
        lo, hi = best, failed_at  # lo succeeded, hi failed
        while hi - lo > 1:
            mid = (lo + hi) // 2
            logger.info(f"Batch-size probe (bisect): trying {mid}")
            if trial(mid):
                lo = mid
            else:
                hi = mid
        best = lo
    return best


def subprocess_trial(config_path: Path, steps: int = 3,
                     timeout: int = 900) -> Callable[[int], bool]:
    """Trial runner executing ``probe_batch`` in a clean TPU subprocess."""

    def trial(bs: int) -> bool:
        cmd = [sys.executable, "-m", "scal_sdt_tpu.cli.probe_batch",
               "--config", str(config_path), "--batch-size", str(bs),
               "--steps", str(steps)]
        try:
            proc = subprocess.run(cmd, capture_output=True, timeout=timeout)
        except subprocess.TimeoutExpired:
            logger.warning(f"Batch-size probe at {bs} timed out; treating as failure")
            return False
        if proc.returncode == PROBE_OK:
            return True
        if proc.returncode == PROBE_OOM:
            logger.info(f"Batch size {bs}: out of memory")
            return False
        tail = proc.stderr.decode(errors="replace")[-2000:]
        raise RuntimeError(
            f"Batch-size probe at {bs} failed for a non-OOM reason "
            f"(rc={proc.returncode}):\n{tail}")

    return trial


def tune_batch_size(config, config_path: Path) -> int:
    """Resolve ``trainer.auto_scale_batch_size`` into a concrete batch size
    and return it (reference semantics: skipped when resuming)."""
    setting = config.trainer.get("auto_scale_batch_size", False)
    if not setting:
        return int(config.batch_size)
    mode = setting if isinstance(setting, str) else "power"
    best = search_batch_size(
        subprocess_trial(Path(config_path)),
        init_bs=int(config.batch_size), mode=mode)
    if best <= 0:
        raise RuntimeError(
            f"Auto batch-size tuning: even batch_size={config.batch_size} "
            f"does not fit in device memory")
    logger.info(f"Auto batch-size tuning selected batch_size={best}")
    return best
