"""Process-zero-gated logging (reference: modules/utils/logging.py:7-14).

On a multi-host TPU slice every host runs the same program; only process 0
should emit console logs, write samples, or push metrics.
"""

from __future__ import annotations

import logging


def is_main_process() -> bool:
    import jax

    return jax.process_index() == 0


class _MainProcessFilter(logging.Filter):
    def filter(self, record: logging.LogRecord) -> bool:
        try:
            return is_main_process()
        except Exception:
            return True


def main_process_logger(name: str = "scal-sdt-tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if not any(isinstance(f, _MainProcessFilter) for f in logger.filters):
        logger.addFilter(_MainProcessFilter())
    return logger
