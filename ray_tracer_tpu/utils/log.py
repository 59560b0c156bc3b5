"""Host-0 structured logging.

The reference logs with bare printf on its single process
(Parallel/raytracer.cu:678-706).  In a multi-host job only process 0
should narrate; everyone can still force-log with `all_hosts=True`.
"""

from __future__ import annotations

import logging
import sys

import jax

_FORMAT = "%(asctime)s %(name)s %(levelname)s %(message)s"


class _Host0Filter(logging.Filter):
    def filter(self, record: logging.LogRecord) -> bool:
        if getattr(record, "all_hosts", False):
            return True
        try:
            return jax.process_index() == 0
        except Exception:
            return True


def get_logger(name: str = "ray_tracer_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter(_FORMAT))
        handler.addFilter(_Host0Filter())
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
        logger.propagate = False
    return logger
