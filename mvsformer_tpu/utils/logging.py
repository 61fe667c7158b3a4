"""Run logging: console + rotating file handler.

Spec: /root/reference/logger/logger.py + logger_config.json — dictConfig with
a console handler and a rotating `info.log` in the run directory.
"""

from __future__ import annotations

import logging
import logging.handlers
import os


def setup_logging(run_dir: str, level=logging.INFO) -> logging.Logger:
    os.makedirs(run_dir, exist_ok=True)
    logger = logging.getLogger("mvsformer_tpu")
    logger.setLevel(level)
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)s - %(levelname)s - %(message)s")

    console = logging.StreamHandler()
    console.setFormatter(logging.Formatter("%(message)s"))
    logger.addHandler(console)

    rotating = logging.handlers.RotatingFileHandler(
        os.path.join(run_dir, "info.log"), maxBytes=10 * 1024 * 1024,
        backupCount=5)
    rotating.setFormatter(fmt)
    logger.addHandler(rotating)
    return logger
