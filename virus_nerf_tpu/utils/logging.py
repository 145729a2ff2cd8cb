"""Colored terminal + file logging.

Counterpart of the reference's logger setup
(reference: args/args.py:165-192, args/logging_formatter.py:1-75).
"""

from __future__ import annotations

import logging
import os

_COLORS = {
    logging.DEBUG: "\x1b[38;21m",
    logging.INFO: "\x1b[38;5;39m",
    logging.WARNING: "\x1b[38;5;226m",
    logging.ERROR: "\x1b[38;5;196m",
    logging.CRITICAL: "\x1b[31;1m",
}
_RESET = "\x1b[0m"


class _ColorFormatter(logging.Formatter):
    def format(self, record):
        color = _COLORS.get(record.levelno, "")
        fmt = f"{color}%(asctime)s %(levelname)s{_RESET} %(message)s"
        return logging.Formatter(fmt, datefmt="%H:%M:%S").format(record)


def make_logger(cfg=None, name: str = "virus_nerf_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(logging.INFO)
    sh = logging.StreamHandler()
    sh.setFormatter(_ColorFormatter())
    logger.addHandler(sh)
    if cfg is not None and getattr(cfg, "save_dir", None):
        os.makedirs(cfg.save_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(cfg.save_dir, "log.txt"))
        fh.setFormatter(
            logging.Formatter("%(asctime)s %(levelname)s %(message)s")
        )
        logger.addHandler(fh)
    logger.propagate = False
    return logger
