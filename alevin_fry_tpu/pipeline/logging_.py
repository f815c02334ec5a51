"""Stage logging (the reference uses slog with timestamped terminal
output, src/main.rs:263-272; we use stdlib logging to stderr)."""

from __future__ import annotations

import logging
import sys

_CONFIGURED = False


def get_logger(name: str) -> logging.Logger:
    global _CONFIGURED
    if not _CONFIGURED:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(
            logging.Formatter(
                "%(asctime)s %(levelname)s [%(name)s] %(message)s",
                datefmt="%Y-%m-%d %H:%M:%S",
            )
        )
        root = logging.getLogger("aft")
        root.addHandler(h)
        root.setLevel(logging.INFO)
        _CONFIGURED = True
    return logging.getLogger(f"aft.{name}")
