"""Structured logging.

The reference uses bare prints with a FIXME to adopt a logging
framework (reference: main.py:439-440, 453); here we use stdlib
logging with a package-level logger.
"""

import logging
import sys

_CONFIGURED = False


def get_logger(name: str = "nestfit_tpu") -> logging.Logger:
    global _CONFIGURED
    logger = logging.getLogger(name)
    if not _CONFIGURED:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(
            logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s")
        )
        root = logging.getLogger("nestfit_tpu")
        if not root.handlers:
            root.addHandler(handler)
        root.setLevel(logging.INFO)
        _CONFIGURED = True
    return logger
