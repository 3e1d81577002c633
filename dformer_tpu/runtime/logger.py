"""Rank-0-gated logging (reference utils/engine/logger.py:102-120)."""

import logging
import os
import sys
from typing import Optional

_FORMAT = "%(asctime)s %(levelname)s %(message)s"


def get_logger(log_dir: Optional[str] = None, log_file: Optional[str] = None,
               rank: int = 0, name: str = "dformer_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO if rank == 0 else logging.WARNING)
    logger.propagate = False
    if logger.handlers:
        return logger
    if rank == 0:
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(logging.Formatter(_FORMAT, "%y%m%d %H:%M:%S"))
        logger.addHandler(sh)
        if log_dir and log_file:
            os.makedirs(log_dir, exist_ok=True)
            fh = logging.FileHandler(log_file)
            fh.setFormatter(logging.Formatter(_FORMAT, "%y%m%d %H:%M:%S"))
            logger.addHandler(fh)
    else:
        logger.addHandler(logging.NullHandler())
    return logger
