import logging
import sys


def setup_logging(name="", level="INFO", color=False, fmt=None, stream=None):
    logger = logging.getLogger(name)
    logger.setLevel(level)
    if not any(isinstance(h, logging.StreamHandler) for h in logger.handlers):
        handler = logging.StreamHandler(stream or sys.stdout)
        if fmt:
            handler.setFormatter(logging.Formatter(fmt))
        logger.addHandler(handler)
