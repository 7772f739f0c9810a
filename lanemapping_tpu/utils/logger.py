"""Logging helpers (reference `baseline/utils/logger.py:6-25`), extended with
a JSONL metric writer and jax.profiler trace annotations (SURVEY.md §5.1:
the reference has no tracing — wall-clock prints only)."""

from __future__ import annotations

import contextlib
import json
import logging
import os
import time
from typing import Dict, Optional


def get_logger(name: str = "lanemapping",
               log_file: Optional[str] = None,
               level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(level)
    fmt = logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s")
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file:
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


class MetricWriter:
    """Append-only JSONL metric stream, one file per tag (replaces the
    reference's TensorBoard scalars + train/val txt appenders,
    `runner.py:84,154-157,188-200`)."""

    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)

    def write(self, tag: str, record: Dict) -> None:
        with open(os.path.join(self.log_dir, f"{tag}.jsonl"), "a") as f:
            f.write(json.dumps(record) + "\n")


@contextlib.contextmanager
def trace_span(name: str):
    """jax.profiler annotation + wall-clock span."""
    import jax

    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    dt = time.perf_counter() - t0
    get_logger().debug("%s took %.1f ms", name, dt * 1e3)


def start_profiler_trace(log_dir: str) -> None:
    import jax

    jax.profiler.start_trace(os.path.join(log_dir, "profile"))


def stop_profiler_trace() -> None:
    import jax

    jax.profiler.stop_trace()
