"""Structured per-iteration fit logging.

Python analog of Spark ML's ``Instrumentation`` (the reference wraps every
fit in it, e.g. BaggingRegressor.scala:119-131, and logs per-round progress
from its sequential loops): one line per boosting/GBM iteration with the
round's error, step size, and cumulative wall time — the signal needed to
debug a 100-iteration GBM fit that has gone flat or slow, without touching
the hot path (each line costs one driver-side string format of numbers the
loop has ALREADY aggregated; no extra Spark jobs).

Off by default. Enable with ``SPARK_ENSEMBLE_VERBOSE_FIT=1`` in the
environment (installs a stderr handler at INFO on import) or by configuring
the ``spark_ensemble_spark.fit`` logger like any other Python logger.
"""

from __future__ import annotations

import logging
import os
import time

LOGGER_NAME = "spark_ensemble_spark.fit"

_log = logging.getLogger(LOGGER_NAME)

if os.environ.get("SPARK_ENSEMBLE_VERBOSE_FIT", "").lower() not in ("", "0", "false"):
    if not _log.handlers:
        _h = logging.StreamHandler()
        _h.setFormatter(logging.Formatter("%(asctime)s %(message)s"))
        _log.addHandler(_h)
    _log.setLevel(logging.INFO)


class FitInstrumentation:
    """Per-fit scope: stamps the estimator uid on each line and tracks
    cumulative wall time from construction (= fit start)."""

    def __init__(self, estimator_uid: str, num_rounds: int) -> None:
        self.uid = estimator_uid
        self.num_rounds = num_rounds
        self.t0 = time.time()

    def iteration(self, i: int, **metrics: float) -> None:
        if not _log.isEnabledFor(logging.INFO):
            return
        parts = " ".join(
            f"{k}={v:.6g}" if isinstance(v, float) else f"{k}={v}"
            for k, v in metrics.items()
            if v is not None
        )
        _log.info(
            "%s iter=%d/%d %s elapsed=%.2fs",
            self.uid,
            i + 1,
            self.num_rounds,
            parts,
            time.time() - self.t0,
        )

    def done(self, n_models: int, reason: str = "completed") -> None:
        if not _log.isEnabledFor(logging.INFO):
            return
        _log.info(
            "%s fit %s: %d model(s) in %.2fs",
            self.uid,
            reason,
            n_models,
            time.time() - self.t0,
        )
