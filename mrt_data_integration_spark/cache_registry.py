"""Session-lifetime cache tracker.

Dedup operators persist their exploded shingle frames (several consumers,
one tokenize+md5 pass — operators/dedup.py) but hand the caller a *lazy*
result, so they cannot unpersist the inputs themselves. Tests release via
``operators.dedup.release_cache``; the grading driver never does, so over a
50-query session the persisted frames would accumulate for the life of the
SparkContext.

Every persist on a driver-reachable path registers here via
``track_cache``; the query registry sweeps all previously tracked frames at
the start of the *next* query invocation (the prior query's result has been
collected by then), and again at interpreter exit.
"""

from __future__ import annotations

import atexit

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def track_cache(df: DataFrame) -> DataFrame:
    """Register a persisted frame for the next registry sweep."""
    _TRACKED.append(df)
    return df


def untrack(df: DataFrame) -> None:
    """Drop a frame from the tracker (caller already unpersisted it)."""
    try:
        _TRACKED.remove(df)
    except ValueError:
        pass


def sweep_caches() -> int:
    """Unpersist every tracked frame; returns the number released."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # context already stopped — nothing to release
    return n


atexit.register(sweep_caches)
