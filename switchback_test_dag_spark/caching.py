"""Session-wide registry for operator-pinned persisted frames.

Several operators persist a small intermediate on purpose — either as a
CollapseProject barrier (dedup shingle frames) or because multiple consumers
would otherwise re-scan the fact table (counterpart means, shared simulation
moments). Those persists are load-bearing, but long-lived sessions (benchmark
loops, services) must be able to drop them: this registry tracks every pin so
callers can release everything after materializing a returned plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PINNED: list[DataFrame] = []


def pin(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for later release. Returns ``df``."""
    _PINNED.append(df)
    return df.persist()


def release_all(blocking: bool = False) -> None:
    """Unpersist every pinned frame (all modules). Call after the plans built
    from them have been materialized (collect/count/write)."""
    while _PINNED:
        _PINNED.pop().unpersist(blocking)


def mark() -> int:
    """Watermark into the pin registry — pair with :func:`release_since` to
    release exactly the pins an enclosed computation created (a long-lived
    job, e.g. a foreachBatch callback, must not ``release_all`` and drop
    pins its CALLER still holds)."""
    return len(_PINNED)


def release_since(marker: int, blocking: bool = False) -> None:
    """Unpersist every frame pinned after ``marker`` (from :func:`mark`)."""
    while len(_PINNED) > marker:
        _PINNED.pop().unpersist(blocking)
