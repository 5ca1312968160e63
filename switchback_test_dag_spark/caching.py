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


def barrier(df: DataFrame) -> DataFrame:
    """Pin ``df`` AND truncate its logical plan: ``localCheckpoint`` returns a
    frame rooted at a ``LogicalRDD`` (a leaf), so downstream transformations
    analyze an O(1) tree instead of re-walking — and, at self-joins, re-copying
    — the whole upstream lineage.

    Why this exists next to :func:`pin`: persist() keeps the full logical
    plan, so a frame consumed by several branches (shingle postings feeding a
    pair self-join; a scrubbed corpus feeding dedup AND stats) embeds its
    lineage once PER REFERENCE, and the analyzer's DeduplicateRelations pass
    then deep-copies one side of every such join — plan size and per-
    transformation analysis cost compound multiplicatively down a pipeline
    (measured: the composed cleaning query reached 5,459 plan operators and
    369 leaf scans, ~10 s of driver-side construction at sf0.1; with barriers
    at the multiplication points it is a few hundred operators). The barrier
    is evaluated per invocation — nothing survives across runs — and with
    ``eager=False`` map-only subtrees stay fully lazy (AQE materializes only
    the exchange stages of the subtree at construction).

    Trade-off (documented, deliberate): a localCheckpoint is not fault-
    tolerant — on a cluster, losing an executor that holds checkpointed
    partitions fails the job instead of recomputing the lineage. Use
    :func:`pin` for frames where recompute-on-loss or CacheManager plan
    matching matters; use ``barrier`` for bounded intermediates whose
    re-reference blowup dominates.

    Release: ``release_all``/``release_since`` unpersist the checkpointed
    RDD directly (a checkpointed frame is invisible to the CacheManager, so
    ``DataFrame.unpersist`` alone would leak it until GC)."""
    out = df.localCheckpoint(eager=False)
    _PINNED.append(out)
    return out


def _release(df: DataFrame, blocking: bool) -> None:
    try:
        plan = df._jdf.queryExecution().logical()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(blocking)
            return
    except Exception:  # noqa: BLE001 - fall through to the cache-manager path
        pass
    df.unpersist(blocking)


def release_all(blocking: bool = False) -> None:
    """Unpersist every pinned frame (all modules). Call after the plans built
    from them have been materialized (collect/count/write)."""
    while _PINNED:
        _release(_PINNED.pop(), blocking)


def mark() -> int:
    """Watermark into the pin registry — pair with :func:`release_since` to
    release exactly the pins an enclosed computation created (a long-lived
    job, e.g. a foreachBatch callback, must not ``release_all`` and drop
    pins its CALLER still holds)."""
    return len(_PINNED)


def release_since(marker: int, blocking: bool = False) -> None:
    """Unpersist every frame pinned after ``marker`` (from :func:`mark`)."""
    while len(_PINNED) > marker:
        _release(_PINNED.pop(), blocking)
