"""Structured-Streaming ingestion of the events fact with switchback-bucket
tumbling windows.

The reference is batch-only (its DAG runs ``@daily`` —
`dags/switchback_test_dag.py:29`), so this is the Spark-native extension SURVEY
§2.9 sketches: the switchback "time unit" (orders floored to a window,
`notebooks/switchback_analysis.ipynb:158`) maps 1:1 onto a tumbling
``window(ts, ...)`` aggregation, and the watermark bounds state for late orders.
The same aggregation expression tree is shared with the batch path, so a
micro-batch ``availableNow`` run over a parquet directory must produce exactly
the batch answer — which is what tests/test_streaming.py asserts.

Scale notes: the streaming agg is keyed by (window, group-cols) — state size is
O(active windows × groups), independent of row volume; the watermark evicts
closed windows. File-source ingestion lists new files per micro-batch, so a
100 TB backfill is bounded by ``maxFilesPerTrigger``, not memory.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_events(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """``readStream`` over the events parquet (file or directory path).

    Schema comes from a batch read of the same path (file streams require an
    explicit schema). Whatever the parquet's physical timestamp type (ns BIGINT
    via ``spark.sql.legacy.parquet.nanosAsLong``, or native µs TIMESTAMP),
    the stream exposes a µs ``ts`` timestamp plus the exact ``ts_ns`` long —
    same contract as ``io.load_table``.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if os.path.isfile(path):
        # file-stream sources need a directory; narrow a single-file fixture
        # path to its parent + glob filter
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    from ..io import normalize_events_ts

    return normalize_events_ts(reader.parquet(path))


def stream_jsonl_events(
    spark: SparkSession,
    path: str,
    schema,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """``readStream`` over JSON-lines events (the interchange format twin of
    :func:`stream_events`): what a pipeline sees when an upstream system
    drops JSONL files into a landing directory instead of parquet.

    ``schema`` is REQUIRED (StructType or DDL string) — unlike parquet,
    JSONL is not self-describing, and schema inference on a stream is both
    an extra scan and a type-drift hazard (``io.read_jsonl_table``'s
    discipline). Timestamps parse under the same µs-precise format the
    batch writer emits, and the output carries the package-wide events
    contract (µs ``ts`` + exact ``ts_ns``) via the shared normalizer, so
    every windowed operator downstream is source-agnostic."""
    from ..io import _TS_FMT, normalize_events_ts

    reader = (
        spark.readStream.schema(schema)
        .option("mode", "FAILFAST")
        .option("timestampFormat", _TS_FMT)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if os.path.isfile(path):
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    return normalize_events_ts(reader.json(path))


def windowed_bucket_metrics(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    by: Sequence[str] = ("event_type",),
    value_col: str = "value",
    exact_decimals: bool = False,
) -> DataFrame:
    """Per-(switchback-bucket, segment) KPI aggregation, streaming-safe.

    Emits bucket start/end, row count and mean/sum of the KPI — the streaming
    twin of the batch time-unit aggregation (SURVEY §2.4 A5). Works on batch
    DataFrames too (watermark is a no-op there), which is how the differential
    test pins equivalence.

    ``exact_decimals`` switches mean/sum to order-independent integer
    micro-unit arithmetic (2-decimal results, ``exact.py``): integer sums are
    streaming-safe partial aggregates, and the value cannot move with shuffle
    or micro-batch order — the form the oracle-checked registry query uses.
    """
    from switchback_test_dag_spark.exact import spark_micro_avg, spark_micro_sum

    v = F.col(value_col).cast("double")
    with_wm = events.withWatermark("ts", watermark) if events.isStreaming else events
    if exact_decimals:
        aggs = [
            F.count(F.lit(1)).alias("n_events"),
            spark_micro_avg(value_col).alias("mean_value"),
            spark_micro_sum(value_col).alias("sum_value"),
        ]
    else:
        aggs = [
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg(v), 6).alias("mean_value"),
            F.round(F.sum(v), 6).alias("sum_value"),
        ]
    return (
        with_wm.groupBy(F.window("ts", window).alias("bucket"), *by)
        .agg(*aggs)
        .select(
            F.col("bucket.start").alias("bucket_start"),
            F.col("bucket.end").alias("bucket_end"),
            *by,
            "n_events",
            "mean_value",
            "sum_value",
        )
    )


def run_stream_to_memory(
    df: DataFrame,
    query_name: str,
    checkpoint_dir: str,
    timeout_sec: int = 300,
    output_mode: str = "complete",
    checkpoint_name: str | None = None,
) -> None:
    """Drain a streaming DataFrame into the in-memory sink with one
    ``availableNow`` pass. ``complete`` re-emits full state each trigger;
    ``append`` emits each window exactly once — after the watermark passes its
    end — and silently drops later-than-watermark input, which is the
    semantics a production sink sees (and what the late-data test pins).
    ``checkpoint_name`` lets a resumed run share state under a new query/table
    name (the memory sink is per-query, the checkpoint is the durable part)."""
    q = (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option(
            "checkpointLocation",
            os.path.join(checkpoint_dir, checkpoint_name or query_name),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    if q.isActive:
        q.stop()
        raise TimeoutError(f"stream {query_name} did not finish in {timeout_sec}s")


def stream_dedup(
    events: DataFrame,
    key_cols: Sequence[str],
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact deduplication with BOUNDED state — the training-data
    dedup operator on the ingest path (batch form: ``text/dedup.exact_dedup``).

    ``dropDuplicatesWithinWatermark`` keeps a key only until the watermark
    passes its event time, so state is O(keys per watermark window) instead
    of O(all keys ever) — the property that lets a 100 TB/day ingest dedup
    run forever. Duplicates arriving within the watermark of the first
    sighting are dropped; a key can legitimately reappear after the
    watermark expires (at-least-once semantics downstream of the horizon —
    callers wanting forever-exactness compose with a batch
    ``exact_dedup`` compaction). On a BATCH frame this degrades to plain
    ``dropDuplicates`` (same keys, no time horizon), which is how the
    differential test pins the stream path."""
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            list(key_cols)
        )
    return events.dropDuplicates(list(key_cols))


def session_window_sessions(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    by: Sequence[str] = ("user_id",),
    keep_event_time: bool = False,
) -> DataFrame:
    """Streaming sessionization via native ``session_window`` — the streaming
    twin of the batch gap sessionization (``queries_relational.event_sessions``
    uses the same expression in batch mode, where it is oracle-checked against
    the classic gaps-and-islands SQL).

    Dynamic-length windows merge in the aggregation state per key; the
    watermark closes (and evicts) a session once event time passes its end +
    gap, so state is O(open sessions per key), bounded regardless of stream
    volume. In append mode each session emits exactly once, on close — the
    shape a downstream session-fact sink wants; ``session_end`` is the
    TIMESTAMP column such a sink would partition/cluster on. Works on batch
    frames too (watermark no-op), which is how the differential test pins
    equivalence.

    ``keep_event_time=True`` additionally retains the raw ``session`` struct
    — the column that CARRIES the event-time watermark metadata — so the
    output can feed another stateful operator (a chained windowed
    aggregation, a stream-stream join) without re-declaring a watermark;
    plucking only ``session.start``/``session.end`` scalars drops that
    metadata."""
    with_wm = events.withWatermark("ts", watermark) if events.isStreaming else events
    agg = with_wm.groupBy(*by, F.session_window("ts", gap).alias("session")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    cols = [
        *by,
        F.col("session.start").alias("session_start"),
        F.col("session.end").alias("session_end"),
        "n_events",
    ]
    if keep_event_time:
        cols.append(F.col("session"))
    return agg.select(*cols)


def running_group_moments(
    events: DataFrame,
    by: Sequence[str] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """Custom stateful operator: running (count, mean, M2) per group via
    ``applyInPandasWithState`` — the cumulative-moment monitor a live
    switchback test needs (sequential looks at the KPI without re-scanning
    history).

    Each micro-batch folds its rows into the group's Welford state with the
    parallel-merge recurrence (numerically stable, associative), then emits
    the updated cumulative row. State per group is three scalars — O(groups),
    independent of stream volume — and is the exact quantity the batch
    t/Welch tests (stats/ttests.py) consume, so a drained stream's final
    emission must equal the batch aggregation (tests/test_streaming.py).
    Group-key columns keep their INPUT types in the output schema (an int
    bucket key stays an int — no silent stringification)."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    by = list(by)
    out_schema = StructType(
        [StructField(c, events.schema[c].dataType) for c in by]
        + [
            StructField("n", LongType()),
            StructField("mean", DoubleType()),
            StructField("m2", DoubleType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        if state.exists:
            n, mean, m2 = state.get
        else:
            n, mean, m2 = 0, 0.0, 0.0
        for pdf in pdfs:
            vals = pd.to_numeric(pdf[value_col], errors="coerce").dropna()
            nb = int(len(vals))
            if nb == 0:
                continue
            mb = float(vals.mean())
            m2b = float(((vals - mb) ** 2).sum())
            delta = mb - mean
            tot = n + nb
            mean = mean + delta * nb / tot
            m2 = m2 + m2b + delta * delta * n * nb / tot
            n = tot
        state.update((n, mean, m2))
        yield pd.DataFrame([dict(zip(by, key)) | {"n": n, "mean": mean, "m2": m2}])

    return events.groupBy(*by).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType="n bigint, mean double, m2 double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _corpus_dedup_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    id_col: str,
    text_col: str,
    index_path: str,
    out_path: str,
) -> None:
    """One :func:`stream_corpus_dedup` micro-batch — module-level so the
    replay-safety contract (a failed batch N replayed from the checkpoint
    must reproduce, not lose, its output) is directly testable by calling
    it twice with the same ``batch_id``."""
    from switchback_test_dag_spark.caching import mark, release_since
    from switchback_test_dag_spark.io import read_batch_state
    from switchback_test_dag_spark.text.dedup import exact_dedup_incremental

    # scoped-release symmetry with the near-dedup sibling: the incremental
    # operator pins nothing today, but a future pin inside it must not leak
    # persisted frames across a long-lived stream's triggers
    cache_mark = mark()
    try:
        index = read_batch_state(spark, index_path, before_batch=batch_id)
        if index is not None:
            index = index.select("fingerprint")
        survivors, new_fps = exact_dedup_incremental(
            batch_df, id_col, text_col, index
        )
        survivors.write.mode("overwrite").parquet(
            os.path.join(out_path, f"batch={batch_id}")
        )
        new_fps.write.mode("overwrite").parquet(
            os.path.join(index_path, f"batch={batch_id}")
        )
    finally:
        release_since(cache_mark)


def _maybe_compact(
    spark: SparkSession, batch_id: int, compact_every: int | None, *paths: str
) -> None:
    """Auto-compaction hook for the foreachBatch streams: fold each state
    log every ``compact_every`` batches, FROM INSIDE the sequential
    ``foreachBatch`` callback — the one point in a streaming job guaranteed
    to have no concurrent writer, which is exactly the quiescence
    ``io.compact_batches`` asks for. Replay-safe by the same watermark
    argument as the reader: if the checkpoint commit fails AFTER a
    compaction folded batch N, the replayed batch N rewrites its
    ``batch=N`` dirs (now hidden behind the watermark) and re-reads state
    with ``before_batch=N`` — which excludes the folded copy of its own
    rows via the preserved ``batch`` column — and, the source offsets being
    checkpointed, reproduces the identical output the snapshot already
    holds."""
    if compact_every and (batch_id + 1) % compact_every == 0:
        from switchback_test_dag_spark.io import compact_batches

        for p in paths:
            compact_batches(spark, p)


def stream_corpus_dedup(
    docs_stream: DataFrame,
    id_col: str,
    text_col: str,
    index_path: str,
    out_path: str,
    checkpoint_dir: str,
    timeout_sec: int = 300,
    query_name: str = "corpus_dedup",
    compact_every: int | None = None,
) -> None:
    """FOREVER-exact streaming corpus dedup — the composition
    :func:`stream_dedup`'s docstring points at: watermark-bounded operators
    can only dedup within a time horizon, while a training-corpus ingest
    must never re-admit a document seen LAST MONTH. ``foreachBatch`` closes
    the gap by pairing each micro-batch with the persistent fingerprint
    index (``text/dedup.exact_dedup_incremental``): per batch, keep the
    min-id first occurrence within the batch whose fingerprint is absent
    from every PRIOR batch's index rows, then append the survivors'
    fingerprints — O(batch + index-lookup join) per trigger, state lives in
    PARQUET (unbounded corpus, zero executor state), not in the streaming
    state store.

    Idempotent by layout, not by luck: ``foreachBatch`` replays a batch
    after a failure, so both sinks write to a ``batch=<id>`` subdirectory
    with per-batch OVERWRITE — a replay rewrites the same directory and the
    union over the directory tree is unchanged (the same snapshot-pointer
    reasoning as ``io.atomic_overwrite``, specialized to append-only batch
    dirs). Crucially, state reads are filtered to STRICTLY EARLIER batches
    (``io.read_batch_state(before_batch=batch_id)``): a replayed batch N
    must not see its own failed attempt's ``batch=N`` index rows, or every
    doc would anti-join against its own fingerprint and the replay would
    silently drop the whole batch. Readers take
    ``io.read_batch_state(spark, out_path)`` / ``(index_path)`` — or plain
    ``spark.read.parquet`` while the log is uncompacted; run
    ``io.compact_batches`` periodically so a year of triggers doesn't mean
    a 35k-directory listing (the stream transparently reads
    snapshot ∪ newer batches afterwards), or pass ``compact_every=N`` and
    the stream folds its own logs every N batches from inside the
    sequential callback — the guaranteed-quiescent point
    (:func:`_maybe_compact` documents replay safety across the fold).

    Micro-batches run sequentially, so batch N's index read sees every
    batch < N — the fold-of-batches == full-batch invariant the incremental
    operator's differential pins carries over to the stream
    (tests/test_streaming.py runs a multi-batch ``availableNow`` pass and
    compares against batch ``exact_dedup`` of the whole landing dir)."""
    spark = docs_stream.sparkSession

    def one_batch(batch_df: DataFrame, batch_id: int) -> None:
        _corpus_dedup_batch(
            spark, batch_df, batch_id, id_col, text_col, index_path, out_path
        )
        _maybe_compact(spark, batch_id, compact_every, index_path, out_path)

    q = (
        docs_stream.writeStream.foreachBatch(one_batch)
        .queryName(query_name)
        .option("checkpointLocation", os.path.join(checkpoint_dir, query_name))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    if q.isActive:
        q.stop()
        raise TimeoutError(f"stream {query_name} did not finish in {timeout_sec}s")


def _corpus_near_dedup_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    id_col: str,
    text_col: str,
    sig_index_path: str,
    out_path: str,
    shingle_n: int = 3,
    k: int = 64,
    bands: int = 16,
    threshold: float = 0.85,
    exact_verify: bool = False,
) -> None:
    """One :func:`stream_corpus_near_dedup` micro-batch — module-level for
    the same replay-testability reason as :func:`_corpus_dedup_batch`.

    State reads go through ``io.read_batch_state(before_batch=batch_id)``
    and are PROJECTED to the state schema: the replay filter keeps a
    replayed batch from pairing against its own failed attempt, and the
    projection drops the Hive ``batch`` partition column — an un-projected
    index frame would make the estimate path's signature union raise
    NUM_COLUMNS_MISMATCH on every batch after the first."""
    from switchback_test_dag_spark.caching import mark, release_since
    from switchback_test_dag_spark.io import read_batch_state
    from switchback_test_dag_spark.text.dedup import (
        minhash_pairs_vs_index,
        minhash_signatures,
    )

    # persist (not localCheckpoint) + explicit release: a long-lived
    # streaming job must leave NOTHING persisted between triggers, and
    # the scoped release also drops the pair operator's internal pins
    # without touching pins the enclosing application holds
    cache_mark = mark()
    batch_df = batch_df.persist()  # consumed by sign + anti-join
    sigs = minhash_signatures(
        batch_df, id_col, text_col, shingle_n=shingle_n, k=k
    ).persist()
    try:
        index = read_batch_state(spark, sig_index_path, before_batch=batch_id)
        if index is not None:
            index = index.select("doc", "sig")
        texts = None
        if exact_verify:
            texts = batch_df.select(id_col, text_col)
            prior = read_batch_state(spark, out_path, before_batch=batch_id)
            if prior is not None:
                texts = texts.unionByName(prior.select(id_col, text_col))
        pairs = minhash_pairs_vs_index(
            sigs, index, k=k, bands=bands, threshold=threshold,
            texts=texts, id_col=id_col, text_col=text_col,
            shingle_n=shingle_n,
        )
        losers = pairs.select(F.col("doc_b").alias(id_col)).distinct()
        survivors = batch_df.join(losers, on=id_col, how="left_anti")
        # id-sorted row groups: the exact-verify path of LATER batches
        # filters this table by candidate id (parquet IN pushdown), and
        # sorted min/max stats make that prune sharp
        survivors.sortWithinPartitions(id_col).write.mode("overwrite").parquet(
            os.path.join(out_path, f"batch={batch_id}")
        )
        sigs.join(
            survivors.select(F.col(id_col).alias("doc")),
            on="doc", how="left_semi",
        ).write.mode("overwrite").parquet(
            os.path.join(sig_index_path, f"batch={batch_id}")
        )
    finally:
        release_since(cache_mark)
        sigs.unpersist()
        batch_df.unpersist()


def stream_corpus_near_dedup(
    docs_stream: DataFrame,
    id_col: str,
    text_col: str,
    sig_index_path: str,
    out_path: str,
    checkpoint_dir: str,
    shingle_n: int = 3,
    k: int = 64,
    bands: int = 16,
    threshold: float = 0.85,
    exact_verify: bool = False,
    timeout_sec: int = 300,
    query_name: str = "corpus_near_dedup",
    compact_every: int | None = None,
) -> None:
    """Streaming NEAR-duplicate corpus dedup — :func:`stream_corpus_dedup`'s
    sibling for the MinHash family: per micro-batch, sign the batch
    (``text/dedup.minhash_signatures``), generate candidates against itself
    and the persistent signature index
    (``text/dedup.minhash_pairs_vs_index``), drop every batch doc that pairs
    with an earlier-kept doc or a smaller-id batch doc (the C4 greedy canon,
    first-arrival across batches), and append ONLY the survivors'
    signatures — losers never pollute the index. Same parquet-state,
    batch=<id>-overwrite idempotent layout as the exact twin.

    ``exact_verify=True`` upgrades cross- and within-batch verification
    from the k-component signature estimate to exact n-gram Jaccard using
    the operator's ``texts=`` option; the text lookup is the batch UNION the
    PRIOR SURVIVORS already sitting in ``out_path`` — the output table
    doubles as the text side of its own index, so no extra storage and the
    text touch stays O(candidate ids). Near-duplicate similarity is not
    transitive, so fold-of-batches equals the batch operator only on
    clusters whose members are pairwise similar (the differential test
    constructs exactly that); in general the streaming canon is
    first-arrival — the semantics a production ingest wants."""
    from switchback_test_dag_spark.text.dedup import (
        minhash_pairs_vs_index,
        minhash_signatures,
    )

    spark = docs_stream.sparkSession

    def one_batch(batch_df: DataFrame, batch_id: int) -> None:
        _corpus_near_dedup_batch(
            spark, batch_df, batch_id, id_col, text_col,
            sig_index_path, out_path,
            shingle_n=shingle_n, k=k, bands=bands, threshold=threshold,
            exact_verify=exact_verify,
        )
        _maybe_compact(spark, batch_id, compact_every, sig_index_path, out_path)

    q = (
        docs_stream.writeStream.foreachBatch(one_batch)
        .queryName(query_name)
        .option("checkpointLocation", os.path.join(checkpoint_dir, query_name))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    if q.isActive:
        q.stop()
        raise TimeoutError(f"stream {query_name} did not finish in {timeout_sec}s")
