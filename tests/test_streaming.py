"""Streaming/batch differential: the windowed bucket aggregation must produce
identical results through the micro-batch path and the batch path."""

from __future__ import annotations

import os

from switchback_test_dag_spark.io import load_table
from switchback_test_dag_spark.streaming import (
    run_stream_to_memory,
    stream_events,
    windowed_bucket_metrics,
)


def _sorted_rows(df):
    return sorted(
        tuple(row) for row in df.collect()
    )


def test_streaming_matches_batch(spark, sf_dir, tmp_path):
    path = os.path.join(sf_dir, "events.parquet")

    stream = stream_events(spark, path)
    assert stream.isStreaming
    streamed = windowed_bucket_metrics(stream, window="1 hour", watermark="2 hours")
    run_stream_to_memory(streamed, "bucket_metrics_test", str(tmp_path))
    got = _sorted_rows(spark.table("bucket_metrics_test"))

    batch = windowed_bucket_metrics(load_table(spark, sf_dir, "events"), window="1 hour")
    expected = _sorted_rows(batch)

    assert len(got) > 0
    assert got == expected


def test_streaming_multiple_microbatches(spark, sf_dir, tmp_path):
    """maxFilesPerTrigger=1 still converges to the same full answer."""
    path = os.path.join(sf_dir, "events.parquet")
    stream = stream_events(spark, path, max_files_per_trigger=1)
    streamed = windowed_bucket_metrics(stream, window="4 hours", watermark="1 hour")
    run_stream_to_memory(streamed, "bucket_metrics_mb", str(tmp_path))
    got = _sorted_rows(spark.table("bucket_metrics_mb"))
    expected = _sorted_rows(
        windowed_bucket_metrics(load_table(spark, sf_dir, "events"), window="4 hours")
    )
    assert got == expected


def test_running_moments_preserve_group_key_types(spark, sf_dir, tmp_path):
    """An integer group key must come back as an integer — the output schema
    derives key fields from the input schema instead of stringifying them."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    from switchback_test_dag_spark.streaming.windows import running_group_moments

    src = str(tmp_path / "events_split")
    load_table(spark, sf_dir, "events").repartition(2).write.parquet(src)
    stream = stream_events(spark, src).withColumn(
        "bucket_id", F.pmod(F.xxhash64("user_id"), F.lit(4))
    )
    moments = running_group_moments(stream, by=("bucket_id",), value_col="value")
    assert isinstance(moments.schema["bucket_id"].dataType, LongType)
    q = (
        moments.writeStream.format("memory")
        .queryName("typed_moments")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_typed"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert not q.isActive
    rows = spark.table("typed_moments").collect()
    assert rows and all(isinstance(r["bucket_id"], int) for r in rows)


def test_session_windows_can_keep_event_time_column(spark, sf_dir):
    """keep_event_time retains the watermark-carrying session struct (start/
    end TIMESTAMPs) so the output can chain into another stateful operator."""
    from pyspark.sql.types import StructType, TimestampType

    from switchback_test_dag_spark.streaming import session_window_sessions

    ev = load_table(spark, sf_dir, "events")
    out = session_window_sessions(ev, keep_event_time=True)
    sess_t = out.schema["session"].dataType
    assert isinstance(sess_t, StructType)
    assert isinstance(sess_t["start"].dataType, TimestampType)
    assert isinstance(sess_t["end"].dataType, TimestampType)
    # and the plain sink-facing columns are unchanged
    assert out.schema["session_end"].dataType == sess_t["end"].dataType
    assert out.count() > 0


def test_stateful_running_moments_matches_batch(spark, sf_dir, tmp_path):
    """applyInPandasWithState: cumulative Welford moments folded across
    micro-batches must equal the batch aggregation exactly (to float noise)."""
    import pytest
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from switchback_test_dag_spark.streaming.windows import running_group_moments

    # split the fixture into 3 files so maxFilesPerTrigger=1 forces the state
    # to carry across micro-batches
    src = str(tmp_path / "events_split")
    load_table(spark, sf_dir, "events").repartition(3).write.parquet(src)

    stream = stream_events(spark, src, max_files_per_trigger=1)
    moments = running_group_moments(stream, by=("event_type",), value_col="value")
    q = (
        moments.writeStream.format("memory")
        .queryName("running_moments")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert not q.isActive

    # memory sink in update mode holds one row per (group, micro-batch);
    # the cumulative final state is the row with max n per group
    final = {
        r["event_type"]: r
        for r in spark.table("running_moments")
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy(F.desc("n"))
            ),
        )
        .filter("rk = 1")
        .collect()
    }

    expected = {
        r["event_type"]: r
        for r in load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("value").alias("n"),
            F.avg(F.col("value").cast("double")).alias("mean"),
            (F.var_samp(F.col("value").cast("double"))
             * (F.count("value") - 1)).alias("m2"),
        )
        .collect()
    }

    assert set(final) == set(expected) and len(final) > 0
    for k, r in expected.items():
        assert final[k]["n"] == r["n"]
        assert final[k]["mean"] == pytest.approx(r["mean"], rel=1e-9)
        assert final[k]["m2"] == pytest.approx(r["m2"], rel=1e-6)


def test_append_mode_watermark_closes_windows_and_drops_late(spark, tmp_path):
    """Append-mode watermark semantics, pinned end-to-end across a restart:
    a window emits exactly once after the watermark passes its end, and input
    later than the watermark is silently dropped — what a production sink
    sees. Deterministic two-run drive over one checkpoint."""
    import os

    from pyspark.sql import functions as F

    from switchback_test_dag_spark.streaming.windows import (
        run_stream_to_memory,
        stream_events,
        windowed_bucket_metrics,
    )

    src = str(tmp_path / "events_src")
    os.makedirs(src)

    def write_batch(name, rows):
        spark.createDataFrame(rows, "ts string, event_type string, value double") \
            .select(F.to_timestamp("ts").alias("ts"), "event_type", "value") \
            .coalesce(1).write.mode("overwrite").parquet(os.path.join(src, name))

    t = lambda h, m=0: f"2024-01-01 {h:02d}:{m:02d}:00"  # noqa: E731
    # batch 1: two events in the 00:00 window; one at 03:00 that advances the
    # watermark to 02:00 (1h lag), closing and emitting the 00:00 window
    write_batch("b1", [(t(0, 10), "a", 1.0), (t(0, 40), "a", 3.0), (t(3), "a", 7.0)])

    out = str(tmp_path / "wm_out")
    ckpt = str(tmp_path / "wm_ckpt")

    def run_once():
        # file sink: the append-mode surface that supports checkpoint
        # recovery (the memory sink does not)
        q = (
            windowed_bucket_metrics(
                stream_events(spark, src + "/*"), window="1 hour", watermark="1 hour"
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return {
            (r["bucket_start"].hour, r["n_events"], r["sum_value"])
            for r in spark.read.parquet(out).collect()
        }

    assert run_once() == {(0, 2, 4.0)}  # 00:00 closed; 03:00 still open

    # batch 2: a LATE event at 00:30 (behind the 02:00 watermark → dropped)
    # and one at 05:00 that advances the watermark past the 03:00 window
    write_batch("b2", [(t(0, 30), "a", 100.0), (t(5), "a", 9.0)])
    # resumed run: the 03:00 window emits with ONLY its original event; the
    # late 00:30 row neither re-opens the 00:00 window nor appears anywhere
    assert run_once() == {(0, 2, 4.0), (3, 1, 7.0)}


def test_stream_dedup_matches_batch_and_bounds_state(spark, sf_dir, tmp_path):
    """Streaming exact dedup: a stream carrying duplicated events (the fixture
    unioned with itself via two glob'd reads of the same file) must emit each
    key exactly once, equal to the batch dropDuplicates result."""
    import pyspark.sql.functions as F

    from switchback_test_dag_spark.streaming.windows import stream_dedup

    path = os.path.join(sf_dir, "events.parquet")
    stream = stream_events(spark, path)
    # duplicate every event inside the stream itself
    doubled = stream.unionByName(stream)
    deduped = stream_dedup(doubled, ["event_id"], watermark="24 hours")
    run_stream_to_memory(
        deduped.select("event_id"),
        "stream_dedup_test",
        str(tmp_path),
        output_mode="append",
    )
    got = spark.table("stream_dedup_test")
    batch = load_table(spark, sf_dir, "events")
    assert got.count() == batch.count()  # each duplicated key emitted once
    assert got.select(F.countDistinct("event_id")).first()[0] == batch.count()


def test_streaming_session_windows_match_batch(spark, sf_dir, tmp_path):
    """Native session_window through the micro-batch path (append mode, state
    carried across maxFilesPerTrigger=1 batches) must agree with the batch run
    of the same expression. Append emits a session only once the watermark
    passes its end, so sessions inside the final watermark horizon legitimately
    never flush: the differential is two-sided bounds around that horizon —
    every emitted session is a true batch session (no corrupt merges across
    micro-batch boundaries), and every batch session closed strictly before
    the final watermark was emitted (no lost state)."""
    import datetime

    from pyspark.sql import functions as F

    from switchback_test_dag_spark.streaming import session_window_sessions

    # split the fixture into three CHRONOLOGICAL files with increasing mtimes
    # (the file source replays them oldest-first): a random split would let the
    # first micro-batch advance the watermark to near-global-max and correctly
    # drop the rest as late — realistic ingestion arrives in time order
    import time as _time

    src = str(tmp_path / "events_split")
    ev = load_table(spark, sf_dir, "events")
    cuts = ev.selectExpr(
        "percentile_approx(cast(ts as long), array(0.33, 0.66)) AS p"
    ).collect()[0]["p"]
    ts_l = F.col("ts").cast("long")
    thirds = [
        ev.filter(ts_l <= cuts[0]),
        ev.filter((ts_l > cuts[0]) & (ts_l <= cuts[1])),
        ev.filter(ts_l > cuts[1]),
    ]
    for part in thirds:
        part.coalesce(1).write.mode("append").parquet(src)
        _time.sleep(1.1)  # distinct mtimes -> deterministic replay order

    stream = stream_events(spark, src, max_files_per_trigger=1)
    streamed = session_window_sessions(stream, gap="30 minutes", watermark="2 hours")
    run_stream_to_memory(
        streamed, "session_windows", str(tmp_path), output_mode="append"
    )
    got = set(_sorted_rows(spark.table("session_windows")))

    batch_df = session_window_sessions(load_table(spark, sf_dir, "events"))
    expected = set(_sorted_rows(batch_df))
    max_ts = load_table(spark, sf_dir, "events").agg(F.max("ts")).collect()[0][0]
    horizon = max_ts - datetime.timedelta(hours=2)
    closed = {r for r in expected if r[2] < horizon}  # r[2] = session_end

    assert len(got) > 0
    assert got <= expected, "streamed session not present in batch result"
    assert closed <= got, "batch-closed session missing from append output"


def test_jsonl_stream_matches_parquet_batch(spark, sf_dir, tmp_path):
    """Interchange-format streaming twin: events written as JSONL, streamed
    back under the explicit schema, must produce windowed metrics identical
    to the parquet batch path — the events ts contract (µs ts + exact ts_ns)
    survives format, stream boundary, and the µs timestampFormat pin."""
    from switchback_test_dag_spark.io import write_jsonl_table
    from switchback_test_dag_spark.streaming import stream_jsonl_events

    ev = load_table(spark, sf_dir, "events")
    jsonl_dir = str(tmp_path / "events_jsonl")
    write_jsonl_table(ev, jsonl_dir)

    stream = stream_jsonl_events(spark, jsonl_dir, ev.schema)
    assert stream.isStreaming
    streamed = windowed_bucket_metrics(stream, window="1 hour", watermark="2 hours")
    run_stream_to_memory(streamed, "jsonl_bucket_metrics_test", str(tmp_path))
    got = _sorted_rows(spark.table("jsonl_bucket_metrics_test"))

    expected = _sorted_rows(windowed_bucket_metrics(ev, window="1 hour"))
    assert len(got) > 0
    assert got == expected


def test_stream_corpus_dedup_matches_batch(spark, tmp_path):
    """Multi-batch availableNow run of stream_corpus_dedup == batch
    exact_dedup of the whole landing dir: cross-batch duplicates are dropped
    via the parquet fingerprint index (no watermark horizon), within-batch
    duplicates via the incremental operator's min-id canon, and the index
    accumulates exactly one fingerprint per survivor. Re-running a batch
    directory write is idempotent (overwrite per batch=<id>)."""
    import switchback_test_dag_spark.text.dedup as TD
    from switchback_test_dag_spark.streaming.windows import stream_corpus_dedup

    landing = tmp_path / "landing"
    rows_by_file = [
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta"),
         (3, "ALPHA   beta GAMMA")],              # 3 dups 1 in-batch
        [(10, "delta epsilon zeta"), (11, "eta theta iota")],  # 10 dups 2
        [(20, "eta theta iota"), (21, "alpha beta gamma"),
         (22, "kappa lambda mu")],                # 20 dups 11, 21 dups 1
    ]
    schema = "doc_id long, text string"
    for i, rows in enumerate(rows_by_file):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(landing / f"f{i}"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(landing / "*"))
    )
    out = tmp_path / "clean"
    idx = tmp_path / "index"
    stream_corpus_dedup(
        stream, "doc_id", "text",
        index_path=str(idx), out_path=str(out),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )

    all_docs = spark.read.parquet(str(landing / "*"))
    expect = {
        r["doc_id"] for r in TD.exact_dedup(all_docs, "doc_id", "text").collect()
    }
    got = {r["doc_id"] for r in spark.read.parquet(str(out)).collect()}
    assert got == expect == {1, 2, 11, 22}
    fps = spark.read.parquet(str(idx))
    assert fps.count() == fps.select("fingerprint").distinct().count() == len(expect)
    # the run really was multi-batch (1 file per trigger -> 3 batch dirs), so
    # the cross-batch drops above went through the INDEX path, not the
    # within-batch min-id canon
    import os

    batches = sorted(n for n in os.listdir(str(idx)) if n.startswith("batch="))
    assert len(batches) == 3, batches


def test_stream_corpus_near_dedup_matches_batch_on_tight_clusters(spark, tmp_path):
    """Multi-batch availableNow run of stream_corpus_near_dedup (exact_verify
    on) == batch minhash_dedup of the whole landing dir, on clusters whose
    members are PAIRWISE similar (near-dup similarity is not transitive, so
    batch equivalence is only defined there — the docstring's contract).
    The signature index accumulates survivors only; cross-batch near-dups
    are dropped through the index path (batch-dir count pinned)."""
    import os

    import switchback_test_dag_spark.text.dedup as TD
    from switchback_test_dag_spark.streaming.windows import (
        stream_corpus_near_dedup,
    )

    base1 = ("the quick brown fox jumps over the lazy dog while seventeen "
             "green turtles watch from a mossy log near the river bank today "
             "as morning light settles across the quiet valley floor")
    base2 = ("completely different prose about orbital mechanics spacecraft "
             "navigation and deep space missions beyond the asteroid belt "
             "with gravity assists plotted around the outer gas giants")
    rows_by_file = [
        [(1, base1), (2, base2)],
        [(10, base1.replace("today", "tonight")),   # near-dup of 1
         (11, "fresh unique content on medieval bread baking and stone "
              "oven construction methods in rural mountain villages with "
              "long fermentation schedules and wood fired heat curves")],
        [(20, base2.replace("plotted", "charted")), # near-dup of 2
         (21, base1.replace("morning", "evening"))],# near-dup of 1 and 10
    ]
    schema = "doc_id long, text string"
    landing = tmp_path / "landing"
    for i, rows in enumerate(rows_by_file):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(landing / f"f{i}")
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(landing / "*"))
    )
    out, idx = tmp_path / "clean", tmp_path / "sigidx"
    stream_corpus_near_dedup(
        stream, "doc_id", "text",
        sig_index_path=str(idx), out_path=str(out),
        checkpoint_dir=str(tmp_path / "ckpt"),
        threshold=0.7, exact_verify=True, compact_every=2,
    )

    import switchback_test_dag_spark.io as _sio

    all_docs = spark.read.parquet(str(landing / "*"))
    expect = {
        r["doc_id"]
        for r in TD.minhash_dedup(
            all_docs, "doc_id", "text", threshold=0.7
        ).collect()
    }
    got = {r["doc_id"] for r in _sio.read_batch_state(spark, str(out)).collect()}
    assert got == expect == {1, 2, 11}
    # index holds exactly the survivors' signatures, one row each
    sig_docs = [
        r["doc"] for r in _sio.read_batch_state(spark, str(idx)).collect()
    ]
    assert sorted(sig_docs) == sorted(expect)
    # compact_every=2 folded batches 0-1 mid-stream (the exact-verify path
    # read prior survivors' TEXT through the snapshot for batch 2)
    assert _sio.compacted_watermark(str(idx)) == 1
    batches = [n for n in os.listdir(str(idx)) if n.startswith("batch=")]
    assert batches == ["batch=2"], batches


def test_corpus_dedup_batch_replay_preserves_data(spark, tmp_path):
    """foreachBatch is at-least-once: a batch whose writes landed but whose
    streaming commit did not is REPLAYED with the same batch_id. The replay
    must reproduce the batch's output, not lose it — before the
    before_batch filter, the replayed batch read its own failed attempt's
    index rows, anti-joined every doc against its own fingerprint, and
    silently replaced the batch with empty output AND an empty index
    partition."""
    from switchback_test_dag_spark.streaming.windows import _corpus_dedup_batch

    schema = "doc_id long, text string"
    idx, out = str(tmp_path / "idx"), str(tmp_path / "out")
    b0 = spark.createDataFrame([(1, "alpha beta"), (2, "gamma delta")], schema)
    b1 = spark.createDataFrame([(10, "alpha beta"), (11, "unique text")], schema)
    _corpus_dedup_batch(spark, b0, 0, "doc_id", "text", idx, out)
    _corpus_dedup_batch(spark, b1, 1, "doc_id", "text", idx, out)
    survivors = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert survivors == {1, 2, 11}

    # the replay: identical call, same batch_id, state dirs already carry
    # the first attempt's batch=1 output
    _corpus_dedup_batch(spark, b1, 1, "doc_id", "text", idx, out)
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {1, 2, 11}
    fps = spark.read.parquet(idx)
    assert fps.count() == 3  # one fingerprint per survivor, no empty batch=1


def test_corpus_near_dedup_batch_replay_and_estimate_mode(spark, tmp_path):
    """Two regressions pinned at once, on the DEFAULT estimate path
    (exact_verify=False): (a) batch 2+ used to crash outright — the raw
    index read carried the Hive 'batch' partition column into the
    signature union (NUM_COLUMNS_MISMATCH); (b) a replayed batch must not
    pair against its own failed attempt's signatures and drop itself."""
    from switchback_test_dag_spark.streaming.windows import (
        _corpus_near_dedup_batch,
    )

    base = ("the quick brown fox jumps over the lazy dog while seventeen "
            "green turtles watch from a mossy log near the river bank today "
            "as morning light settles across the quiet valley floor")
    other = ("completely different prose about orbital mechanics spacecraft "
             "navigation and deep space missions beyond the asteroid belt "
             "with gravity assists plotted around the outer gas giants")
    schema = "doc_id long, text string"
    idx, out = str(tmp_path / "sigidx"), str(tmp_path / "out")
    b0 = spark.createDataFrame([(1, base), (2, other)], schema)
    b1 = spark.createDataFrame(
        [(10, base.replace("today", "tonight"))], schema  # near-dup of 1
    )
    kw = dict(threshold=0.7, exact_verify=False)
    _corpus_near_dedup_batch(spark, b0, 0, "doc_id", "text", idx, out, **kw)
    _corpus_near_dedup_batch(spark, b1, 1, "doc_id", "text", idx, out, **kw)
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {1, 2}

    # replay of batch 1 (failed streaming commit, writes already on disk)
    _corpus_near_dedup_batch(spark, b1, 1, "doc_id", "text", idx, out, **kw)
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {1, 2}
    # batch 2 against the 2-batch index: the estimate-path union regression.
    # doc 20 repeats doc 2 verbatim (est_jaccard = 1.0) — a one-word edit
    # would sit in the estimate's coin-flip band at k=64/t=0.7, and this
    # test pins the union/replay plumbing, not estimate accuracy
    b2 = spark.createDataFrame(
        [(20, other),
         (21, "fresh unique content on medieval bread baking and stone "
              "oven construction methods in rural mountain villages")],
        schema,
    )
    _corpus_near_dedup_batch(spark, b2, 2, "doc_id", "text", idx, out, **kw)
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {1, 2, 21}
    sig_docs = sorted(r.doc for r in spark.read.parquet(idx).collect())
    assert sig_docs == [1, 2, 21]


def test_stream_corpus_dedup_survives_midstream_compaction(spark, tmp_path):
    """A compaction landing between two availableNow passes is invisible to
    the stream's semantics: the second pass reads snapshot ∪ newer batches
    through read_batch_state and the fold still equals batch exact_dedup of
    the full landing dir. Pins the reader/writer contract the daily-ops
    recipe composes (ingest → compact → ingest)."""
    import time as _time

    import switchback_test_dag_spark.io as sio
    import switchback_test_dag_spark.text.dedup as TD
    from switchback_test_dag_spark.streaming.windows import stream_corpus_dedup

    landing = tmp_path / "landing"
    schema = "doc_id long, text string"
    rows_by_file = [
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta")],
        [(10, "delta epsilon zeta"), (11, "eta theta iota")],
        [(20, "eta theta iota"), (21, "alpha beta gamma"),
         (22, "kappa lambda mu")],
    ]
    for i, rows in enumerate(rows_by_file[:2]):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(landing / f"f{i}")
        )
    out, idx, ckpt = tmp_path / "clean", tmp_path / "index", tmp_path / "ckpt"

    def run():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(landing / "*"))
        )
        stream_corpus_dedup(
            stream, "doc_id", "text",
            index_path=str(idx), out_path=str(out), checkpoint_dir=str(ckpt),
        )

    run()  # batches 0, 1
    assert sio.compact_batches(spark, str(idx)) == 1
    assert sio.compact_batches(spark, str(out)) == 1

    _time.sleep(1.1)  # distinct mtime for the new landing file
    spark.createDataFrame(rows_by_file[2], schema).coalesce(1).write.parquet(
        str(landing / "f2")
    )
    run()  # batch 2, reading the compacted index

    all_docs = spark.read.parquet(str(landing / "*"))
    expect = {
        r["doc_id"] for r in TD.exact_dedup(all_docs, "doc_id", "text").collect()
    }
    got = {
        r["doc_id"]
        for r in sio.read_batch_state(spark, str(out)).collect()
    }
    assert got == expect == {1, 2, 11, 22}
    fps = sio.read_batch_state(spark, str(idx))
    assert fps.count() == fps.select("fingerprint").distinct().count() == 4


def test_corpus_near_dedup_exact_verify_spans_compaction(spark, tmp_path):
    """exact_verify=True reads prior survivors' TEXT from out_path; after a
    compaction that text lives in the snapshot, and verification must keep
    producing the exact-Jaccard drops across the boundary."""
    import switchback_test_dag_spark.io as sio
    from switchback_test_dag_spark.streaming.windows import (
        _corpus_near_dedup_batch,
    )

    base = ("the quick brown fox jumps over the lazy dog while seventeen "
            "green turtles watch from a mossy log near the river bank today "
            "as morning light settles across the quiet valley floor")
    schema = "doc_id long, text string"
    idx, out = str(tmp_path / "sigidx"), str(tmp_path / "out")
    kw = dict(threshold=0.7, exact_verify=True)
    b0 = spark.createDataFrame([(1, base)], schema)
    _corpus_near_dedup_batch(spark, b0, 0, "doc_id", "text", idx, out, **kw)
    sio.compact_batches(spark, idx)
    sio.compact_batches(spark, out)
    b1 = spark.createDataFrame(
        [(10, base.replace("today", "tonight")),  # near-dup of compacted 1
         (11, "fresh unique content on medieval bread baking and stone "
              "oven construction methods in rural mountain villages")],
        schema,
    )
    _corpus_near_dedup_batch(spark, b1, 1, "doc_id", "text", idx, out, **kw)
    got = {r.doc_id for r in sio.read_batch_state(spark, out).collect()}
    assert got == {1, 11}


def test_stream_corpus_dedup_auto_compaction(spark, tmp_path):
    """compact_every=N folds the stream's own state logs every N batches
    from inside the sequential foreachBatch callback (the guaranteed-
    quiescent point): after a 3-batch availableNow pass with
    compact_every=2, batches 0-1 live in the compacted snapshot (watermark
    1), batch 2 is a fresh dir on top, and the fold changes nothing
    semantically — the result still equals batch exact_dedup."""
    import os

    import switchback_test_dag_spark.io as sio
    import switchback_test_dag_spark.text.dedup as TD
    from switchback_test_dag_spark.streaming.windows import stream_corpus_dedup

    landing = tmp_path / "landing"
    schema = "doc_id long, text string"
    rows_by_file = [
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta")],
        [(10, "delta epsilon zeta"), (11, "eta theta iota")],
        [(20, "eta theta iota"), (21, "kappa lambda mu")],
    ]
    for i, rows in enumerate(rows_by_file):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(landing / f"f{i}")
        )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(landing / "*"))
    )
    out, idx = tmp_path / "clean", tmp_path / "index"
    stream_corpus_dedup(
        stream, "doc_id", "text",
        index_path=str(idx), out_path=str(out),
        checkpoint_dir=str(tmp_path / "ckpt"), compact_every=2,
    )
    assert sio.compacted_watermark(str(idx)) == 1
    assert sio.compacted_watermark(str(out)) == 1
    remaining = [n for n in os.listdir(str(idx)) if n.startswith("batch=")]
    assert remaining == ["batch=2"]
    all_docs = spark.read.parquet(str(landing / "*"))
    expect = {
        r["doc_id"] for r in TD.exact_dedup(all_docs, "doc_id", "text").collect()
    }
    got = {r["doc_id"] for r in sio.read_batch_state(spark, str(out)).collect()}
    assert got == expect == {1, 2, 11, 21}
