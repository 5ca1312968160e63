"""Token-budget sequence packing: next-fit invariants, partition-invariance,
oversized-document isolation, and an in-process DuckDB replay of the portable
assignment (recursive-CTE next-fit — the oracle shape the registry contract
uses)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from switchback_test_dag_spark.io import load_table
from switchback_test_dag_spark.plans.packing import pack_documents, pack_stats
from switchback_test_dag_spark.text import analysis as TA

SF = "/root/testdata/sf0.001"
BUDGET = 512


@pytest.fixture(scope="module")
def docs_tok(spark):
    docs = load_table(spark, SF, "documents")
    return docs.select(
        "doc_id", "source", TA.token_count("text").cast("long").alias("toks")
    ).localCheckpoint()


def test_every_doc_packed_once_and_no_multidoc_overflow(docs_tok):
    packed = pack_documents(
        docs_tok, "doc_id", "toks", BUDGET, strata=["source"], n_buckets=4, seed=9
    ).localCheckpoint()
    n_docs = docs_tok.count()
    assert packed.count() == n_docs
    assert packed.select("doc_id").distinct().count() == n_docs
    stats = pack_stats(packed, "toks", BUDGET, strata=["source"]).collect()
    assert stats, "expected per-source stats"
    for r in stats:
        assert r["n_overflow_seqs"] == 0
    # sequence indices are contiguous 1..max within each (stratum, bucket)
    per_bucket = (
        packed.groupBy("source", "bucket")
        .agg(
            F.max("seq").alias("mx"),
            F.count_distinct("seq").alias("nd"),
            F.min("seq").alias("mn"),
        )
        .collect()
    )
    for r in per_bucket:
        assert r["mn"] == 1 and r["mx"] == r["nd"]


def test_partition_invariance_and_seed_sensitivity(docs_tok):
    def key_set(df):
        return {
            (r["doc_id"], r["bucket"], r["seq"])
            for r in df.select("doc_id", "bucket", "seq").collect()
        }

    a = key_set(
        pack_documents(
            docs_tok, "doc_id", "toks", BUDGET, strata=["source"], n_buckets=4, seed=9
        )
    )
    b = key_set(
        pack_documents(
            docs_tok.repartition(13),
            "doc_id",
            "toks",
            BUDGET,
            strata=["source"],
            n_buckets=4,
            seed=9,
        )
    )
    assert a == b, "assignment must not depend on input partitioning"
    c = key_set(
        pack_documents(
            docs_tok, "doc_id", "toks", BUDGET, strata=["source"], n_buckets=4, seed=10
        )
    )
    assert a != c, "a different seed must permute the assignment"


def test_oversized_doc_isolated_and_null_tokens_zero(spark):
    rows = [(1, 10), (2, None), (3, 2000), (4, 500), (5, 5)]
    df = spark.createDataFrame(rows, "doc_id int, toks long")
    packed = pack_documents(df, "doc_id", "toks", 512, n_buckets=1, seed=0)
    got = {r["doc_id"]: (r["seq"], r["toks"]) for r in packed.collect()}
    assert got[2][1] == 0  # NULL token count packs as 0
    by_seq: dict[int, list[int]] = {}
    for d, (s, _) in got.items():
        by_seq.setdefault(s, []).append(d)
    over_seq = got[3][0]
    assert by_seq[over_seq] == [3], "oversized doc must not share its sequence"
    for s, members in by_seq.items():
        if s == over_seq:
            continue
        fill = sum(got[d][1] for d in members)
        assert fill <= 512


def test_portable_assignment_replays_in_duckdb(docs_tok):
    packed = pack_documents(
        docs_tok,
        "doc_id",
        "toks",
        BUDGET,
        strata=["source"],
        n_buckets=4,
        seed=9,
        portable=True,
    )
    spark_rows = sorted(
        (r["doc_id"], r["bucket"], r["seq"])
        for r in packed.select("doc_id", "bucket", "seq").collect()
    )
    pdf = docs_tok.toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    duck_rows = sorted(
        tuple(r)
        for r in con.execute(
            f"""
        WITH RECURSIVE h AS (
          SELECT doc_id, source, toks,
                 ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':9'), 1, 15))::BIGINT AS h
          FROM docs
        ), d AS (
          SELECT doc_id, source, coalesce(toks, 0) AS toks, h % 4 AS bucket,
                 row_number() OVER (PARTITION BY source, h % 4 ORDER BY h, doc_id) AS rn
          FROM h
        ), pack AS (
          SELECT source, bucket, rn, doc_id, toks, 1 AS seq, toks AS fill
          FROM d WHERE rn = 1
          UNION ALL
          SELECT d.source, d.bucket, d.rn, d.doc_id, d.toks,
                 CASE WHEN p.fill + d.toks > {BUDGET} THEN p.seq + 1 ELSE p.seq END,
                 CASE WHEN p.fill + d.toks > {BUDGET} THEN d.toks ELSE p.fill + d.toks END
          FROM d JOIN pack p
            ON d.source = p.source AND d.bucket = p.bucket AND d.rn = p.rn + 1
        )
        SELECT doc_id, CAST(bucket AS INT), CAST(seq AS INT) FROM pack
        """
        ).fetchall()
    )
    assert spark_rows == duck_rows


def test_auto_bucket_sizing_bounds_occupancy(spark):
    """n_buckets="auto" must derive max(defaultParallelism, ceil(n/target))
    so the mean bucket holds <= target rows and a small input still fans out
    across the cluster — at two fixture sizes (ceil-dominated and
    parallelism-dominated)."""
    par = spark.sparkContext.defaultParallelism

    # ceil-dominated: 2000 rows / target 10 -> 200 buckets (> parallelism)
    big = spark.createDataFrame(
        [(i, i % 7 + 1) for i in range(2000)], "doc_id long, toks long"
    )
    packed = pack_documents(
        big, "doc_id", "toks", 512, seed=3, target_rows_per_bucket=10
    ).localCheckpoint()
    occ = packed.groupBy("bucket").count().collect()
    assert len(occ) <= max(par, 200)
    assert 2000 / max(par, 200) <= 10  # mean occupancy <= target by construction
    assert max(r["count"] for r in occ) <= 3 * 10  # uniform hash, fixed seed

    # parallelism-dominated: 40 rows, huge target -> n_buckets = parallelism
    small = spark.createDataFrame(
        [(i, 5) for i in range(40)], "doc_id long, toks long"
    )
    packed_s = pack_documents(
        small, "doc_id", "toks", 512, seed=3, target_rows_per_bucket=1_000_000
    ).localCheckpoint()
    occ_s = packed_s.groupBy("bucket").count().collect()
    assert len(occ_s) <= par  # routed across (up to) defaultParallelism buckets
    assert packed_s.count() == 40
    # explicit ints stay the no-extra-job path and validate
    with pytest.raises(ValueError, match="n_buckets"):
        pack_documents(small, "doc_id", "toks", 512, n_buckets="sixty-four")
    with pytest.raises(ValueError, match="n_buckets"):
        pack_documents(small, "doc_id", "toks", 512, n_buckets=0)
    # bool IS an int to isinstance — True must not slip through as 1 bucket
    with pytest.raises(ValueError, match="n_buckets"):
        pack_documents(small, "doc_id", "toks", 512, n_buckets=True)


def test_repetition_stats_known_values(spark):
    """Hand-computed repetition signals, incl. empty/NULL/one-token docs."""
    rows = [
        (1, "a a a b"),  # top 3/4; 2-gram occurrences [a a, a a, a b] -> dup 2/3
        (2, "x y z"),    # top 1/3; grams [x y, y z] all unique -> 0
        (3, ""),         # no tokens -> 0, 0
        (4, "solo"),     # one token -> top 1.0, no grams -> 0
        (5, None),       # NULL text -> 0, 0
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: (round(r["top_token_frac"], 6), round(r["dup_ngram_frac"], 6))
        for r in TA.repetition_stats(df, "doc_id", "text").collect()
    }
    assert got == {
        1: (0.75, round(2 / 3, 6)),
        2: (round(1 / 3, 6), 0.0),
        3: (0.0, 0.0),
        4: (1.0, 0.0),
        5: (0.0, 0.0),
    }
