"""Data Selection with Importance Resampling (DSIR) — hashed-n-gram
importance weights for targeted corpus selection (Xie et al. 2023, "Data
Selection for Language Models via Importance Resampling"; public method):
score every raw-corpus document by how much more likely its hashed n-gram
features are under a TARGET distribution (a small high-quality / in-domain
set) than under the RAW corpus distribution, then select by weight. The
selection stage composes with the repo's deterministic samplers — the
published estimator's feature side is what this module adds.

Method (paper's hashed generative mini-model):

- features: word unigrams AND bigrams, hashed into ``n_buckets`` buckets
  (hashing makes the parameter space fixed-size regardless of vocabulary —
  the trick that lets the fit be two aggregations);
- both distributions are bucket unigram models with add-one smoothing:
  ``p[b] = (count[b] + 1) / (total + B)``;
- a document's log importance weight is
  ``sum_b c_b(doc) * (ln p_target[b] - ln p_raw[b])``.

Scale shape (100 TB design point): the raw corpus is the big side and it is
touched by exactly ONE narrow map (tokens → grams → bucket) into a map-side-
combinable ``(doc, bucket)`` count; both fitted distributions are ``B`` rows
— metadata — broadcast back for the scoring join, so nothing ever shuffles
the corpus on gram and no driver-side state exceeds ``n_buckets`` rows.
Scoring is pure JVM (ln/sum built-ins); the one float stage (log-ratio sum)
is bounded per doc by its gram count.

``portable=True`` swaps xxhash64 bucketing for the md5-prefix form that
exists verbatim in DuckDB/BigQuery/Trino, so an external engine replays
bucket assignment — and therefore weights — exactly (the registry contract
pins rounded weights plus an id-hash membership checksum of the top-k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from switchback_test_dag_spark.text.analysis import TOKEN_SPLIT_RE

_B, _CNT = "_dsir_b", "_dsir_c"


def _gram_buckets(text_col: str, n_buckets: int, portable: bool):
    """Array of bucket ids, one per word unigram AND bigram occurrence (NOT
    distinct — the model is a count model)."""
    toks = f"filter(split(lower({text_col}), '{TOKEN_SPLIT_RE}'), x -> x != '')"
    grams = (
        f"concat({toks}, CASE WHEN size({toks}) >= 2 THEN "
        f"transform(sequence(1, size({toks}) - 1), "
        f"i -> concat_ws(' ', element_at({toks}, i), element_at({toks}, i + 1))) "
        f"ELSE array() END)"
    )
    if portable:
        # conv() yields a string; the 15-hex-digit prefix fits BIGINT exactly
        bucket = (
            f"x -> pmod(CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT),"
            f" {n_buckets})"
        )
    else:
        bucket = f"x -> pmod(xxhash64(x), {n_buckets})"
    return F.expr(f"transform({grams}, {bucket})")


def doc_bucket_counts(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 256,
    portable: bool = False,
) -> DataFrame:
    """Per-document hashed-gram bucket counts ``(id_col, bucket, cnt)``.
    NULL/empty texts contribute no rows (their weight is 0 by definition)."""
    return (
        docs.select(
            F.col(id_col),
            F.explode(_gram_buckets(text_col, n_buckets, portable)).alias(_B),
        )
        .groupBy(id_col, _B)
        .agg(F.count(F.lit(1)).alias(_CNT))
    )


def _bucket_distribution(counts: DataFrame, n_buckets: int) -> DataFrame:
    """Add-one-smoothed bucket log-probabilities ``(bucket, logp)`` over a
    (doc, bucket, cnt) frame — missing buckets get the smoothing floor via a
    dense bucket spine so the scoring join never drops a bucket."""
    spark = counts.sparkSession
    totals = counts.groupBy(_B).agg(F.sum(_CNT).alias("n"))
    spine = spark.range(n_buckets).select(F.col("id").cast("long").alias(_B))
    dense = spine.join(totals, _B, "left").select(
        _B, F.coalesce("n", F.lit(0)).alias("n")
    )
    # the grand total rides a global window over the DENSE frame — B rows of
    # metadata, so the single-task window is free, and it avoids the scalar
    # crossJoin shape (BroadcastNestedLoopJoin) the repo's plan pins forbid
    # so an accidental O(n^2) can never hide behind a scalar attach
    from pyspark.sql import Window

    t = F.sum("n").over(Window.partitionBy())
    return dense.select(
        _B,
        F.log((F.col("n") + 1) / (t + F.lit(n_buckets))).alias("logp"),
    )


def dsir_log_weights(
    docs: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 256,
    portable: bool = False,
) -> DataFrame:
    """``(id_col, log_weight)`` for every document with at least one token:
    the DSIR log importance weight under hashed unigram+bigram features.
    Positive means the document looks more like ``target`` than like the raw
    corpus average. ``target`` needs only ``text_col``."""
    dc = doc_bucket_counts(docs, id_col, text_col, n_buckets, portable)
    raw_dist = _bucket_distribution(dc, n_buckets)
    tgt_counts = doc_bucket_counts(
        target.select(F.lit(0).alias("_tid"), F.col(text_col)),
        "_tid",
        text_col,
        n_buckets,
        portable,
    )
    tgt_dist = _bucket_distribution(tgt_counts, n_buckets)
    ratio = (
        tgt_dist.withColumnRenamed("logp", "lt")
        .join(raw_dist.withColumnRenamed("logp", "lr"), _B)
        .select(_B, (F.col("lt") - F.col("lr")).alias("dl"))
    )
    return (
        dc.join(broadcast(ratio), _B)
        .groupBy(id_col)
        .agg(F.sum(F.col(_CNT) * F.col("dl")).alias("log_weight"))
    )
