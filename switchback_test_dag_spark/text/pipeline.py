"""Composable corpus-cleaning pipeline — the CCNet-order chain as a public
API (quality filter → segment-level boilerplate removal → exact dedup →
near-dup removal → train/eval decontamination), the stage order published by
Wenzek et al. 2020 (segment scrubbing must precede document-level dedup
because it changes fingerprints) with the decontamination stage of Brown et
al. 2020 App. C appended.

This is the same chain the registry's ``corpus_clean_stats`` contract
value-hashes against its DuckDB oracle at every scale factor — the query
CALLS this function, so the public API and the oracled contract can never
drift apart.

Reference tie-in: the reference has no corpus pipeline (it is an experiment
DAG); this composes the mandated training-data extension operators
(``text/lines``, ``text/dedup``, ``text/decontaminate``, ``text/analysis``)
into the shape a pretraining data job actually runs.

Scale shape: every stage keeps its own audited plan (boilerplate set
broadcast, fingerprint shuffle, AllPairs-filtered Jaccard self-join,
broadcast eval grams); the chain adds nothing wide. Intermediates that are
consumed by several downstream stages (the scrubbed corpus; the flagged
survivor frame) are pinned via ``caching.pin`` so one evaluation of the
result does not replay the quality/segment or Jaccard subtrees per
consumer — call ``caching.release_all()`` after materializing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# barrier, not persist: each pinned frame here is consumed by several
# downstream branches (and the dedup stage self-joins), so a lazy persist
# keeps the full lineage in every reference and the analyzer's duplicate-
# relation copies compound down the chain — the barrier truncates the plan
# at each stage boundary (see caching.barrier)
from switchback_test_dag_spark.caching import barrier as pin
from switchback_test_dag_spark.text import analysis as TA
from switchback_test_dag_spark.text import decontaminate as DC
from switchback_test_dag_spark.text import dedup as TD
from switchback_test_dag_spark.text import lines as LN
from switchback_test_dag_spark.text import spans as SP


def clean_corpus(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    segmenter: Column,
    quality_min: float = 0.5,
    boiler_min_df: int = 20,
    rejoin_sep: str = " ",
    shingle_n: int = 3,
    jaccard_threshold: float = 0.85,
    eval_df: DataFrame | None = None,
    decon_n: int = 13,
    quality_col: str = "quality",
    segment_policy: str | None = "boilerplate",
    span_policy: str | None = None,
    span_len: int = 13,
    span_min_count: int = 2,
    near_dup_method: str = "jaccard",
) -> DataFrame:
    """Run the full cleaning chain; returns one row per SURVIVING document
    (quality-passed, scrubbed non-empty, fingerprint-unique, no near-dup
    with a lower id) carrying every input column except ``text_col`` —
    which is REPLACED by the boilerplate-scrubbed text — plus
    ``quality_col`` (the score of the RAW text, computed before scrubbing)
    and a ``contaminated`` boolean (all False when ``eval_df`` is None;
    callers decide whether to drop or just count contaminated docs).

    ``segmenter`` is a Column producing ``array<string>`` segments from the
    document (production: ``F.split(F.col(text), '\\n')``; token-chunk
    policies work too — segmentation stays with the caller, as in
    ``text/lines``). Scrubbed text is the surviving segments joined with
    ``rejoin_sep``; documents scrubbed to nothing are dropped.

    ``segment_policy`` selects the segment-level stage:

    - ``"boilerplate"`` (default, the oracled contract): drop segments with
      document frequency ≥ ``boiler_min_df`` (``lines.drop_boilerplate``);
    - ``"dedup"``: CCNet's literal line-dedup — corpus-wide keep-FIRST
      occurrence of each distinct segment (``lines.dedup_segments``;
      ``boiler_min_df`` is ignored);
    - ``None``: skip the segment stage (text passes through unscrubbed;
      ``segmenter`` is not evaluated).

    Whatever the policy, the stage runs BEFORE fingerprinting — the CCNet
    order pin applies to both segment policies (scrubbing changes
    fingerprints), and is load-bearing-tested for both.

    ``span_policy`` selects a duplicated-SPAN stage between segment
    scrubbing and exact dedup:

    - ``None`` (default, the oracled contract): no span stage;
    - ``"remove"``: cut every token covered by a corpus-duplicated
      ``span_len``-token window (``spans.remove_duplicated_spans`` — Lee et
      al. 2021's substring dedup applied). Runs on the SCRUBBED text and
      BEFORE fingerprinting for the same reason the segment stage does:
      cutting changes fingerprints, so span removal must precede exact and
      near-dup detection (order pin tested). The output then carries a
      ``spans_cut_tokens`` bigint column; documents cut to empty text are
      dropped (the scrubbed-to-nothing rule).

    ``near_dup_method`` selects the near-dup pair generator:

    - ``"jaccard"`` (default, the oracled contract): exact n-gram Jaccard
      via AllPairs prefix filtering (``dedup.ngram_jaccard_pairs``) —
      exhaustive, the right choice wherever it fits;
    - ``"minhash"``: MinHash-LSH candidates + the SAME exact-Jaccard
      verification (``dedup.minhash_lsh_pairs`` defaults, k=64/16 bands) —
      the corpus-scale path when even prefix-filtered AllPairs is too wide;
      drops only what Jaccard would drop (every candidate is
      exact-verified), differing solely by LSH candidate recall
      (≥ 1−(1−s⁴)¹⁶, ≈1 above the default threshold).
    """
    if near_dup_method not in ("jaccard", "minhash"):
        raise ValueError(
            f"clean_corpus: unknown near_dup_method {near_dup_method!r} "
            "(expected 'jaccard' or 'minhash')"
        )
    if span_policy not in ("remove", None):
        raise ValueError(
            f"clean_corpus: unknown span_policy {span_policy!r} "
            "(expected 'remove' or None)"
        )
    if segment_policy not in ("boilerplate", "dedup", None):
        raise ValueError(
            f"clean_corpus: unknown segment_policy {segment_policy!r} "
            "(expected 'boilerplate', 'dedup', or None)"
        )
    scored = docs.withColumn(quality_col, TA.quality_score(text_col)).filter(
        F.col(quality_col) >= quality_min
    )
    # CCNet order: scrub BEFORE fingerprinting. seg frame pinned — the
    # boilerplate stage traverses its input three times (df table,
    # occurrence explode, reassembly base)
    if segment_policy is None:
        scrubbed = scored
    else:
        seg = pin(scored.withColumn("_cc_segs", segmenter).drop(text_col))
        kept_segs = (
            LN.drop_boilerplate(seg, id_col, "_cc_segs", boiler_min_df)
            if segment_policy == "boilerplate"
            else LN.dedup_segments(seg, id_col, "_cc_segs")
        )
        scrubbed = pin(
            kept_segs.select(
                *[c for c in kept_segs.columns if c != "_cc_segs"],
                F.concat_ws(rejoin_sep, "_cc_segs").alias(text_col),
            ).filter(F.col(text_col) != "")
        )
    if span_policy == "remove":
        scrubbed = pin(
            SP.remove_duplicated_spans(
                scrubbed, id_col, text_col,
                span_len=span_len, min_count=span_min_count,
            ).filter(F.col(text_col) != "")
        )
    kept1 = TD.exact_dedup(scrubbed, id_col, text_col)
    pair_fn = (
        TD.ngram_jaccard_pairs
        if near_dup_method == "jaccard"
        else TD.minhash_lsh_pairs
    )
    near = (
        pair_fn(
            kept1, id_col, text_col, shingle_n=shingle_n,
            threshold=jaccard_threshold,
        )
        .select(F.col("doc_b").alias(id_col))
        .distinct()
    )
    kept2 = kept1.join(near, id_col, "left_anti")
    if eval_df is None:
        return kept2.withColumn("contaminated", F.lit(False))
    bad = DC.contaminated_ids(kept2, eval_df, id_col, text_col, n=decon_n).select(
        id_col, F.lit(True).alias("_cc_contam")
    )
    # pinned: survivor stats and any downstream selection each evaluate this
    # frame, and every evaluation would replay the Jaccard/decon subtrees
    # fused single select (vs withColumn + drop): the join output's tree is
    # the entire pipeline — every extra transformation re-walks it
    return pin(
        kept2.join(bad, id_col, "left").select(
            *kept2.columns,
            F.coalesce("_cc_contam", F.lit(False)).alias("contaminated"),
        )
    )
