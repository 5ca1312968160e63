"""Deduplication operators — exact, MinHash+LSH, SimHash, n-gram Jaccard and
embedding-cosine near-dup, designed for 100 TB corpora.

Scale design:
- **exact**: hash-groupBy on a content fingerprint — one shuffle keyed on the
  fingerprint, map-side combinable.
- **MinHash+LSH**: signatures are a single ``transform(sequence(0,k-1), ...)``
  expression (no UDF, no explode); banding explodes k/r band keys per doc and
  self-joins on (band, band_hash) — the shuffle is keyed on band hashes, which
  are uniform by construction (no skew). Candidates are then verified with the
  exact Jaccard on shingle sets. This is the shape of every published web-scale
  dedup (e.g. the C4/RefinedWeb pipelines): candidate generation cost
  O(docs · bands), never O(docs²).
- **SimHash**: 64-bit signature folded from token hashes with
  ``aggregate``/``zip_with`` bit-vector sums — per-row work O(tokens · 64) in
  codegen, then near-dup detection by Hamming distance on signature prefixes.
- **brute-force variants** (n-gram Jaccard, embedding cosine) are quadratic and
  exist as the *oracle/verification* path and for small candidate pools —
  production flows go through LSH first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from switchback_test_dag_spark.text.analysis import content_fingerprint, word_shingles


# --------------------------------------------------------------------------- #
# exact dedup
# --------------------------------------------------------------------------- #


def exact_duplicate_groups(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Groups of byte-identical (after whitespace/case normalization) docs:
    fingerprint → groupBy → keep groups with >1 member. One shuffle."""
    return (
        df.select(F.col(id_col), content_fingerprint(text_col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("keeper_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep one representative (min id) per content fingerprint. The standard
    first pass of any corpus pipeline; shuffle keyed on the fingerprint."""
    w_keep = (
        df.select(F.col(id_col), content_fingerprint(text_col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias(id_col))
    )
    return df.join(w_keep, on=id_col, how="left_semi")


# --------------------------------------------------------------------------- #
# MinHash + LSH
# --------------------------------------------------------------------------- #


def minhash_signature(shingle_col: str, k: int = 64) -> Column:
    """k-permutation MinHash signature as ``array<bigint>``: hash function j is
    ``xxhash64(shingle, j)``; signature[j] = min over shingles. One expression,
    O(|shingles|·k) per row inside codegen. Empty shingle sets → array of NULLs
    (callers drop them)."""
    return F.expr(
        f"""transform(sequence(0, {k - 1}),
                      j -> array_min(transform({shingle_col}, s -> xxhash64(s, j))))"""
    )


def lsh_band_keys(sig_col: str, bands: int, rows: int) -> Column:
    """Band keys: xxhash64 of each r-row slice of the signature →
    ``array<struct<band:int, key:bigint>>``. Docs agreeing on any band collide."""
    return F.expr(
        f"""transform(sequence(0, {bands - 1}),
                      b -> struct(b AS band,
                                  xxhash64(array_join(slice({sig_col}, b * {rows} + 1, {rows}), ',')) AS key))"""
    )


def exact_jaccard(a_col: str, b_col: str) -> Column:
    """|A∩B| / |A∪B| over two (distinct-element) array columns; 0.0 when the
    union is empty (ANSI-safe)."""
    inter = f"size(array_intersect({a_col}, {b_col}))"
    union = f"size({a_col}) + size({b_col}) - {inter}"
    return F.expr(
        f"CASE WHEN {union} = 0 THEN 0.0 ELSE CAST({inter} AS DOUBLE) / ({union}) END"
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    k: int = 64,
    bands: int = 16,
    threshold: float = 0.85,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, exact Jaccard ≥ threshold) via
    MinHash-LSH candidate generation + exact verification.

    rows-per-band r = k/bands; detection prob of a pair with true Jaccard s is
    1−(1−s^r)^bands (defaults: ≥1−4e-8 at s=0.9). The candidate self-join is
    keyed on uniform band hashes — no skew; verification joins shingle sets
    back only for candidates (LSH output ≪ docs²).
    """
    rows = k // bands
    # persist() is load-bearing, not a cache nicety: without the materialization
    # boundary CollapseProject inlines the O(tokens) shingle expression into the
    # signature lambda and it is re-evaluated k times per row (64× slowdown
    # measured). The shingle set is also reused by the verification join.
    shingled = (
        df.select(
            F.col(id_col).alias("doc"),
            word_shingles(text_col, shingle_n).alias("sh"),
        )
        .filter(F.size("sh") > 0)
        .persist()
    )
    sig = shingled.select(
        "doc", "sh", minhash_signature("sh", k).alias("sig")
    )
    banded = sig.select(
        "doc", F.explode(lsh_band_keys("sig", bands, rows)).alias("bk")
    ).select("doc", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a, b = banded.alias("a"), banded.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )
    sh_a = shingled.select(F.col("doc").alias("doc_a"), F.col("sh").alias("sh_a"))
    sh_b = shingled.select(F.col("doc").alias("doc_b"), F.col("sh").alias("sh_b"))
    return (
        candidates.join(sh_a, "doc_a")
        .join(sh_b, "doc_b")
        .withColumn("jaccard", exact_jaccard("sh_a", "sh_b"))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard"))
    )


def minhash_dedup(
    df: DataFrame, id_col: str, text_col: str, **lsh_kwargs
) -> DataFrame:
    """Drop near-duplicates: every doc appearing as the greater id of a
    near-dup pair is removed (greedy min-id keeper — the C4-style policy)."""
    pairs = minhash_lsh_pairs(df, id_col, text_col, **lsh_kwargs)
    losers = pairs.select(F.col("doc_b").alias(id_col)).distinct()
    return df.join(losers, on=id_col, how="left_anti")


# --------------------------------------------------------------------------- #
# SimHash
# --------------------------------------------------------------------------- #


def simhash(token_col: str, bits: int = 64) -> Column:
    """SimHash signature of a token array: per-bit sum of ±1 votes from each
    token's xxhash64, sign-folded into a ``bits``-wide bigint.

    Expressed as ``aggregate`` over tokens with a ``zip_with`` bit-vector
    accumulator — stays in codegen; no UDF, no explode.
    """
    return F.expr(
        f"""aggregate(
              transform(sequence(0, {bits - 1}),
                        i -> CASE WHEN aggregate({token_col}, 0L,
                                    (acc, t) -> acc + CASE WHEN shiftright(xxhash64(t), i) % 2 != 0 THEN 1 ELSE -1 END) > 0
                             THEN shiftleft(1L, i) ELSE 0L END),
              0L, (acc, x) -> acc + x)"""
    )


def hamming64(a_col: str, b_col: str) -> Column:
    """Hamming distance between two 64-bit signatures: popcount of XOR."""
    return F.expr(f"bit_count({a_col} ^ {b_col})")


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    prefix_bits: int = 16,
) -> DataFrame:
    """Near-dup pairs by SimHash: candidates share one of 4 16-bit signature
    chunks (pigeonhole: any pair within Hamming ≤ 3 of 64 bits agrees on ≥1 of
    4 chunks), verified by full Hamming distance. Candidate join is keyed on
    (chunk index, chunk value) — uniform, skew-free."""
    from switchback_test_dag_spark.text.analysis import tokens

    n_chunks = 64 // prefix_bits
    # persist boundary: stops CollapseProject from inlining the tokenization
    # into the 64-iteration bit lambda (see minhash_lsh_pairs)
    toks = (
        df.select(F.col(id_col).alias("doc"), tokens(text_col).alias("__toks"))
        .filter(F.size("__toks") > 0)
        .persist()
    )
    sigs = toks.select("doc", simhash("__toks").alias("sig"))
    chunks = sigs.select(
        "doc",
        "sig",
        F.explode(
            F.expr(
                f"""transform(sequence(0, {n_chunks - 1}),
                              c -> struct(c AS chunk,
                                          shiftright(sig, c * {prefix_bits}) & {(1 << prefix_bits) - 1} AS val))"""
            )
        ).alias("ck"),
    ).select("doc", "sig", F.col("ck.chunk").alias("chunk"), F.col("ck.val").alias("val"))
    a, b = chunks.alias("a"), chunks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.expr("bit_count(a.sig ^ b.sig)").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# --------------------------------------------------------------------------- #
# brute-force verification paths
# --------------------------------------------------------------------------- #


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.85,
) -> DataFrame:
    """All-pairs exact n-gram Jaccard ≥ threshold. O(docs²) — the verification/
    oracle path; production uses :func:`minhash_lsh_pairs` for candidates."""
    shingled = df.select(
        F.col(id_col).alias("doc"), word_shingles(text_col, shingle_n).alias("sh")
    ).filter(F.size("sh") > 0)
    a = shingled.select(F.col("doc").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = shingled.select(F.col("doc").alias("doc_b"), F.col("sh").alias("sh_b"))
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .withColumn("jaccard", exact_jaccard("sh_a", "sh_b"))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard"))
    )


def cosine_sim(a_col: str, b_col: str) -> Column:
    """Cosine similarity of two float-array columns via zip_with/aggregate dot
    products (JVM-side; no UDF). 0.0 for zero-norm inputs (ANSI-safe)."""
    dot = f"aggregate(zip_with({a_col}, {b_col}, (x, y) -> CAST(x AS DOUBLE) * y), 0D, (acc, v) -> acc + v)"
    na = f"sqrt(aggregate({a_col}, 0D, (acc, v) -> acc + CAST(v AS DOUBLE) * v))"
    nb = f"sqrt(aggregate({b_col}, 0D, (acc, v) -> acc + CAST(v AS DOUBLE) * v))"
    return F.expr(
        f"CASE WHEN {na} = 0 OR {nb} = 0 THEN 0.0 ELSE {dot} / ({na} * {nb}) END"
    )


def embedding_near_dup_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.95
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, cosine ≥ threshold).
    Brute-force all-pairs — correct for ≤10⁵ vectors / verification; at corpus
    scale generate candidates with :func:`vectors.similarity.hyperplane_lsh_topk`
    buckets first."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine_sim("va", "vb"))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))
    )
