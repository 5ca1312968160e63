"""Document / embedding operator queries (training-data pipeline extensions:
dedup, similarity search, text analysis, multimodal plumbing), each with a
DuckDB oracle where SQL-expressible. Registered into ``queries.QUERIES`` on
import (see bottom of ``queries.py``).

Oracle parity notes:
- tokenization is pinned on both engines as: lowercase → split on ``\\s+`` →
  drop empties; shingles are space-joined word 3-grams, distinct;
- Jaccard/cosine are rounded to 4 decimals on both sides;
- MinHash signatures use xxhash64, which DuckDB lacks → that query's oracle is
  the *brute-force exact* equivalent (the LSH result must equal the exact
  result at these similarity margins); SimHash uses portable md5-prefix token
  hashes so its oracle replays the signatures verbatim; the approximate ANN
  queries emit hash-checked recall@k contracts (``VS.recall_gate``) — every
  registered query carries a value-level oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from switchback_test_dag_spark.io import load_table
from switchback_test_dag_spark.plans import packing as PK
from switchback_test_dag_spark.plans import sampling as PS
from switchback_test_dag_spark.queries import query
from switchback_test_dag_spark.text import analysis as TA
from switchback_test_dag_spark.text import decontaminate as DC
from switchback_test_dag_spark.text import dedup as TD
from switchback_test_dag_spark.text import spans as SP
from switchback_test_dag_spark.vectors import similarity as VS

# DuckDB-side token/shingle builders (kept in one place so every oracle agrees)
_DUCK_TOKS = "list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x != '')"
_DUCK_SH3 = (
    "list_distinct([array_to_string(toks[i:i+2], ' ') "
    "for i in generate_series(1, len(toks) - 2)])"
)
_DUCK_JACCARD_PAIRS = f"""
WITH tk AS (
  SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
), sh AS (
  SELECT doc_id, {_DUCK_SH3} AS sh FROM tk WHERE len(toks) >= 3
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         len(list_intersect(a.sh, b.sh)) AS i,
         len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS u
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, round(i * 1.0 / u, 4) AS jaccard
FROM pairs WHERE u > 0 AND i * 1.0 / u >= 0.85
"""


# --------------------------------------------------------------------------- #
# text analysis
# --------------------------------------------------------------------------- #


def _duck_profile_score(words: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter({_DUCK_TOKS}, x -> list_contains([{lst}], x)))"


def _duck_lang_case() -> str:
    scores = {lang: _duck_profile_score(ws) for lang, ws in TA.LANG_PROFILES.items()}
    best = "greatest(" + ", ".join(scores.values()) + ")"
    cases = " ".join(f"WHEN {e} = {best} THEN '{lang}'" for lang, e in scores.items())
    return f"CASE WHEN {best} < 1 THEN 'und' ELSE CASE {cases} END END"


_DUCK_SW = _duck_profile_score(TA.LANG_PROFILES["en"])
_DUCK_NTOK = f"len({_DUCK_TOKS})"
_DUCK_QUALITY = f"""(
    0.25 * least(1.0, length(text) / 500.0)
  + 0.25 * least(1.0, (CASE WHEN {_DUCK_NTOK} = 0 THEN 0.0 ELSE CAST({_DUCK_SW} AS DOUBLE) / {_DUCK_NTOK} END) * 4)
  + 0.25 * (1 - least(1.0, (CASE WHEN length(text) = 0 THEN 0.0
                            ELSE CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE) / length(text) END) * 5))
  + 0.25 * (CASE WHEN {_DUCK_NTOK} > 0
                  AND CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE) / {_DUCK_NTOK} BETWEEN 3 AND 10
            THEN 1.0 ELSE 0.0 END)
)"""


# PII differential: every 10th doc gets a deterministic synthetic email
# appended (both engines replay the same injection), so the pattern counts
# and the redaction length delta are non-trivially value-hashed — zeros on
# the injected slice would mean a broken pattern, nonzeros elsewhere a
# false-positive regression. Patterns are spliced with single backslashes for
# DuckDB (its standard strings don't process escapes; Spark SQL literals do,
# hence the doubled form in text/analysis.PII_PATTERNS).
def _duck_pii_sql() -> tuple[str, str, str]:
    pats = {k: p.replace("\\\\", "\\") for k, p in TA.PII_PATTERNS.items()}
    hits = " + ".join(
        f"len(regexp_extract_all(aug, '{p}'))" for p in pats.values()
    )
    red, redb = "aug", "aug"
    for name, p in pats.items():
        red = f"regexp_replace({red}, '{p}', '<{name}>', 'g')"
        # the token_fmt parameterization exercised with a second, caller-style
        # format ("[kind]") — same no-re-match invariant, different tokens
        redb = f"regexp_replace({redb}, '{p}', '[{name}]', 'g')"
    return hits, red, redb


_DUCK_PII_HITS, _DUCK_PII_RED, _DUCK_PII_RED_BRACKET = _duck_pii_sql()

_DUCK_AUG = (
    "CASE WHEN doc_id % 10 = 0 THEN text || ' contact u' || CAST(doc_id AS VARCHAR)"
    " || '@ex.com' ELSE text END"
)

# Sampling membership contract (driver-oracle row for plans/sampling): the
# portable md5-permutation rank is replayed verbatim in DuckDB, and membership
# is pinned per stratum as (count, sum of a 40-bit id hash) — a changed set
# breaks the value hash even when counts agree. 10 hex digits keep the sum far
# from BIGINT overflow at any benched scale (1M sampled rows × 2^40 < 2^61).
_DUCK_ID_HASH = "('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 10))::BIGINT"
_DUCK_SAMPLING = f"""
samp AS (
  SELECT source, doc_id,
         row_number() OVER (PARTITION BY source
           ORDER BY substring(md5(CAST(doc_id AS VARCHAR) || ':3'), 1, 16), doc_id) AS rk,
         count(*) OVER (PARTITION BY source) AS n
  FROM documents
), sagg AS (
  SELECT source,
         count(CASE WHEN rk <= 7 THEN 1 END) AS n_sampled_k7,
         CAST(sum(CASE WHEN rk <= 7 THEN {_DUCK_ID_HASH} END) AS BIGINT) AS sampled_id_hash
  FROM samp GROUP BY source
), fsamp AS (
  SELECT source, doc_id,
         row_number() OVER (PARTITION BY source
           ORDER BY substring(md5(CAST(doc_id AS VARCHAR) || ':5'), 1, 16), doc_id) AS rk,
         count(*) OVER (PARTITION BY source) AS n
  FROM documents
), fagg AS (
  SELECT source,
         count(CASE WHEN rk <= floor(n * 0.25 + 0.5) THEN 1 END) AS n_frac_sampled,
         CAST(sum(CASE WHEN rk <= floor(n * 0.25 + 0.5) THEN {_DUCK_ID_HASH} END) AS BIGINT) AS frac_id_hash
  FROM fsamp GROUP BY source
)"""

# Sequence-packing contract (driver-oracle row for plans/packing): the
# portable next-fit assignment is replayed as a recursive CTE — one row per
# doc stepping rn -> rn+1 within (source, bucket) — and pinned per source as
# sequence count, max fill, the multi-doc-overflow invariant (always 0), and
# an assignment-sensitive checksum sum(id_hash32 * seq). 8 hex digits (32-bit
# hash) keep the checksum inside BIGINT at every benched scale factor
# (5e5 docs × 4.3e9 × seq ≈ 1e17 at 100×).
_PACK_BUDGET, _PACK_BUCKETS, _PACK_SEED = 512, 4, 9
_DUCK_ID_HASH32 = "('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT"
_DUCK_PACKING = f"""
pkh AS (
  SELECT source, doc_id, len({_DUCK_TOKS}) AS toks,
         ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':{_PACK_SEED}'), 1, 15))::BIGINT AS h
  FROM documents
), pkd AS MATERIALIZED (
  -- MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, so the
  -- recursive walk below would otherwise recompute the md5 + window pipeline
  -- over every document on EVERY iteration — depth x corpus work that
  -- measured in CPU-hours at the 100x point. Materialized, each iteration
  -- probes a small real table and the full walk is seconds at 100x.
  SELECT source, doc_id, toks, h % {_PACK_BUCKETS} AS bucket,
         row_number() OVER (PARTITION BY source, h % {_PACK_BUCKETS} ORDER BY h, doc_id) AS rn
  FROM pkh
), pk AS (
  SELECT source, bucket, rn, doc_id, toks, 1 AS seq, toks AS fill
  FROM pkd WHERE rn = 1
  UNION ALL
  SELECT n.source, n.bucket, n.rn, n.doc_id, n.toks,
         CASE WHEN p.fill + n.toks > {_PACK_BUDGET} THEN p.seq + 1 ELSE p.seq END,
         CASE WHEN p.fill + n.toks > {_PACK_BUDGET} THEN n.toks ELSE p.fill + n.toks END
  FROM pkd n JOIN pk p
    ON n.source = p.source AND n.bucket = p.bucket AND n.rn = p.rn + 1
), pseq AS (
  SELECT source, bucket, seq, sum(toks) AS fill, count(*) AS nd
  FROM pk GROUP BY 1, 2, 3
), pagg AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_pack_seqs,
         CAST(max(fill) AS BIGINT) AS pack_max_fill,
         CAST(count(CASE WHEN fill > {_PACK_BUDGET} AND nd > 1 THEN 1 END) AS BIGINT)
             AS pack_overflow_seqs
  FROM pseq GROUP BY source
), pchk AS (
  SELECT source, CAST(sum({_DUCK_ID_HASH32} * seq) AS BIGINT) AS pack_id_hash
  FROM pk GROUP BY source
)"""

# Repetition contract (driver-oracle row for text/analysis.repetition_stats,
# the Gopher-style repetition filters): per-doc top-token fraction and
# duplicate-2-gram occurrence fraction, replayed in SQL from the same token
# array and averaged per source. Docs with no tokens (or < 2 tokens for the
# gram signal) score 0.0 — LEFT joins from documents keep them in the avg.
_DUCK_REPETITION = f"""
rtc AS (
  SELECT source, doc_id, tok, count(*) AS c
  FROM (SELECT source, doc_id, unnest({_DUCK_TOKS}) AS tok FROM documents)
  GROUP BY 1, 2, 3
), rtagg AS (
  SELECT source, doc_id, CAST(max(c) AS DOUBLE) / sum(c) AS topf
  FROM rtc GROUP BY 1, 2
), rgc AS (
  SELECT source, doc_id, g, count(*) AS c
  FROM (
    SELECT source, doc_id,
           unnest([array_to_string(toks[i:i+1], ' ')
                   for i in generate_series(1, len(toks) - 1)]) AS g
    FROM (SELECT source, doc_id, {_DUCK_TOKS} AS toks FROM documents)
    WHERE len(toks) >= 2
  ) GROUP BY 1, 2, 3
), rgagg AS (
  SELECT source, doc_id,
         CAST(coalesce(sum(CASE WHEN c > 1 THEN c END), 0) AS DOUBLE) / sum(c) AS dupf
  FROM rgc GROUP BY 1, 2
), ragg AS (
  SELECT dd.source,
         round(avg(coalesce(t.topf, 0)), 6) AS avg_top_token_frac,
         round(avg(coalesce(g.dupf, 0)), 6) AS avg_dup_2gram_frac
  FROM documents dd
  LEFT JOIN rtagg t ON dd.doc_id = t.doc_id
  LEFT JOIN rgagg g ON dd.doc_id = g.doc_id
  GROUP BY dd.source
)"""

# Duplicated-span contract (driver-oracle row for text/spans — the fixed-L
# suffix-dedup approximation): the portable md5-prefix window keys are
# replayed in SQL, duplicated windows (count >= 2 corpus-wide) are joined
# back to their start positions, and per-doc coverage is the DISTINCT count
# of tokens inside any duplicated window (the interval union the Spark side
# computes with a fold). Averaged per source with every doc kept.
_SPAN_L = 4

# doc_text_profile text-pin size gate (see the query's docstring): below this
# many bytes of documents parquet, the (doc_id, source, text) base is pinned
# into the columnar cache (one text decode, O(1) branch trees — measured win
# at sf0.1's 0.6 MB); above it, text stays on per-branch pruned parquet scans
# (the cache build of the text bytes was the measured 6× sf10 cpu regression
# at ~60 MB, r13 §11). 16 MiB places the crossover inside the bracketed
# range; it is data-size-adaptive, not a core-count tune.
_TEXT_PIN_MAX_BYTES = 16 << 20


def _local_parquet_bytes(sf_dir: str, name: str) -> int:
    """On-disk bytes of a fixture table's parquet (file or directory), or a
    value above every pin gate when the path is not local/stat-able — remote
    storage means a real corpus, where the scan path is the right default."""
    import os as _os

    path = _os.path.join(sf_dir, f"{name}.parquet")
    try:
        if _os.path.isdir(path):
            return sum(
                _os.path.getsize(_os.path.join(root, f))
                for root, _dirs, files in _os.walk(path)
                for f in files
            )
        return _os.path.getsize(path)
    except OSError:
        return 1 << 62


_DUCK_SPANS = f"""
soc AS MATERIALIZED (
  SELECT doc_id, unnest(
    [struct_pack(pos := i - 1,
                 wk := substr(md5(array_to_string(toks[i:i+{_SPAN_L - 1}], ' ')), 1, 16))
     for i in generate_series(1, len(toks) - {_SPAN_L - 1})],
    recursive := true)
  FROM (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents)
), sdup AS (
  SELECT wk FROM soc GROUP BY wk HAVING count(*) >= 2
), shit AS (
  SELECT soc.doc_id, soc.pos FROM soc JOIN sdup USING (wk)
), shp AS (
  -- interval union via a running max of window ends: each duplicated window
  -- [pos, pos+L) contributes its tokens past the furthest end already seen
  -- (positions ascend, so the previous end never reaches pos+L)
  SELECT doc_id, pos,
         max(pos + {_SPAN_L}) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe
  FROM shit
), scov AS (
  SELECT doc_id,
         sum(pos + {_SPAN_L} - greatest(coalesce(pe, pos), pos)) AS covered
  FROM shp GROUP BY doc_id
), sfr AS (
  SELECT dd.source,
         round(avg(CASE WHEN len({_DUCK_TOKS}) > 0
                        THEN CAST(coalesce(sc.covered, 0) AS DOUBLE) / len({_DUCK_TOKS})
                        ELSE 0.0 END), 6) AS avg_dup_span_frac,
         count(CASE WHEN sc.covered > 0 THEN 1 END) AS n_dup_span_docs
  FROM documents dd LEFT JOIN scov sc ON dd.doc_id = sc.doc_id
  GROUP BY dd.source
), stok AS (
  -- span REMOVAL replay: original-case token rows of affected docs only
  SELECT doc_id, unnest(
    [struct_pack(pos := i - 1, tok := otoks[i])
     for i in generate_series(1, len(otoks))],
    recursive := true)
  FROM (SELECT doc_id,
               list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')
                 AS otoks
        FROM documents
        WHERE doc_id IN (SELECT DISTINCT doc_id FROM shit))
), smark AS (
  -- running max of duplicated-window ends marks covered token positions
  SELECT st.doc_id, st.pos, st.tok,
         max(sh.pos + {_SPAN_L}) OVER (
           PARTITION BY st.doc_id ORDER BY st.pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ce
  FROM stok st LEFT JOIN shit sh ON st.doc_id = sh.doc_id AND st.pos = sh.pos
), srebuilt AS (
  SELECT doc_id,
         coalesce(string_agg(CASE WHEN ce IS NULL OR pos >= ce THEN tok END,
                             ' ' ORDER BY pos), '') AS new_text,
         count(CASE WHEN ce IS NOT NULL AND pos < ce THEN 1 END) AS cut_toks
  FROM smark GROUP BY doc_id
), srem AS (
  SELECT dd.source,
         CAST(sum(coalesce(sr.cut_toks, 0)) AS BIGINT) AS span_cut_tokens,
         count(sr.doc_id) AS n_span_cut_docs,
         CAST(sum(('0x' || substring(md5(sr.new_text), 1, 10))::BIGINT)
              AS BIGINT) AS span_text_hash
  FROM documents dd LEFT JOIN srebuilt sr ON dd.doc_id = sr.doc_id
  GROUP BY dd.source
)"""


@query(
    "doc_text_profile",
    f"""WITH RECURSIVE d AS (SELECT source, text, {_DUCK_AUG} AS aug FROM documents),
       prof AS (
       SELECT source,
              count(*) AS n_docs,
              CAST(sum(len({_DUCK_TOKS})) AS BIGINT) AS total_tokens,
              CAST(sum(len(regexp_extract_all(text, '[a-zA-Z0-9_]+|[^a-zA-Z0-9_\\s]'))) AS BIGINT) AS total_bpe_tokens,
              round(avg(len({_DUCK_TOKS})), 4) AS avg_tokens,
              round(avg({_DUCK_QUALITY}), 6) AS avg_quality,
              count(CASE WHEN {_DUCK_QUALITY} >= 0.75 THEN 1 END) AS n_high,
              count(CASE WHEN {_duck_lang_case()} = 'en' THEN 1 END) AS n_lang_en,
              count(CASE WHEN {_duck_lang_case()} != 'en' THEN 1 END) AS n_lang_other,
              CAST(sum({_DUCK_PII_HITS}) AS BIGINT) AS total_pii_hits,
              count(CASE WHEN {_DUCK_PII_HITS} > 0 THEN 1 END) AS n_pii_docs,
              CAST(sum(length(aug) - length({_DUCK_PII_RED})) AS BIGINT)
                  AS redact_chars_removed,
              CAST(sum(length(aug) - length({_DUCK_PII_RED_BRACKET})) AS BIGINT)
                  AS redact_bracket_delta
       FROM d GROUP BY source), {_DUCK_SAMPLING}, {_DUCK_PACKING}, {_DUCK_REPETITION},
       {_DUCK_SPANS}
       SELECT prof.*, sagg.n_sampled_k7, sagg.sampled_id_hash,
              fagg.n_frac_sampled, fagg.frac_id_hash,
              pagg.n_pack_seqs, pagg.pack_max_fill, pagg.pack_overflow_seqs,
              pchk.pack_id_hash,
              ragg.avg_top_token_frac, ragg.avg_dup_2gram_frac,
              sfr.avg_dup_span_frac, sfr.n_dup_span_docs,
              srem.span_cut_tokens, srem.n_span_cut_docs, srem.span_text_hash
       FROM prof JOIN sagg USING (source) JOIN fagg USING (source)
            JOIN pagg USING (source) JOIN pchk USING (source)
            JOIN ragg USING (source) JOIN sfr USING (source)
            JOIN srem USING (source)""",
)
def doc_text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-analysis suite per source over the documents table: token counting
    (whitespace + BPE-ish regex) for corpus budgeting, composite quality
    scoring (length/stopword/punctuation/word-length — the cheap pre-filter of
    a pretraining pipeline), the language-ID heuristic (stopword-profile
    argmax) folded into per-source language counts, and the PII hygiene pass
    (``text/analysis.pii_counts`` / ``redact_pii`` — email/card/phone/IP
    patterns as pure codegen expressions, audited under BOTH the default and
    a caller-supplied ``token_fmt``) counted and length-audited against a
    deterministic email injection both engines replay.

    Also carries the deterministic-sampling membership contract
    (``plans/sampling``): per source, the count and 40-bit-id-hash sum of
    ``stratified_exact_sample(k=7)`` and ``stratified_fraction_sample(0.25)``
    memberships under the portable md5 permutation, which the oracle replays
    verbatim as a ``row_number`` window — a changed sample SET breaks the
    value hash even when the counts agree; the sequence-packing contract
    (``plans/packing``, next-fit walk replayed as a recursive CTE); and the
    Gopher-style repetition filters (``repetition_stats``: top-token
    fraction, duplicate-2-gram occurrence fraction) averaged per source; and
    the duplicated-span contract (``text/spans.duplicated_span_stats``, the
    fixed-L suffix-dedup approximation): per-source average duplicated-token
    coverage and the count of docs containing any corpus-duplicated
    ``_SPAN_L``-token window, portable md5-prefix window keys replayed
    verbatim in the oracle; and the span-REMOVAL contract
    (``text/spans.remove_duplicated_spans``): per-source tokens cut, docs
    affected, and a checksum of the rebuilt texts — the oracle re-performs
    the cut (running-max coverage over token rows, ordered string_agg), so
    the value hash pins the actual output text, not just counts.

    Scan shape: the profile aggregation itself is one documents pass, but
    each contract branch (sampling, packing, repetition, span stats, span
    removal) is its own scan subtree — Catalyst does not dedupe common
    subtrees, and the span operators additionally explode the text to token
    grain internally (and pin a starts frame, so InMemoryTableScans appear in
    the printed plan). The branches that only need METADATA — both samplers,
    the packing walk, and every branch's source re-attach join — derive from
    ONE barriered (doc_id, source, token-count) sliver: ``caching.barrier``
    persists it and re-roots each consumer at the cache's
    ``InMemoryRelation`` leaf, so the analyzer walks O(1) trees instead of
    re-copying a shared scan at each of the seven branch joins (the
    DeduplicateRelations compounding measured in OPTIMIZATION_r13.md §9;
    this query's assembly was ~1.8 s of driver-side construction at sf0.1
    before any pin, ~0.5 s with one). Whether the heavy ``text`` column
    enters that cache is SIZE-GATED (``_TEXT_PIN_MAX_BYTES``): the cache
    build re-encodes every text byte into the columnar cache ONCE, and its
    payoff is the ~4 parquet text decodes the other branches then skip —
    a trade that was measured to win at sf0.1 (0.6 MB of documents parquet:
    construction −1.3 s, cpu +0.02 s) and to LOSE 6× at sf10 (~60 MB:
    0.31 → 1.91 s cpu, the r13 §11 worktree A/B), so small inputs pin
    text and large inputs keep per-branch pruned parquet scans (each branch
    its OWN relation — nothing for DeduplicateRelations to copy, no text
    bytes in the cache). Unknown sizes (non-local storage — the 100 TB
    case by definition) take the scan path, the conservative-at-scale
    default."""
    from switchback_test_dag_spark.caching import barrier as _barrier

    if _local_parquet_bytes(sf_dir, "documents") <= _TEXT_PIN_MAX_BYTES:
        # small input: ONE pinned (doc_id, source, text) base, every branch
        # rooted at the cache's InMemoryRelation leaf (the r13 §11 shape —
        # the cache build is trivially cheap here and the barrier keeps
        # driver-side construction O(1) per branch)
        base = _barrier(
            load_table(spark, sf_dir, "documents").select(
                "doc_id", "source", "text"
            )
        )
        docs = base
        meta = base.select(
            "doc_id",
            "source",
            TA.token_count("text").cast("long").alias("_toks"),
        )

        def text_scan() -> DataFrame:
            return base.select("doc_id", "text")

    else:
        # large input: text stays on pruned parquet scans; only the
        # metadata sliver (ids, source, token counts) is pinned
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "source", "text"
        )
        meta = _barrier(
            load_table(spark, sf_dir, "documents").select(
                "doc_id",
                "source",
                TA.token_count("text").cast("long").alias("_toks"),
            )
        )

        def text_scan() -> DataFrame:
            return load_table(spark, sf_dir, "documents").select(
                "doc_id", "text"
            )

    sample_base = meta.select("doc_id", "source")  # pruned sliver for samplers
    pk_base = meta  # (doc_id, source, _toks) — the packing contract's input
    qs = TA.quality_score("text")
    lang = TA.lang_id("text")
    aug = F.when(
        F.col("doc_id") % 10 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact u"),
            F.col("doc_id").cast("string"),
            F.lit("@ex.com"),
        ),
    ).otherwise(F.col("text"))
    docs = docs.withColumn("aug", aug)
    pii_total = F.expr(
        "aggregate(map_values(_pii), 0, (acc, x) -> acc + x)"
    )
    docs = docs.withColumn("_pii", TA.pii_counts("aug")).withColumn(
        "_pii_n", pii_total
    )
    red_delta = F.length("aug") - F.length(TA.redact_pii("aug"))
    red_delta_b = F.length("aug") - F.length(
        TA.redact_pii("aug", token_fmt="[{kind}]")
    )
    prof = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(TA.token_count("text")).cast("long").alias("total_tokens"),
        F.sum(TA.bpe_token_count("text")).cast("long").alias("total_bpe_tokens"),
        F.round(F.avg(TA.token_count("text")), 4).alias("avg_tokens"),
        F.round(F.avg(qs), 6).alias("avg_quality"),
        F.count(F.when(qs >= 0.75, 1)).alias("n_high"),
        F.count(F.when(lang == "en", 1)).alias("n_lang_en"),
        F.count(F.when(lang != "en", 1)).alias("n_lang_other"),
        F.sum("_pii_n").cast("long").alias("total_pii_hits"),
        F.count(F.when(F.col("_pii_n") > 0, 1)).alias("n_pii_docs"),
        F.sum(red_delta).cast("long").alias("redact_chars_removed"),
        F.sum(red_delta_b).cast("long").alias("redact_bracket_delta"),
    )
    # sampling membership contract: run the real operators (portable md5
    # permutation) and pin each stratum's membership as (count, id-hash sum);
    # left join + coalesced counts so a stratum too small to draw from
    # (fraction target 0) still keeps its profile row with n=0/NULL hash,
    # exactly like the oracle's conditional aggregate
    id_hash = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 10), 16, 10)
        .cast("long")
    )
    exact_s = PS.stratified_exact_sample(
        sample_base, ["source"], "doc_id", k=7, seed=3, portable=True
    )
    sagg = exact_s.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_sampled_k7"),
        F.sum(id_hash).cast("long").alias("sampled_id_hash"),
    )
    frac_s = PS.stratified_fraction_sample(
        sample_base, ["source"], "doc_id", 0.25, seed=5, portable=True
    )
    fagg = frac_s.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_frac_sampled"),
        F.sum(id_hash).cast("long").alias("frac_id_hash"),
    )
    # sequence-packing contract: run the real operator (portable hash) and pin
    # per source the sequence count, max fill, the multi-doc-overflow
    # invariant, and an assignment-sensitive checksum — the oracle replays the
    # next-fit walk itself as a recursive CTE, so a changed ORDER or bucket
    # routing breaks the hash even when counts agree
    packed = PK.pack_documents(
        pk_base,
        "doc_id",
        "_toks",
        _PACK_BUDGET,
        strata=["source"],
        n_buckets=_PACK_BUCKETS,
        seed=_PACK_SEED,
        portable=True,
    )
    id_hash32 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    pagg = PK.pack_stats(packed, "_toks", _PACK_BUDGET, strata=["source"]).select(
        "source",
        F.col("n_sequences").cast("long").alias("n_pack_seqs"),
        F.col("max_seq_fill").alias("pack_max_fill"),
        F.col("n_overflow_seqs").cast("long").alias("pack_overflow_seqs"),
    )
    pchk = packed.groupBy("source").agg(
        F.sum(id_hash32 * F.col("seq")).cast("long").alias("pack_id_hash")
    )
    # repetition contract: the Gopher-style per-doc repetition signals
    # averaged per source (docs too short for a signal score 0.0 and stay in
    # the average — repetition_stats left-joins every input row back)
    rep = TA.repetition_stats(text_scan(), "doc_id", "text", ngram_n=2)
    ragg = rep.join(sample_base, "doc_id").groupBy("source").agg(
        F.round(F.avg("top_token_frac"), 6).alias("avg_top_token_frac"),
        F.round(F.avg("dup_ngram_frac"), 6).alias("avg_dup_2gram_frac"),
    )
    # duplicated-span contract (text/spans): per-source coverage average and
    # count of documents containing any duplicated fixed-L window, portable
    # keys so the oracle replays the exact grouping
    span = SP.duplicated_span_stats(
        text_scan(), "doc_id", "text", span_len=_SPAN_L, portable=True
    )
    spagg = span.join(sample_base, "doc_id").groupBy("source").agg(
        F.round(F.avg("dup_token_frac"), 6).alias("avg_dup_span_frac"),
        F.count(F.when(F.col("n_dup_positions") > 0, 1)).alias("n_dup_span_docs"),
    )
    # span-REMOVAL contract (text/spans.remove_duplicated_spans): per-source
    # tokens cut, documents affected, and a value-sensitive checksum of the
    # REBUILT texts (40-bit md5-prefix sum) — the oracle replays the cut
    # itself (token rows of affected docs, running-max coverage, ordered
    # string_agg), so a single moved/kept token breaks the hash
    cut = SP.remove_duplicated_spans(
        text_scan(), "doc_id", "text", span_len=_SPAN_L, portable=True
    )
    cut_text_hash = F.conv(
        F.substring(F.md5(F.col("text")), 1, 10), 16, 10
    ).cast("long")
    cagg = cut.join(sample_base, "doc_id").groupBy("source").agg(
        F.sum("spans_cut_tokens").cast("long").alias("span_cut_tokens"),
        F.count(F.when(F.col("spans_cut_tokens") > 0, 1)).alias("n_span_cut_docs"),
        F.sum(F.when(F.col("spans_cut_tokens") > 0, cut_text_hash))
        .cast("long")
        .alias("span_text_hash"),
    )
    return (
        prof.join(F.broadcast(sagg), "source", "left")
        .join(F.broadcast(fagg), "source", "left")
        .join(F.broadcast(pagg), "source", "left")
        .join(F.broadcast(pchk), "source", "left")
        .join(F.broadcast(ragg), "source", "left")
        .join(F.broadcast(spagg), "source", "left")
        .join(F.broadcast(cagg), "source", "left")
        .withColumn("n_sampled_k7", F.coalesce("n_sampled_k7", F.lit(0)).cast("long"))
        .withColumn(
            "n_frac_sampled", F.coalesce("n_frac_sampled", F.lit(0)).cast("long")
        )
    )


@query(
    "doc_fingerprint_dups",
    """WITH u AS (
         SELECT doc_id, text FROM documents
         UNION ALL
         SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 50 = 0
       )
       SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint,
              count(*) AS n_docs, min(doc_id) AS keeper_id
       FROM u GROUP BY fingerprint HAVING count(*) > 1""",
)
def doc_fingerprint_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content fingerprint (md5 of normalized text): the corpus
    unioned with a shifted copy of every 50th doc — duplicate groups found by
    hash-groupBy (one shuffle keyed on the fingerprint)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    copies = docs.filter(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    return TD.exact_duplicate_groups(docs.unionByName(copies), "doc_id", "text")


@query(
    "doc_winnow_pairs",
    f"""WITH tk AS (
         SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
       ), sh AS (
         SELECT doc_id,
                [array_to_string(toks[i:i+2], ' ') for i in generate_series(1, len(toks) - 2)] AS sh
         FROM tk WHERE len(toks) >= 6
       ), h AS (
         SELECT doc_id, list_transform(sh, s -> substring(md5(s), 1, 16)) AS h FROM sh
       ), fp AS (
         SELECT doc_id, unnest(list_distinct([list_min(h[j:j+3]) for j in generate_series(1, len(h) - 3)])) AS fingerprint
         FROM h
       ), keep AS (
         SELECT fingerprint FROM fp GROUP BY fingerprint HAVING count(*) <= 10
       ), fpc AS (
         SELECT fp.doc_id, fp.fingerprint FROM fp JOIN keep USING (fingerprint)
       ), pairs AS (
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
         FROM fpc a JOIN fpc b ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
         GROUP BY 1, 2
       )
       SELECT doc_a, doc_b, CAST(n_shared AS BIGINT) AS n_shared
       FROM pairs WHERE n_shared >= 2""",
)
def doc_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprinting (MOSS winnowing, word 3-grams,
    window 4): doc pairs sharing ≥ 2 selected fingerprints — the
    plagiarism-detector shape. The md5-prefix rolling hash is kept as a hex
    STRING so window minima are engine-portable, and the oracle replays the
    exact winnowing selection in SQL (not just a downstream aggregate).

    Runs the production configuration: MOSS's boilerplate rule ``max_df=10``
    (Schleimer et al. §4 — fingerprints in "many documents" are template
    text, and each contributes df² join rows). The cap is replayed in the
    oracle as a plain HAVING on fingerprint document frequency, so the
    capped semantics are value-diffed too. At the sf0.01 fixture the corpus
    max df is 7 — the cap provably changes nothing there — while at sf1 it
    removes the dominant quadratic term (measured 13.4× wall at 10× data
    uncapped)."""
    docs = load_table(spark, sf_dir, "documents")
    return TD.winnow_shared_pairs(
        docs, "doc_id", "text", shingle_n=3, window=4, min_shared=2, max_df=10
    )


# --------------------------------------------------------------------------- #
# dedup
# --------------------------------------------------------------------------- #


# the LSH pair query also labels each pair with its duplicate CLUSTER
# (connected component, canonical min-id label); the oracle replays the
# component computation as a recursive reachability CTE over the exact pairs
_DUCK_LSH_COMPONENTS = (
    _DUCK_JACCARD_PAIRS.replace(
        "SELECT doc_a, doc_b, round(i * 1.0 / u, 4) AS jaccard\nFROM pairs WHERE u > 0 AND i * 1.0 / u >= 0.85",
        """, fpairs AS (
  SELECT doc_a, doc_b, round(i * 1.0 / u, 4) AS jaccard
  FROM pairs WHERE u > 0 AND i * 1.0 / u >= 0.85
), sym AS (
  SELECT doc_a AS a, doc_b AS b FROM fpairs
  UNION SELECT doc_b, doc_a FROM fpairs
), reach AS (
  SELECT a AS node, a AS r FROM sym
  UNION
  SELECT s.a, rr.r FROM sym s JOIN reach rr ON s.b = rr.node
), comp AS (
  SELECT node, min(r) AS component FROM reach GROUP BY node
)
SELECT p.doc_a, p.doc_b, p.jaccard, c.component
FROM fpairs p JOIN comp c ON p.doc_a = c.node""",
    ).replace("WITH tk AS (", "WITH RECURSIVE tk AS (")
)


@query("doc_minhash_lsh_pairs", _DUCK_LSH_COMPONENTS)
def doc_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs, exact-Jaccard verified at threshold 0.85,
    each pair labeled with its duplicate CLUSTER id
    (``text/dedup.connected_components`` — iterative min-label propagation,
    the canonical-keeper step pairwise dedup policies get wrong on
    transitive duplicates).

    Oracle is the brute-force all-pairs Jaccard (at the fixture's similarity
    margins — planted dups ≥ 0.9 — the LSH miss probability is < 1e-7, so
    the approximate path must reproduce the exact result) with the component
    labels replayed as a recursive reachability CTE: an iteration bug that
    under-propagates a label, or a symmetry bug that misses a direction,
    breaks the hash."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = TD.minhash_lsh_pairs(
        docs, "doc_id", "text", shingle_n=3, k=64, bands=16, threshold=0.85
    # materialize the pair set once: it feeds BOTH the component computation
    # and the final label join — without the boundary the whole LSH pipeline
    # runs twice
    ).localCheckpoint()
    comp = TD.connected_components(pairs, "doc_a", "doc_b")
    return pairs.join(
        comp.select(F.col("node").alias("doc_a"), "component"), "doc_a"
    )


@query("doc_ngram_jaccard_pairs", _DUCK_JACCARD_PAIRS)
def doc_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force n-gram Jaccard near-dup pairs (the exact verification path —
    direct parity with the oracle)."""
    docs = load_table(spark, sf_dir, "documents")
    return TD.ngram_jaccard_pairs(docs, "doc_id", "text", shingle_n=3, threshold=0.85)


@query(
    "doc_simhash_pairs",
    f"""WITH tk AS (
         SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
       ), th AS (
         SELECT doc_id,
                list_transform(toks, t -> ('0x' || substring(md5(t), 1, 15))::BIGINT) AS th
         FROM tk WHERE len(toks) > 0
       ), sig AS (
         SELECT doc_id,
                CAST(list_sum(
                  [CASE WHEN list_sum([CASE WHEN (h >> i) & 1 != 0 THEN 1 ELSE -1 END
                                       for h in th]) > 0
                        THEN 1::BIGINT << i ELSE 0::BIGINT END
                   for i in generate_series(0, 59)]) AS BIGINT) AS sig
         FROM th
       ), ck AS (
         SELECT doc_id, sig, c AS chunk, (sig >> (c * 15)) & 32767 AS val
         FROM sig, unnest(generate_series(0, 3)) AS t(c)
       ), pairs AS (
         SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
         FROM ck a JOIN ck b
           ON a.chunk = b.chunk AND a.val = b.val AND a.doc_id < b.doc_id
       )
       SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= 3""",
)
def doc_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (Hamming ≤ 3 of 60 bits via 15-bit chunk
    pigeonhole candidates — exact for this radius). Token hashes are portable
    md5-prefix bigints (the winnowing trick, text/dedup.py), so the oracle
    replays signature construction, pigeonhole candidate generation, and
    Hamming verification bit-for-bit in DuckDB. Recall against planted dups is
    additionally pytest-verified (tests/test_text_dedup.py)."""
    docs = load_table(spark, sf_dir, "documents")
    return TD.simhash_pairs(docs, "doc_id", "text", max_hamming=3)


# Bound sits far under the measured LSH pair-recall minima (0.997-1.000 at
# 4 planes × 8 OR-ed tables across sf0.001/0.01/0.1 — this fixture's 0.4
# threshold is the HARD case for hyperplane LSH; production 0.95 needs fewer
# tables) yet far above where a real index regression (broken plane family,
# wrong probe set, lost table) lands.
_EMB_LSH_RECALL_BOUND = 0.8


@query(
    "emb_near_dup_pairs",
    f"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
              round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                           CAST(b.embedding AS DOUBLE[])), 4) AS cosine,
              CAST({_EMB_LSH_RECALL_BOUND} AS DOUBLE) AS lsh_recall_floor
       FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])) >= 0.4""",
)
def emb_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs. Fixture embeddings are cluster-sampled
    (max pair cosine ≈ 0.51), so the demo threshold is 0.4; production
    near-dup removal uses ≥ 0.95 with LSH candidate generation.

    Carries the SCALE PATH's quality contract: the same pair set is also
    computed by ``embedding_near_dup_pairs_lsh`` (hyperplane buckets, OR-ed
    tables, no driver collect — what SCALE.md designates once the broadcast
    cap trips) and every output row gets ``lsh_recall_floor =
    least(round(pair_recall, 4), bound)`` — the ``recall_gate`` shape: the
    oracle predicts the constant bound, so an LSH recall regression surfaces
    as a lower value and fails the driver's hash check."""
    emb = load_table(spark, sf_dir, "embeddings")
    from switchback_test_dag_spark.caching import pin as _pin

    exact = _pin(
        TD.embedding_near_dup_pairs(emb, "vec_id", "embedding", threshold=0.4)
    )
    lsh = TD.embedding_near_dup_pairs_lsh(
        emb, "vec_id", "embedding", threshold=0.4, n_planes=4, n_tables=8
    )
    hits = lsh.join(exact.select("id_a", "id_b"), ["id_a", "id_b"], "left_semi")
    stats = hits.agg(F.count(F.lit(1)).alias("n_hit")).crossJoin(
        exact.agg(F.count(F.lit(1)).alias("n_ex"))
    )
    floor = stats.select(
        F.when(F.col("n_ex") == 0, F.lit(float(_EMB_LSH_RECALL_BOUND)))
        .otherwise(
            F.least(
                F.round(F.col("n_hit") / F.col("n_ex"), 4),
                F.lit(float(_EMB_LSH_RECALL_BOUND)),
            )
        )
        .alias("lsh_recall_floor")
    )
    return exact.crossJoin(F.broadcast(floor))


# --------------------------------------------------------------------------- #
# similarity search
# --------------------------------------------------------------------------- #


@query(
    "emb_cosine_topk",
    """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                  FROM embeddings WHERE vec_id < 5),
       scored AS (
         SELECT q.query_id, e.vec_id AS neighbor_id,
                round(list_cosine_similarity(qv, CAST(e.embedding AS DOUBLE[])), 4) AS cosine
         FROM embeddings e, q WHERE e.vec_id != q.query_id
       )
       SELECT query_id, neighbor_id, cosine,
              CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
       FROM scored
       QUALIFY rank <= 10""",
)
def emb_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-10 for 5 query vectors: broadcast queries,
    one corpus scan, window top-k keyed on query_id."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5)
    return VS.cosine_topk_bruteforce(emb, queries_df, "vec_id", "embedding", k=10)


# Bounds sit well under the measured per-query minima (LSH 0.6–0.7, IVF
# 0.8–0.9 across sf0.001/0.01/0.1) so a fixture regeneration with a new seed
# cannot flip the gate, while any real index regression (broken hash, wrong
# probe set, bad centroids) lands near zero and still fails the hash.
_LSH_RECALL_BOUND = 0.5
_IVF_RECALL_BOUND = 0.7


def _ann_gate_oracle(bound: float, extra_cols: str = "") -> str:
    """The recall-gate contract a SQL oracle can predict without replaying the
    index: one row per query with the recall floor pinned at ``bound``. Any
    query whose true recall@10 drops below the bound surfaces Spark-side as a
    lower value and fails the hash check."""
    return f"""SELECT vec_id AS query_id, 10 AS k,
              CAST({bound} AS DOUBLE) AS recall_floor{extra_cols}
       FROM embeddings WHERE vec_id < 5"""


@query("emb_lsh_topk", _ann_gate_oracle(_LSH_RECALL_BOUND))
def emb_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH approximate top-10 (n_planes=4, distance-2 multi-probe),
    hash-checked as a quality contract: the query runs the LSH search AND the
    exact brute force, then emits per-query score-threshold recall@10 floored
    at the gate bound (``VS.recall_gate``). The oracle predicts the constant
    floor, so recall regressions fail the driver's value hash — a stronger
    check than rows-only for an index that is approximate by design. Raw
    neighbor rows stay covered by tests/test_text_dedup.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5)
    approx = VS.hyperplane_lsh_topk(
        emb, queries_df, "vec_id", "embedding", k=10, n_planes=4, multiprobe=2
    )
    exact = VS.cosine_topk_bruteforce(emb, queries_df, "vec_id", "embedding", k=10)
    return VS.recall_gate(approx, exact, k=10, bound=_LSH_RECALL_BOUND)


@query(
    "emb_ivf_topk",
    _ann_gate_oracle(
        _IVF_RECALL_BOUND,
        extra_cols=f",\n              CAST({_IVF_RECALL_BOUND} AS DOUBLE)"
        " AS pq_recall_floor",
    ),
)
def emb_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-10 (spherical-k-means coarse quantizer trained on a
    deterministic sample; cell-keyed candidate join; n_probe=5 of 8 cells),
    hash-checked as a recall@10 ≥ 0.7 quality contract exactly like
    :func:`emb_lsh_topk` — PLUS the IVF-PQ memory dial's contract as a second
    column: ``pq_recall_floor`` runs :func:`VS.ivf_pq_topk` (the probe scan
    reads m-byte PQ codes instead of dim·4 float bytes — 16 bytes vs 256 at
    the query's m=16/dim=64 — ADC-shortlists k·refine candidates per query,
    then re-ranks with EXACT cosine from full vectors, so quantization can
    lower recall but never distort a reported score) under the SAME 0.7
    recall@10 floor. Folded into one query to stay inside the driver's
    50-query correctness window — the same-grain-suite pattern."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5)
    # ONE training-sample fetch and ONE coarse-quantizer training shared by
    # both indexes: the trainers are deterministic in (corpus, params, seed)
    # and define their sample identically, so sharing changes nothing — it
    # removes the duplicate corpus-wide TakeOrdered + driver transfer (the
    # PQ codebooks previously re-fetched the same 4096-vector sample) and
    # the duplicate driver k-means
    smp = VS.train_sample_matrix(emb, "vec_id", "embedding")
    cents = VS.train_ivf_centroids(
        emb, "vec_id", "embedding", n_cells=8, sample=smp
    )
    approx = VS.ivf_topk(
        emb, queries_df, "vec_id", "embedding", k=10, n_cells=8, n_probe=5,
        centroids=cents,
    )
    pq = VS.ivf_pq_topk(
        emb, queries_df, "vec_id", "embedding",
        k=10, n_cells=8, n_probe=6, m=16, refine=8, centroids=cents,
        sample=smp,
    )
    exact = VS.cosine_topk_bruteforce(emb, queries_df, "vec_id", "embedding", k=10)
    from switchback_test_dag_spark.caching import pin as _pin

    exact = _pin(exact)  # threshold side of BOTH gates — one brute-force pass
    ivf_gate = VS.recall_gate(approx, exact, k=10, bound=_IVF_RECALL_BOUND)
    pq_gate = VS.recall_gate(pq, exact, k=10, bound=_IVF_RECALL_BOUND).select(
        "query_id", F.col("recall_floor").alias("pq_recall_floor")
    )
    # broadcast: one row per query (5 at any scale — the query set is the
    # fixed vec_id < 5 slice), but the gate sides sit behind window/agg
    # chains whose size estimates keep the planner on a sort-merge join
    from pyspark.sql.functions import broadcast as _bc

    return ivf_gate.join(_bc(pq_gate), "query_id").select(
        "query_id", "k", "recall_floor", "pq_recall_floor"
    )


# --------------------------------------------------------------------------- #
# multimodal plumbing
# --------------------------------------------------------------------------- #


_DUCK_BMP_AGG = """
       SELECT source, CAST(count(*) AS BIGINT) AS n_media,
              CAST(sum(54 + ((3 * w + 3) // 4) * 4 * h) AS BIGINT) AS total_bytes,
              CAST(max(54 + ((3 * w + 3) // 4) * 4 * h) AS BIGINT) AS max_bytes,
              CAST(sum(w * h) AS BIGINT) AS total_px,
              CAST(sum(sr) AS BIGINT) AS sum_r,
              CAST(sum(sg) AS BIGINT) AS sum_g,
              CAST(sum(sb) AS BIGINT) AS sum_b,
              CAST(sum(ws) AS BIGINT) AS wsum,
              round(CAST(sum(sr) + sum(sg) + sum(sb) AS DOUBLE)
                    / CAST(sum(w * h) * 3 AS DOUBLE), 6) AS mean_px
       FROM bmp_per GROUP BY source"""

_DUCK_BMP_PER = """bmp_dims AS (
         SELECT doc_id, source, 8 + doc_id % 9 AS w, 6 + doc_id % 5 AS h
         FROM documents
       ), bmp_px AS (
         SELECT d.doc_id, d.source, d.w, d.h, r.r, c.c, k.k,
                (d.doc_id * 7 + r.r * 5 + c.c * 3 + k.k * 11) % 256 AS v
         FROM bmp_dims d,
              unnest(generate_series(0, d.h - 1)) AS r(r),
              unnest(generate_series(0, d.w - 1)) AS c(c),
              unnest(generate_series(0, 2)) AS k(k)
       ), bmp_per AS (
         SELECT doc_id, any_value(source) AS source,
                any_value(w) AS w, any_value(h) AS h,
                sum(CASE WHEN k = 0 THEN v ELSE 0 END) AS sr,
                sum(CASE WHEN k = 1 THEN v ELSE 0 END) AS sg,
                sum(CASE WHEN k = 2 THEN v ELSE 0 END) AS sb,
                sum(v * ((r * w + c) * 3 + k + 1)) AS ws
         FROM bmp_px GROUP BY doc_id
       )"""


def _fanout_docs(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Right-size the per-document codec stages: the documents parquet is
    compact (text compresses well), so `maxPartitionBytes` yields only a
    handful of scan splits — 1 at sf0.1, 8 at the 100x point — and the
    CPU-heavy Python encode/decode stages inherit that, idling most cores
    (measured: media_decode_suite ran ~11-way effective on 32 cores at 100x).
    Payload-byte budgets (`repartition_by_bytes`) are the wrong dial BEFORE
    synthesis when rows are still tiny ids; instead target ~500 docs per
    Arrow task, clamped to 4x the core count (each Python task costs ~20 ms
    of scheduling/Arrow setup locally, so a fixed 4x-cores fan-out measurably
    HURTS small inputs — 0.9 s -> 3.1 s on the sf0.1 bmp branch). The row
    count is one cheap metadata-backed job; the shuffled frame is a 2-column
    sliver."""
    target = min(
        df.count() // 500 + 1, spark.sparkContext.defaultParallelism * 4
    )
    return df.repartition(int(target)) if target > 1 else df


def _suite_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (doc_id, source) sliver every per-format branch fans out over.
    ``media_decode_suite`` builds it ONCE and passes it to all eight
    branches: the row-count job inside ``_fanout_docs`` and the documents
    scan otherwise re-ran once per branch — nine near-identical count jobs
    per suite evaluation for the same number (guide §1.2: don't compute
    things you throw away). Branch helpers keep the ``docs=None`` default so
    they stay independently callable."""
    return _fanout_docs(
        spark, load_table(spark, sf_dir, "documents").select("doc_id", "source")
    )


def _media_bmp_agg(spark: SparkSession, sf_dir: str, docs: DataFrame | None = None) -> DataFrame:
    """The multimodal component's REAL image codec path (superseding the
    payload-byte-accounting query, whose octet_length aggregates it absorbs):
    per-document BMP payloads (canonical 24-bit bottom-up BI_RGB bytes with
    per-id varying dimensions — multimodal/bmp.py) are decoded by the real
    DIB parser inside Arrow-batched ``mapInPandas``, yielding integer-exact
    dimension / byte-size / channel-sum / position-weighted-checksum features,
    aggregated per source. The oracle never sees bytes: it recomputes the same
    features from the closed-form pixel pattern AND the container-size formula
    ``54 + stride·h`` (stride = 4-byte-padded 3·w), so a parse bug anywhere —
    header offsets, row stride, bottom-up flip, BGR order — breaks the match.
    All features are exact integers until the final mean, so shuffle order
    cannot move any value."""
    from switchback_test_dag_spark.multimodal.media import (
        synth_decode_bmp_features,
    )

    docs = _suite_docs(spark, sf_dir) if docs is None else docs
    feats = synth_decode_bmp_features(docs, "doc_id")
    joined = feats.join(docs, feats.media_id == docs.doc_id)
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_media"),
        F.sum("n_bytes").cast("long").alias("total_bytes"),
        F.max("n_bytes").cast("long").alias("max_bytes"),
        F.sum(F.col("width").cast("long") * F.col("height")).cast("long").alias(
            "total_px"
        ),
        F.sum("sum_r").cast("long").alias("sum_r"),
        F.sum("sum_g").cast("long").alias("sum_g"),
        F.sum("sum_b").cast("long").alias("sum_b"),
        F.sum("wsum").cast("long").alias("wsum"),
        F.round(
            (F.sum("sum_r") + F.sum("sum_g") + F.sum("sum_b")).cast("double")
            / (F.sum(F.col("width").cast("long") * F.col("height")) * 3).cast(
                "double"
            ),
            6,
        ).alias("mean_px"),
    )


_DUCK_WAV_PER = """wav_s AS (
         SELECT d.doc_id, d.source,
                ((d.doc_id * 31 + t.i * 17) % 65536) - 32768 AS samp
         FROM documents d, unnest(generate_series(0, 255)) AS t(i)
       ), wav_per AS (
         SELECT doc_id, any_value(source) AS source, count(*) AS n,
                sum(samp * samp) AS ss, max(abs(samp)) AS pk
         FROM wav_s GROUP BY doc_id
       )"""

_DUCK_WAV_AGG = """
       SELECT source, CAST(count(*) AS BIGINT) AS n_media,
              CAST(sum(n) AS BIGINT) AS total_samples,
              round(sqrt(CAST(sum(ss) AS DOUBLE) / CAST(sum(n) AS DOUBLE)), 6) AS rms,
              CAST(max(pk) AS INTEGER) AS max_peak,
              CAST(sum(n) * 1000 // 8000 AS BIGINT) AS total_duration_ms
       FROM wav_per GROUP BY source"""


def _media_wav_agg(spark: SparkSession, sf_dir: str, docs: DataFrame | None = None) -> DataFrame:
    """The multimodal component's REAL codec path: per-document WAV payloads
    (spec-conformant RIFF PCM16 bytes, stdlib-``wave``-readable — see
    multimodal/wav.py) are decoded by the chunk-walking parser inside
    Arrow-batched ``mapInPandas``, yielding integer-exact energy/peak/count
    features, aggregated per source. The oracle never sees bytes: it recomputes
    the same features from the closed-form waveform generator, so a parse bug
    anywhere (header arithmetic, chunk offsets, endianness) breaks the match.
    Features are exact integers until the final rms sqrt, so shuffle order
    cannot move any value."""
    from switchback_test_dag_spark.multimodal.media import (
        synth_decode_wav_features,
    )

    docs = _suite_docs(spark, sf_dir) if docs is None else docs
    feats = synth_decode_wav_features(
        docs, "doc_id", n_samples=256, sample_rate=8000
    )
    joined = feats.join(docs, feats.media_id == docs.doc_id)
    total_n = F.sum("n_samples")
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_media"),
        total_n.cast("long").alias("total_samples"),
        F.round(
            F.sqrt(F.sum("sum_sq").cast("double") / total_n.cast("double")), 6
        ).alias("rms"),
        F.max("peak").alias("max_peak"),
        F.expr("(sum(n_samples) * 1000) div 8000").cast("long").alias(
            "total_duration_ms"
        ),
    )


_DUCK_PNG_PER = """png_dims AS (
         SELECT doc_id, source, 5 + doc_id % 11 AS w, 5 + doc_id % 7 AS h
         FROM documents
       ), png_px AS (
         SELECT d.doc_id, d.source, d.w, d.h, r.r, c.c, k.k,
                (d.doc_id * 7 + r.r * 5 + c.c * 3 + k.k * 11) % 256 AS v
         FROM png_dims d,
              unnest(generate_series(0, d.h - 1)) AS r(r),
              unnest(generate_series(0, d.w - 1)) AS c(c),
              unnest(generate_series(0, 2)) AS k(k)
       ), png_per AS (
         SELECT doc_id, any_value(source) AS source,
                any_value(w) AS w, any_value(h) AS h,
                sum(CASE WHEN k = 0 THEN v ELSE 0 END) AS sr,
                sum(CASE WHEN k = 1 THEN v ELSE 0 END) AS sg,
                sum(CASE WHEN k = 2 THEN v ELSE 0 END) AS sb,
                sum(v * ((r * w + c) * 3 + k + 1)) AS ws
         FROM png_px GROUP BY doc_id
       )"""

_DUCK_PNG_AGG = """
       SELECT source, CAST(count(*) AS BIGINT) AS n_media,
              CAST(sum(w * h) AS BIGINT) AS total_px,
              CAST(sum(sr) AS BIGINT) AS sum_r,
              CAST(sum(sg) AS BIGINT) AS sum_g,
              CAST(sum(sb) AS BIGINT) AS sum_b,
              CAST(sum(ws) AS BIGINT) AS wsum,
              round(CAST(sum(sr) + sum(sg) + sum(sb) AS DOUBLE)
                    / CAST(sum(w * h) * 3 AS DOUBLE), 6) AS mean_px
       FROM png_per GROUP BY source"""


def _media_png_agg(spark: SparkSession, sf_dir: str, docs: DataFrame | None = None) -> DataFrame:
    """The multimodal component's entropy-coded image path: per-document PNG
    payloads (real 8-bit truecolor files, stdlib-zlib DEFLATE, scanline
    filters cycling through all five types — multimodal/png.py) are decoded
    by the chunk-walking CRC-verifying parser inside Arrow-batched
    ``mapInPandas``, yielding the same integer-exact pixel features as
    :func:`_media_bmp_agg`, aggregated per source. The oracle recomputes
    the features from the closed-form pixel pattern: a bug anywhere in the
    codec — chunk offsets, CRC math, inflate framing, any of the five filter
    inversions (heights ≥5 guarantee each appears in every payload) —
    changes a sum and breaks the match. Unlike BMP, the container size is
    compression-dependent, so byte-size aggregates are deliberately not part
    of this contract (pixel math is). All features are exact integers until
    the final mean, so shuffle order cannot move any value."""
    from switchback_test_dag_spark.multimodal.media import (
        synth_decode_png_features,
    )

    docs = _suite_docs(spark, sf_dir) if docs is None else docs
    feats = synth_decode_png_features(docs, "doc_id")
    joined = feats.join(docs, feats.media_id == docs.doc_id)
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_media"),
        F.sum(F.col("width").cast("long") * F.col("height")).cast("long").alias(
            "total_px"
        ),
        F.sum("sum_r").cast("long").alias("sum_r"),
        F.sum("sum_g").cast("long").alias("sum_g"),
        F.sum("sum_b").cast("long").alias("sum_b"),
        F.sum("wsum").cast("long").alias("wsum"),
        F.round(
            (F.sum("sum_r") + F.sum("sum_g") + F.sum("sum_b")).cast("double")
            / (F.sum(F.col("width").cast("long") * F.col("height")) * 3).cast(
                "double"
            ),
            6,
        ).alias("mean_px"),
    )


_DUCK_AVI_PER = """avi_px AS (
         SELECT d.doc_id, d.source, j.j, r.r, c.c, k.k,
                ((d.doc_id * 1009 + j.j) * 7 + r.r * 5 + c.c * 3 + k.k * 11) % 256 AS v
         FROM documents d,
              unnest(generate_series(0, 5)) AS j(j),
              unnest(generate_series(0, 5)) AS r(r),
              unnest(generate_series(0, 7)) AS c(c),
              unnest(generate_series(0, 2)) AS k(k)
       ), avi_per AS (
         SELECT doc_id, any_value(source) AS source,
                sum(v) AS spx,
                sum(CASE WHEN j = 0 THEN v * ((r * 8 + c) * 3 + k + 1) ELSE 0 END) AS f0w
         FROM avi_px GROUP BY doc_id
       )"""

# uncompressed-DIB AVI container size is closed-form: 224 header bytes plus
# n_frames chunks of (8 + stride*h), stride = 4-byte-aligned 3*w — the same
# spec arithmetic the writer implements, derived independently here
_DUCK_AVI_AGG = """
       SELECT source, CAST(count(*) AS BIGINT) AS n_media,
              CAST(count(*) * 6 AS BIGINT) AS total_frames,
              CAST(10 AS BIGINT) AS fps_max,
              CAST(count(*) * 6 * 8 * 6 AS BIGINT) AS total_px,
              CAST(count(*) * (224 + 6 * (8 + ((3 * 8 + 3) // 4) * 4 * 6)) AS BIGINT)
                  AS total_bytes,
              CAST(sum(spx) AS BIGINT) AS sum_px,
              CAST(sum(f0w) AS BIGINT) AS frame0_wsum
       FROM avi_per GROUP BY source"""


def _media_avi_agg(spark: SparkSession, sf_dir: str, docs: DataFrame | None = None) -> DataFrame:
    """The multimodal component's REAL video path in the driver-oracled suite:
    per-document AVI payloads (6 deterministic 8×6 RGB frames through the
    uncompressed-DIB writer — multimodal/avi.py) are decoded by the real
    container walker inside Arrow-batched ``mapInPandas``. Two independent
    contracts ride the hash: pixel math (total/frame-0 checksums replayed
    from the closed-form frame generator) and CONTAINER BYTE ACCOUNTING (the
    oracle recomputes payload size from the RIFF spec arithmetic
    ``224 + n·(8 + stride·h)``, so any header/chunk layout drift in the
    writer or a short read in the walker breaks the match)."""
    from switchback_test_dag_spark.multimodal.media import (
        synth_decode_avi_features,
    )

    docs = _suite_docs(spark, sf_dir) if docs is None else docs
    feats = synth_decode_avi_features(
        docs, "doc_id", n_frames=6, width=8, height=6
    )
    joined = feats.join(docs, feats.media_id == docs.doc_id)
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_media"),
        F.sum("n_frames").cast("long").alias("total_frames"),
        F.max("fps").cast("long").alias("fps_max"),
        F.sum(
            F.col("width").cast("long") * F.col("height") * F.col("n_frames")
        ).cast("long").alias("total_px"),
        F.sum("n_bytes").cast("long").alias("total_bytes"),
        F.sum("sum_px").cast("long").alias("sum_px"),
        F.sum("frame0_wsum").cast("long").alias("frame0_wsum"),
    )


# MJPEG-in-AVI: frame count / fps / decoder-reported geometry are closed-form
# per doc_id; byte size and reconstructed pixels are entropy-coded and stay
# pytest-gated (the still-JPEG policy)
_DUCK_MJPG_AGG = """
       SELECT source, CAST(count(*) AS BIGINT) AS n_media,
              CAST(sum(2 + doc_id % 3) AS BIGINT) AS total_frames,
              CAST(12 AS BIGINT) AS fps_max,
              CAST(sum((6 + doc_id % 7) * (6 + doc_id % 5) * (2 + doc_id % 3))
                   AS BIGINT) AS total_px
       FROM documents GROUP BY source"""

_DUCK_MJPB_AGG = """
       SELECT source, CAST(count(*) AS BIGINT) AS n_media,
              CAST(sum(1 + doc_id % 4) AS BIGINT) AS total_frames,
              CAST(10 AS BIGINT) AS fps_max,
              CAST(sum((7 + doc_id % 6) * (5 + doc_id % 4) * (1 + doc_id % 4))
                   AS BIGINT) AS total_px
       FROM documents GROUP BY source"""

_DUCK_M1V_AGG = """
       SELECT source, CAST(count(*) AS BIGINT) AS n_media,
              CAST(sum(1 + doc_id % 3) AS BIGINT) AS total_frames,
              CAST(25 AS BIGINT) AS fps_max,
              CAST(sum(2 * (5 + doc_id % 5) * 2 * (4 + doc_id % 3)
                       * (1 + doc_id % 3)) AS BIGINT) AS total_px
       FROM documents GROUP BY source"""


def _media_m1v_agg(spark: SparkSession, sf_dir: str, docs: DataFrame | None = None) -> DataFrame:
    """Intra-only MPEG-1 (round 13, ``multimodal/mpeg1.py``) in the
    driver-oracled suite: per-document payloads — raw video elementary
    streams on odd ids, minimal MPEG-1 PROGRAM STREAMS on even ids, so the
    PES demux rides the hash too — decoded through the real sequence/GOP/
    picture/slice/macroblock parse with MPEG quantization and VLC/escape
    entropy coding. Geometry/frame-count formulas deliberately differ from
    every other video branch; pixel fidelity is pytest-gated (lossy-path
    policy)."""
    from switchback_test_dag_spark.multimodal.media import (
        synth_decode_mpeg1_features,
    )

    docs = _suite_docs(spark, sf_dir) if docs is None else docs
    feats = synth_decode_mpeg1_features(docs, "doc_id", qscale=2)
    joined = feats.join(docs, feats.media_id == docs.doc_id)
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_media"),
        F.sum("n_frames").cast("long").alias("total_frames"),
        F.max("fps").cast("long").alias("fps_max"),
        F.sum(
            F.col("width").cast("long") * F.col("height") * F.col("n_frames")
        ).cast("long").alias("total_px"),
    )


def _media_mjpb_agg(spark: SparkSession, sf_dir: str, docs: DataFrame | None = None) -> DataFrame:
    """Motion-JPEG-B (QuickTime's MARKER-LESS MJPEG layout, fourcc 'mjpb')
    in the driver-oracled suite: per-document AVI payloads whose every frame
    is an offset-table-headed, UNSTUFFED-scan MJPEG-B field
    (``multimodal/mjpegb.py`` composing jpeg.py's machinery), decoded by the
    container walk + marker-less per-frame parse. Geometry/frame-count
    formulas deliberately differ from the MJPG branch so a codec-dispatch
    swap breaks the hash; pixel fidelity is pytest-gated like every lossy
    path."""
    from switchback_test_dag_spark.multimodal.media import (
        synth_decode_mjpegb_avi_features,
    )

    docs = _suite_docs(spark, sf_dir) if docs is None else docs
    feats = synth_decode_mjpegb_avi_features(docs, "doc_id", quality=90)
    joined = feats.join(docs, feats.media_id == docs.doc_id)
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_media"),
        F.sum("n_frames").cast("long").alias("total_frames"),
        F.max("fps").cast("long").alias("fps_max"),
        F.sum(
            F.col("width").cast("long") * F.col("height") * F.col("n_frames")
        ).cast("long").alias("total_px"),
    )


def _media_mjpg_agg(spark: SparkSession, sf_dir: str, docs: DataFrame | None = None) -> DataFrame:
    """COMPRESSED video in the driver-oracled suite: per-document MJPEG AVI
    payloads (variable geometry and frame count, closed-form per doc_id;
    each frame a real baseline JPEG inside a real RIFF container —
    multimodal/avi.py + jpeg.py composed) are decoded by the container walk
    + full per-frame JPEG parse inside ``mapInPandas``. The hash pins frame
    counts, fps, and decoder-reported geometry — a chunk-slicing, fourcc, or
    marker-parse bug breaks the match; a decode failure on any payload fails
    the whole query, so the hash certifies the compressed-video path RUNS on
    every payload. Reconstructed pixel fidelity is pytest-gated
    (tests/test_multimodal.py), the same policy as the still-JPEG branch."""
    from switchback_test_dag_spark.multimodal.media import (
        synth_decode_mjpeg_avi_features,
    )

    docs = _suite_docs(spark, sf_dir) if docs is None else docs
    feats = synth_decode_mjpeg_avi_features(docs, "doc_id", quality=90)
    joined = feats.join(docs, feats.media_id == docs.doc_id)
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_media"),
        F.sum("n_frames").cast("long").alias("total_frames"),
        F.max("fps").cast("long").alias("fps_max"),
        F.sum(
            F.col("width").cast("long") * F.col("height") * F.col("n_frames")
        ).cast("long").alias("total_px"),
    )


_DUCK_JPEG_PER = """jpeg_dims AS (
         SELECT doc_id, source, 8 + doc_id % 9 AS w, 8 + doc_id % 5 AS h
         FROM documents
       )"""

_DUCK_JPEG_AGG = """
       SELECT source, CAST(count(*) AS BIGINT) AS n_media,
              CAST(sum(w * h) AS BIGINT) AS total_px,
              CAST(sum(w) AS BIGINT) AS total_w,
              CAST(sum(h) AS BIGINT) AS total_h
       FROM jpeg_dims GROUP BY source"""


def _media_jpeg_agg(spark: SparkSession, sf_dir: str, docs: DataFrame | None = None) -> DataFrame:
    """The lossy-codec path's driver-oracled slice: per-document baseline JPEG
    payloads (optimal-Huffman encoder, multimodal/jpeg.py) are decoded by the
    FULL entropy-decode + dequantize + IDCT parser inside ``mapInPandas``;
    the suite hashes the decoder-reported geometry (closed-form per doc_id,
    so a dimension/marker-parse bug breaks the match) and the per-source
    payload counts. Reconstructed pixel values are quantization-dependent and
    not SQL-replayable — their exactness contract (coefficient-bit-exact
    roundtrip, byte-exact reference reconstruction, fidelity bound) lives in
    tests/test_multimodal.py. A decode failure on any payload fails the whole
    query, so the driver hash still certifies the decoder RUNS end-to-end on
    every payload."""
    from switchback_test_dag_spark.multimodal.media import (
        synth_decode_jpeg_features,
    )

    docs = _suite_docs(spark, sf_dir) if docs is None else docs
    feats = synth_decode_jpeg_features(docs, "doc_id", quality=90)
    joined = feats.join(docs, feats.media_id == docs.doc_id)
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_media"),
        F.sum(F.col("width").cast("long") * F.col("height")).cast("long").alias(
            "total_px"
        ),
        F.sum("width").cast("long").alias("total_w"),
        F.sum("height").cast("long").alias("total_h"),
    )


# --------------------------------------------------------------------------- #
# generic magic-bytes dispatch (decode_features over a mixed-format corpus)
# --------------------------------------------------------------------------- #

# j's pooling bucket under exact_quantiles-style integer boundaries
# a_b = (b*n)//dim is b = ((dim*(j+1) - 1) // n) — the closed form of
# "largest b with (b*n)//dim <= j", replayed identically on both engines
_DUCK_DISPATCH_PER = """bmpd AS (
  SELECT doc_id, 8 + doc_id % 9 AS w, 6 + doc_id % 5 AS h
  FROM documents WHERE doc_id % 5 = 0
), bmp_vals AS (
  SELECT d.doc_id, (r.r * d.w + c.c) * 3 + k.k AS j, d.w * d.h * 3 AS n,
         ((d.doc_id * 7 + r.r * 5 + c.c * 3 + k.k * 11) % 256) / 255.0 AS v
  FROM bmpd d,
       unnest(generate_series(0, d.h - 1)) AS r(r),
       unnest(generate_series(0, d.w - 1)) AS c(c),
       unnest(generate_series(0, 2)) AS k(k)
), pngd AS (
  SELECT doc_id, 5 + doc_id % 11 AS w, 5 + doc_id % 7 AS h
  FROM documents WHERE doc_id % 5 = 1
), png_vals AS (
  SELECT d.doc_id, (r.r * d.w + c.c) * 3 + k.k AS j, d.w * d.h * 3 AS n,
         ((d.doc_id * 7 + r.r * 5 + c.c * 3 + k.k * 11) % 256) / 255.0 AS v
  FROM pngd d,
       unnest(generate_series(0, d.h - 1)) AS r(r),
       unnest(generate_series(0, d.w - 1)) AS c(c),
       unnest(generate_series(0, 2)) AS k(k)
), wav_vals AS (
  SELECT d.doc_id, t.i AS j, 256 AS n,
         ((d.doc_id * 31 + t.i * 17) % 65536) / 65535.0 AS v
  FROM (SELECT doc_id FROM documents WHERE doc_id % 5 = 3) d,
       unnest(generate_series(0, 255)) AS t(i)
), avi_vals AS (
  SELECT d.doc_id, f.f * 144 + (r.r * 8 + c.c) * 3 + k.k AS j, 864 AS n,
         (((d.doc_id * 1009 + f.f) * 7 + r.r * 5 + c.c * 3 + k.k * 11) % 256)
             / 255.0 AS v
  FROM (SELECT doc_id FROM documents WHERE doc_id % 5 = 4) d,
       unnest(generate_series(0, 5)) AS f(f),
       unnest(generate_series(0, 5)) AS r(r),
       unnest(generate_series(0, 7)) AS c(c),
       unnest(generate_series(0, 2)) AS k(k)
), tagged AS (
  SELECT 'bmp' AS fmt, * FROM bmp_vals
  UNION ALL SELECT 'png', * FROM png_vals
  UNION ALL SELECT 'wav', * FROM wav_vals
  UNION ALL SELECT 'avi', * FROM avi_vals
), pooled AS (
  SELECT fmt, doc_id, CAST((8 * (j + 1) - 1) // n AS INTEGER) AS dim_idx,
         avg(v) AS pv
  FROM tagged GROUP BY fmt, doc_id, (8 * (j + 1) - 1) // n
)"""

# the dispatch facts reshaped onto the suite's tall (fmt, source, metric,
# value) schema: per-dimension corpus means plus a per-format media count
_DUCK_DISPATCH_TALL = """
SELECT 'dispatch_' || fmt AS fmt, 'all' AS source,
       'dim' || CAST(dim_idx AS VARCHAR) || '_mean' AS metric,
       round(avg(pv), 6) AS value
FROM pooled GROUP BY fmt, dim_idx
UNION ALL
SELECT 'dispatch_' || fmt AS fmt, 'all' AS source, 'n_media' AS metric,
       CAST(count(DISTINCT doc_id) AS DOUBLE) AS value
FROM pooled GROUP BY fmt
"""


def _media_dispatch_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GENERIC decode path under the driver hash: a mixed-format corpus
    (``synthesize_mixed_media`` — format = doc_id % 5, every payload built by
    a real encoder) flows through ``decode_features``'s magic-bytes dispatch
    (multimodal/media.py) with NO format hints, and the pooled feature
    vectors are exploded and averaged per (format, dimension). The oracle
    replays decode + bucket pooling closed-form for the four LOSSLESS
    formats (bmp/png/wav/avi) — any dispatch mistake (wrong codec for a
    magic), any decode bug, or any pooling-boundary drift moves a mean and
    breaks the hash. JPEG payloads (doc_id % 5 = 2) are excluded here: their
    reconstructed pixels are quantization-dependent, so their dispatch
    coverage lives in the suite's jpeg rows and the pytest bit-exactness
    contracts. NOT separately registered: the driver's correctness harness
    samples the FIRST 50 registered queries, so these facts ride inside
    ``media_decode_suite``'s tall schema instead of spilling past the
    window."""
    from switchback_test_dag_spark.multimodal.media import (
        synth_decode_mixed_features,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    replayable = _fanout_docs(spark, docs.filter(F.col("doc_id") % 5 != 2))
    feats = synth_decode_mixed_features(replayable, "doc_id", dim=8)
    tall = feats.select(
        "media_id", F.posexplode("feature").alias("dim_idx", "value")
    )
    fmt = (
        F.when(F.col("media_id") % 5 == 0, "bmp")
        .when(F.col("media_id") % 5 == 1, "png")
        .when(F.col("media_id") % 5 == 3, "wav")
        .otherwise("avi")
    )
    return tall.groupBy(fmt.alias("fmt"), "dim_idx").agg(
        F.count(F.lit(1)).cast("long").alias("n_media"),
        F.round(F.avg("value"), 6).alias("mean_feature"),
    )


def _unpivot_metrics(df: DataFrame, fmt: str) -> DataFrame:
    """Per-source aggregate → tall (fmt, source, metric, value) frame.

    All formats share one driver-hashable schema without NULL padding: every
    feature is cast to DOUBLE (exact for these magnitudes — the largest, the
    position-weighted checksum, stays far below 2^53 even at the 100× scale
    fixture) and rounded to 6 so both engines see identical doubles.
    """
    vals = [c for c in df.columns if c != "source"]
    casted = df.select(
        "source", *[F.col(c).cast("double").alias(c) for c in vals]
    )
    tall = casted.unpivot(["source"], vals, "metric", "value")
    return tall.select(
        F.lit(fmt).alias("fmt"),
        "source",
        "metric",
        F.round("value", 6).alias("value"),
    )


def _duck_unpivot(agg_cte: str, fmt: str, metrics: list[str]) -> str:
    on = ", ".join(f"CAST({m} AS DOUBLE) AS {m}" for m in metrics)
    return (
        f"SELECT '{fmt}' AS fmt, source, metric, round(value, 6) AS value "
        f"FROM (UNPIVOT {agg_cte} ON {on} INTO NAME metric VALUE value)"
    )


_DUCK_MEDIA_SUITE = (
    "WITH "
    + ",\n".join(
        [
            _DUCK_BMP_PER,
            _DUCK_WAV_PER,
            _DUCK_PNG_PER,
            _DUCK_AVI_PER,
            _DUCK_JPEG_PER,
            _DUCK_DISPATCH_PER,
        ]
    )
    + f",\nbmp_agg AS ({_DUCK_BMP_AGG}),\nwav_agg AS ({_DUCK_WAV_AGG}),"
    + f"\npng_agg AS ({_DUCK_PNG_AGG}),\navi_agg AS ({_DUCK_AVI_AGG}),"
    + f"\njpeg_agg AS ({_DUCK_JPEG_AGG}),\nmjpg_agg AS ({_DUCK_MJPG_AGG}),"
    + f"\nmjpb_agg AS ({_DUCK_MJPB_AGG}),\nm1v_agg AS ({_DUCK_M1V_AGG})\n"
    + "\nUNION ALL\n".join(
        [
            _duck_unpivot(
                "bmp_agg",
                "bmp",
                [
                    "n_media",
                    "total_bytes",
                    "max_bytes",
                    "total_px",
                    "sum_r",
                    "sum_g",
                    "sum_b",
                    "wsum",
                    "mean_px",
                ],
            ),
            _duck_unpivot(
                "wav_agg",
                "wav",
                [
                    "n_media",
                    "total_samples",
                    "rms",
                    "max_peak",
                    "total_duration_ms",
                ],
            ),
            _duck_unpivot(
                "png_agg",
                "png",
                [
                    "n_media",
                    "total_px",
                    "sum_r",
                    "sum_g",
                    "sum_b",
                    "wsum",
                    "mean_px",
                ],
            ),
            _duck_unpivot(
                "avi_agg",
                "avi",
                [
                    "n_media",
                    "total_frames",
                    "fps_max",
                    "total_px",
                    "total_bytes",
                    "sum_px",
                    "frame0_wsum",
                ],
            ),
            _duck_unpivot(
                "jpeg_agg",
                "jpeg",
                ["n_media", "total_px", "total_w", "total_h"],
            ),
            _duck_unpivot(
                "mjpg_agg",
                "mjpg",
                ["n_media", "total_frames", "fps_max", "total_px"],
            ),
            _duck_unpivot(
                "mjpb_agg",
                "mjpb",
                ["n_media", "total_frames", "fps_max", "total_px"],
            ),
            _duck_unpivot(
                "m1v_agg",
                "m1v",
                ["n_media", "total_frames", "fps_max", "total_px"],
            ),
            _DUCK_DISPATCH_TALL,
        ]
    )
)


@query("media_decode_suite", _DUCK_MEDIA_SUITE)
def media_decode_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALL EIGHT real codec paths in one (fmt, source, metric) contract — BMP
    (uncompressed DIB), WAV (RIFF PCM16), PNG (DEFLATE + all five scanline
    filters), AVI (RIFF container walk + per-frame DIB decode), baseline
    JPEG (entropy decode + dequantize + IDCT), MJPEG-in-AVI (the
    container walk COMPOSED with the JPEG parser — real compressed video),
    Motion-JPEG-B in AVI (QuickTime's marker-less layout: offset-table
    frame headers, UNSTUFFED scans — the same DCT/Huffman machinery under a
    different byte discipline, fourcc 'mjpb'), and intra-only MPEG-1
    (round 13, fmt='m1v': sequence/GOP/picture/slice/macroblock parse, MPEG
    quantization + VLC/escape coding, PES demux for program-stream ids)
    payloads decoded by the pure-Python parsers inside Arrow-batched
    ``mapInPandas``
    (multimodal/{bmp,wav,png,avi,jpeg}.py), features aggregated per source,
    then unpivoted to a shared tall schema and unioned. The oracle never sees
    bytes: each branch recomputes its metrics from closed-form payload
    generators and spec arithmetic (BMP container size 54 + stride·h; AVI
    container size 224 + n·(8 + stride·h)), so a parse bug anywhere — header
    offsets, row stride, bottom-up flip, BGR order, chunk walking, CRC math,
    inflate framing, filter inversion — changes a value and breaks the hash.
    The suite also carries the GENERIC magic-bytes dispatch rows
    (fmt='dispatch_*': ``decode_features`` over a mixed-format corpus with no
    format hints, pooled features replayed closed-form — see
    ``_media_dispatch_agg``). Compression-dependent quantities (PNG/JPEG byte
    sizes, JPEG reconstructed pixel sums) are deliberately excluded from the hash — their exactness
    contracts are pytest-gated (see ``_media_jpeg_agg``); everything else is
    integer-exact until the final mean/rms."""
    # pin: the dims and n_media branches below both read this tiny per-fmt
    # aggregate — without the boundary the dispatch branch's whole
    # mapInPandas decode (Python-worker work, invisible to cpu_total but
    # real) runs once per consumer
    from switchback_test_dag_spark.caching import pin as _pin

    docs = _suite_docs(spark, sf_dir)
    disp = _pin(_media_dispatch_agg(spark, sf_dir))
    disp_dims = disp.select(
        F.concat(F.lit("dispatch_"), F.col("fmt")).alias("fmt"),
        F.lit("all").alias("source"),
        F.concat(
            F.lit("dim"), F.col("dim_idx").cast("string"), F.lit("_mean")
        ).alias("metric"),
        F.col("mean_feature").alias("value"),
    )
    disp_n = (
        disp.groupBy("fmt")
        .agg(F.first("n_media").alias("n"))
        .select(
            F.concat(F.lit("dispatch_"), F.col("fmt")).alias("fmt"),
            F.lit("all").alias("source"),
            F.lit("n_media").alias("metric"),
            F.col("n").cast("double").alias("value"),
        )
    )
    return (
        _unpivot_metrics(_media_bmp_agg(spark, sf_dir, docs), "bmp")
        .unionByName(_unpivot_metrics(_media_wav_agg(spark, sf_dir, docs), "wav"))
        .unionByName(_unpivot_metrics(_media_png_agg(spark, sf_dir, docs), "png"))
        .unionByName(_unpivot_metrics(_media_avi_agg(spark, sf_dir, docs), "avi"))
        .unionByName(_unpivot_metrics(_media_jpeg_agg(spark, sf_dir, docs), "jpeg"))
        .unionByName(_unpivot_metrics(_media_mjpg_agg(spark, sf_dir, docs), "mjpg"))
        .unionByName(_unpivot_metrics(_media_mjpb_agg(spark, sf_dir, docs), "mjpb"))
        .unionByName(_unpivot_metrics(_media_m1v_agg(spark, sf_dir, docs), "m1v"))
        .unionByName(disp_dims)
        .unionByName(disp_n)
    )


# --------------------------------------------------------------------------- #
# composed corpus-cleaning pipeline
# --------------------------------------------------------------------------- #


# --------------------------------------------------------------------------- #
# corpus-selection contracts folded into corpus_clean_stats: segment-level
# dedup (CCNet line dedup, Wenzek et al. 2020 -- text/lines) and DSIR
# hashed-n-gram importance weights (Xie et al. 2023 -- text/dsir). Folded
# rather than registered standalone because the driver's correctness harness
# samples the first 50 registered queries (same reason the dispatch rows live
# inside media_decode_suite).
#
# Segments for the fixture are 2-token chunks (the corpus has no newlines to
# split on; 2-token chunks over its small vocabulary collide across documents
# the way real web boilerplate lines do). Both engines build the chunk arrays
# identically: lowercase-split tokens, windows of 2 starting at 1, 3, 5, ...
# with a trailing 1-token chunk when the count is odd.
_SEG_CHUNK = 2
_SEG_BOILER_DF = 20
_DSIR_BUCKETS = 64
_DSIR_TOPK = 5
_DSIR_FP_SCALE = 1_000_000
_DSIR_WBITS = 20
_DSIR_SEL_SEED = 29
_DUCK_SEGS = (
    "CASE WHEN len(toks) = 0 THEN CAST([] AS VARCHAR[]) ELSE "
    f"[array_to_string(toks[i:i+{_SEG_CHUNK - 1}], ' ') "
    f"for i in generate_series(1, len(toks), {_SEG_CHUNK})] END"
)
_DUCK_SEG_TEXT_HASH = (
    "('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':' || t), 1, 8))::BIGINT"
)
_DUCK_SELECTION_CTES = f"""sgtk AS (
  SELECT doc_id, source, {_DUCK_TOKS} AS toks FROM documents
), sgch AS (
  SELECT doc_id, source, {_DUCK_SEGS} AS segs FROM sgtk
), sge AS (
  SELECT doc_id, source,
         unnest(generate_series(1, len(segs))) AS pos,
         unnest(segs) AS seg
  FROM sgch
), sgfk AS (
  SELECT doc_id, pos, seg,
         row_number() OVER (PARTITION BY seg ORDER BY doc_id, pos) AS rn
  FROM sge
), sgboiler AS (
  SELECT seg FROM sge GROUP BY seg HAVING count(DISTINCT doc_id) >= {_SEG_BOILER_DF}
), sgft AS (
  SELECT sgch.doc_id, sgch.source, coalesce(f.t, '') AS t, coalesce(f.k, 0) AS k
  FROM sgch LEFT JOIN (
    SELECT doc_id, array_to_string(list(seg ORDER BY pos), '|') AS t, count(*) AS k
    FROM sgfk WHERE rn = 1 GROUP BY doc_id
  ) f USING (doc_id)
), sgbt AS (
  SELECT sgch.doc_id, sgch.source, coalesce(b.t, '') AS t, coalesce(b.k, 0) AS k
  FROM sgch LEFT JOIN (
    SELECT doc_id, array_to_string(list(seg ORDER BY pos), '|') AS t, count(*) AS k
    FROM sge ANTI JOIN sgboiler USING (seg) GROUP BY doc_id
  ) b USING (doc_id)
), sgagg AS (
  SELECT occ.source, occ.n_seg_occurrences, ft.n_kept_first, ft.first_text_hash,
         bt.n_kept_boiler, bt.boiler_text_hash
  FROM (SELECT source, CAST(sum(len(segs)) AS BIGINT) AS n_seg_occurrences
        FROM sgch GROUP BY source) occ
  JOIN (SELECT source, CAST(sum(k) AS BIGINT) AS n_kept_first,
               CAST(sum({_DUCK_SEG_TEXT_HASH}) AS BIGINT) AS first_text_hash
        FROM sgft GROUP BY source) ft USING (source)
  JOIN (SELECT source, CAST(sum(k) AS BIGINT) AS n_kept_boiler,
               CAST(sum({_DUCK_SEG_TEXT_HASH}) AS BIGINT) AS boiler_text_hash
        FROM sgbt GROUP BY source) bt USING (source)
), dsg AS (
  SELECT doc_id, source,
         list_concat(toks,
           CASE WHEN len(toks) >= 2 THEN
             [array_to_string(toks[i:i+1], ' ') for i in generate_series(1, len(toks) - 1)]
           ELSE CAST([] AS VARCHAR[]) END) AS grams
  FROM sgtk
), dse AS (
  SELECT doc_id, source,
         ('0x' || substring(md5(unnest(grams)), 1, 15))::BIGINT % {_DSIR_BUCKETS} AS b
  FROM dsg
), dsc AS (
  SELECT doc_id, source, b, count(*) AS c FROM dse GROUP BY doc_id, source, b
), dsspine AS (
  SELECT unnest(generate_series(0, {_DSIR_BUCKETS} - 1)) AS b
), dsraw AS (
  SELECT dsspine.b, coalesce(sum(dsc.c), 0) AS n
  FROM dsspine LEFT JOIN dsc USING (b) GROUP BY dsspine.b
), dstgt AS (
  SELECT dsspine.b, coalesce(sum(dsc.c) FILTER (WHERE dsc.doc_id % 13 = 0), 0) AS n
  FROM dsspine LEFT JOIN dsc USING (b) GROUP BY dsspine.b
), dsdl AS (
  SELECT dsraw.b,
         CAST(round((ln((dstgt.n + 1) / ((SELECT sum(n) FROM dstgt) + {_DSIR_BUCKETS}))
                   - ln((dsraw.n + 1) / ((SELECT sum(n) FROM dsraw) + {_DSIR_BUCKETS})))
                    * {_DSIR_FP_SCALE}) AS BIGINT) AS dl
  FROM dsraw JOIN dstgt USING (b)
), dsw AS (
  SELECT dsc.doc_id, dsc.source, CAST(sum(dsc.c * dsdl.dl) AS BIGINT) AS lwfp
  FROM dsc JOIN dsdl USING (b) GROUP BY dsc.doc_id, dsc.source
), dsr AS (
  SELECT doc_id, source, lwfp,
         row_number() OVER (PARTITION BY source ORDER BY -lwfp, doc_id) AS rk,
         max(lwfp) OVER (PARTITION BY source) AS mx
  FROM dsw
), dssel AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY
           -(((CAST(round(exp((lwfp - mx) / {_DSIR_FP_SCALE}.0) * {1 << _DSIR_WBITS}) AS BIGINT) + 1)
              * 1099511627776)
             // greatest(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':{_DSIR_SEL_SEED}'), 1, 10))::BIGINT, 1)),
           doc_id) AS srk
  FROM dsr
), dsagg AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_dsir_scored,
         round(sum(lwfp) / (count(*) * {_DSIR_FP_SCALE}.0), 4) AS avg_dsir_log_weight,
         CAST(sum(CASE WHEN rk <= {_DSIR_TOPK} THEN {_DUCK_ID_HASH} END) AS BIGINT)
           AS dsir_top_id_hash
  FROM dsr GROUP BY source
), dsselagg AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_dsir_selected,
         CAST(sum({_DUCK_ID_HASH}) AS BIGINT) AS dsir_sel_id_hash
  FROM dssel WHERE srk <= {_DSIR_TOPK} GROUP BY source
)"""

_DUCK_CLEAN = f"""
WITH q AS (
  SELECT doc_id, source, text, {_DUCK_QUALITY} AS qs
  FROM documents WHERE {_DUCK_QUALITY} >= 0.5
), qt AS (
  SELECT doc_id, source, qs, {_DUCK_TOKS} AS toks FROM q
), qsg AS (
  SELECT doc_id, source, qs, {_DUCK_SEGS} AS segs FROM qt
), qse AS (
  SELECT doc_id, unnest(generate_series(1, len(segs))) AS pos, unnest(segs) AS seg
  FROM qsg
), qboiler AS (
  SELECT seg FROM qse GROUP BY seg HAVING count(DISTINCT doc_id) >= {_SEG_BOILER_DF}
), qscrub AS (
  SELECT qsg.doc_id, qsg.source, qsg.qs, s.stext AS text
  FROM qsg JOIN (
    SELECT doc_id, array_to_string(list(seg ORDER BY pos), ' ') AS stext
    FROM qse ANTI JOIN qboiler USING (seg) GROUP BY doc_id
  ) s USING (doc_id)
  WHERE s.stext != ''
), fp AS (
  SELECT doc_id, source, qs, text,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS f
  FROM qscrub
), k1 AS (
  SELECT * FROM fp WHERE doc_id IN (SELECT min(doc_id) FROM fp GROUP BY f)
), tk AS (
  SELECT doc_id, {_DUCK_TOKS} AS toks FROM k1
), sh AS (
  SELECT doc_id, {_DUCK_SH3} AS sh FROM tk WHERE len(toks) >= 3
), near AS (
  SELECT DISTINCT b.doc_id
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) > 0
    AND len(list_intersect(a.sh, b.sh)) * 1.0
        / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.85
), k2 AS (
  SELECT * FROM k1 WHERE doc_id NOT IN (SELECT doc_id FROM near)
), etk AS (
  SELECT {_DUCK_TOKS} AS toks FROM documents WHERE doc_id % 13 = 0
), ev AS (
  SELECT DISTINCT unnest(
    [array_to_string(toks[i:i+3], ' ') for i in generate_series(1, len(toks) - 3)]
  ) AS gram FROM etk
), k2g AS (
  SELECT doc_id, list_distinct(
    [array_to_string(toks[i:i+3], ' ') for i in generate_series(1, len(toks) - 3)]
  ) AS g
  FROM (SELECT doc_id, {_DUCK_TOKS} AS toks FROM k2)
), contam AS (
  SELECT DISTINCT k2g.doc_id
  FROM k2g, unnest(k2g.g) AS u(gram) JOIN ev ON u.gram = ev.gram
), k3 AS (
  SELECT k2.* FROM k2 LEFT JOIN contam c USING (doc_id) WHERE c.doc_id IS NULL
), ww AS (
  SELECT doc_id, source, len({_DUCK_TOKS}) AS w,
         greatest(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':17'), 1, 10))::BIGINT, 1) AS a
  FROM k3
), wr AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
                            ORDER BY -((w * 1099511627776) // a), doc_id) AS rk
  FROM ww WHERE w > 0
), wagg AS (
  SELECT source,
         count(*) AS n_wsample,
         CAST(sum(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 10))::BIGINT)
              AS BIGINT) AS wsample_id_hash
  FROM wr WHERE rk <= 5 GROUP BY source
), {_DUCK_SELECTION_CTES}
SELECT k2.source,
       count(*) FILTER (WHERE c.doc_id IS NULL) AS n_kept,
       round(avg(qs) FILTER (WHERE c.doc_id IS NULL), 4) AS avg_quality,
       count(c.doc_id) AS n_contam,
       coalesce(any_value(wagg.n_wsample), 0) AS n_wsample,
       any_value(wagg.wsample_id_hash) AS wsample_id_hash,
       any_value(sgagg.n_seg_occurrences) AS n_seg_occurrences,
       any_value(sgagg.n_kept_first) AS n_kept_first,
       any_value(sgagg.first_text_hash) AS first_text_hash,
       any_value(sgagg.n_kept_boiler) AS n_kept_boiler,
       any_value(sgagg.boiler_text_hash) AS boiler_text_hash,
       any_value(dsagg.n_dsir_scored) AS n_dsir_scored,
       any_value(dsagg.avg_dsir_log_weight) AS avg_dsir_log_weight,
       any_value(dsagg.dsir_top_id_hash) AS dsir_top_id_hash,
       any_value(dsselagg.n_dsir_selected) AS n_dsir_selected,
       any_value(dsselagg.dsir_sel_id_hash) AS dsir_sel_id_hash
FROM k2 LEFT JOIN contam c USING (doc_id)
     LEFT JOIN wagg ON k2.source = wagg.source
     LEFT JOIN sgagg ON k2.source = sgagg.source
     LEFT JOIN dsagg ON k2.source = dsagg.source
     LEFT JOIN dsselagg ON k2.source = dsselagg.source
GROUP BY k2.source
"""


@query("corpus_clean_stats", _DUCK_CLEAN)
def corpus_clean_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed training-data cleaning pipeline — the operators chained the way
    a production corpus job runs them, in CCNet order (Wenzek et al. 2020:
    segment-level cleaning precedes document-level dedup because scrubbing
    changes fingerprints): quality filter (score ≥ 0.5) → segment-level
    boilerplate removal (``text/lines.drop_boilerplate``, 2-token chunk
    segments, df ≥ 20 dropped everywhere; documents scrubbed to nothing are
    dropped; all later stages run on the SCRUBBED text) → exact dedup (md5
    fingerprint, min-id keeper) → near-dup removal (exact n-gram
    Jaccard ≥ 0.85, higher id dropped) → benchmark decontamination
    (``text/decontaminate.contaminated_ids``: ≥1 shared distinct word 4-gram
    with the eval slice ``doc_id % 13 == 0``; n=4 suits the fixture's tiny
    synthetic vocabulary — production uses the papers' 8–13) → per-source
    survivor stats plus the per-source contaminated count, and a token-count-
    weighted k=5 priority sample of the clean survivors
    (``plans/sampling.weighted_priority_sample``, integer priorities replayed
    bit-for-bit by the oracle window) pinned as (count, id-hash sum). Each
    stage is a shuffle keyed on its own key (fingerprint, shingle hash, gram,
    source); the eval gram set is broadcast; nothing is collected
    driver-side.

    The row also carries the corpus-SELECTION contracts (folded here — not
    standalone rows — to stay inside the driver's 50-query check window):

    - segment-level dedup (``text/lines``; CCNet line dedup, Wenzek et al.
      2020) over 2-token chunk segments, BOTH policies value-hashed per
      source: keep-first (each distinct segment survives only at its minimum
      (doc, pos) occurrence) and boilerplate-drop (df ≥ 20 removed
      everywhere); the checksums hash each doc's REASSEMBLED survivor string,
      so a changed keeper, lost position, or reordered array breaks the
      contract even at equal counts;
    - DSIR importance weights (``text/dsir``; Xie et al. 2023) against the
      same eval slice, portable md5 bucketing (64 buckets) in FIXED POINT:
      the per-bucket log-ratio rounds once into an integer and the weight is
      the exact integer sum ``Σ c_b·dl_fp`` — order-independent, so rank
      keys and the mean replay bit-for-bit (no float-accumulation flake):
      per-source scored count, mean weight, top-5 membership id-hash ranked
      through the samplers' range-partitioned rank (no single-task-per-
      stratum window);
    - DSIR importance RESAMPLING (``text/dsir.dsir_select``; the paper's
      selection stage): weights → quantized BIGINT
      ``round(exp((fp−max_fp)/scale)·2^20)+1`` → ``weighted_priority_sample``
      (k=5 per source, seed 29), membership pinned as (count, id-hash) with
      the quantization AND the sampler's integer priority replayed in the
      oracle's dssel window."""
    from switchback_test_dag_spark.caching import barrier as pin
    from switchback_test_dag_spark.text import lines as LN
    from switchback_test_dag_spark.text.pipeline import clean_corpus

    docs = load_table(spark, sf_dir, "documents")
    toks = "filter(split(lower(text), '\\\\s+'), x -> x != '')"
    # bind-once wrapper: the chunk lambda's BODY references the token array,
    # and a lambda-body reference to a composite expression is re-evaluated
    # PER ELEMENT (text/analysis._array_ngrams_sql documents the O(len²)
    # blowup — measured here as 6.4 s executor CPU at sf0.1, re-tokenizing
    # every document once per 2-token chunk). transform(array(e), tk -> ...)
    # evaluates the tokenizer once per row and binds it to ``tk``; nested
    # lambdas are safe here because no Python UDF consumes this column.
    segs = (
        f"element_at(transform(array({toks}), tk -> "
        f"CASE WHEN size(tk) = 0 THEN CAST(array() AS ARRAY<STRING>) ELSE "
        f"transform(sequence(1, size(tk), {_SEG_CHUNK}), "
        f"i -> concat_ws(' ', slice(tk, i, {_SEG_CHUNK}))) END), 1)"
    )
    eval_df = docs.filter(F.col("doc_id") % 13 == 0)
    # the chain is the PUBLIC API (text/pipeline.clean_corpus) — CCNet order
    # (Wenzek et al. 2020: scrub between quality filter and document-level
    # dedup; order pin in tests/test_lines_dsir.py), n=4 grams for the tiny
    # fixture vocabulary; the frame arrives pinned (its two consumers below
    # would otherwise each replay the Jaccard/decon subtrees)
    flagged = clean_corpus(
        docs.select("doc_id", "source", "text"),
        "doc_id",
        "text",
        segmenter=F.expr(segs),
        quality_min=0.5,
        boiler_min_df=_SEG_BOILER_DF,
        shingle_n=3,
        jaccard_threshold=0.85,
        eval_df=eval_df,
        decon_n=4,
        quality_col="qs",
    )
    clean = ~F.col("contaminated")
    stats = flagged.groupBy("source").agg(
        F.sum(F.when(clean, 1).otherwise(0)).cast("long").alias("n_kept"),
        F.round(F.avg(F.when(clean, F.col("qs"))), 4).alias("avg_quality"),
        F.sum(F.when(clean, 0).otherwise(1)).cast("long").alias("n_contam"),
    )
    # weighted-sample contract (plans/sampling.weighted_priority_sample): a
    # token-count-weighted k=5 draw from the clean survivors per source,
    # membership pinned as (count, 40-bit id-hash sum) — the INTEGER priority
    # ordering replays bit-for-bit in the oracle's window
    ws = PS.weighted_priority_sample(
        flagged.filter(clean).select(
            "doc_id", "source", TA.token_count("text").cast("long").alias("_w")
        ),
        ["source"],
        "doc_id",
        "_w",
        k=5,
        seed=17,
        portable=True,
    )
    id_hash40 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 10), 16, 10
    ).cast("long")
    wagg = ws.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_wsample"),
        F.sum(id_hash40).cast("long").alias("wsample_id_hash"),
    )
    # segment-dedup contract (text/lines) over the RAW corpus (standalone
    # value contract for BOTH policies, beside the chained pipeline above);
    # pinned — the occurrence total and the two policies' explode/reassembly
    # passes traverse it six times
    seg_base = pin(docs.select("doc_id", "source", F.expr(segs).alias("segs")))

    def _seg_agg(deduped: DataFrame, n_name: str, h_name: str) -> DataFrame:
        t = F.concat_ws("|", F.col("segs"))
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"), t)),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        return deduped.groupBy("source").agg(
            F.sum(F.size("segs")).cast("long").alias(n_name),
            F.sum(h).cast("long").alias(h_name),
        )

    seg_tot = seg_base.groupBy("source").agg(
        F.sum(F.size("segs")).cast("long").alias("n_seg_occurrences")
    )
    seg_first = _seg_agg(
        LN.dedup_segments(seg_base, "doc_id", "segs"),
        "n_kept_first",
        "first_text_hash",
    )
    seg_boiler = _seg_agg(
        LN.drop_boilerplate(seg_base, "doc_id", "segs", _SEG_BOILER_DF),
        "n_kept_boiler",
        "boiler_text_hash",
    )

    # DSIR contract (text/dsir) over the RAW corpus vs the same eval slice —
    # FIXED-POINT weights (integer Σ c_b·dl_fp, order-independent, so the
    # rank keys and the mean can never flip on float accumulation order; the
    # pin() shares the one corpus weight pass between the ranked top-k and
    # the resampling stage below)
    from switchback_test_dag_spark.plans.sampling import _H as _KEY, _with_key_rank
    from switchback_test_dag_spark.text import dsir as DS

    weights = pin(
        DS.dsir_log_weights(
            docs,
            eval_df.select("text"),
            "doc_id",
            "text",
            n_buckets=_DSIR_BUCKETS,
            portable=True,
            fixed_point_scale=_DSIR_FP_SCALE,
        ).join(docs.select("doc_id", "source"), "doc_id")
    )
    ranked = _with_key_rank(
        weights.withColumn(_KEY, -F.col("log_weight_fp")),
        ["source"],
        "doc_id",
    )
    dsagg = ranked.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_dsir_scored"),
        F.round(
            F.sum("log_weight_fp")
            / (F.count(F.lit(1)) * F.lit(float(_DSIR_FP_SCALE))),
            4,
        ).alias("avg_dsir_log_weight"),
        F.sum(F.when(F.col("_rk") <= _DSIR_TOPK, id_hash40))
        .cast("long")
        .alias("dsir_top_id_hash"),
    )
    # DSIR SELECTION contract — the paper's importance-RESAMPLING stage
    # (weights → quantized BIGINT → weighted_priority_sample), membership
    # pinned as (count, id-hash) per source and replayed by the oracle's
    # dssel window
    sel = DS.dsir_select(
        None,
        None,
        "doc_id",
        "text",
        k=_DSIR_TOPK,
        strata=["source"],
        portable=True,
        seed=_DSIR_SEL_SEED,
        fixed_point_scale=_DSIR_FP_SCALE,
        weight_bits=_DSIR_WBITS,
        weights=weights,
    )
    selagg = sel.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_dsir_selected"),
        F.sum(id_hash40).cast("long").alias("dsir_sel_id_hash"),
    )

    # the n_wsample coalesce rides the final select instead of a mid-chain
    # withColumn — one fewer analyzer pass over the full-pipeline tree
    return (
        stats.join(F.broadcast(wagg), "source", "left")
        .join(F.broadcast(seg_tot), "source", "left")
        .join(F.broadcast(seg_first), "source", "left")
        .join(F.broadcast(seg_boiler), "source", "left")
        .join(F.broadcast(dsagg), "source", "left")
        .join(F.broadcast(selagg), "source", "left")
        .select(
            "source",
            "n_kept",
            "avg_quality",
            "n_contam",
            F.coalesce("n_wsample", F.lit(0)).cast("long").alias("n_wsample"),
            "wsample_id_hash",
            "n_seg_occurrences",
            "n_kept_first",
            "first_text_hash",
            "n_kept_boiler",
            "boiler_text_hash",
            "n_dsir_scored",
            "avg_dsir_log_weight",
            "dsir_top_id_hash",
            "n_dsir_selected",
            "dsir_sel_id_hash",
        )
    )

