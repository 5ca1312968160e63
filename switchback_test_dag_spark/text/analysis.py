"""Text analysis — tokenization, shingling, language ID, quality scoring,
token counting and document fingerprinting, all as native Spark SQL expressions.

Scale notes: every function here is a pure column expression evaluated inside
whole-stage codegen — no UDF, no shuffle, no driver round-trip. Shingling uses
``transform(sequence(...))`` (one array allocation per row) instead of exploding,
so a 100 TB corpus scan stays a single narrow stage.

Expressions are built with ``F.expr`` format strings keyed on a column name; use
``df.withColumn("text", ...)`` style aliasing if the source column is computed.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword profiles for the n-gram/stopword language-ID
# heuristic. These are deliberately short, high-frequency function words; at
# production scale they'd be replaced by per-language frequency tables, but the
# operator shape (score = |tokens ∩ profile| per language, argmax) is identical.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it"),
    "de": ("der", "die", "das", "und", "ist", "ein", "nicht", "zu"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "pas"),
    "es": ("el", "la", "los", "y", "es", "un", "una", "no"),
}

# NB: these are spliced into Spark SQL string literals inside F.expr(...);
# Spark's SQL parser processes backslash escapes, so the literal needs a
# doubled backslash for the regex engine to receive `\s`.
TOKEN_SPLIT_RE = r"\\s+"
# BPE-ish unit: a run of word chars OR a single non-word non-space char.
BPE_TOKEN_RE = r"[a-zA-Z0-9_]+|[^a-zA-Z0-9_\\s]"


def tokens(text_col: str) -> Column:
    """Whitespace tokens of the lowercased text, empties removed."""
    return F.expr(
        f"filter(split(lower({text_col}), '{TOKEN_SPLIT_RE}'), x -> x != '')"
    )


def token_count(text_col: str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text_col))


def bpe_token_count(text_col: str) -> Column:
    """BPE-ish token count: word runs + individual punctuation marks, the usual
    cheap proxy for subword token counts in corpus budgeting."""
    return F.expr(f"size(regexp_extract_all({text_col}, '{BPE_TOKEN_RE}', 0))")


def _array_ngrams_sql(
    arr_sql: str, n: int, sep: str = " ", distinct: bool = True
) -> str:
    """n-gram array over an array expression via a zip_with chain of slices
    (distinct by default — shingle semantics; ``distinct=False`` keeps every
    occurrence, the repetition-counting semantics).

    Performance-critical shape, two regimes:

    - ``arr_sql`` is a plain COLUMN identifier → per-position ``concat``
      over ``element_at`` lookups (column references inside a lambda body
      are BoundReference reads, not re-evaluated expressions) —
      allocation-free, measured ~25% less executor CPU than the
      zip_with-of-slices chain. This is the form the hot dedup paths hit
      (they materialize the token array behind an Exchange first).
    - ``arr_sql`` is a composite EXPRESSION → the zip_with chain with every
      occurrence at *argument* level (evaluated once per row per
      occurrence, ~n+2 total). A lambda-BODY reference to an expression is
      re-evaluated per element — an O(len²) blowup measured at 64×+ — and
      the bind-once ``transform(array(e), a -> ...)`` wrapper that would
      avoid it produces NESTED lambdas, which Spark 4.1 cannot feed into
      Python-UDF arguments (UDF extraction fails with INTERNAL_ERROR), so
      the chain stays the expression-input form.

    Values are identical across regimes INCLUDING arrays carrying NULL
    elements: both forms use ``concat``, which propagates a NULL element
    into a NULL n-gram (the earlier ``concat_ws`` form silently SKIPPED
    NULLs, so an identifier-named caller with NULL elements would have
    gotten regime-dependent n-grams). Short and NULL inputs yield
    ``array()`` in both.
    """
    if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_.]*", arr_sql):
        elems = [f"element_at({arr_sql}, i + {k})" for k in range(n)]
        joiner = f", '{sep}', " if sep else ", "
        acc = (
            f"transform(sequence(1, size({arr_sql}) - {n - 1}), "
            f"i -> concat({joiner.join(elems)}))"
        )
    else:
        ln = f"size({arr_sql}) - {n - 1}"
        acc = f"slice({arr_sql}, 1, {ln})"
        for k in range(2, n + 1):
            acc = (
                f"zip_with({acc}, slice({arr_sql}, {k}, {ln}), "
                f"(a, b) -> concat(a, '{sep}', b))"
            )
    if distinct:
        acc = f"array_distinct({acc})"
    return f"CASE WHEN size({arr_sql}) >= {n} THEN {acc} ELSE array() END"


def word_shingles(text_col: str, n: int = 3) -> Column:
    """Distinct word n-gram shingles (space-joined), the MinHash input unit.
    Documents shorter than ``n`` words yield an empty array (callers must guard
    any division by |shingles| — ANSI mode)."""
    toks = f"filter(split(lower({text_col}), '{TOKEN_SPLIT_RE}'), x -> x != '')"
    return F.expr(_array_ngrams_sql(toks, n, " "))


def char_ngrams(text_col: str, n: int = 3) -> Column:
    """Distinct character n-grams of the lowercased text (SimHash/lang-ID
    features)."""
    chars = f"split(lower({text_col}), '')"
    return F.expr(_array_ngrams_sql(chars, n, ""))


def _profile_score(text_col: str, words: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return (
        f"size(filter(filter(split(lower({text_col}), '{TOKEN_SPLIT_RE}'), x -> x != ''),"
        f" x -> array_contains(array({lst}), x)))"
    )


def lang_id(text_col: str, min_hits: int = 1) -> Column:
    """Stopword-profile language ID: per-language hit count over
    :data:`LANG_PROFILES`, argmax wins (ties broken by profile order), below
    ``min_hits`` → 'und' (undetermined).

    The classic cheap lang-ID heuristic (stopword/n-gram overlap); the operator
    shape matches what a production fastText-style scorer needs: one pass,
    per-row arithmetic, groupable output. Pure CASE/greatest expression —
    portable verbatim to the DuckDB oracle."""
    scores = {lang: _profile_score(text_col, ws) for lang, ws in LANG_PROFILES.items()}
    best = "greatest(" + ", ".join(scores.values()) + ")"
    cases = " ".join(
        f"WHEN {expr} = {best} THEN '{lang}'" for lang, expr in scores.items()
    )
    return F.expr(
        f"CASE WHEN {best} < {min_hits} THEN 'und' ELSE CASE {cases} END END"
    )


def stopword_ratio(text_col: str, lang: str = "en") -> Column:
    """Share of tokens that are (English, by default) stopwords — a quality
    signal: natural prose has ~0.3-0.5, keyword spam ~0."""
    hits = _profile_score(text_col, LANG_PROFILES[lang])
    ntok = f"size(filter(split(lower({text_col}), '{TOKEN_SPLIT_RE}'), x -> x != ''))"
    return F.expr(
        f"CASE WHEN {ntok} = 0 THEN 0.0 ELSE CAST({hits} AS DOUBLE) / {ntok} END"
    )


def punct_ratio(text_col: str) -> Column:
    """Share of non-alphanumeric, non-space characters."""
    total = f"length({text_col})"
    punct = f"length(regexp_replace({text_col}, '[a-zA-Z0-9\\\\s]', ''))"
    return F.expr(
        f"CASE WHEN {total} = 0 THEN 0.0 ELSE CAST({punct} AS DOUBLE) / {total} END"
    )


def mean_word_len(text_col: str) -> Column:
    ntok = f"size(filter(split(lower({text_col}), '{TOKEN_SPLIT_RE}'), x -> x != ''))"
    chars = f"length(regexp_replace({text_col}, '{TOKEN_SPLIT_RE}', ''))"
    return F.expr(
        f"CASE WHEN {ntok} = 0 THEN 0.0 ELSE CAST({chars} AS DOUBLE) / {ntok} END"
    )


def quality_score(text_col: str) -> Column:
    """Composite [0,1] document quality score: length saturation, stopword
    ratio, low punctuation, sane mean word length — the standard cheap filters
    a pretraining pipeline applies before expensive model-based scoring."""
    length_term = F.expr(f"least(1.0, length({text_col}) / 500.0)")
    sw = stopword_ratio(text_col)
    punct = punct_ratio(text_col)
    mwl = mean_word_len(text_col)
    mwl_term = F.when((mwl >= 3) & (mwl <= 10), F.lit(1.0)).otherwise(F.lit(0.0))
    return (
        0.25 * length_term
        + 0.25 * F.least(F.lit(1.0), sw * 4)
        + 0.25 * (1 - F.least(F.lit(1.0), punct * 5))
        + 0.25 * mwl_term
    )


def content_fingerprint(text_col: str) -> Column:
    """Exact-dup content fingerprint: md5 of whitespace-normalized lowercased
    text. md5 exists verbatim in DuckDB → oracle parity; at scale swap for
    xxhash64 (cheaper, same grouping semantics)."""
    return F.md5(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    )


def rolling_fingerprint(text_col: str, window: int = 8, keep_every: int = 16) -> Column:
    """Winnowing-style rolling fingerprint: xxhash64 each ``window``-gram of
    words, keep hashes ≡ 0 (mod ``keep_every``) — a sorted sketch of the
    document usable for containment / partial-overlap detection. Pure expression
    (no UDF): transform + filter over the shingle array."""
    toks = f"filter(split(lower({text_col}), '{TOKEN_SPLIT_RE}'), x -> x != '')"
    grams = _array_ngrams_sql(toks, window, " ")
    return F.expr(
        f"""array_sort(filter(transform({grams}, s -> xxhash64(s)),
                              h -> pmod(h, {keep_every}) = 0))"""
    )


# --------------------------------------------------------------------------- #
# PII detection / redaction (pretraining-corpus hygiene)
# --------------------------------------------------------------------------- #

# Conservative, high-precision patterns (the standard pre-redaction set a
# training-data pipeline runs BEFORE tokenization). Each is spliced into Spark
# SQL literals via F.expr, hence the doubled backslashes. Order matters for
# redaction: emails first (their local part would otherwise survive as a
# word), then long digit runs (cards), then phones, then IPs.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    # 13-19 digits with optional single space/dash separators (card-shaped)
    "card": r"\\b\\d(?:[ -]?\\d){12,18}\\b",
    # +intl or (area) prefixed, 7+ digits with common separators
    "phone": r"(?:\\+\\d{1,3}[ -]?)?(?:\\(\\d{2,4}\\)[ -]?)?\\d{3}[ -]\\d{3,4}[ -]?\\d{0,4}\\b",
    "ipv4": r"\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b",
}


def pii_counts(text_col: str) -> Column:
    """Per-document PII hit counts as a ``map<string, int>`` — one codegen
    pass, no UDF; the corpus-audit side of redaction (sum the map values per
    source to rank leaky slices before deciding scrub policy)."""
    entries = ", ".join(
        f"'{name}', CAST(size(regexp_extract_all({text_col}, '{pat}', 0)) AS INT)"
        for name, pat in PII_PATTERNS.items()
    )
    return F.expr(f"map({entries})")


def redact_pii(text_col: str, token_fmt: str = "<{kind}>") -> Column:
    """Replace every PII match with a typed placeholder token (``<email>``,
    ``<card>``, ...): a chain of native ``regexp_replace`` calls — pure
    column expression inside whole-stage codegen, so scrubbing a 100 TB
    corpus is a narrow map stage with zero shuffle. Patterns apply in
    ``PII_PATTERNS`` order (emails before digit runs).

    ``token_fmt`` is validated up front: rendered placeholders must contain
    no ``$`` or ``\\`` (Java's ``regexp_replace`` treats them as group
    references/escapes in the replacement) and no ``'`` (the token is
    spliced into a SQL string literal), and no rendered token may itself be
    re-matched by any LATER pattern in the chain (e.g. a caller format
    rendering ``555-1234`` would be re-redacted by the phone pattern) — the
    no-re-match invariant the default ``<kind>`` tokens satisfy."""
    import re as _re

    items = list(PII_PATTERNS.items())
    out = f"({text_col})"
    for i, (name, pat) in enumerate(items):
        token = token_fmt.format(kind=name)
        bad = sorted({ch for ch in token if ch in "$\\'"})
        if bad:
            raise ValueError(
                f"redact_pii token_fmt renders {token!r} for kind {name!r}, "
                f"which contains {bad}: $ and \\ are group references/escapes "
                "in the Java replacement string, and ' breaks the spliced SQL "
                "literal — pick placeholder text without them"
            )
        for later_name, later_pat in items[i + 1 :]:
            if _re.search(later_pat.replace("\\\\", "\\"), token):
                raise ValueError(
                    f"redact_pii token_fmt renders {token!r} for kind "
                    f"{name!r}, which the later {later_name!r} pattern "
                    "re-matches — the placeholder would be redacted again; "
                    "pick tokens no PII pattern matches"
                )
        out = f"regexp_replace({out}, '{pat}', '{token}')"
    return F.expr(out)


def repetition_stats(
    df, id_col: str, text_col: str, ngram_n: int = 2
):
    """Per-document repetition signals — the corpus-filter rules pretraining
    pipelines apply after cheap quality scoring (the Gopher/MassiveText
    "repetition" family, Rae et al. 2021 §A1.1, public method):

    - ``top_token_frac``: occurrences of the document's most frequent token /
      total tokens (prompt-injection spam, keyword stuffing, boilerplate);
    - ``dup_ngram_frac``: fraction of word ``ngram_n``-gram OCCURRENCES that
      are repeats of an n-gram already seen in the document (looping text,
      template churn). Documents with no tokens (or too few for an n-gram)
      score 0.0 — empty is not repetitive.

    Scale shape: both signals need per-(doc, unit) counts, so tokens and
    n-grams are tagged and exploded in ONE pass and share ONE shuffle keyed
    on (doc, kind, unit); per-doc reduction is map-side combinable and
    bounded by vocabulary, never docs². Skew is bounded by document length
    (one document's units land in one reducer group only per distinct unit).

    Returns ``(id_col, top_token_frac double, dup_ngram_frac double)`` with
    every input row present (left join back over ``id_col``).
    """
    from pyspark.sql import DataFrame  # noqa: F401 (signature documentation)

    toks_sql = f"filter(split(lower({text_col}), '{TOKEN_SPLIT_RE}'), x -> x != '')"
    grams_sql = _array_ngrams_sql(toks_sql, ngram_n, " ", distinct=False)
    units = (
        f"concat(transform({toks_sql}, t -> struct('t' AS kind, t AS unit)), "
        f"transform({grams_sql}, g -> struct('g' AS kind, g AS unit)))"
    )
    counts = (
        df.select(F.col(id_col).alias("_rid"), F.explode(F.expr(units)).alias("u"))
        .groupBy("_rid", F.col("u.kind").alias("kind"), F.col("u.unit").alias("unit"))
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    per_id = counts.groupBy("_rid").agg(
        F.max(F.when(F.col("kind") == "t", F.col("_c"))).alias("_tmx"),
        F.sum(F.when(F.col("kind") == "t", F.col("_c"))).alias("_ttot"),
        F.sum(
            F.when((F.col("kind") == "g") & (F.col("_c") > 1), F.col("_c"))
        ).alias("_gdup"),
        F.sum(F.when(F.col("kind") == "g", F.col("_c"))).alias("_gtot"),
    )
    stats = per_id.select(
        F.col("_rid").alias(id_col),
        (F.col("_tmx") / F.col("_ttot")).alias("top_token_frac"),
        F.when(
            F.col("_gtot").isNotNull(),
            F.coalesce(F.col("_gdup"), F.lit(0)) / F.col("_gtot"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_ngram_frac"),
    )
    return (
        df.select(id_col)
        .join(stats, id_col, "left")
        .fillna(0.0, ["top_token_frac", "dup_ngram_frac"])
    )
