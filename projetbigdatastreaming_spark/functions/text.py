"""Text-analysis column expressions (north-star: LLM training-data
pipeline operators over the `documents` table).

All of these are pure Spark SQL expressions — they run inside
whole-stage codegen on the JVM with no Python in the hot path, so they
scale to a 100 TB corpus exactly like any built-in function.

Portability: anything the DuckDB oracle must reproduce uses md5 as the
hash primitive (identical hex output in both engines); engine-internal
hashing (LSH bucketing) uses xxhash64, which is faster and needs no
cross-engine parity.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword sets for the n-gram/stopword language-ID
# heuristic.  Deliberately small and explicit so the oracle SQL can
# restate them verbatim.
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "est"),
    "es": ("el", "la", "de", "que", "y", "los", "una", "es"),
    "de": ("der", "die", "das", "und", "ein", "zu", "ist", "den"),
}


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (P6 generalized:
    TwitterKafkaStreaming.scala:184-185 `split(" ")`)."""
    return F.split(F.col(col) if isinstance(col, str) else col, " ")


def hash60(col: Column) -> Column:
    """Portable 60-bit non-negative hash: first 15 hex chars of md5.

    Identical in DuckDB as CAST(concat('0x', substr(md5(x),1,15)) AS
    BIGINT); 60 bits keeps the value inside a signed 64-bit int in both
    engines.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def normalized_text(col: Column | str) -> Column:
    """Canonical form for exact-dup fingerprinting: lowercase, collapse
    internal whitespace, trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def fingerprint(col: Column | str) -> Column:
    """Content fingerprint: md5 of the normalized text (16 hex chars)."""
    return F.substring(F.md5(normalized_text(col)), 1, 16)


def word_shingles(text_col: str, n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array<string> — the unit of
    MinHash / Jaccard near-dup detection.  Pure higher-order functions:
    no explode, no shuffle, evaluated per-row.

    The token array is bound once via a single-element transform
    (a `let`-binding in Spark SQL's expression language) so the split
    isn't re-evaluated per shingle.
    """
    return F.expr(
        f"""
        transform(array(split({text_col}, ' ')), toks ->
          array_distinct(
            CASE WHEN size(toks) >= {n}
                 THEN transform(sequence(1, size(toks) - {n - 1}),
                                i -> concat_ws(' ', slice(toks, i, {n})))
                 ELSE array(concat_ws(' ', toks))
            END))[0]
        """
    )


def winnow_fingerprints(text_col: str, k: int = 8, w: int = 4) -> Column:
    """Winnowed document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03): hash every char k-gram of the normalized text with the
    portable 60-bit md5 hash, slide a w-window over the hash sequence,
    keep each window's minimum, dedupe.  Returns array<bigint>.

    The standard rolling-hash fingerprint for plagiarism/overlap
    detection, guaranteeing any shared run of k+w-1 chars yields at
    least one common fingerprint.  Pure higher-order expressions
    (let-bindings via single-element transform), no explode until the
    caller chooses row form; portable to the DuckDB oracle.

    Degenerate inputs: text shorter than k hashes as one whole-string
    gram; fewer than w grams yield their single minimum.
    """
    norm = f"trim(regexp_replace(lower({text_col}), '\\\\s+', ' '))"
    h = "CAST(conv(substring(md5({x}), 1, 15), 16, 10) AS BIGINT)"
    gram_h = h.format(x=f"substring(s, p, {k})")
    whole_h = h.format(x="s")
    return F.expr(
        f"""
        transform(array({norm}), s ->
          CASE WHEN length(s) < {k} THEN array({whole_h})
          ELSE transform(
                 array(transform(sequence(1, length(s) - {k - 1}),
                                 p -> {gram_h})),
                 hs -> array_distinct(
                   CASE WHEN size(hs) >= {w}
                        THEN transform(sequence(1, size(hs) - {w - 1}),
                                       j -> array_min(slice(hs, j, {w})))
                        ELSE array(array_min(hs))
                   END))[0]
          END)[0]
        """
    )


def token_count_ws(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col)).cast("bigint")


def token_count_bpe(col: Column | str) -> Column:
    """BPE-ish token count: alpha runs, digit runs, and single
    non-space symbols each count as one token."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)).cast(
        "bigint"
    )


def _sw_ratio_expr(tokens_expr: str, lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (
        f"size(filter({tokens_expr}, t -> t IN ({words}))) / "
        f"CAST(greatest(size({tokens_expr}), 1) AS DOUBLE)"
    )


def language_scores(text_col: str) -> dict[str, Column]:
    """Per-language stopword-hit ratio columns."""
    toks = f"split({text_col}, ' ')"
    return {lang: F.expr(_sw_ratio_expr(toks, lang)) for lang in STOPWORDS}


def language_id(text_col: str) -> Column:
    """Heuristic language ID: argmax of stopword-hit ratios, 'und' when
    no stopword of any language occurs.  Deterministic tie-break by
    the fixed language order en, fr, es, de (strict > comparison).
    """
    scores = language_scores(text_col)
    best_lang = F.lit("und")
    best_score = F.lit(0.0)
    for lang in ("en", "fr", "es", "de"):
        s = scores[lang]
        is_better = s > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, s).otherwise(best_score)
    return best_lang


def quality_score(text_col: str) -> Column:
    """Composite quality score in [0,1]: length band + mean word length
    band + non-alnum ratio penalty.  Mirrors the shape of public
    LLM-data quality filters (length/punct/stopword heuristics).

    All band predicates are INTEGER-exact (cross-multiplied ratios, no
    float comparison): ``mean_wl BETWEEN 3 AND 10`` becomes
    ``3*n_tok <= sum_len <= 10*n_tok`` and ``non_alnum < 0.1`` becomes
    ``10*n_bad < len`` — a document exactly on a band boundary gets the
    same verdict in every engine, which raw-double comparisons do not
    guarantee (the round-1 driver hash mismatch).

    The score itself is summed in integer CENTI-points and divided by
    100 as the very last step, producing a DOUBLE in both engines.
    (The round-2 mismatch was representational: decimal literals make
    Spark emit DECIMAL(x,2) — pandas ``Decimal('1.00')`` — while
    DuckDB's ROUND of its decimal emits float64; the driver hashes the
    two differently even though every value is equal.)
    """
    toks = f"split({text_col}, ' ')"
    n_tok = f"size({toks})"
    sum_len = f"aggregate({toks}, 0L, (a, t) -> a + length(t))"
    n_tok_g = f"greatest({n_tok}, 1)"
    n_bad = (
        f"(length({text_col}) - length(regexp_replace({text_col},"
        f" '[^A-Za-z0-9 ]', '')))"
    )
    len_g = f"greatest(length({text_col}), 1)"
    return F.expr(
        f"""
        CAST((CASE WHEN {n_tok} BETWEEN 10 AND 1000 THEN 40
                   WHEN {n_tok} BETWEEN 3 AND 2000 THEN 20
                   ELSE 0 END)
             + (CASE WHEN {sum_len} >= 3 * {n_tok_g}
                      AND {sum_len} <= 10 * {n_tok_g} THEN 30 ELSE 10 END)
             + (CASE WHEN 10 * {n_bad} < {len_g} THEN 30
                     WHEN 10 * {n_bad} < 3 * {len_g} THEN 15
                     ELSE 0 END) AS DOUBLE) / 100.0D
        """
    )
