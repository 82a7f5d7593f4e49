"""Text analysis operators: language-ID, quality scoring, token counts,
document fingerprinting.  All built-in-function (JVM) expressions —
no Python in the hot path; every output is integer-or-exact typed so a
DuckDB oracle reproduces it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import norm_tokens

# tiny marker dictionaries for the n-gram/stopword language heuristic;
# deterministic argmax with lang-name tiebreak
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "is"],
    "fr": ["le", "la", "et", "les", "des", "un"],
    "de": ["der", "die", "und", "das", "ein", "ist"],
    "es": ["el", "la", "los", "que", "un", "es"],
}


def token_count(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return docs.select(
        F.col(id_col), F.size(norm_tokens(F.col(text_col))).alias("n_tokens")
    )


def quality_features(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Quality-scoring features: length, alpha/digit/space counts, mean
    token length (milli-units), distinct-token ratio (milli-units)."""
    t = F.col(text_col)
    toks = norm_tokens(t)
    n_tok = F.size(toks)
    total_tok_len = F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x))
    return docs.select(
        F.col(id_col),
        F.length(t).alias("n_chars_m"),
        F.length(F.regexp_replace(t, "[^A-Za-z]", "")).alias("n_alpha"),
        F.length(F.regexp_replace(t, "[^0-9]", "")).alias("n_digit"),
        F.length(F.regexp_replace(t, "[^ ]", "")).alias("n_space"),
        n_tok.alias("n_tokens"),
        F.when(n_tok > 0, F.floor(total_tok_len * 1000 / n_tok)).otherwise(F.lit(0)).cast("long").alias("mean_tok_len_milli"),
        F.when(n_tok > 0, F.floor(F.size(F.array_distinct(toks)) * 1000 / n_tok)).otherwise(F.lit(0)).cast("long").alias("distinct_ratio_milli"),
    )


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-marker language heuristic: per language, count marker
    tokens; argmax with (count desc, lang asc) deterministic tiebreak."""
    toks = norm_tokens(F.col(text_col))
    scores = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        ms = F.array(*[F.lit(m) for m in markers])
        cnt = F.size(F.filter(toks, lambda x: F.array_contains(ms, x)))
        scores.append(F.struct(cnt.alias("n"), F.lit(lang).alias("lang")))
    # fold keeps the FIRST strict maximum in sorted-lang order, so ties
    # resolve to the alphabetically-first language (deterministic)
    arr = F.array(*scores)
    best = F.aggregate(
        arr,
        F.struct(F.lit(-1).alias("n"), F.lit("").alias("lang")),
        lambda acc, s: F.when(s["n"] > acc["n"], s).otherwise(acc),
    )
    return docs.select(F.col(id_col), best["lang"].alias("pred_lang"), best["n"].alias("marker_hits"))


# Gopher-style repetition/shape gates (Rae et al. 2021, table A1 —
# public thresholds), expressed as integer milli-ratios so the keep
# decision is bit-stable and oracle-reproducible.
QUALITY_REASON_TOO_FEW_TOKENS = 1
QUALITY_REASON_TOO_MANY_TOKENS = 2
QUALITY_REASON_MEAN_TOK_LEN = 4
QUALITY_REASON_ALPHA_RATIO = 8
QUALITY_REASON_DISTINCT_RATIO = 16


def quality_filter(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 5,
    max_tokens: int = 1_000_000,
    min_mean_tok_len_milli: int = 2_000,
    max_mean_tok_len_milli: int = 12_000,
    min_alpha_ratio_milli: int = 500,
    min_distinct_ratio_milli: int = 200,
) -> DataFrame:
    """Gopher-style quality gate: (doc_id, keep, reasons bitmask).

    Composes ``quality_features`` into one map-only pass — the filter
    itself introduces NO shuffle, so it streams at scan speed at any
    corpus size; downstream stages consume ``keep`` as a pushed-down
    predicate.
    """
    f = quality_features(docs, text_col=text_col, id_col=id_col)
    alpha_milli = F.when(
        F.col("n_chars_m") > 0, F.floor(F.col("n_alpha") * 1000 / F.col("n_chars_m"))
    ).otherwise(F.lit(0))
    reasons = (
        F.when(F.col("n_tokens") < min_tokens, F.lit(QUALITY_REASON_TOO_FEW_TOKENS)).otherwise(F.lit(0))
        + F.when(F.col("n_tokens") > max_tokens, F.lit(QUALITY_REASON_TOO_MANY_TOKENS)).otherwise(F.lit(0))
        + F.when(
            (F.col("mean_tok_len_milli") < min_mean_tok_len_milli)
            | (F.col("mean_tok_len_milli") > max_mean_tok_len_milli),
            F.lit(QUALITY_REASON_MEAN_TOK_LEN),
        ).otherwise(F.lit(0))
        + F.when(alpha_milli < min_alpha_ratio_milli, F.lit(QUALITY_REASON_ALPHA_RATIO)).otherwise(F.lit(0))
        + F.when(
            F.col("distinct_ratio_milli") < min_distinct_ratio_milli,
            F.lit(QUALITY_REASON_DISTINCT_RATIO),
        ).otherwise(F.lit(0))
    )
    return f.select(
        F.col(id_col),
        reasons.cast("long").alias("reasons"),
        (reasons == 0).alias("keep"),
    )


# PII patterns in the Java/RE2-common dialect (no backrefs, no
# lookaround) so Spark's regexp_replace and DuckDB's RE2 agree byte
# for byte.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_redact(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Redact emails/phones/IPv4s: (doc_id, clean_text, n_email,
    n_phone, n_ipv4).  Map-only regexp passes — scan-speed at any
    scale; patterns applied in a fixed order (email first, so an IP
    inside a hostname local-part is consumed by the email rule)."""
    t = F.col(text_col)
    counts = {k: F.regexp_count(t, F.lit(p)).cast("long") for k, p in PII_PATTERNS.items()}
    clean = t
    for k, p in PII_PATTERNS.items():
        clean = F.regexp_replace(clean, p, f"<{k.upper()}>")
    return docs.select(
        F.col(id_col),
        clean.alias("clean_text"),
        counts["email"].alias("n_email"),
        counts["phone"].alias("n_phone"),
        counts["ipv4"].alias("n_ipv4"),
    )


def repetition_features(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ns: tuple[int, ...] = (2, 3),
) -> DataFrame:
    """Gopher-style repetition gate inputs: per-n duplicate-n-gram
    milli-fraction, ``floor(1000 * (total - distinct) / total)`` over
    the doc's ordered n-grams (0 when the doc has < n tokens).

    Map-only array arithmetic per row (JVM ``transform``/``slice``) —
    no shuffle, no token explode; the n-gram lists live only inside the
    projection, so nothing wide survives into downstream exchanges."""
    toks = norm_tokens(F.col(text_col))
    m = F.size(toks)

    def dup_milli(n: int) -> Column:
        idx = F.sequence(F.lit(0), F.greatest(m - n, F.lit(0)))
        # NB: single-parameter lambda — a 2-arg lambda would be read by
        # ``transform`` as its (element, index) form
        grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
        total = F.size(grams)
        distinct = F.size(F.array_distinct(grams))
        return (
            F.when(m >= n, F.floor((total - distinct) * 1000 / total))
            .otherwise(F.lit(0))
            .cast("long")
            .alias(f"dup{n}_milli")
        )

    return docs.select(F.col(id_col), *[dup_milli(n) for n in ns])


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Content fingerprint: md5 of whitespace-normalized lowercase text."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    return docs.select(F.col(id_col), F.md5(norm).alias("fingerprint"))
