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


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Content fingerprint: md5 of whitespace-normalized lowercase text."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    return docs.select(F.col(id_col), F.md5(norm).alias("fingerprint"))
