"""Extraction front-end: html→text + batched mention detection +
alias-dictionary entity linking.

Mandated by the north rule, not by the reference (the reference's
"stated" facts enter by caller insertion — src/cause.rs:10-11,
src/lib.rs:66); this stage produces that stated layer from raw pages.

All Python code paths are **vectorized Arrow UDFs** (pandas_udf) — no
per-row Python.  Entity-link scoring stays JVM-side: a broadcast join
against the (tiny) alias dictionary + a deterministic argmax window
(score desc, iri asc) — the idiomatic-Spark half of the contract.

Fidelity invariant: ``html_to_text(html)`` must be byte-identical to
the page's ``text`` column per url (verified by ``verify_fidelity``).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SCRIPT_RE = re.compile(r"<(script|style|head)\b[^>]*>.*?</\1>", re.S | re.I)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")]


def _strip_html(h: bytes | None) -> str:
    if h is None:
        return ""
    s = h.decode("utf-8", errors="replace")
    s = _SCRIPT_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    for k, v in _ENTITIES:  # &amp; last so &amp;lt; doesn't double-decode
        s = s.replace(k, v)
    return _WS_RE.sub(" ", s).strip()


@F.pandas_udf(T.StringType())
def html_to_text(html: pd.Series) -> pd.Series:
    """Deterministic tag-strip + entity-unescape + whitespace collapse
    (Arrow-batched; the de-facto extraction kernel)."""
    return html.map(_strip_html)


def extract_text(pages: DataFrame) -> DataFrame:
    return pages.withColumn("extracted_text", html_to_text(F.col("html")))


def verify_fidelity(pages_with_extracted: DataFrame) -> int:
    """Count of urls whose extracted text is NOT byte-identical to the
    stated text column — must be 0 (north-rule invariant)."""
    return pages_with_extracted.filter(
        ~(F.col("extracted_text").eqNullSafe(F.col("text")))
    ).count()


def make_mention_detector(alias_list: list[str]):
    """Build a batched mention detector closed over the alias vocabulary.

    Candidate surfaces are unigrams and bigrams of the lowercased token
    stream that appear in the alias set; output is the distinct surfaces
    in first-occurrence order (deterministic)."""
    max_words = max(a.count(" ") + 1 for a in alias_list) if alias_list else 1
    vocab = frozenset(alias_list)

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def detect(text: pd.Series) -> pd.Series:
        def one(t: str | None) -> list[str]:
            if not t:
                return []
            toks = re.split(r"[^a-z0-9]+", t.lower())
            toks = [x for x in toks if x]
            seen: list[str] = []
            have = set()
            for n in range(1, max_words + 1):
                for i in range(len(toks) - n + 1):
                    cand = " ".join(toks[i : i + n])
                    if cand in vocab and cand not in have:
                        have.add(cand)
                        seen.append(cand)
            return seen

        return text.map(one)

    return detect


def link_mentions(pages: DataFrame, alias_dict: DataFrame, text_col: str = "text") -> DataFrame:
    """Detect alias mentions and link each to its best-scoring entity.

    - detection: Arrow-batched UDF over the text column;
    - linking: broadcast join to the alias dictionary (tiny dim) +
      deterministic argmax per (url, surface): score desc, iri asc.

    Returns (url, surface, iri, score)."""
    aliases = [r.alias for r in alias_dict.select("alias").distinct().collect()]
    detect = make_mention_detector(aliases)
    mentions = pages.select(
        "url", F.explode(detect(F.col(text_col))).alias("surface")
    )
    joined = mentions.join(
        F.broadcast(alias_dict), mentions.surface == alias_dict["alias"], "inner"
    ).select("url", "surface", "iri", "score")
    w = Window.partitionBy("url", "surface").orderBy(F.col("score").desc(), F.col("iri").asc())
    return (
        joined.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )
