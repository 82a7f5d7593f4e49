"""Benchmark decontamination: drop training documents that overlap an
evaluation set by shared word n-grams.

The standard LLM-corpus hygiene step (popularised by GPT-3 appendix C /
the Pile / OLMo pipelines as "13-gram decontamination"): any training
document sharing >= ``min_hits`` distinct n-grams with a benchmark
document is contaminated and removed.  The reference engine has no
corpus layer; this extends the mandated training-data-pipeline scope
alongside dedup/quality/PII (operators/dedup.py, textstats.py).

Scale shape (100 TB corpus, MB-scale benchmark):

- the benchmark gram set is tiny (eval suites are a few MB of text) —
  it is collected once, deduplicated, and BROADCAST, so the corpus-side
  probe is map-only: explode grams -> hash-probe the broadcast set.
- only grams that HIT the benchmark survive the probe, so the one
  shuffle (groupBy doc_id to count hits) moves hit pairs only — a
  vanishing fraction of the corpus.
- the final filter is a broadcast anti-join on the flagged-id list
  (same shape as dedup.drop_near_dups): contaminated ids are rare, the
  corpus itself never shuffles.

Tokenization/shingling reuses dedup.norm_tokens/word_shingles, so the
DuckDB oracle (``_TS``/``_shingles`` in __spark_entry__.py) stays
shared across all n-gram operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import norm_tokens, word_shingles


def benchmark_grams(
    bench: DataFrame, text_col: str = "text", n: int = 3
) -> DataFrame:
    """Distinct word n-grams of the benchmark corpus — the (small)
    build side of the contamination probe."""
    return bench.select(
        F.explode(word_shingles(norm_tokens(F.col(text_col)), n)).alias("gram")
    ).dropDuplicates()


def contamination_hits(
    corpus: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Per-document count of distinct n-grams shared with the benchmark
    set: ``(id_col, n_hits)``, hit documents only.

    ``word_shingles`` already dedups grams within a document, so after
    the explode each (doc, gram) pair is unique and ``count(*)`` is the
    distinct-hit count.
    """
    grams = corpus.select(
        F.col(id_col),
        F.explode(word_shingles(norm_tokens(F.col(text_col)), n)).alias("gram"),
    )
    return (
        grams.join(F.broadcast(benchmark_grams(bench, text_col, n)), on="gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def decontaminate(
    corpus: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_hits: int = 1,
) -> DataFrame:
    """The corpus minus documents sharing >= ``min_hits`` distinct
    n-grams with the benchmark — broadcast anti-join on the flagged-id
    list, the corpus never shuffles."""
    flagged = (
        contamination_hits(corpus, bench, text_col, id_col, n)
        .filter(F.col("n_hits") >= min_hits)
        .select(id_col)
    )
    return corpus.join(F.broadcast(flagged), on=id_col, how="left_anti")
