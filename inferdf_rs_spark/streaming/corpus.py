"""Corpus-stream operators: watermarked windowed ingest metrics,
state-bounded streaming dedup, and a custom stateful per-host operator.

The reference engine has no streaming surface (SURVEY.md §2.10); these
are the web-pipeline's own stream-side needs, built on the three stock
Structured-Streaming tools so state stays BOUNDED on an unbounded
crawl stream:

- windowed aggregation + watermark: per-(window, lang) ingest metrics;
  rows later than the watermark are dropped and window state is
  reclaimed once the watermark passes the window end;
- ``dropDuplicatesWithinWatermark``: streaming exact-dedup on the
  content digest whose dedup state also expires with the watermark —
  a plain streaming dropDuplicates would hold every digest ever seen;
- ``applyInPandasWithState``: the custom-stateful escape hatch (the
  stream-side analogue of the batch engine's Arrow UDFs) — here a
  per-host cumulative counter that emits each host's batch and
  running totals.

All three run on the same pages schema as the batch pipeline
(url, warc_ts, html, text, lang), so a crawl feed can fan out to the
incremental graph (streaming.ingest) and these monitors from one
``readStream``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def windowed_ingest_metrics(
    pages: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Per-(event-time window, lang) page counts + mean text length.

    Watermark bounds BOTH late-data acceptance and aggregation state:
    windows older than (max event time − watermark) are finalized and
    their state dropped — mandatory on an unbounded crawl stream."""
    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(
            F.count("*").alias("n_pages"),
            F.avg(F.length("text")).alias("avg_chars"),
        )
        .select(F.col("w.start").alias("w_start"), F.col("w.end").alias("w_end"), "lang", "n_pages", "avg_chars")
    )


def streaming_exact_dedup(pages: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """First occurrence of each content digest within the watermark
    horizon (the streaming form of ``operators.dedup.exact_dedup``'s
    keep-first policy).

    ``dropDuplicatesWithinWatermark`` expires digest state once the
    watermark passes — the unbounded-state hazard of a plain streaming
    dropDuplicates (one state row per digest FOREVER) is the reason
    this variant exists."""
    return (
        pages.withColumn("dup_key", F.md5(F.col("text")))
        .withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["dup_key"])
    )


HOST_STATS_OUTPUT = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("batch_pages", T.LongType()),
        T.StructField("total_pages", T.LongType()),
    ]
)
HOST_STATS_STATE = T.StructType([T.StructField("total", T.LongType())])


def per_host_page_counts(pages: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-host
    cumulative page counts across micro-batches.

    State is one int64 per host — the pattern to copy for any
    accumulator the built-in aggregations can't express (per-key
    models, session heuristics).  Arrow-batched like every other
    Python edge in this engine; no per-row Python on the stream."""

    def update(key, pdfs, state):
        import pandas as pd

        n = 0
        for pdf in pdfs:
            n += len(pdf)
        (total,) = state.get if state.exists else (0,)
        total += n
        state.update((total,))
        yield pd.DataFrame({"host": [key[0]], "batch_pages": [n], "total_pages": [total]})

    host = F.regexp_extract(F.col("url"), r"^[a-z]+://([^/]+)", 1).alias("host")
    return (
        pages.select(host, "url")
        .groupBy("host")
        .applyInPandasWithState(
            update,
            outputStructType=HOST_STATS_OUTPUT,
            stateStructType=HOST_STATS_STATE,
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )
