"""Sequence packing for training-batch assembly.

Not part of the reference engine (SURVEY.md §2.10 — it has no
aggregations); this is the training-data-pipeline step that turns a
deduplicated corpus into fixed-token-budget packs: documents in a
stable global order, chunked wherever the running token total crosses
a budget boundary.

The core primitive is a DISTRIBUTED PREFIX SUM.  The naive Spark
expression — ``sum(x) over (order by k)`` with no partition key — is a
correctness trap at scale: an un-partitioned window collapses the whole
table into ONE task.  Instead we do the classic two-pass scan:

1. bucket rows by range over the order key (pure arithmetic on the
   key, no sampling — deterministic across retries/resumes, unlike
   ``repartitionByRange`` whose sampled boundaries can shift);
2. per-bucket cumulative sums under a window PARTITIONED by bucket
   (parallel, one narrow shuffle);
3. bucket totals (tiny: one row per bucket) get their own exclusive
   prefix sum — at most thousands of rows, a single-task window is
   correct there — and are broadcast-joined back as offsets.

Wall-clock is two narrow shuffles of the (key, value) pair — the same
shape at 10^12 rows with more buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import token_count


def distributed_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cumsum",
    n_buckets: int | None = None,
) -> DataFrame:
    """Inclusive prefix sum of ``value_col`` in ``order_col`` order.

    ``order_col`` must be unique per row (it defines the total order).
    One tiny min/max aggregate reads the key span (the catalog-stats
    lookup a production run gets for free from parquet footers).
    """
    if n_buckets is None:
        n_buckets = max(df.sparkSession.sparkContext.defaultParallelism, 8)
    lo, hi = df.agg(F.min(order_col), F.max(order_col)).first()
    if lo is None:
        return df.withColumn(out_col, F.lit(None).cast("long"))
    span = int(hi) - int(lo) + 1
    n_buckets = min(n_buckets, span)
    # bucket = (key - lo) / ceil(span / n_buckets), in DECIMAL: the old
    # (key - lo) * n_buckets / span long arithmetic overflowed for key
    # spans near the int64 range (hash-derived ids), and the clamp then
    # assigned buckets NON-monotonically in key order — silently wrong
    # prefix sums (ADVICE r5).  Decimal(38,0) holds the full span and
    # dividing by a precomputed width never multiplies row values.
    width = -(-span // n_buckets)  # ceil — width*n_buckets >= span
    dec = "decimal(38,0)"
    bkt = F.floor(
        (F.col(order_col).cast(dec) - F.lit(int(lo)).cast(dec))
        / F.lit(int(width)).cast(dec)
    ).cast("int")
    bkt = F.least(F.lit(n_buckets - 1), F.greatest(F.lit(0), bkt))
    bucketed = df.withColumn("_bkt", bkt)

    w_local = (
        Window.partitionBy("_bkt")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = bucketed.withColumn("_local", F.sum(value_col).over(w_local))

    # exclusive prefix over the per-bucket totals: n_buckets rows, so the
    # single-partition window is on a table that fits in one cache line
    # per bucket — then broadcast back
    w_off = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        bucketed.groupBy("_bkt")
        .agg(F.sum(value_col).alias("_tot"))
        .withColumn("_off", F.coalesce(F.sum("_tot").over(w_off), F.lit(0)))
        .select("_bkt", "_off")
    )
    return (
        local.join(F.broadcast(offsets), "_bkt")
        .withColumn(out_col, (F.col("_local") + F.col("_off")).cast("long"))
        .drop("_bkt", "_local", "_off")
    )


def pack_sequences(
    docs: DataFrame,
    budget: int,
    order_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int | None = None,
) -> DataFrame:
    """Assign each document to a training pack of ~``budget`` tokens.

    Cumulative-boundary packing: documents in ``order_col`` order, pack
    ``i`` holds the rows whose running token total lands in
    ``(i*budget, (i+1)*budget]``.  Deterministic, order-preserving and
    resume-stable (re-running over the same corpus reproduces identical
    pack ids — no greedy bin state to checkpoint).  Returns
    ``(doc_id, n_tokens, cum_tokens, pack_id)``.
    """
    counted = token_count(docs, text_col=text_col, id_col=order_col)
    summed = distributed_prefix_sum(
        counted, order_col, "n_tokens", out_col="cum_tokens", n_buckets=n_buckets
    )
    # greatest(0, ·) clamps leading zero-token docs (cum_tokens = 0)
    return summed.withColumn(
        "pack_id",
        F.greatest(
            F.lit(0), F.floor((F.col("cum_tokens") - 1) / budget)
        ).cast("long"),
    )
