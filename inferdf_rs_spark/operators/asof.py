"""As-of (most-recent-prior) join — an event-pipeline primitive Spark
lacks as a built-in.

Not part of the reference engine (SURVEY.md §2.10); training-data
pipelines need it to stamp each record with the latest state of some
slowly-changing side (crawl metadata, policy version, user context).

Spark-first formulation: UNION the two sides with a tag, then one
window per key carrying the right side's values forward with
``last(..., ignorenulls=True)``.  This is a single narrow shuffle on
the join key — never a range- or theta-join explosion — and scales by
key cardinality like any hash aggregation.  Skewed keys can be salted
upstream; within a key the window sort is (order, tag, tie), so ties
are deterministic and right-side rows at the same timestamp sort
BEFORE left rows (inclusive ``right.order <= left.order`` semantics,
matching DuckDB's ASOF JOIN default).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    order: str,
    values: Sequence[str],
    tie: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """For each left row, attach ``values`` from the latest right row
    with the same ``on`` key and ``right.order <= left.order``.

    ``tie`` (a right-side column, e.g. an event id) makes the winner
    among equal-``order`` right rows deterministic: the largest wins.
    Left rows with no prior right row get nulls.
    """
    val_cols = list(values)
    tagged_r = right.select(
        F.col(on),
        F.col(order),
        F.lit(0).alias("_tag"),
        (F.col(tie) if tie else F.lit(0)).alias("_tie"),
        F.struct(*[F.col(c) for c in val_cols]).alias("_vals"),
    )
    left_rest = [c for c in left.columns]
    tagged_l = left.select(
        F.col(on),
        F.col(order),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(tagged_r.schema["_tie"].dataType).alias("_tie"),
        F.lit(None).cast(tagged_r.schema["_vals"].dataType).alias("_vals"),
        F.struct(*[left[c] for c in left_rest]).alias("_lrow"),
    )
    tagged_r = tagged_r.withColumn(
        "_lrow", F.lit(None).cast(tagged_l.schema["_lrow"].dataType)
    )

    w = (
        Window.partitionBy(on)
        .orderBy(F.col(order).asc(), F.col("_tag").asc(), F.col("_tie").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = tagged_l.unionByName(tagged_r).withColumn(
        "_carried", F.last("_vals", ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("_tag") == 1).select(
        *[F.col("_lrow")[c].alias(c) for c in left_rest],
        *[F.col("_carried")[c].alias(prefix + c) for c in val_cols],
    )
    return out
