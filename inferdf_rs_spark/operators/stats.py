"""Graph shape statistics — the skew planner's input.

Not a reference operator (SURVEY.md §2.10): the reference's in-memory
store never needs them, but the north rule's skew handling (salting
rdf:type / sameAs hubs, predicate-bucket partitioning) has to be DRIVEN
by numbers.  ``predicate_stats`` is what a production run computes once
per snapshot and feeds into: broadcast-vs-shuffle regime picks, salt
factors for hub subjects, and predicate-bucket assignment for the
materialized layout.

Two-level aggregation, both narrow hash shuffles with map-side partial
aggregation: (p, s) degree first, then per-p rollup — never a window
over a whole predicate's facts (the hot-predicate single-task trap this
operator exists to detect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def predicate_stats(store: DataFrame) -> DataFrame:
    """Per-predicate: fact count, distinct subjects/objects, max and
    p-sum subject out-degree.  ``max_s_degree >> n_facts / n_subjects``
    flags a hub predicate that needs salting."""
    deg = store.groupBy("p", "s").agg(F.count(F.lit(1)).alias("_d"))
    by_p = deg.groupBy("p").agg(
        F.sum("_d").alias("n_facts"),
        F.count(F.lit(1)).alias("n_subjects"),
        F.max("_d").alias("max_s_degree"),
    )
    n_obj = store.groupBy("p").agg(F.count_distinct("o").alias("n_objects"))
    return by_p.join(n_obj, "p").select(
        "p",
        F.col("n_facts").cast("long").alias("n_facts"),
        F.col("n_subjects").cast("long").alias("n_subjects"),
        F.col("n_objects").cast("long").alias("n_objects"),
        F.col("max_s_degree").cast("long").alias("max_s_degree"),
    )
