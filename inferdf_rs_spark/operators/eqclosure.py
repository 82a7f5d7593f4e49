"""Eq-statement closure: connected components over resource-equality pairs.

The reference *emits* Eq statements in deduction and *checks* them in
validation (src/system/deduction.rs:120-131) — merging equal resources
is left to the caller's interpretation.  At scale that merge is a
connected-components problem over the ``eq_pairs`` table; we use
iterative min-id propagation (alternating large-star/small-star style
rounds expressed as joins + groupBy min), converging in O(log n) rounds.

Output: ``(term_id, res)`` mapping every member to its component's
canonical (minimum) id — the ``eq_mapping`` accepted by
``terms.resource_facets`` and by match-time resource rewriting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def eq_closure(eq_pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """Min-label propagation over undirected equality edges.

    ``eq_pairs``: any DataFrame with columns ``a``, ``b`` (term ids);
    only positive pairs should be passed (filter ``sign`` upstream).
    """
    edges = (
        eq_pairs.select(F.col("a").alias("x"), F.col("b").alias("y"))
        .unionByName(eq_pairs.select(F.col("b").alias("x"), F.col("a").alias("y")))
        .filter(F.col("x") != F.col("y"))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    # label(x) = min over neighborhood ∪ self
    labels = (
        edges.select("x", "y")
        .unionByName(edges.select(F.col("x"), F.col("x").alias("y")))
        .groupBy("x")
        .agg(F.min("y").alias("lbl"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # propagate: lbl(x) = min(lbl(x), min over neighbors' lbl)
        nb = (
            edges.join(labels.withColumnRenamed("x", "y2"), edges.y == F.col("y2"))
            .select("x", F.col("lbl").alias("nlbl"))
            .groupBy("x")
            .agg(F.min("nlbl").alias("nlbl"))
        )
        new_labels = (
            labels.join(nb, "x", "left")
            .select("x", F.least(F.col("lbl"), F.coalesce(F.col("nlbl"), F.col("lbl"))).alias("lbl"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "x")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("x").alias("term_id"), F.col("lbl").alias("res"))


def apply_eq_mapping(triples: DataFrame, mapping: DataFrame) -> DataFrame:
    """Rewrite s/p/o through the canonical mapping (identity when absent),
    deduplicating the rewritten facts."""
    out = triples
    for pos in ("s", "p", "o"):
        m = mapping.select(F.col("term_id").alias(f"_{pos}k"), F.col("res").alias(f"_{pos}v"))
        out = (
            out.join(m, out[pos] == m[f"_{pos}k"], "left")
            .withColumn(pos, F.coalesce(F.col(f"_{pos}v"), F.col(pos)))
            .drop(f"_{pos}k", f"_{pos}v")
        )
    return out.dropDuplicates(["s", "p", "o", "sign"])
