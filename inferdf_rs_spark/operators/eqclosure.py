"""Eq-statement closure: connected components over resource-equality pairs.

The reference *emits* Eq statements in deduction and *checks* them in
validation (src/system/deduction.rs:120-131) — merging equal resources
is left to the caller's interpretation.  At scale that merge is a
connected-components problem over the ``eq_pairs`` table; we use the
Shiloach-Vishkin scheme: every round does one **hook** (take the min
label over the direct neighborhood) and one **pointer jump**
(``lbl(x) ← lbl(lbl(x))``, doubling the distance a label travels), so a
sameAs chain of length L converges in O(log L) rounds — not the O(L) of
plain one-hop propagation.  Web-scale sameAs graphs have long chains;
this is the difference between ~20 rounds and ~10⁵ rounds at 100 TB.

Output: ``(term_id, res)`` mapping every member to its component's
canonical (minimum) id — the ``eq_mapping`` accepted by
``terms.resource_facets`` and by match-time resource rewriting.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..caches import CheckpointTracker


def eq_closure_with_rounds(
    eq_pairs: DataFrame, max_iter: int = 25, strict: bool = True
) -> tuple[DataFrame, int]:
    """Hook + pointer-jump min-label closure; returns (mapping, rounds).

    ``eq_pairs``: any DataFrame with columns ``a``, ``b`` (term ids);
    only positive pairs should be passed (filter ``sign`` upstream).
    ``strict``: raise if max_iter is exhausted while labels still move
    (a silent non-converged mapping would be *wrong*, merging nothing
    past the horizon); ``strict=False`` downgrades to a warning.

    Storage discipline: each round's label checkpoint supersedes the
    previous round's — superseded generations are unpersisted as soon as
    the convergence probe has read them, so the storage pool holds at
    most two label generations (plus the edge list) regardless of round
    count.  Only the FINAL generation (backing the returned mapping)
    survives; its lifecycle belongs to the caller.
    """
    tracker = CheckpointTracker(eq_pairs.sparkSession)
    edges, edge_ids = tracker.checkpoint(
        eq_pairs.select(F.col("a").alias("x"), F.col("b").alias("y"))
        .unionByName(eq_pairs.select(F.col("b").alias("x"), F.col("a").alias("y")))
        .filter(F.col("x") != F.col("y"))
        .dropDuplicates()
    )
    # label(x) = min over neighborhood ∪ self
    labels, label_ids = tracker.checkpoint(
        edges.select("x", "y")
        .unionByName(edges.select(F.col("x"), F.col("x").alias("y")))
        .groupBy("x")
        .agg(F.min("y").alias("lbl"))
    )
    rounds = 0
    converged = False
    # round-invariant Column expressions, hoisted out of the loop (each
    # round only re-applies them to the fresh label generation)
    _nlbl_sel = ("x", F.col("lbl").alias("nlbl"))
    _jump_keys = (F.col("x").alias("jx"), F.col("lbl").alias("jlbl"))
    # the moved flag rides the label checkpoint so convergence is one
    # tiny aggregate over the checkpointed narrow blocks instead of a
    # re-join of the two label generations (round fold: 2 jobs/round
    # with the second join-free — the old probe re-planned and
    # re-executed a join every round)
    new_lbl = F.least(
        F.col("lbl"),
        F.coalesce(F.col("nlbl"), F.col("lbl")),
        F.coalesce(F.col("jlbl"), F.col("lbl")),
    )
    _lbl_sel = ("x", new_lbl.alias("lbl"), (new_lbl != F.col("lbl")).alias("chg"))
    for _ in range(max_iter):
        rounds += 1
        # hook: m(x) = min over neighbors y of lbl(y)
        nb = (
            edges.join(labels.withColumnRenamed("x", "y2"), edges.y == F.col("y2"))
            .select(*_nlbl_sel)
            .groupBy("x")
            .agg(F.min("nlbl").alias("nlbl"))
        )
        # pointer jump: j(x) = lbl(lbl(x)) — labels chase their own labels,
        # doubling propagation distance per round (Shiloach-Vishkin)
        jump = (
            labels.alias("l1")
            .join(
                labels.select(*_jump_keys),
                F.col("l1.lbl") == F.col("jx"),
                "left",
            )
            .select(F.col("l1.x").alias("x"), F.col("jlbl"))
        )
        new_labels, new_ids = tracker.checkpoint(
            labels.join(nb, "x", "left").join(jump, "x", "left").select(*_lbl_sel)
        )
        changed = new_labels.agg(F.max("chg")).collect()[0][0]
        # the old generation has now been read for the last time
        tracker.release(label_ids)
        labels, label_ids = new_labels.select("x", "lbl"), new_ids
        if not changed:
            converged = True
            break
    if not converged:
        msg = (
            f"eq_closure did not converge within max_iter={max_iter} rounds — "
            "the mapping would silently under-merge; raise max_iter "
            "(rounds needed ≈ log2 of the longest sameAs chain)"
        )
        if strict:
            # no-leak on the error path: a long-running caller catching
            # this per batch must not retain the edge list + final label
            # generation in the storage pool for every failure
            tracker.release()
            raise RuntimeError(msg)
        warnings.warn(msg)
    tracker.release(edge_ids)  # the mapping reads only the final labels
    return labels.select(F.col("x").alias("term_id"), F.col("lbl").alias("res")), rounds


def eq_closure(eq_pairs: DataFrame, max_iter: int = 25, strict: bool = True) -> DataFrame:
    """Min-label closure over undirected equality edges (see
    ``eq_closure_with_rounds``)."""
    mapping, _ = eq_closure_with_rounds(eq_pairs, max_iter=max_iter, strict=strict)
    return mapping


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
