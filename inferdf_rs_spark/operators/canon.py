"""Blank-node iso-canonicalization: hash-based color refinement.

Why: the reference mints blank nodes with a *sequential* generator
(src/rule/mod.rs:230-233, src/system/deduction.rs:225-229), while this
engine mints them as deterministic hashes of (rule, substitution).  The
two graphs are isomorphic but not label-identical, so P/R scoring
against reference output must compare **canonical forms**.  This module
assigns every blank node a label that depends only on its structural
position (an iterative WL/color-refinement signature hash), making
isomorphic graphs byte-identical after rewriting.

Algorithm (distributed WL refinement):
- non-blank resources are self-colored (their ids are content hashes);
- blank nodes start from one shared color;
- each round, a blank's color becomes a hash of the MULTISET of
  (direction, predicate-color, neighbor-color) over its incident
  triples — folded commutatively (sum of per-row hashes + count), so
  the per-node aggregate is map-side combinable and order-free;
- O(diameter) rounds; each round is one explode + one groupBy.

Automorphic blanks (truly interchangeable) converge to the same label —
harmless for set-based P/R comparison, by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..caches import CheckpointTracker
from ..schemas import KIND_BLANK


def canonical_bnode_labels(triples: DataFrame, terms: DataFrame, iterations: int = 5) -> DataFrame:
    """Returns (term_id, canon) for every blank node.

    Storage discipline: each refinement round's color checkpoint
    supersedes the previous one; superseded generations (and the
    incidence list, once the last round has scanned it) are unpersisted
    so the pool holds at most two color generations at any time.  Only
    the final colors — backing the returned labels — stay persisted.

    Degree skew: the per-node signature is a COMMUTATIVE fold — each
    incident edge hashes to one int64 and a node's color is
    ``xxhash64(sum(h), count)`` — so a 10^5-degree hub's rows partial-
    aggregate map-side like everyone else's; no single task ever
    materializes one node's whole incidence multiset (the previous
    ``sort_array(collect_list(...))`` did, and a pathological blank
    skewed its one task).  Multiset identity: sum+count over 64-bit row
    hashes accumulated in decimal(38,0); a cross-multiset collision
    needs the full 2^64 sum AND equal cardinality — the same per-round
    collision class hash-WL already lives with.
    """
    tracker = CheckpointTracker(triples.sparkSession)
    blanks = terms.filter(F.col("kind") == KIND_BLANK).select("term_id")
    colors, color_ids = tracker.checkpoint(
        blanks.select("term_id", F.lit(0).cast("long").alias("color"))
    )

    # incidence list touching blank nodes only (everything else is stable)
    inc, inc_ids = tracker.checkpoint(
        triples.select(F.col("s").alias("node"), F.lit(0).alias("dir"), "p", F.col("o").alias("other"))
        .unionByName(
            triples.select(F.col("o").alias("node"), F.lit(1).alias("dir"), "p", F.col("s").alias("other"))
        )
        .join(blanks.withColumnRenamed("term_id", "node"), "node", "left_semi")
    )

    for _ in range(iterations):
        # neighbor/predicate colors: blank → current color, other → own id
        oc = colors.select(F.col("term_id").alias("other"), F.col("color").alias("oc"))
        pc = colors.select(F.col("term_id").alias("p"), F.col("color").alias("pc"))
        sig = (
            inc.join(oc, "other", "left")
            .join(pc, "p", "left")
            .select(
                "node",
                F.xxhash64(
                    F.col("dir"),
                    F.coalesce(F.col("pc"), F.col("p")),
                    F.coalesce(F.col("oc"), F.col("other")),
                ).alias("h"),
            )
            .groupBy("node")
            .agg(
                F.xxhash64(
                    F.sum(F.col("h").cast("decimal(38,0)")).cast("string"),
                    F.count(F.lit(1)),
                ).alias("color")
            )
        )
        colors, new_ids = tracker.checkpoint(
            blanks.join(sig.withColumnRenamed("node", "term_id"), "term_id", "left")
            .select("term_id", F.coalesce(F.col("color"), F.lit(0)).alias("color"))
        )
        tracker.release(color_ids)  # superseded generation
        color_ids = new_ids
    tracker.release(inc_ids)  # the returned labels read only final colors
    return colors.select("term_id", F.col("color").alias("canon"))


def canonicalize_triples(triples: DataFrame, terms: DataFrame, iterations: int = 5) -> DataFrame:
    """Rewrite blank-node ids to canonical labels; output distinct
    (s, p, o, sign) in canonical id space."""
    labels = canonical_bnode_labels(triples, terms, iterations)
    out = triples.select("s", "p", "o", "sign")
    for pos in ("s", "p", "o"):
        m = labels.select(F.col("term_id").alias(f"_{pos}k"), F.col("canon").alias(f"_{pos}v"))
        out = (
            out.join(m, out[pos] == m[f"_{pos}k"], "left")
            .withColumn(pos, F.coalesce(F.col(f"_{pos}v"), F.col(pos)))
            .drop(f"_{pos}k", f"_{pos}v")
        )
    return out.dropDuplicates()


def graph_signature(triples: DataFrame, terms: DataFrame, iterations: int = 5) -> int:
    """One int64 fingerprint of the canonicalized graph — equal for
    isomorphic graphs (mod WL's known limits on pathological automorphic
    structures, which rule-minted KGs don't exhibit).

    Fully distributed: per-row xxhash64 folded by a commutative SUM
    (order-independent, map-side partial agg, no single-task
    collect_list of the whole graph).  Sum — not xor — so duplicate
    canonical rows (automorphic blanks WL merges) contribute with
    multiplicity instead of cancelling in pairs; accumulated as
    DECIMAL(38,0) because an ANSI-mode BIGINT sum would throw on
    overflow, then wrapped to int64 driver-side."""
    canon = canonicalize_triples(triples, terms, iterations)
    row = canon.agg(
        F.sum(F.xxhash64("s", "p", "o", "sign").cast("decimal(38,0)")).alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    h = int(row.h or 0) + row.n * 0x9E3779B97F4A7C15
    return ((h + 2**63) % 2**64) - 2**63  # wrap into int64 range


def pr_score(got: DataFrame, gold: DataFrame, got_terms: DataFrame, gold_terms: DataFrame, iterations: int = 5):
    """Precision/recall between two graphs after canonicalization —
    the BASELINE.json P/R≥0.95 harness."""
    g1 = canonicalize_triples(got, got_terms, iterations)
    g2 = canonicalize_triples(gold, gold_terms, iterations)
    n_got = g1.count()
    n_gold = g2.count()
    tp = g1.join(g2, on=["s", "p", "o", "sign"], how="left_semi").count()
    return (tp / n_got if n_got else 1.0, tp / n_gold if n_gold else 1.0)
