"""Provenance: explain entailed facts back to their premises.

The reference stores one ``Cause`` per fact (``Stated(u32) |
Entailed(u32)``, src/cause.rs:9-15); the ``Entailed`` index resolves to
an ``Entailment { rule, substitution }`` (src/cause.rs:28-34), so "why
does this fact exist" is one table lookup and a proof tree is a chain of
them.  This engine's fixpoint deliberately exchanges only a NARROW
lineage — ``(rule_id, subst_hash)``, operators/fixpoint.py
``NARROW_COLS`` — instead of shipping the substitution vector through
every round, so explain RECONSTRUCTS the winning substitution
Spark-side:

1. **invert the conclusion** over the target facts — a conclusion
   statement whose positions are all Var / constant / existential-Var
   binds some hypothesis variables directly from the fact's (s, p, o)
   (and pins minted existentials to their deterministic
   ``xxhash64('inferdf:ex', rule_id, subst_hash, j)`` values);
2. **cascade the hypothesis patterns** over those seed bindings — the
   same binding-consistency joins as ``find_substitutions`` (J1), but
   the frontier side stays proportional to the number of facts being
   explained, never the store: each join is a partition-pruned pattern
   scan keyed by already-bound variables (AQE broadcasts the frontier);
3. **keep the binding whose hash matches** the stored ``subst_hash`` —
   exact modulo a 64-bit hash collision, the same bound the dictionary
   collision audit already guards.

Rules whose conclusion positions are computed expressions (literal
instantiation, F12) are not invertible; those fall back to a full
hypothesis match semi-joined on the frontier's ``subst_hash`` set.

At 100 TB the walk touches per hop: the frontier (small), one pruned
pattern scan per hypothesis slot, and one store join to look up premise
lineage — never an unbounded product.  Depth is bounded by the fixpoint
round number, which decreases strictly along every premise edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..caches import CheckpointTracker
from ..rules import Rule, TripleStmt, Var
from ..schemas import CAUSE_ENTAILED, CAUSE_STATED
from ..terms import Term
from .match import _join_bindings, find_substitutions, scan_pattern

# fact-side column names carried through the walk (prefixed to avoid
# colliding with the v{i} binding columns and pattern-scan projections)
_FACT = ["fs", "fp", "fo", "fsign"]


def _subst_hash_col(rule: Rule):
    """Mirror of conclude()'s substitution identity — MUST stay in sync
    with operators/conclude.py (xxhash64 over rule_id + sorted bound
    hypothesis vars)."""
    hyp_vars = sorted(rule.hypothesis_vars())
    if hyp_vars:
        return F.xxhash64(F.lit(rule.rule_id), *[F.col(f"v{i}") for i in hyp_vars])
    return F.xxhash64(F.lit(rule.rule_id))


def _invertible(stmt) -> bool:
    return isinstance(stmt, TripleStmt) and all(
        isinstance(n, (Var, Term)) for n in (stmt.s, stmt.p, stmt.o)
    )


def _statement_seed(frontier_r: DataFrame, rule: Rule, st, const_ids: dict) -> DataFrame:
    """Invert one conclusion statement over the rule's target facts:
    rows of bound hypothesis-variable columns + subst_hash."""
    s = st.stmt
    cond = F.col("fsign") == F.lit(bool(st.sign))
    proj: dict[int, str] = {}
    for pos_name, node in zip(_FACT[:3], (s.s, s.p, s.o)):
        if isinstance(node, Var):
            if node.index >= rule.variables:
                # existential: minted deterministically from the very
                # subst_hash the fact carries (conclude.py minting) — a
                # consistency predicate, binds no hypothesis var
                j = node.index - rule.variables
                cond = cond & (
                    F.col(pos_name)
                    == F.xxhash64(
                        F.lit("inferdf:ex"),
                        F.lit(rule.rule_id),
                        F.col("subst_hash"),
                        F.lit(j),
                    )
                )
            elif node.index in proj:
                cond = cond & (F.col(pos_name) == F.col(proj[node.index]))
            else:
                proj[node.index] = pos_name
        else:
            cond = cond & (F.col(pos_name) == F.lit(const_ids[node]))
    return frontier_r.filter(cond).select(
        *[F.col(pos).alias(f"v{i}") for i, pos in sorted(proj.items())], "subst_hash"
    )


def _winning_substitutions(
    store: DataFrame,
    rule: Rule,
    const_ids: dict,
    frontier_r: DataFrame,
    p_buckets: int | None,
) -> DataFrame:
    """The substitution behind each frontier fact's stored lineage:
    distinct rows of (all bound v{i}, subst_hash) with the hash check
    applied."""
    patterns = list(rule.hypothesis)
    if all(_invertible(st) for st in rule.conclusion.statements):
        parts = []
        for st in rule.conclusion.statements:
            acc = _statement_seed(frontier_r, rule, st, const_ids)
            for p in patterns:
                acc = _join_bindings(acc, scan_pattern(store, p, const_ids, p_buckets=p_buckets))
            parts.append(acc)
        out = parts[0]
        for df in parts[1:]:
            out = out.unionByName(df)
    else:
        # non-invertible conclusion (computed positions): full hypothesis
        # match restricted to the frontier's substitution hashes
        out = find_substitutions(store, rule, const_ids, distinct=True, p_buckets=p_buckets)
        out = out.withColumn("subst_hash", _subst_hash_col(rule)).join(
            frontier_r.select("subst_hash").dropDuplicates(), "subst_hash"
        )
    return out.filter(_subst_hash_col(rule) == F.col("subst_hash")).dropDuplicates(
        ["subst_hash"]
    )


def explain_step(ds, system, targets: DataFrame | None = None) -> DataFrame:
    """One proof hop: premise edges for entailed facts.

    ``targets``: frame with at least (s, p, o, sign, rule_id,
    subst_hash) — defaults to every entailed fact in the store.  Returns
    one row per (fact, hypothesis slot): fact key ``s p o sign`` +
    ``rule_id subst_hash hyp_idx`` + premise key ``ps pp po psign``.
    Facts whose stored (rule_id, subst_hash) no longer matches any
    substitution (foreign lineage) produce no rows.
    """
    store = ds.triples
    if targets is None:
        targets = store.filter(F.col("cause_kind") == CAUSE_ENTAILED)
    frontier = targets.select(
        F.col("s").alias("fs"),
        F.col("p").alias("fp"),
        F.col("o").alias("fo"),
        F.col("sign").alias("fsign"),
        "rule_id",
        "subst_hash",
    )
    const_ids = system.const_ids()
    parts = [
        frontier.select(
            F.col("fs").alias("s"),
            F.col("fp").alias("p"),
            F.col("fo").alias("o"),
            F.col("fsign").alias("sign"),
            "rule_id",
            "subst_hash",
            F.lit(0).alias("hyp_idx"),
            F.col("fs").alias("ps"),
            F.col("fp").alias("pp"),
            F.col("fo").alias("po"),
            F.col("fsign").alias("psign"),
        ).limit(0)
    ]
    for rule in system.rules:
        frontier_r = frontier.filter(F.col("rule_id") == F.lit(rule.rule_id))
        wins = _winning_substitutions(store, rule, const_ids, frontier_r, ds.p_buckets)
        bound = frontier_r.join(wins, "subst_hash")

        def _pos(node):
            if isinstance(node, Var):
                return F.col(f"v{node.index}")
            return F.lit(const_ids[node])

        for j, p in enumerate(rule.hypothesis):
            parts.append(
                bound.select(
                    F.col("fs").alias("s"),
                    F.col("fp").alias("p"),
                    F.col("fo").alias("o"),
                    F.col("fsign").alias("sign"),
                    "rule_id",
                    "subst_hash",
                    F.lit(j).alias("hyp_idx"),
                    _pos(p.s).alias("ps"),
                    _pos(p.p).alias("pp"),
                    _pos(p.o).alias("po"),
                    F.lit(bool(p.sign)).alias("psign"),
                )
            )
    out = parts[0]
    for df in parts[1:]:
        out = out.unionByName(df)
    return out


def stated_support(
    ds,
    system,
    targets: DataFrame | None = None,
    max_depth: int = 64,
) -> DataFrame:
    """For each entailed fact, the set of STATED facts its stored
    derivation bottoms out on — the distributed analogue of following
    ``Cause`` links to ``Stated`` leaves (src/cause.rs:9-15).

    Returns distinct rows (s, p, o, sign, ls, lp, lo, lsign): fact →
    stated leaf.  The walk strictly decreases the premise's fixpoint
    ``round`` each hop, so ``max_depth`` only guards foreign input;
    hitting it raises (a truncated support set would silently read as a
    complete one).
    """
    spark = ds.triples.sparkSession
    tracker = CheckpointTracker(spark)
    store_lineage = ds.triples.select(
        F.col("s").alias("ps"),
        F.col("p").alias("pp"),
        F.col("o").alias("po"),
        F.col("sign").alias("psign"),
        F.col("cause_kind").alias("p_cause"),
        F.col("rule_id").alias("p_rule_id"),
        F.col("subst_hash").alias("p_subst_hash"),
    )
    if targets is None:
        targets = ds.triples.filter(F.col("cause_kind") == CAUSE_ENTAILED)
    # (root fact, current entailed sub-fact) pairs; dedup per hop keeps
    # the pair set bounded by |targets| x |proof DAG| even when many
    # derivations share sub-facts (diamond-shaped proofs)
    frontier, frontier_ids = tracker.checkpoint(
        targets.select(
            F.col("s").alias("rs"),
            F.col("p").alias("rp"),
            F.col("o").alias("ro"),
            F.col("sign").alias("rsign"),
            "s",
            "p",
            "o",
            "sign",
            "rule_id",
            "subst_hash",
        ).dropDuplicates()
    )
    leaves = []
    # hop fold: each hop runs exactly TWO driver actions — the eager hop
    # checkpoint and one tiny aggregate over its narrow blocks that tells
    # whether any entailed premise remains (the next frontier's
    # emptiness).  The former per-hop plan ran three (standalone
    # ``limit(1)`` probe + hop checkpoint + a separate next-frontier
    # checkpoint); the next frontier is now a lazy filter over the hop
    # checkpoint, which the leaves retain anyway.
    more = bool(frontier.limit(1).count())
    try:
        for _ in range(max_depth):
            if not more:
                break
            # one premise expansion over the DISTINCT sub-facts (roots
            # sharing a sub-fact pay for its expansion once) ...
            facts = frontier.select(
                "s", "p", "o", "sign", "rule_id", "subst_hash"
            ).dropDuplicates()
            edges = explain_step(ds, system, targets=facts)
            # ... then premises rejoin their roots and pick up lineage
            hop = (
                frontier.join(edges, ["s", "p", "o", "sign", "rule_id", "subst_hash"])
                .join(store_lineage, ["ps", "pp", "po", "psign"])
                .select(
                    "rs", "rp", "ro", "rsign",
                    "ps", "pp", "po", "psign",
                    "p_cause", "p_rule_id", "p_subst_hash",
                )
                .dropDuplicates()
            )
            hop, hop_ids = tracker.checkpoint(hop)
            leaves.append(
                hop.filter(F.col("p_cause") == CAUSE_STATED).select(
                    F.col("rs").alias("s"),
                    F.col("rp").alias("p"),
                    F.col("ro").alias("o"),
                    F.col("rsign").alias("sign"),
                    F.col("ps").alias("ls"),
                    F.col("pp").alias("lp"),
                    F.col("po").alias("lo"),
                    F.col("psign").alias("lsign"),
                )
            )
            more = bool(
                hop.agg(
                    F.count(F.when(F.col("p_cause") == CAUSE_ENTAILED, 1))
                ).collect()[0][0]
            )
            frontier = hop.filter(F.col("p_cause") == CAUSE_ENTAILED).select(
                "rs", "rp", "ro", "rsign",
                F.col("ps").alias("s"),
                F.col("pp").alias("p"),
                F.col("po").alias("o"),
                F.col("psign").alias("sign"),
                F.col("p_rule_id").alias("rule_id"),
                F.col("p_subst_hash").alias("subst_hash"),
            )
        else:
            tracker.release()
            raise RuntimeError(
                f"stated_support did not bottom out within max_depth={max_depth} "
                "hops — premise rounds must strictly decrease; is the store's "
                "lineage from this rule system?"
            )
        if not leaves:
            out = spark.createDataFrame(
                [],
                "s long, p long, o long, sign boolean, "
                "ls long, lp long, lo long, lsign boolean",
            )
        else:
            out = leaves[0]
            for df in leaves[1:]:
                out = out.unionByName(df)
            out = out.dropDuplicates()
        # sever the result from the walk's checkpoint generations so they
        # can all be released before returning (the caller owns only the
        # final blocks; dropping the result frame leaks them — at scale,
        # write or collect it, then clearCache/unpersist as usual)
        out, out_ids = tracker.checkpoint(out)
    except Exception:
        tracker.release()
        raise
    tracker.release(tracker.ids - out_ids)
    return out
