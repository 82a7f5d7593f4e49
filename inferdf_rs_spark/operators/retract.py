"""Incremental retraction: DRed (delete–rederive) over the closed store.

The reference engine only inserts (``Dataset`` has no removal —
src/dataset.rs:24-38); retraction is the missing direction of
incremental maintenance for a long-lived materialized graph: un-assert
stated facts without recomputing the fixpoint from scratch.

Classic DRed (Gupta/Mumick/Subrahmanian, SIGMOD'93), Spark-shaped:

1. **Overdelete** — semi-naive DOWN: seed Δ with the retracted stated
   facts; each round re-uses the fixpoint's delta-seeded match (J2,
   ``find_substitutions(delta=…)``) to find every substitution touching
   Δ, and marks its conclusions (entailed rows only) deleted.  Repeat
   until Δ empties.  Over-approximates: a fact with an alternative
   derivation is still marked.
2. **Rederive** — one full deduction round over the retained store
   (the single full-match round is DRed's known cost), keeping exactly
   the conclusions that were overdeleted: those have alternative
   support and come back with fresh lineage.
3. **Propagate** — the re-inserted facts seed a normal insert fixpoint
   (the same ``initial_delta`` path streaming ingest uses).  Every
   conclusion it finds is inside the old closure, so it terminates by
   re-inserting at most the overdeleted set.  Its rounds start ABOVE
   the store's max round (``initial_round``) so the provenance walk's
   strict round-decrease invariant keeps holding.

Scope: rule systems whose conclusions are pure Triple statements over
universal variables (no Eq/True side statements, no existential
minting, no computed expressions) — the same class the streaming
incremental path supports; anything else raises.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..caches import CheckpointTracker
from ..rules import TripleStmt, Var
from ..schemas import CAUSE_ENTAILED, TRIPLE_KEY, TRIPLES_SCHEMA
from .conclude import merge_concluded
from .fixpoint import NARROW_COLS, _deduce_round, _dispatch_rules, fixpoint


def _check_supported(rules) -> None:
    for r in rules:
        for st in r.conclusion.statements:
            s = st.stmt
            if not isinstance(s, TripleStmt):
                raise NotImplementedError(
                    "retract(): Eq/True conclusions need their own delete "
                    "propagation — not supported yet"
                )
            for node in (s.s, s.p, s.o):
                if isinstance(node, Var) and node.index >= r.variables:
                    raise NotImplementedError(
                        "retract(): existential (minted) conclusions not supported"
                    )


def retract(
    spark: SparkSession,
    store: DataFrame,
    terms: DataFrame,
    rules,
    const_ids: dict,
    retracted: DataFrame,
    max_rounds: int = 100,
    **fixpoint_kw,
):
    """Remove ``retracted`` stated facts (frame with the TRIPLE_KEY
    columns ``s p o sign``) from a CLOSED store and restore the fixpoint
    incrementally.  Returns a ``FixpointResult`` whose ``store`` is the
    exact closure of the surviving stated facts."""
    _check_supported(rules)
    schema_cols = [f.name for f in TRIPLES_SCHEMA.fields]
    store = store.select(*[c for c in schema_cols if c in store.columns])
    tracker = CheckpointTracker(spark)
    rules = list(rules)

    # ---- 1. overdelete ----------------------------------------------
    retr_keys = retracted.select(*TRIPLE_KEY).dropDuplicates()
    delta, delta_ids = tracker.checkpoint(
        store.join(retr_keys, on=TRIPLE_KEY, how="left_semi")
    )
    deleted, deleted_ids = tracker.checkpoint(delta.select(*TRIPLE_KEY))
    entailed_keys = store.filter(F.col("cause_kind") == CAUSE_ENTAILED).select(*TRIPLE_KEY)
    rnd = 0
    while rnd < max_rounds:
        rnd += 1
        active = _dispatch_rules(rules, const_ids, delta)
        if not active:
            break
        c = _deduce_round(spark, store, terms, active, const_ids, delta, rnd, None)
        cand = c.triples.select(*TRIPLE_KEY).dropDuplicates()
        newly, newly_ids = tracker.checkpoint(
            cand.join(entailed_keys, on=TRIPLE_KEY, how="left_semi").join(
                deleted, on=TRIPLE_KEY, how="left_anti"
            )
        )
        if not newly.limit(1).collect():
            tracker.release(newly_ids)
            break
        # semi-naive: next round's delta is the NEWLY deleted rows only;
        # each superseded generation is released once its successor is
        # checkpointed (the engine's cache-lifecycle discipline)
        next_deleted, next_deleted_ids = tracker.checkpoint(deleted.unionByName(newly))
        next_delta, next_delta_ids = tracker.checkpoint(
            store.join(newly, on=TRIPLE_KEY, how="left_semi")
        )
        tracker.release(deleted_ids | delta_ids | newly_ids)
        deleted, deleted_ids = next_deleted, next_deleted_ids
        delta, delta_ids = next_delta, next_delta_ids
    else:
        raise RuntimeError(f"retract(): overdeletion did not converge in {max_rounds} rounds")

    survivors, _ = tracker.checkpoint(store.join(deleted, on=TRIPLE_KEY, how="left_anti"))

    # ---- 2. rederive (one full deduction round over the survivors) ---
    c = _deduce_round(
        spark, survivors, terms, list(enumerate(rules)), const_ids, None, 0, None
    )
    max_round = survivors.agg(F.coalesce(F.max("round"), F.lit(0))).first()[0]
    # mirror the insert fixpoint's sign discipline: negative conclusions
    # are rederived only when the propagation step will also insert them
    deduced = (
        c.triples
        if fixpoint_kw.get("insert_negatives", False)
        else c.triples.filter(F.col("sign"))
    )
    rederived = (
        deduced
        .select(*NARROW_COLS)
        .join(deleted, on=TRIPLE_KEY, how="left_semi")
        .groupBy(*TRIPLE_KEY)
        .agg(F.min(F.struct("rule_id", "subst_hash")).alias("_lin"))
        .select(
            *TRIPLE_KEY,
            F.lit(CAUSE_ENTAILED).cast("int").alias("cause_kind"),
            F.col("_lin.rule_id").alias("rule_id"),
            F.col("_lin.subst_hash").alias("subst_hash"),
            F.lit(max_round + 1).cast("int").alias("round"),
            F.lit("rederived").alias("src_partition"),
            F.lit(None).cast("long").alias("g"),
        )
    )
    rederived, _ = tracker.checkpoint(rederived)
    # release overdelete scaffolding; the survivors + rederived blocks
    # stay alive — they back the returned store's lineage
    tracker.release(deleted_ids | delta_ids)

    # ---- 3. propagate (standard insert fixpoint, delta-seeded) -------
    base = survivors.unionByName(rederived)
    res = fixpoint(
        spark,
        base,
        terms,
        rules,
        const_ids,
        initial_delta=rederived,
        initial_round=max_round + 1,
        max_rounds=max_round + 1 + max_rounds,
        **fixpoint_kw,
    )
    # the survivors/rederived checkpoints back the returned store's
    # lineage — hand their blocks to the result so release() frees them
    # (a long-running caller, e.g. streaming retraction, must not leak
    # one survivors copy per call)
    res.cache_ids |= tracker.ids
    return res
