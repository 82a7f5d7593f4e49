"""Semi-naive forward-chaining fixpoint with per-round checkpoint/resume.

The reference exposes one deduction round and leaves the fixpoint to the
caller (doc example src/lib.rs:56-69); its seeded
``deduce_from_triple``/``excluded_hypothesis`` API (src/system/mod.rs:124-149,
src/rule/mod.rs:79-108) is exactly the hook semi-naive evaluation needs.
Here the loop is driver-side:

    round k:  delta_{k-1} ⋈ rules ⋈ store  → conclusions
              new = conclusions ∖ store (left-anti on the triple key)
              store ∪= new;  delta_k = new;  stop when empty

Scale design:
- the delta is small after round 1 → AQE broadcasts it into the
  store-side scans; the store itself is never re-shuffled per round;
- every round's new facts and new terms are (optionally) appended as a
  parquet checkpoint with an atomically-updated meta file, so a killed
  job resumes between rounds (north_rule requirement);
- lineage columns ride on every deduced fact (cause/rule/subst/round).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..rules import Rule
from ..schemas import TRIPLE_KEY, TERMS_SCHEMA, TRIPLES_SCHEMA
from ..terms import merge_terms, resource_facets
from .conclude import Concluded, conclude, merge_concluded
from .match import find_substitutions


class ExpressionError(RuntimeError):
    """Deduction hit an expression error (reference returns Err from eval)."""


@dataclass
class FixpointResult:
    store: DataFrame
    terms: DataFrame
    eqs: DataFrame
    trues: DataFrame
    rounds: int
    metrics: list = field(default_factory=list)


def _deduce_round(
    spark: SparkSession,
    store: DataFrame,
    terms: DataFrame,
    rules: list[Rule],
    const_ids: dict,
    delta: DataFrame | None,
    round_num: int,
    functions: dict | None,
) -> Concluded:
    facets = resource_facets(terms)
    batches = []
    for idx, rule in enumerate(rules):
        # distinct=False: duplicate substitutions (a binding reachable via
        # two delta slots) only duplicate conclusion rows, and those are
        # deduped once on the triple key downstream — one exchange per
        # round instead of one per rule per round
        subst = find_substitutions(store, rule, const_ids, delta=delta, distinct=False)
        batches.append(conclude(subst, rule, idx, const_ids, facets, round_num, functions))
    return merge_concluded(spark, batches)


def _meta_path(d: str) -> str:
    return os.path.join(d, "meta.json")


def _write_meta(d: str, meta: dict) -> None:
    tmp = _meta_path(d) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, _meta_path(d))  # atomic: resume sees complete rounds only


def read_meta(d: str) -> dict | None:
    try:
        with open(_meta_path(d)) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


EQS_SCHEMA = "a bigint, b bigint, sign boolean, rule_id bigint, subst_hash bigint"
TRUES_SCHEMA = (
    "res bigint, vtype int, bval boolean, verr int, sign boolean, rule_id bigint, subst_hash bigint"
)


def fixpoint(
    spark: SparkSession,
    store: DataFrame,
    terms: DataFrame,
    rules: list[Rule],
    const_ids: dict,
    functions: dict | None = None,
    max_rounds: int = 100,
    checkpoint_dir: str | None = None,
    insert_negatives: bool = False,
    strict_errors: bool = True,
) -> FixpointResult:
    """Run deduce→insert to fixpoint (U3/U4 + J2/J3).

    Only positive Triple statements are inserted back into the store,
    mirroring the reference doc example (src/lib.rs:62-69); Eq and True
    statements accumulate in side tables for the caller (the reference
    likewise leaves them to the caller — it only checks them in
    validation).  Set ``insert_negatives`` to also store negative facts.
    """
    eqs = spark.createDataFrame([], EQS_SCHEMA)
    trues = spark.createDataFrame([], TRUES_SCHEMA)
    metrics: list[dict] = []

    start_round = 0
    if checkpoint_dir:
        meta = read_meta(checkpoint_dir)
        if meta is None:
            os.makedirs(checkpoint_dir, exist_ok=True)
            store.write.mode("overwrite").parquet(os.path.join(checkpoint_dir, "base"))
            terms.write.mode("overwrite").parquet(os.path.join(checkpoint_dir, "terms_base"))
            _write_meta(checkpoint_dir, {"round": 0, "done": False})
            meta = {"round": 0, "done": False}
        st, tm, dl, eqs_c, trues_c, metrics_c = load_checkpoint(spark, checkpoint_dir)
        store, terms, delta = st, tm, dl
        eqs, trues = eqs_c, trues_c
        metrics = metrics_c
        start_round = meta["round"]
        if meta.get("done"):
            return FixpointResult(store, terms, eqs, trues, start_round, metrics)
    else:
        delta = None  # round 1 = full deduce

    store = store.localCheckpoint(eager=True)
    terms = terms.localCheckpoint(eager=True)
    if delta is not None:
        delta = delta.localCheckpoint(eager=True)

    import sys
    import time as _time

    debug_timing = os.environ.get("INFERDF_DEBUG_TIMING") == "1"
    # optional columnar scan cache over the store pieces — measured NO
    # faster than the row-format localCheckpoint blocks on this workload
    # (the per-round cache materialization pass costs more than the
    # column-pruned scans save), so the checkpoint path stays the default
    scan_cache = os.environ.get("INFERDF_STORE_CACHE", "ckpt") == "columnar"
    cached_store = None

    rnd = start_round
    while rnd < max_rounds:
        rnd += 1
        if scan_cache:
            prev_cache = cached_store
            cached_store = store.persist()
            scan_store = cached_store
            if prev_cache is not None:
                prev_cache.unpersist()
        else:
            scan_store = store
        _t0 = _time.perf_counter()
        c = _deduce_round(spark, scan_store, terms, rules, const_ids, delta, rnd, functions)
        if strict_errors and any(r.has_expressions() for r in rules):
            bad = c.errors.limit(1).collect()
            if bad:
                raise ExpressionError(f"expression error in round {rnd}: {bad[0].asDict()}")

        deduced = c.triples if insert_negatives else c.triples.filter(F.col("sign"))
        # dedup BEFORE the anti-join: dropDuplicates runs a map-side partial
        # aggregate that shrinks the conclusions stream before it hits the
        # wire, and the anti-join then reuses the dedup's hash exchange on
        # the same key — one fat shuffle instead of two (the conclusions
        # stream carries lineage columns, ~100B/row; measured 10.8 GB of
        # shuffle per fixpoint before this reorder)
        new = (
            deduced.dropDuplicates(TRIPLE_KEY)
            .join(scan_store.select(*TRIPLE_KEY), on=TRIPLE_KEY, how="left_anti")
            .localCheckpoint(eager=True)
        )
        n_new = new.count()
        if debug_timing:
            sys.stderr.write(
                f"[fixpoint] round={rnd} new={n_new} deduce+anti+ckpt={_time.perf_counter() - _t0:.2f}s\n"
            )

        # static rule analysis: skip side-channel actions (term minting,
        # Eq/True accumulation) when no rule can produce them — saves
        # several Spark jobs per round on projection-only rule systems
        any_mints = any(r.mints_terms() for r in rules)
        any_eqs = any(r.has_eq_statements() for r in rules)
        any_trues = any(r.has_true_statements() for r in rules)

        new_terms = spark.createDataFrame([], TERMS_SCHEMA)
        if any_mints:
            new_terms = (
                c.new_terms.join(terms.select("term_id"), on="term_id", how="left_anti")
                .dropDuplicates(["term_id"])
                .localCheckpoint(eager=True)
            )
        round_eqs = c.eqs.dropDuplicates()
        round_trues = c.trues.dropDuplicates()
        if any_eqs:
            round_eqs = round_eqs.localCheckpoint(eager=True)
            eqs = eqs.unionByName(round_eqs).dropDuplicates()
        if any_trues:
            round_trues = round_trues.localCheckpoint(eager=True)
            trues = trues.unionByName(round_trues).dropDuplicates()

        metrics.append({"round": rnd, "new_facts": n_new})
        done = n_new == 0

        if checkpoint_dir:
            new.write.mode("overwrite").parquet(os.path.join(checkpoint_dir, f"delta/round={rnd}"))
            if any_mints:
                new_terms.write.mode("overwrite").parquet(
                    os.path.join(checkpoint_dir, f"new_terms/round={rnd}")
                )
            if any_eqs:
                round_eqs.write.mode("overwrite").parquet(
                    os.path.join(checkpoint_dir, f"eqs/round={rnd}")
                )
            if any_trues:
                round_trues.write.mode("overwrite").parquet(
                    os.path.join(checkpoint_dir, f"trues/round={rnd}")
                )
            _write_meta(checkpoint_dir, {"round": rnd, "done": done, "metrics": metrics})

        if done:
            break
        store = store.unionByName(new)
        terms = merge_terms(terms, new_terms)
        delta = new
        if rnd % 8 == 0:
            # compact the union-of-deltas plan periodically
            store = store.localCheckpoint(eager=True)
            terms = terms.localCheckpoint(eager=True)

    if cached_store is not None:
        cached_store.unpersist()  # data lives in the checkpointed pieces
    return FixpointResult(store, terms, eqs, trues, rnd, metrics)


def load_checkpoint(spark: SparkSession, checkpoint_dir: str):
    """Rebuild fixpoint state from a checkpoint dir (resume path)."""
    meta = read_meta(checkpoint_dir)
    if meta is None:
        raise FileNotFoundError(f"no checkpoint at {checkpoint_dir}")
    store = spark.read.schema(TRIPLES_SCHEMA).parquet(os.path.join(checkpoint_dir, "base"))
    terms = spark.read.schema(TERMS_SCHEMA).parquet(os.path.join(checkpoint_dir, "terms_base"))
    eqs = spark.createDataFrame([], EQS_SCHEMA)
    trues = spark.createDataFrame([], TRUES_SCHEMA)
    delta = None
    for k in range(1, meta["round"] + 1):
        d = spark.read.schema(TRIPLES_SCHEMA).parquet(os.path.join(checkpoint_dir, f"delta/round={k}"))
        store = store.unionByName(d)
        tdir = os.path.join(checkpoint_dir, f"new_terms/round={k}")
        if os.path.isdir(tdir):
            terms = terms.unionByName(spark.read.schema(TERMS_SCHEMA).parquet(tdir))
        edir = os.path.join(checkpoint_dir, f"eqs/round={k}")
        if os.path.isdir(edir):
            eqs = eqs.unionByName(spark.read.parquet(edir))
        trdir = os.path.join(checkpoint_dir, f"trues/round={k}")
        if os.path.isdir(trdir):
            trues = trues.unionByName(spark.read.parquet(trdir))
        delta = d
    return store, terms, delta, eqs.dropDuplicates(), trues.dropDuplicates(), meta.get("metrics", [])
