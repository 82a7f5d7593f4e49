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
- **co-partitioned store pieces**: the store is kept as a list of
  pieces, each hash-partitioned on the triple key and locally
  checkpointed.  The per-round "new facts" anti-join chains over the
  pieces, so the store side of every anti-join is exchange-free — only
  the (small) conclusions stream shuffles each round.  Pieces compact
  into one when the list grows past a threshold;
- **one deduction per round**: the strict expression-error indicator is
  folded into the same materialization as the new-facts delta (error
  rows ride along with a negative ``cause_kind`` marker), instead of a
  second full deduction job;
- **per-delta rule dispatch** (reference ``BipolarMap`` pattern index,
  src/pattern/map.rs:13-25, src/system/mod.rs:144-148): a rule runs in
  a delta round only if at least one hypothesis slot can match a delta
  triple — checked driver-side on the delta's distinct (sign, p) set
  against the slot's sign and constant predicate;
- large deltas spill: past ``delta_disk_threshold`` rows the piece
  checkpoints use MEMORY_AND_DISK_DESER blocks that evict under memory
  pressure (kills the all-deltas-in-RAM cliff);
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

from .. import terms as _terms_mod
from ..caches import CheckpointTracker, unpersist_rdd_ids
from ..rules import Rule
from ..schemas import CAUSE_ENTAILED, TRIPLE_KEY, TERMS_SCHEMA, TRIPLES_SCHEMA
from ..terms import merge_terms, resource_facets
from .conclude import Concluded, _empty as _empty_df, conclude, merge_concluded
from .match import find_substitutions

# the per-round exchanged row: triple key + minimal int lineage.  The
# constant-per-round lineage (cause_kind, round, g) and the derivable
# src_partition label are re-attached LAZILY after the piece checkpoint
# (see _attach_lineage) so they never ride through the dedup/anti-join/
# repartition exchanges — 4 fewer UnsafeRow slots (incl. the one string)
# per shuffled row.
NARROW_COLS = ["s", "p", "o", "sign", "rule_id", "subst_hash"]


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
    # persistent-RDD ids backing store/terms/eqs/trues — release() frees
    # them once the caller has copied (or finished with) the result
    cache_ids: set = field(default_factory=set)
    # Dataset-level persists (the base store cache): released via
    # df.unpersist() so the CacheManager entry goes too, not just blocks
    persisted_dfs: list = field(default_factory=list)

    def release(self, blocking: bool = False) -> None:
        """Unpersist every cache/checkpoint this fixpoint run created.

        The result DataFrames become unusable afterwards (localCheckpoint
        lineage is truncated) — call only after materializing your own
        copy (e.g. ``store.localCheckpoint()`` or a parquet write).
        Long-running callers (streaming: one fixpoint per micro-batch)
        MUST do this or the storage pool grows by one store copy per
        batch."""
        for df in self.persisted_dfs:
            df.unpersist(blocking)
        self.persisted_dfs = []
        unpersist_rdd_ids(self.store.sparkSession, self.cache_ids, blocking)
        self.cache_ids = set()


def _deduce_round(
    spark: SparkSession,
    store: DataFrame,
    terms: DataFrame,
    rules: list[tuple[int, Rule]],
    const_ids: dict,
    delta: DataFrame | None,
    round_num: int,
    functions: dict | None,
) -> Concluded:
    facets = resource_facets(terms)
    batches = []
    for idx, rule in rules:
        # distinct=False: duplicate substitutions (a binding reachable via
        # two delta slots) only duplicate conclusion rows, and those are
        # deduped once on the triple key downstream — one exchange per
        # round instead of one per rule per round
        subst = find_substitutions(store, rule, const_ids, delta=delta, distinct=False)
        batches.append(conclude(subst, rule, idx, const_ids, facets, round_num, functions))
    return merge_concluded(spark, batches)


def _slot_can_feed(sp, const_ids: dict, pos_ps: set, neg_ps: set) -> bool:
    """Can any delta triple match this hypothesis slot?  Driver-side
    analogue of the reference's canonical-pattern dispatch
    (src/pattern/map.rs:13-25): the slot's sign must have delta rows and
    its predicate, when constant, must be among the delta's predicates.
    (Constant s/o positions could prune further; predicate+sign is the
    dominant case and keeps the delta probe to one tiny distinct.)"""
    from ..rules import Var

    ps = pos_ps if sp.sign else neg_ps
    if not ps:
        return False
    p_node = sp.positions()[1]
    if isinstance(p_node, Var):
        return True
    return const_ids.get(p_node) in ps


def _dispatch_rules(
    rules: list[Rule],
    const_ids: dict,
    delta: DataFrame | None,
    delta_ps: set | None = None,
) -> list[tuple[int, Rule]]:
    """J3: prune rules no delta triple can feed (full-store rounds run all).

    ``delta_ps``: the delta's distinct {(p, sign)} set when the caller
    already knows it — the fixpoint loop folds it into the per-round
    stats aggregate, so steady-state rounds dispatch with ZERO extra
    Spark actions.  ``None`` falls back to a one-off distinct probe
    (first seeded round / checkpoint resume)."""
    indexed = list(enumerate(rules))
    if delta is None or len(rules) < 2:
        return indexed
    if delta_ps is None:
        dps = delta.select("p", "sign").distinct().collect()
        delta_ps = {(r.p, r.sign) for r in dps}
    pos_ps = {p for p, sg in delta_ps if sg}
    neg_ps = {p for p, sg in delta_ps if not sg}
    return [
        (i, r)
        for i, r in indexed
        if any(_slot_can_feed(sp, const_ids, pos_ps, neg_ps) for sp in r.hypothesis)
    ]


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
    delta_disk_threshold: int = 2_000_000,
    compact_pieces: int = 16,
    store_broadcast_rows: int = 2_000_000,
    initial_delta: DataFrame | None = None,
    allow_partial: bool = False,
    store_rows: int | None = None,
    initial_round: int = 0,
) -> FixpointResult:
    """Run deduce→insert to fixpoint (U3/U4 + J2/J3).

    Only positive Triple statements are inserted back into the store,
    mirroring the reference doc example (src/lib.rs:62-69); Eq and True
    statements accumulate in side tables for the caller (the reference
    likewise leaves them to the caller — it only checks them in
    validation).  Set ``insert_negatives`` to also store negative facts.

    ``delta_disk_threshold``: rounds whose previous delta exceeded this
    many rows checkpoint to disk-evictable (MEMORY_AND_DISK_DESER) blocks
    instead of pinned executor memory.
    ``compact_pieces``: max number of co-partitioned store pieces before
    they are compacted into one (a single store-size exchange, amortized
    over that many rounds).
    ``store_broadcast_rows``: while the accumulated store is at most this
    many rows, the per-round new-facts anti-join broadcasts the store
    (map-side, zero exchange — fastest at small scale); past it the loop
    switches to the co-partitioned piece chain (zero *store-side*
    exchange — the only plan that survives a store too big to broadcast).
    ``initial_delta``: start delta-seeded instead of with a full deduce —
    the streaming incremental-maintenance path (the store is already
    closed; only delta-touching derivations can be new).  Ignored when
    resuming from a checkpoint.
    ``allow_partial``: by default the loop RAISES if max_rounds is
    exhausted before the delta empties (a silent non-fixpoint is an
    incomplete closure, i.e. a wrong result); pass True to accept the
    partial store.
    ``store_rows``: the input store's row count when the caller already
    knows it (catalog / ``graph_meta.json`` sidecar metadata) — skips
    the initial driver-side ``count()``; in the large regime the input
    is then partitioned directly (no transient Dataset-level persist),
    so a 100 TB store is never counted or double-buffered just to pick
    the join regime.
    """
    from pyspark.storagelevel import StorageLevel

    # normalize to the fact-table contract: callers may hand a store with
    # extra physical columns (e.g. the p_bucket partition column of a
    # materialized graph) — those must not leak into piece unions
    _schema_cols = [f.name for f in TRIPLES_SCHEMA.fields]
    if [c for c in store.columns if c not in _schema_cols]:
        store = store.select(*_schema_cols)

    eqs = _empty_df(spark, EQS_SCHEMA)
    trues = _empty_df(spark, TRUES_SCHEMA)
    metrics: list[dict] = []

    start_round = 0
    if checkpoint_dir:
        meta = read_meta(checkpoint_dir)
        if meta is None:
            os.makedirs(checkpoint_dir, exist_ok=True)
            store.write.mode("overwrite").parquet(os.path.join(checkpoint_dir, "base"))
            terms.write.mode("overwrite").parquet(os.path.join(checkpoint_dir, "terms_base"))
            meta = {"round": 0, "done": False, "id_bits": _terms_mod.ID_BITS}
            _write_meta(checkpoint_dir, meta)
        st, tm, dl, eqs_c, trues_c, metrics_c = load_checkpoint(spark, checkpoint_dir)
        store, terms, delta = st, tm, dl
        eqs, trues = eqs_c, trues_c
        metrics = metrics_c
        start_round = meta["round"]
        if meta.get("done"):
            return FixpointResult(store, terms, eqs, trues, start_round, metrics)
        if store_rows is not None:
            # caller metadata describes ITS input (= the checkpoint base);
            # the resumed store also holds every completed round's delta,
            # whose sizes the meta records — keep the regime pick honest
            store_rows += sum(m.get("new_facts", 0) for m in metrics)
    else:
        delta = initial_delta  # None ⇒ round 1 = full deduce
        # round numbers start above initial_round: the retraction path
        # (operators/retract.py) re-derives facts into a store whose
        # retained facts keep their original rounds — new rounds must sit
        # strictly ABOVE them or the explain walk's strict round-decrease
        # invariant breaks on rederived lineage
        start_round = initial_round

    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    tracker = CheckpointTracker(spark)

    # src_partition for entailed facts is derivable from rule_id — a
    # tiny when-chain re-attached after the exchanges, never shuffled
    _src_label = F.lit(None).cast("string")
    for _i, _r in reversed(list(enumerate(rules))):
        _src_label = F.when(F.col("rule_id") == F.lit(_r.rule_id), F.lit(f"r{_i}")).otherwise(
            _src_label
        )

    def _attach_lineage(df: DataFrame, rnd_num: int) -> DataFrame:
        """Narrow exchanged rows → full TRIPLES_SCHEMA (lazy projection
        over checkpointed blocks; the constants never hit the wire)."""
        return df.select(
            "s",
            "p",
            "o",
            "sign",
            F.lit(CAUSE_ENTAILED).cast("int").alias("cause_kind"),
            "rule_id",
            "subst_hash",
            F.lit(rnd_num).cast("int").alias("round"),
            _src_label.alias("src_partition"),
            F.lit(None).cast("long").alias("g"),
        )

    def _ckpt(df: DataFrame) -> DataFrame:
        out, _ = tracker.checkpoint(df)
        return out

    def _piece(df: DataFrame, big: bool) -> DataFrame:
        """Hash-partition on the triple key, sort within partitions, then
        checkpoint: the captured LogicalRDD partitioning+ordering make
        every later anti-join against this piece exchange-free AND
        sort-free on the piece side (only the small conclusions stream
        shuffles+sorts per round).  AQE is toggled off around the
        checkpoint because AdaptiveSparkPlanExec does not expose the
        final plan's partitioning to the Dataset.checkpoint capture
        (verified: with AQE on the LogicalRDD reports
        UnknownPartitioning and every round re-exchanges the store)."""
        rp = df.repartition(n_part, *TRIPLE_KEY).sortWithinPartitions(*TRIPLE_KEY)
        # big pieces: MEMORY_AND_DISK_DESER — stays DESERIALIZED in memory
        # while it fits (the store is scanned by every rule slot every
        # round; serialized/disk levels pay per-scan deserialization,
        # measured ~2x slower fixpoint at 38M stated facts) and evicts to
        # disk under pressure (caps the all-deltas-in-RAM RSS cliff).
        # NB PySpark's bare MEMORY_AND_DISK constant is the *serialized*
        # level — not what we want on the scan-hot store.
        lvl = StorageLevel.MEMORY_AND_DISK_DESER if big else None
        prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            out, ids = tracker.checkpoint(rp, storage_level=lvl)
            return out, ids
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)

    # materialize the caller's store plan under AQE; in the large regime
    # the persisted copy is transient (unpersisted once the partitioned
    # piece exists) so the storage pool holds ONE copy of the store, not
    # two — double-buffering 38M+ rows was measured to push the pool into
    # eviction thrash and slow every later scan.  When the caller passed
    # ``store_rows`` catalog metadata AND the store is large, skip both
    # the count and the transient persist: the partitioning shuffle
    # materializes the input exactly once (the input plan is typically a
    # bare scan there — a materialized graph read back from parquet).
    base = None
    base_live = False
    if store_rows is not None:
        n_store = store_rows
        large = n_store > store_broadcast_rows
        if large:
            pc0, ids0 = _piece(store, big=True)
            pieces, piece_idsets = [pc0], [ids0]
        else:
            base, base_ids, _ = tracker.persist(store, StorageLevel.MEMORY_AND_DISK_DESER)
            pieces, piece_idsets = [base], [base_ids]
            base_live = True
    else:
        # n_store comes from the persist's own materializing count — one job
        base, base_ids, n_store = tracker.persist(store, StorageLevel.MEMORY_AND_DISK_DESER)
        large = n_store > store_broadcast_rows
        if large:
            # _piece (AQE off for partitioning capture) reshuffles cached blocks
            pc0, ids0 = _piece(base, big=True)
            pieces, piece_idsets = [pc0], [ids0]
            base.unpersist()
            tracker.ids -= base_ids
        else:
            pieces, piece_idsets = [base], [base_ids]
            base_live = True
    # base_live: the Dataset-level persist of the input store is live —
    # it must be released via base.unpersist() (drops the CacheManager
    # entry too) — release-by-RDD-id alone leaves a storage-level-NONE
    # InMemoryRelation that later scans matching the plan recompute through
    terms = _ckpt(terms)
    if delta is not None:
        delta = _ckpt(delta)

    def store_union() -> DataFrame:
        out = pieces[0]
        for pc in pieces[1:]:
            out = out.unionByName(pc)
        return out

    import sys
    import time as _time

    debug_timing = os.environ.get("INFERDF_DEBUG_TIMING") == "1"

    rnd = start_round
    last_new = 0
    # blocks kept alive one extra round because the delta still reads
    # them after their piece was compacted away (released next round)
    carry_release: set = set()
    # the delta's distinct {(p, sign)} set, folded into the previous
    # round's stats aggregate — None (first seeded round / resume) makes
    # _dispatch_rules fall back to a one-off distinct probe
    delta_ps: set | None = None
    # A checkpoint resumed at start_round > 0 with meta done=False is NOT
    # converged — if it already sits at max_rounds the loop never runs and
    # the allow_partial contract below must still fire.
    done = start_round == 0
    while rnd < max_rounds:
        rnd += 1
        scan_store = store_union()
        _t0 = _time.perf_counter()
        active = _dispatch_rules(rules, const_ids, delta, delta_ps)
        c = _deduce_round(spark, scan_store, terms, active, const_ids, delta, rnd, functions)

        deduced = c.triples if insert_negatives else c.triples.filter(F.col("sign"))
        # dedup BEFORE the anti-join: the groupBy runs a map-side partial
        # aggregate that shrinks the conclusions stream before it hits the
        # wire — and only the NARROW_COLS projection rides the exchanges
        # (constants + the src label re-attach after the checkpoint).
        # min(struct(lineage)) instead of dropDuplicates: a fact derived
        # by TWO rules keeps the lexicographically-least (rule_id,
        # subst_hash) — dropDuplicates would retain an arbitrary one,
        # making the stored lineage vary across runs/retries against the
        # engine's determinism guarantees.  Small regime: one broadcast
        # anti-join against the whole store (map-side, zero exchange).
        # Large regime: chained anti-joins against co-partitioned pieces
        # → zero *store-side* exchange per round (only the conclusions
        # stream shuffles) — the plan that survives a store too big to
        # broadcast.
        new = (
            deduced.select(*NARROW_COLS)
            .groupBy(*TRIPLE_KEY)
            .agg(F.min(F.struct("rule_id", "subst_hash")).alias("_lin"))
            .select(*TRIPLE_KEY, "_lin.*")
        )
        if large:
            for pc in pieces:
                new = new.join(pc.select(*TRIPLE_KEY), on=TRIPLE_KEY, how="left_anti")
        else:
            new = new.join(
                F.broadcast(scan_store.select(*TRIPLE_KEY)), on=TRIPLE_KEY, how="left_anti"
            )

        # fold the strict-error indicator into the same materialization as
        # the delta (error rows ride along with err > 0) — one deduction
        # computation per round, not two.  The deduction runs under AQE in
        # this localCheckpoint; the following _piece shuffle (AQE off for
        # partitioning capture) only re-reads its blocks.
        check_errors = strict_errors and any(r.has_expressions() for _, r in active)
        if check_errors:
            err_rows = c.errors.select(
                F.lit(None).cast("long").alias("s"),
                F.lit(None).cast("long").alias("p"),
                F.lit(None).cast("long").alias("o"),
                F.lit(True).alias("sign"),
                F.col("rule_id"),
                F.col("subst_hash"),
                F.col("err").cast("int").alias("err"),
            )
            staged = new.withColumn("err", F.lit(0).cast("int")).unionByName(err_rows)
        else:
            staged = new
        # one materialization of the round's delta under AQE.  Large
        # regime: a TRANSIENT persist — the partitioned piece supersedes
        # it and the copy is released (a leaked copy per round was
        # measured to thrash the storage pool).  Small regime: the
        # checkpoint IS the store piece, so it stays.
        staged_ids: set = set()
        if large:
            staged = staged.persist(StorageLevel.MEMORY_AND_DISK_DESER)
        else:
            staged, staged_ids = tracker.checkpoint(staged)

        # ONE driver action per round for all round stats: new-fact count,
        # strict-error probe, and the NEXT round's dispatch predicate set
        # — previously three separate jobs (count + limit(1).collect +
        # next round's distinct probe).  The aggregate runs over the
        # checkpointed blocks (small regime) or materializes the persist
        # (large regime); collect_set is bounded by the delta's distinct
        # (predicate, sign) count — the same bound the old distinct probe
        # carried (web-KG predicate vocabularies are small).
        is_fact = (F.col("err") == 0) if check_errors else F.lit(True)
        agg_cols = [
            F.count(F.when(is_fact, 1)).alias("n_new"),
            F.collect_set(F.when(is_fact, F.struct("p", "sign"))).alias("dps"),
        ]
        if check_errors:
            agg_cols.append(
                F.min(
                    F.when(F.col("err") > 0, F.struct("err", "rule_id", "subst_hash"))
                ).alias("bad")
            )
        stats = staged.agg(*agg_cols).collect()[0]
        if check_errors and stats["bad"] is not None:
            # error path: release every cache/checkpoint this run
            # created — a long-running caller that catches
            # ExpressionError per batch (streaming) must not leak one
            # store copy per failure
            bad = stats["bad"]
            if large:
                staged.unpersist()
            tracker.release()
            if base_live:
                base.unpersist()
            raise ExpressionError(
                f"expression error in round {rnd}: err={bad.err} "
                f"rule_id={bad.rule_id} subst_hash={bad.subst_hash}"
            )
        new_src = staged.filter(F.col("err") == 0).drop("err") if check_errors else staged
        if large:
            new, new_ids = _piece(new_src, big=last_new > delta_disk_threshold)
            staged.unpersist()
        else:
            new = new_src  # (a filter over) checkpointed narrow blocks
            new_ids = staged_ids
        n_new = int(stats["n_new"])
        delta_ps = {(r.p, r.sign) for r in stats["dps"]}
        last_new = n_new
        new_full = _attach_lineage(new, rnd)
        if debug_timing:
            sys.stderr.write(
                f"[fixpoint] round={rnd} new={n_new} rules={[i for i, _ in active]} "
                f"deduce+anti+ckpt={_time.perf_counter() - _t0:.2f}s\n"
            )

        # static rule analysis: skip side-channel actions (term minting,
        # Eq/True accumulation) when no active rule can produce them —
        # saves several Spark jobs per round on projection-only systems
        any_mints = any(r.mints_terms() for _, r in active)
        any_eqs = any(r.has_eq_statements() for _, r in active)
        any_trues = any(r.has_true_statements() for _, r in active)

        new_terms = _empty_df(spark, TERMS_SCHEMA)
        if any_mints:
            new_terms = _ckpt(
                c.new_terms.join(terms.select("term_id"), on="term_id", how="left_anti")
                .dropDuplicates(["term_id"])
            )
        # construct the side-channel dedup plans only when a rule can feed
        # them (they would be statically empty otherwise; skipping the
        # construction keeps the per-round driver floor flat)
        round_eqs = round_trues = None
        if any_eqs:
            round_eqs = _ckpt(c.eqs.dropDuplicates())
            eqs = eqs.unionByName(round_eqs).dropDuplicates()
        if any_trues:
            round_trues = _ckpt(c.trues.dropDuplicates())
            trues = trues.unionByName(round_trues).dropDuplicates()

        # the prior round's delta blocks (kept alive across the compaction
        # that superseded their piece) are released only NOW: the
        # new_terms/eqs/trues checkpoints above lazily recompute this
        # round's deduction, which still reads that delta — its lineage is
        # truncated (localCheckpoint), so dropping the blocks before every
        # consumer has materialized fails with CHECKPOINT_RDD_BLOCK_ID_NOT_
        # FOUND for any minting/Eq/True rule system (regression:
        # test_fixpoint_minting_eq_rules_survive_piece_compaction)
        if carry_release:
            tracker.release(carry_release)
            carry_release = set()

        metrics.append({"round": rnd, "new_facts": n_new, "rules_run": [i for i, _ in active]})
        done = n_new == 0

        if checkpoint_dir:
            new_full.write.mode("overwrite").parquet(
                os.path.join(checkpoint_dir, f"delta/round={rnd}")
            )
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
            _write_meta(
                checkpoint_dir,
                {"round": rnd, "done": done, "metrics": metrics, "id_bits": _terms_mod.ID_BITS},
            )

        if done:
            break
        n_store += n_new
        pieces.append(new_full)
        piece_idsets.append(new_ids)
        if (not large and n_store > store_broadcast_rows) or (
            large and len(pieces) > compact_pieces
        ):
            # crossed the broadcastable horizon (one store-size exchange,
            # then exchange-free rounds) — or compacting the piece chain
            # (the same exchange, amortized over compact_pieces rounds).
            # Superseded piece generations are released, EXCEPT the
            # current round's blocks, which the next round's delta reads.
            large = True
            merged, merged_ids = _piece(store_union(), big=True)
            for ids in piece_idsets[:-1]:
                tracker.release(ids - new_ids)
            if base_live:
                # small→large transition: mirror the large-at-start path —
                # the Dataset-level persist needs df.unpersist() so the
                # CacheManager entry for the input-store plan goes too
                base.unpersist()
                base_live = False
            carry_release = set(new_ids)  # delta reads these one more round
            pieces, piece_idsets = [merged], [merged_ids]
        if any_mints:
            terms = merge_terms(terms, new_terms)
            if rnd % 8 == 0:
                terms = _ckpt(terms)
        delta = new

    if not done and not allow_partial:
        tracker.release()  # same no-leak discipline as the error path
        if base_live:
            base.unpersist()
        raise RuntimeError(
            f"fixpoint did not converge within max_rounds={max_rounds} "
            f"(last delta={last_new} facts) — the closure is incomplete; "
            "raise max_rounds or pass allow_partial=True"
        )
    return FixpointResult(
        store_union(), terms, eqs, trues, rnd, metrics, tracker.ids, [base] if base_live else []
    )


def load_checkpoint(spark: SparkSession, checkpoint_dir: str):
    """Rebuild fixpoint state from a checkpoint dir (resume path).
    Schemas follow the active id width (``terms.set_id_bits``); the meta
    file records the width the checkpoint was WRITTEN with, and resuming
    at any other width raises instead of silently misreading the parquet
    (a 128-bit decimal store read through a bigint schema fails per-row,
    not per-job)."""
    from ..terms import terms_schema, triples_schema

    meta = read_meta(checkpoint_dir)
    if meta is None:
        raise FileNotFoundError(f"no checkpoint at {checkpoint_dir}")
    written_bits = meta.get("id_bits", 64)
    if written_bits != _terms_mod.ID_BITS:
        raise ValueError(
            f"checkpoint at {checkpoint_dir} was written with id_bits="
            f"{written_bits} but the session is at id_bits={_terms_mod.ID_BITS} "
            f"— call terms.set_id_bits({written_bits}) before resuming"
        )
    store = spark.read.schema(triples_schema()).parquet(os.path.join(checkpoint_dir, "base"))
    terms = spark.read.schema(terms_schema()).parquet(os.path.join(checkpoint_dir, "terms_base"))
    eqs = spark.createDataFrame([], EQS_SCHEMA)
    trues = spark.createDataFrame([], TRUES_SCHEMA)
    delta = None
    for k in range(1, meta["round"] + 1):
        d = spark.read.schema(triples_schema()).parquet(os.path.join(checkpoint_dir, f"delta/round={k}"))
        store = store.unionByName(d)
        tdir = os.path.join(checkpoint_dir, f"new_terms/round={k}")
        if os.path.isdir(tdir):
            terms = terms.unionByName(spark.read.schema(terms_schema()).parquet(tdir))
        edir = os.path.join(checkpoint_dir, f"eqs/round={k}")
        if os.path.isdir(edir):
            eqs = eqs.unionByName(spark.read.parquet(edir))
        trdir = os.path.join(checkpoint_dir, f"trues/round={k}")
        if os.path.isdir(trdir):
            trues = trues.unionByName(spark.read.parquet(trdir))
        delta = d
    return store, terms, delta, eqs.dropDuplicates(), trues.dropDuplicates(), meta.get("metrics", [])
