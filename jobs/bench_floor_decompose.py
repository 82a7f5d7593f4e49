"""Attribute the ~2.7 s/round sequential driver floor (BENCH_SCALING.md)
to its components: Catalyst plan analysis/optimization, bare action
round-trip latency, and checkpoint materialization overhead.

The floor was measured as the per-round wall of a fixpoint over a ~1%
sample (almost no data — pure driver cost).  This job times each
candidate component in isolation on the SAME tiny chain store the
``fixpoint_tc`` bench query closes:

- plan_construct : Python-side construction of one round's full plan
               (seeded deduce → min-struct dedup → anti-join) WITHOUT
               analysis — pure py4j round-trip cost.  The r6 caches
               (scan/conclusion Column packs, facet-view reuse) attack
               exactly this term.
- plan_build : the same construction PLUS forced analysis +
               optimization + physical planning WITHOUT executing
               (``queryExecution().executedPlan()``), fresh plan per
               iteration (no analyzer cache hits).  plan_build −
               plan_construct isolates the actual Catalyst share.
- action_rt  : bare job round-trip — ``collect()`` of a one-row
               pre-analyzed cached frame (scheduling + py4j latency,
               no planning).
- ckpt_io    : eager ``localCheckpoint`` of a tiny fresh projection —
               the per-round materialization action.
- stats_agg  : the per-round single-aggregate convergence probe over a
               checkpointed tiny delta.
- round_wall : one real seeded fixpoint round end-to-end (deduce +
               checkpoint + stats) for the total these pieces must add
               up to.

Run:  python jobs/bench_floor_decompose.py [--iters 5]
One JSON line; OPTIMIZATION_r06.md carries the attribution.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from inferdf_rs_spark.operators.fixpoint import (  # noqa: E402
    NARROW_COLS,
    _deduce_round,
)
from inferdf_rs_spark.pipelines import kg_demo  # noqa: E402
from inferdf_rs_spark.rules import iri, pat, rule, stmt_triple, v  # noqa: E402
from inferdf_rs_spark.schemas import TRIPLE_KEY  # noqa: E402
from inferdf_rs_spark.session import get_spark  # noqa: E402
from inferdf_rs_spark.terms import encode_terms  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    spark = get_spark(app_name="floor_decompose")
    ds = kg_demo.chain_dataset(spark, args.sf)
    r = rule(
        variables=3,
        hypothesis=[
            pat("+", v(0), iri(kg_demo.KG + "next"), v(1)),
            pat("+", v(1), iri(kg_demo.KG + "next"), v(2)),
        ],
        statements=[stmt_triple("+", v(0), iri(kg_demo.KG + "next"), v(2))],
    )
    const_ids = encode_terms(spark, r.constants())
    store = ds.triples.localCheckpoint(eager=True)
    delta = store.localCheckpoint(eager=True)

    def round_plan():
        c = _deduce_round(spark, store, ds.terms, [(0, r)], const_ids, delta, 1, None)
        new = (
            c.triples.filter(F.col("sign"))
            .select(*NARROW_COLS)
            .groupBy(*TRIPLE_KEY)
            .agg(F.min(F.struct("rule_id", "subst_hash")).alias("_lin"))
            .select(*TRIPLE_KEY, "_lin.*")
        )
        return new.join(F.broadcast(store.select(*TRIPLE_KEY)), on=TRIPLE_KEY, how="left_anti")

    def plan_construct():
        # Python-side DataFrame construction only (py4j round-trips);
        # nothing is analyzed or planned
        round_plan()

    def plan_build():
        round_plan()._jdf.queryExecution().executedPlan()

    one_row = spark.range(1).localCheckpoint(eager=True)

    def action_rt():
        one_row.collect()

    def ckpt_io():
        store.select(*TRIPLE_KEY).localCheckpoint(eager=True)

    ckpt_delta = store.select(*NARROW_COLS).localCheckpoint(eager=True)

    def stats_agg():
        ckpt_delta.agg(
            F.count(F.lit(1)).alias("n"),
            F.collect_set(F.struct("p", "sign")).alias("dps"),
        ).collect()

    def round_wall():
        staged = round_plan().localCheckpoint(eager=True)
        staged.agg(
            F.count(F.lit(1)).alias("n"),
            F.collect_set(F.struct("p", "sign")).alias("dps"),
        ).collect()

    phases = [
        ("plan_construct", plan_construct),
        ("plan_build", plan_build),
        ("action_rt", action_rt),
        ("ckpt_io", ckpt_io),
        ("stats_agg", stats_agg),
        ("round_wall", round_wall),
    ]
    out: dict[str, list[float]] = {n: [] for n, _ in phases}
    for it in range(args.iters + 1):  # +1 warmup
        for name, fn in phases:
            t0 = time.perf_counter()
            fn()
            dt = round(time.perf_counter() - t0, 4)
            if it > 0:
                out[name].append(dt)
            sys.stderr.write(f"iter {it} {name}: {dt}\n")

    print(
        json.dumps(
            {
                "metric": "floor_decompose",
                "parallelism": spark.sparkContext.defaultParallelism,
                "median": {n: statistics.median(v) for n, v in out.items()},
                "best": {n: min(v) for n, v in out.items()},
                "all": out,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
