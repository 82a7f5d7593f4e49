"""Decompose the fixpoint stage's scaling (worst per-stage scaler on
the unsaturated local[2]->local[8] pair: 0.486) into its cost layers,
each timed separately at both pinned parallelism levels.

Prep once (writes the closed graph; the job re-derives the STATED layer
by filtering cause_kind == CAUSE_STATED — bit-identical to the layer
the pipeline's fixpoint consumed):

    spark-submit --master 'local[8]' --conf spark.ui.enabled=false \
        jobs/run_kg_pipeline.py --synth 500000 --out /tmp/fpdec/graph

Then time each level:

    taskset -c 0-1 spark-submit --master local[2] --conf spark.ui.enabled=false \
        jobs/bench_fixpoint_decompose.py --graph /tmp/fpdec/graph --iters 3
    taskset -c 0-7 spark-submit --master local[8] --conf spark.ui.enabled=false \
        jobs/bench_fixpoint_decompose.py --graph /tmp/fpdec/graph --iters 3

Variants (warmup + median-of-iters each):

- deduce_full   : one full-store deduction round over all web rules →
                  narrow projection → noop sink.  The parallel join/
                  match kernel in isolation — the part that SHOULD
                  scale with cores.
- dedup_anti    : + min-struct conclusion dedup + anti-join against the
                  stated layer → noop.  Adds the conclusions-stream
                  exchange (map-side partial agg) and the store probe.
- round_large   : + MEMORY_AND_DISK_DESER persist + the one-action
                  stats aggregate + the co-partitioned piece shuffle
                  (repartition on the triple key, AQE off, sorted) →
                  noop.  The production large-regime round body.
- fixpoint_full : the pipeline's whole fixpoint stage (System.fixpoint
                  to convergence + store.count), rounds reported.
- driver_floor  : the same fixpoint over a ~1% hash-sample of the
                  stated layer.  With almost no data, wall time is the
                  SEQUENTIAL per-round driver cost (planning, job
                  scheduling, action latency) — the Amdahl term that no
                  core count can shrink; reported per round.

One JSON line per run; BENCH_SCALING.md carries the merged table.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("ARROW_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.storagelevel import StorageLevel  # noqa: E402

from inferdf_rs_spark.engine import Dataset, System  # noqa: E402
from inferdf_rs_spark.operators.fixpoint import (  # noqa: E402
    NARROW_COLS,
    _deduce_round,
)
from inferdf_rs_spark.pipelines.webkg import read_graph, web_rules  # noqa: E402
from inferdf_rs_spark.schemas import CAUSE_STATED, TRIPLE_KEY, TRIPLES_SCHEMA  # noqa: E402
from inferdf_rs_spark.terms import encode_terms  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--graph", required=True)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("fixpoint_decompose").getOrCreate()
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.sparkContext.setLogLevel("WARN")
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))

    g = read_graph(spark, args.graph)
    cols = [f.name for f in TRIPLES_SCHEMA.fields]
    stated = (
        g.triples.filter(F.col("cause_kind") == CAUSE_STATED)
        .select(*cols)
        .localCheckpoint(eager=True)
    )
    terms = g.terms.localCheckpoint(eager=True)
    n_stated = stated.count()

    rules = web_rules()
    enum_rules = list(enumerate(rules))
    const_ids = encode_terms(spark, [c for r in rules for c in r.constants()])

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def deduce_full():
        c = _deduce_round(spark, stated, terms, enum_rules, const_ids, None, 1, None)
        noop(c.triples.filter(F.col("sign")).select(*NARROW_COLS))

    def _deduped_new():
        c = _deduce_round(spark, stated, terms, enum_rules, const_ids, None, 1, None)
        new = (
            c.triples.filter(F.col("sign"))
            .select(*NARROW_COLS)
            .groupBy(*TRIPLE_KEY)
            .agg(F.min(F.struct("rule_id", "subst_hash")).alias("_lin"))
            .select(*TRIPLE_KEY, "_lin.*")
        )
        return new.join(stated.select(*TRIPLE_KEY), on=TRIPLE_KEY, how="left_anti")

    def dedup_anti():
        noop(_deduped_new())

    def round_large():
        staged = _deduped_new().persist(StorageLevel.MEMORY_AND_DISK_DESER)
        staged.agg(
            F.count(F.lit(1)).alias("n_new"),
            F.collect_set(F.struct("p", "sign")).alias("dps"),
        ).collect()
        prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            noop(staged.repartition(n_part, *TRIPLE_KEY).sortWithinPartitions(*TRIPLE_KEY))
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
            staged.unpersist(True)

    fp_rounds = {"full": 0, "floor": 0}

    def fixpoint_full():
        sysm = System(spark, rules)
        res = sysm.fixpoint(Dataset(stated, terms, n_triples=n_stated))
        res.store.count()
        fp_rounds["full"] = len(res.metrics)
        res.release()

    # ~1% deterministic hash-sample: tiny data, same rule system — the
    # wall is almost pure sequential driver cost per round
    floor_in = stated.filter(F.pmod(F.xxhash64("s", "p", "o"), F.lit(101)) == 0).localCheckpoint(
        eager=True
    )
    n_floor = floor_in.count()

    def driver_floor():
        sysm = System(spark, rules)
        res = sysm.fixpoint(Dataset(floor_in, terms, n_triples=n_floor))
        res.store.count()
        fp_rounds["floor"] = len(res.metrics)
        res.release()

    phases = [
        ("deduce_full", deduce_full),
        ("dedup_anti", dedup_anti),
        ("round_large", round_large),
        ("fixpoint_full", fixpoint_full),
        ("driver_floor", driver_floor),
    ]
    out: dict[str, list[float]] = {n: [] for n, _ in phases}
    for it in range(args.iters + 1):  # +1 warmup
        for name, fn in phases:
            t0 = time.perf_counter()
            fn()
            dt = round(time.perf_counter() - t0, 3)
            if it > 0:
                out[name].append(dt)
            sys.stderr.write(f"iter {it} {name}: {dt}\n")

    print(
        json.dumps(
            {
                "metric": "fixpoint_decompose",
                "parallelism": spark.sparkContext.defaultParallelism,
                "n_stated": n_stated,
                "n_floor": n_floor,
                "rounds": fp_rounds,
                "best": {n: min(v) for n, v in out.items()},
                "median": {n: statistics.median(v) for n, v in out.items()},
                "floor_per_round_sec": round(
                    statistics.median(out["driver_floor"]) / max(fp_rounds["floor"], 1), 3
                ),
                "all": out,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
