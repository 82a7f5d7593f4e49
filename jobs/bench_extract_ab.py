"""A/B the fused vs unfused extraction front-end in ONE JVM.

Same pages input, same session; iterations alternate
``run_pipeline(fused_extract=...)`` False/True so JIT warmth and
page-cache state are shared.  Reports per-mode best/median of the
extract_verify+link_encode stage sum (the stages the fusion moves work
between) and the whole-iteration wall.  One JSON line.

    spark-submit --master local[32] jobs/bench_extract_ab.py \
        --pages <parquet> --iters 3
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("ARROW_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from inferdf_rs_spark.caches import persistent_rdd_ids  # noqa: E402
from inferdf_rs_spark.extraction import synth  # noqa: E402
from inferdf_rs_spark.extraction.extract import collect_alias_vocabulary  # noqa: E402
from inferdf_rs_spark.pipelines import webkg  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--iters", type=int, default=3, help="iterations PER MODE")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("extract_ab").getOrCreate()
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.sparkContext.setLogLevel("WARN")

    pages = spark.read.parquet(args.pages)
    target = spark.sparkContext.defaultParallelism * 4
    if pages.rdd.getNumPartitions() < target:
        pages = pages.repartition(target)

    alias_d = synth.alias_dict(spark)
    aliases = collect_alias_vocabulary(alias_d)
    static_terms = webkg.static_term_rows(
        spark, alias_d, synth.entity_types(spark), synth.sameas_seed(spark)
    ).localCheckpoint(eager=True)
    keep_ids = persistent_rdd_ids(spark)

    # one discarded warmup per mode pays JIT for both plan shapes
    schedule = [False, True] + [False, True] * args.iters
    runs: dict[str, list[dict]] = {"fused": [], "unfused": []}
    for i, fused in enumerate(schedule):
        t0 = time.perf_counter()
        pr = webkg.run_pipeline(
            spark,
            pages,
            skip_fidelity=False,
            static_terms=static_terms,
            aliases=aliases,
            fused_extract=fused,
        )
        wall = time.perf_counter() - t0
        rec = {
            "wall": round(wall, 2),
            "extract_link": round(
                pr.timings["extract_verify"] + pr.timings["link_encode"], 2
            ),
            "timings": {k: round(v, 2) for k, v in pr.timings.items()},
        }
        sys.stderr.write(f"iter {i} fused={fused}: {rec}\n")
        if i >= 2:  # drop the two warmups
            runs["fused" if fused else "unfused"].append(rec)
        pr = None
        spark.catalog.clearCache()
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rid in [int(x) for x in jmap.keySet().toArray()]:
            if rid not in keep_ids:
                jrdd = jmap.get(rid)
                if jrdd is not None:
                    jrdd.unpersist()
        spark.sparkContext._jvm.System.gc()

    def stats(key):
        out = {}
        for mode, rs in runs.items():
            vals = sorted(r[key] for r in rs)
            out[mode] = {"best": vals[0], "median": vals[len(vals) // 2], "all": vals}
        return out

    print(
        json.dumps(
            {
                "metric": "extract_ab",
                "parallelism": spark.sparkContext.defaultParallelism,
                "extract_link": stats("extract_link"),
                "wall": stats("wall"),
                "detail": runs,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
