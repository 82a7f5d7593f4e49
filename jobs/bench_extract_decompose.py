"""Decompose the extract stage's scaling ceiling: time the parquet scan
alone, scan+fused-UDF (no persist/agg), and the full pipeline extract
stage, at the current parallelism.  Run via two taskset'd spark-submits
(8 vs 32 cores) to attribute the stage's 8->32 efficiency between the
input scan (I/O + decompress, partly bus-bound) and the Python kernel
(CPU-bound, scales with cores).  One JSON line.

    taskset -c 0-7 spark-submit --master local[8] \
        jobs/bench_extract_decompose.py --pages <parquet> --iters 3
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
from pyspark.sql import functions as F  # noqa: E402

from inferdf_rs_spark.extraction import synth  # noqa: E402
from inferdf_rs_spark.extraction.extract import (  # noqa: E402
    collect_alias_vocabulary,
    make_fused_extract_detect,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("extract_decompose").getOrCreate()
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.sparkContext.setLogLevel("WARN")

    pages = spark.read.parquet(args.pages)
    target = spark.sparkContext.defaultParallelism * 4
    if pages.rdd.getNumPartitions() < target:
        pages = pages.repartition(target)

    aliases = collect_alias_vocabulary(synth.alias_dict(spark))
    det = make_fused_extract_detect(aliases, spark=spark)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def scan_only():
        # html+text read + decode, no python (JVM-side length keeps
        # columns from being pruned away)
        noop(
            pages.select(
                F.length(F.decode(F.col("html"), "utf-8")).alias("a"),
                F.length(F.col("text")).alias("b"),
            )
        )

    def scan_udf():
        # the fused kernel with NO persist and NO agg: scan + Arrow +
        # python strip/fidelity/match + tiny output
        noop(
            pages.select(
                "url",
                "lang",
                det(F.decode(F.col("html"), "utf-8"), F.col("text")).alias("_ex"),
            )
        )

    def full_stage():
        # the real extract_verify stage: + persist of the slim result +
        # the count/fidelity aggregate (then released)
        cached = (
            pages.select(
                "url", "lang", det(F.decode(F.col("html"), "utf-8"), F.col("text")).alias("_ex")
            )
            .select("url", "lang", F.col("_ex.surfaces").alias("s"), F.col("_ex.fid_ok").alias("f"))
            .persist()
        )
        cached.agg(F.count("*"), F.sum(F.when(F.col("f"), 0).otherwise(1))).collect()
        cached.unpersist(True)

    phases = [("scan_only", scan_only), ("scan_udf", scan_udf), ("full_stage", full_stage)]
    out: dict[str, list[float]] = {n: [] for n, _ in phases}
    for it in range(args.iters + 1):  # +1 warmup
        for name, fn in phases:
            t0 = time.perf_counter()
            fn()
            dt = round(time.perf_counter() - t0, 2)
            if it > 0:
                out[name].append(dt)
            sys.stderr.write(f"iter {it} {name}: {dt}\n")

    print(
        json.dumps(
            {
                "metric": "extract_decompose",
                "parallelism": spark.sparkContext.defaultParallelism,
                "best": {n: min(v) for n, v in out.items()},
                "median": {n: sorted(v)[len(v) // 2] for n, v in out.items()},
                "all": out,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
