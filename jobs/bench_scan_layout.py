"""Parquet layout A/B for the extract stage's scan+decode share (the
worst scaler in the r4 decomposition: scan_only eff 0.56 at 8→32 cores).

Two modes, composed by the caller (see BENCH_SCALING.md):

    # once: rewrite the pages table under candidate layouts
    spark-submit --master local[32] jobs/bench_scan_layout.py \
        --prepare <pages_parquet> --root /tmp/scan_layouts

    # per parallelism level: time the pure scan for every layout
    taskset -c 0-7 spark-submit --master local[8] \
        jobs/bench_scan_layout.py --measure --root /tmp/scan_layouts --iters 3

Layouts: snappy @128 MB row groups (the writer default = the r4
baseline), zstd @128 MB (denser — fewer bus bytes, more decode CPU),
uncompressed @128 MB (zero decode CPU, max bus bytes), snappy @32 MB
(finer skipping/split granularity).  The scan probe is identical to
bench_extract_decompose.scan_only: decode(html)+length on both blob
columns through the noop sink — pure columnar scan, no Python.
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

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

LAYOUTS = [
    # (name, compression, row_group_bytes)
    ("snappy_128m", "snappy", 128 * 1024 * 1024),
    ("zstd_128m", "zstd", 128 * 1024 * 1024),
    ("none_128m", "none", 128 * 1024 * 1024),
    ("snappy_32m", "snappy", 32 * 1024 * 1024),
]


def prepare(spark: SparkSession, pages_path: str, root: str) -> None:
    pages = spark.read.parquet(pages_path)
    target = spark.sparkContext.defaultParallelism * 4
    if pages.rdd.getNumPartitions() < target:
        pages = pages.repartition(target)
    sizes = {}
    for name, comp, block in LAYOUTS:
        dst = os.path.join(root, name)
        (
            pages.write.mode("overwrite")
            .option("compression", comp)
            .option("parquet.block.size", block)
            .parquet(dst)
        )
        sizes[name] = sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(dst)
            for f in fs
            if f.endswith(".parquet")
        )
    print(json.dumps({"metric": "scan_layout_prepare", "bytes": sizes}))


def measure(spark: SparkSession, root: str, iters: int) -> None:
    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    out: dict[str, list[float]] = {}
    for it in range(iters + 1):  # +1 warmup
        for name, _, _ in LAYOUTS:
            df = spark.read.parquet(os.path.join(root, name))
            t0 = time.perf_counter()
            noop(
                df.select(
                    F.length(F.decode(F.col("html"), "utf-8")).alias("a"),
                    F.length(F.col("text")).alias("b"),
                )
            )
            dt = round(time.perf_counter() - t0, 2)
            if it > 0:
                out.setdefault(name, []).append(dt)
            sys.stderr.write(f"iter {it} {name}: {dt}\n")
    print(
        json.dumps(
            {
                "metric": "scan_layout",
                "parallelism": spark.sparkContext.defaultParallelism,
                "median": {n: sorted(v)[len(v) // 2] for n, v in out.items()},
                "best": {n: min(v) for n, v in out.items()},
                "all": out,
            }
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--prepare", default=None, help="source pages parquet")
    ap.add_argument("--measure", action="store_true")
    ap.add_argument("--root", required=True)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("scan_layout").getOrCreate()
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.sparkContext.setLogLevel("WARN")
    if args.prepare:
        prepare(spark, args.prepare, args.root)
    if args.measure:
        measure(spark, args.root, args.iters)
    spark.stop()


if __name__ == "__main__":
    main()
