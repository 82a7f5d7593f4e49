"""spark-submit helper: synthesize N deterministic pages to parquet.

    spark-submit jobs/synth_pages_job.py <n_pages> <out_path>
"""

from __future__ import annotations

import os
import sys

# cap per-worker thread pools (see inferdf_rs_spark.session)
os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("ARROW_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from inferdf_rs_spark.extraction import synth  # noqa: E402


def main() -> None:
    n_pages, out = int(sys.argv[1]), sys.argv[2]
    words = int(sys.argv[3]) if len(sys.argv) > 3 else 160  # realistic page text
    spark = (
        SparkSession.builder.appName("synth_pages")
        # zstd: 3.5x fewer bytes than snappy on this blob-heavy table at
        # equal scan wall (BENCH_LAYOUT.md) — the ingest-layer layout
        .config("spark.sql.parquet.compression.codec", "zstd")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    # 4x the largest parallelism level → good balance at every level
    parts = max(128, n_pages // 25000)
    synth.synth_pages(spark, n_pages, partitions=parts, words_per_page=words).write.mode(
        "overwrite"
    ).parquet(out)
    spark.stop()


if __name__ == "__main__":
    main()
