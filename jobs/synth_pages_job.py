"""spark-submit helper: synthesize N deterministic pages to parquet.

    spark-submit jobs/synth_pages_job.py <n_pages> <out_path>
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from inferdf_rs_spark.extraction import synth  # noqa: E402


def main() -> None:
    n_pages, out = int(sys.argv[1]), sys.argv[2]
    spark = SparkSession.builder.appName("synth_pages").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    parts = max(32, n_pages // 50000)
    synth.synth_pages(spark, n_pages, partitions=parts).write.mode("overwrite").parquet(out)
    spark.stop()


if __name__ == "__main__":
    main()
