"""Dataset backends (X2 extension surface).

The reference is generic over any store implementing its dataset traits
(src/dataset.rs:13-137); the Spark analogue is "any DataFrame source".
This registry reads/writes (triples, terms) dataset pairs across the
formats available in this container — parquet/json/csv natively, ORC,
and Iceberg behind an import-try (jars not shipped in the image; the
code path is the one a cluster deployment would use).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..engine import Dataset
from ..schemas import TERMS_SCHEMA, TRIPLES_SCHEMA


def parquet_row_count(path: str) -> int:
    """Catalog-style row count from parquet FOOTERS only — no Spark job,
    no data scan.  This is the metadata a table catalog (Iceberg/Hive)
    serves for free; for bare-parquet layouts (the demo tables, a
    materialized graph directory) the footers are the catalog.  Driver
    cost is one ~8 KB footer read per file — O(files), not O(rows) —
    which is how a 10^12-row table's count stays a metadata lookup."""
    import glob as _glob

    import pyarrow.parquet as pq

    if os.path.isdir(path):
        files = sorted(_glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
    else:
        files = [path]
    return sum(pq.ParquetFile(f).metadata.num_rows for f in files)


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.spark.SparkCatalog  # noqa: B018
        return True
    except Exception:
        return False


def write_dataset(ds: Dataset, path: str, fmt: str = "parquet") -> None:
    if fmt == "iceberg":
        if not iceberg_available(ds.triples.sparkSession):
            raise RuntimeError("Iceberg runtime jars not on classpath; use parquet")
        ds.triples.writeTo(f"{path}.triples").createOrReplace()
        ds.terms.writeTo(f"{path}.terms").createOrReplace()
        return
    w_triples = ds.triples.write.mode("overwrite").format(fmt)
    w_terms = ds.terms.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        w_triples = w_triples.option("header", True)
        w_terms = w_terms.option("header", True)
    w_triples.save(os.path.join(path, "triples"))
    w_terms.save(os.path.join(path, "terms"))


def read_dataset(spark: SparkSession, path: str, fmt: str = "parquet") -> Dataset:
    if fmt == "iceberg":
        if not iceberg_available(spark):
            raise RuntimeError("Iceberg runtime jars not on classpath; use parquet")
        return Dataset(spark.read.table(f"{path}.triples"), spark.read.table(f"{path}.terms"))
    r = spark.read.format(fmt)
    if fmt == "json":
        return Dataset(
            r.schema(TRIPLES_SCHEMA).load(os.path.join(path, "triples")),
            spark.read.format(fmt).schema(TERMS_SCHEMA).load(os.path.join(path, "terms")),
        )
    if fmt == "csv":
        return Dataset(
            r.schema(TRIPLES_SCHEMA).option("header", True).load(os.path.join(path, "triples")),
            spark.read.format(fmt).schema(TERMS_SCHEMA).option("header", True).load(os.path.join(path, "terms")),
        )
    return Dataset(
        r.load(os.path.join(path, "triples")),
        spark.read.format(fmt).load(os.path.join(path, "terms")),
    )


def write_dataset_csv(ds: Dataset, path: str) -> None:
    ds.triples.write.mode("overwrite").option("header", True).csv(os.path.join(path, "triples"))
    ds.terms.write.mode("overwrite").option("header", True).csv(os.path.join(path, "terms"))
