"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline; the LSH-bucketed
variant is the 100 TB scale path (candidates only from sign-bucket
collisions — the cross product never materializes).

All dot products run JVM-side via ``zip_with`` + ``aggregate`` in
double precision, left-to-right — bit-reproducible by the DuckDB
oracle's list_transform/list_aggregate evaluation.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for a small set of query vectors.

    The query side is a handful of rows → broadcast into the scan; the
    big side is read once, no shuffle until the per-query top-k window
    (partitioned by query id → k·|Q| rows survive).
    Output (query_id, neighbor_id, rank, cosine_micro)."""
    q = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    joined = embeddings.crossJoin(F.broadcast(q)).filter(F.col(id_col) != F.col("query_id"))
    scored = joined.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        cosine(F.col("qvec"), F.col(vec_col)).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.floor(F.col("cos") * 1e6).cast("long").alias("cosine_micro"),
        )
    )


def cosine_consecutive(embeddings: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Cosine between each vector and its id-successor (O(n) probe)."""
    nxt = embeddings.select((F.col(id_col) - 1).alias(id_col), F.col(vec_col).alias("vec_next"))
    return (
        embeddings.join(nxt, on=id_col)
        .select(
            id_col,
            F.floor(cosine(F.col(vec_col), F.col("vec_next")) * 1e6).cast("long").alias("cosine_micro"),
        )
    )


def _hyperplanes(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5 — no RNG state,
    identical across runs/executors."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"plane:{p}:{d}".encode()).digest()
            v = int.from_bytes(h[:8], "big", signed=False) / 2**64 - 0.5
            row.append(v)
        planes.append(row)
    return planes


def lsh_bucket_ann(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_planes: int = 8,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: random-hyperplane sign buckets, candidates
    restricted to the query's bucket (plus exact re-rank inside it).

    The scale path: bucket assignment is a map-only pass; the join key
    is the bucket code, so work is proportional to bucket occupancy,
    not n².  Recall < 1 by construction (approximate)."""
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes)

    def bucket(vec: Column) -> Column:
        code = F.lit(0).cast("long")
        for i, plane in enumerate(planes):
            arr = F.array(*[F.lit(x) for x in plane])
            code = code + F.when(_dot(vec, arr) > 0, F.lit(2**i).cast("long")).otherwise(F.lit(0).cast("long"))
        return code

    with_b = embeddings.withColumn("bucket", bucket(F.col(vec_col)))
    q = with_b.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"), F.col("bucket")
    )
    cands = with_b.join(F.broadcast(q), on="bucket").filter(F.col(id_col) != F.col("query_id"))
    scored = cands.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        cosine(F.col("qvec"), F.col(vec_col)).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.floor(F.col("cos") * 1e6).cast("long").alias("cosine_micro"),
        )
    )
