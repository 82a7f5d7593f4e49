"""Distributed k-means over embedding columns + the two operators it
enables: IVF approximate nearest neighbor and SemDeDup-style semantic
deduplication.

The reference engine has no vector layer; these extend the mandated
training-data-pipeline scope alongside the LSH family
(operators/similarity.py).  IVF (inverted-file) ANN is the classic
alternative to LSH bucketing: partition the corpus by nearest centroid,
probe only the ``nprobe`` nearest lists per query.  SemDeDup
(Abbas et al., 2023) deduplicates semantically: cluster embeddings,
then drop near-identical pairs WITHIN a cluster — the cluster key
bounds the candidate self-join exactly like an LSH band key.

Exactness: all comparisons run in integer arithmetic — vectors are
milli-quantized (``round(x*1000)`` as long, exact for float inputs in
both Spark and DuckDB), distances are integer sums of squares, and
centroid updates are ``floor(sum/count)`` (exact: |sum| << 2^53 and a
non-integer quotient is at least 1/count from an integer, far beyond
double rounding).  Ties break on the lower centroid index / vector id,
so assignments are bit-reproducible and DuckDB-oracle-checkable —
no IEEE-fold caveat anywhere in this module.

Scale shape (10^10 vectors, 1000 executors):

- k-means: centroids are k x dim integers (KBs) — they live on the
  driver and BROADCAST into a map-only assignment; the only shuffle per
  iteration is the (cluster, position) partial-sum aggregate, k*dim
  rows after map-side combine.  Lloyd iterations are O(iters) jobs.
- IVF: queries are few -> broadcast; each query scans only its nprobe
  clusters (the assignment is a pushable ``cluster IN (...)`` filter
  over a cluster-partitioned table), then an exact integer re-rank.
- SemDeDup: the self-join key is the cluster id — occupancy-bounded
  like an LSH bucket join, never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MILLI = 1000


def _milli(vec: Column) -> Column:
    """Exact milli-int quantization: round half away from zero in both
    Spark and DuckDB; float inputs are exactly represented in double."""
    return F.transform(vec, lambda x: F.round(x.cast("double") * MILLI).cast("long"))


def _sq_dist(vec: Column, center: list[int]) -> Column:
    c = F.array(*[F.lit(int(x)).cast("long") for x in center])
    diffs = F.zip_with(vec, c, lambda x, y: (x - y) * (x - y))
    return F.aggregate(diffs, F.lit(0).cast("long"), lambda acc, x: acc + x)


def _nearest(vec: Column, centers: list[list[int]], n: int = 1) -> Column:
    """Array of the ``n`` nearest centroid indices, by (distance, index)."""
    scored = F.array(
        *[
            F.struct(_sq_dist(vec, ctr).alias("d"), F.lit(i).alias("c"))
            for i, ctr in enumerate(centers)
        ]
    )
    ranked = F.array_sort(scored)
    return F.transform(F.slice(ranked, 1, n), lambda s: s["c"])


def kmeans_fit(
    vecs: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[int]]:
    """Lloyd's algorithm with deterministic init (the k lowest-id
    vectors).  Returns the final integer centroids (k x dim, driver
    side — the model is KBs regardless of corpus size)."""
    q = vecs.select(F.col(id_col).alias("_id"), _milli(F.col(vec_col)).alias("_v"))
    init = q.orderBy("_id").limit(k).collect()
    centers = [list(r["_v"]) for r in init]
    for _ in range(iters):
        # the cluster id is computed in its own projection: a generator
        # (posexplode) sibling to the struct-array expression strips the
        # struct field aliases during the generator rewrite
        assigned = q.withColumn("cl", _nearest(F.col("_v"), centers)[0]).select(
            "cl", F.posexplode("_v").alias("pos", "val")
        )
        stats = (
            assigned.groupBy("cl", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        by_cl: dict[int, dict[int, int]] = {}
        for r in stats:
            by_cl.setdefault(r["cl"], {})[r["pos"]] = r["s"] // r["n"]
        # an emptied cluster keeps its previous centroid (deterministic)
        centers = [
            [by_cl[i][p] for p in sorted(by_cl[i])] if i in by_cl else centers[i]
            for i in range(k)
        ]
    return centers


def kmeans_assign(
    vecs: DataFrame,
    centers: list[list[int]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Map-only nearest-centroid assignment: ``(id_col, cluster)``."""
    return vecs.select(
        F.col(id_col),
        _nearest(_milli(F.col(vec_col)), centers)[0].cast("int").alias("cluster"),
    )


def ann_ivf(
    vecs: DataFrame,
    centers: list[list[int]],
    query_ids: list[int],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF top-k: each query probes its ``nprobe`` nearest centroids'
    clusters only, then exact integer-distance re-rank inside the
    candidate set.  Output (query_id, neighbor_id, rank, dist_milli2).

    The corpus side is filtered by cluster membership BEFORE the
    broadcast-join with the (few-row) query side — on a
    cluster-partitioned table that filter is partition pruning, so each
    query reads ~nprobe/k of the data."""
    base = vecs.select(F.col(id_col), _milli(F.col(vec_col)).alias("_v")).withColumn(
        "cluster", _nearest(F.col("_v"), centers)[0].cast("int")
    )
    # probe list computed in its own projection before the explode (the
    # generator rewrite strips struct-field aliases from sibling exprs)
    q = (
        base.filter(F.col(id_col).isin([int(i) for i in query_ids]))
        .withColumn("_probes", _nearest(F.col("_v"), centers, nprobe).cast("array<int>"))
        .select(
            F.col(id_col).alias("query_id"),
            F.col("_v").alias("qvec"),
            F.explode("_probes").alias("cluster"),
        )
    )
    cand = base.join(F.broadcast(q), on="cluster").filter(
        F.col(id_col) != F.col("query_id")
    )
    scored = cand.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.aggregate(
            F.zip_with(F.col("_v"), F.col("qvec"), lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("dist_milli2"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist_milli2").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "dist_milli2")
    )


def semantic_dedup(
    vecs: DataFrame,
    centers: list[list[int]],
    max_dist_milli2: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup: within each cluster, drop every vector that has a
    LOWER-id vector within ``max_dist_milli2`` squared milli-distance —
    the min-id representative of each near-identical group survives.
    Returns the surviving ids.  The self-join is keyed on the cluster
    id (occupancy-bounded, never all-pairs)."""
    base = vecs.select(F.col(id_col), _milli(F.col(vec_col)).alias("_v")).withColumn(
        "cluster", _nearest(F.col("_v"), centers)[0].cast("int")
    )
    left = base.select("cluster", F.col(id_col).alias("a"), F.col("_v").alias("va"))
    right = base.select("cluster", F.col(id_col).alias("b"), F.col("_v").alias("vb"))
    dropped = (
        left.join(right, on="cluster")
        .filter(F.col("b") < F.col("a"))
        .filter(
            F.aggregate(
                F.zip_with(F.col("va"), F.col("vb"), lambda x, y: (x - y) * (x - y)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
            <= F.lit(int(max_dist_milli2))
        )
        .select(F.col("a").alias(id_col))
        .dropDuplicates()
    )
    return base.select(id_col).join(dropped, on=id_col, how="left_anti")
