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

The numpy kernels below preserve that exactness: every product and
partial sum of milli-int values is an integer with magnitude
< dim·max_milli² (guarded at ``_F64_EXACT_LIMIT`` ≪ 2^53), and IEEE
float64 arithmetic on integers below 2^53 is exact regardless of
summation order — so the BLAS matmul returns the exact integer
distance, and ``argmin``/stable ``argsort`` reproduce the
(distance, index) tie-break bit-for-bit.

Scale shape (10^10 vectors, 1000 executors, k up to 10^5 lists):

- k-means: centroids are k x dim integers — a ``SparkContext.broadcast``
  matrix consumed by a vectorized Arrow batch matmul, so assignment is
  map-only and k is bounded by executor memory (a 10^5 x 1024 int64
  matrix is ~800 MB — streamable; the former per-centroid literal
  expression tree died at k ~ O(100)).  The only shuffle per Lloyd
  iteration is the (cluster, position) partial-sum aggregate, k*dim
  rows after map-side combine.
- IVF: queries are few -> broadcast; each query scans only its nprobe
  clusters (the assignment is a pushable ``cluster IN (...)`` filter
  over a cluster-partitioned table), then an exact integer re-rank.
- SemDeDup: the candidate scan is keyed on the cluster id — one
  exchange by cluster, then a per-cluster blocked matmul
  (``applyInPandas``) whose cost is occupancy-bounded like an LSH
  bucket join, never all-pairs over the corpus.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MILLI = 1000

# |sum of dim products| must stay an exact float64 integer: guard each
# batch at max|milli| <= 3e7 so dim * max_milli^2 <= 1024 * 9e14... is
# too lax — use the tight bound dim * max_milli^2 < 2^53 checked with
# the actual dim at call time.
_F64_EXACT_LIMIT = float(1 << 53)


def _milli(vec: Column) -> Column:
    """Exact milli-int quantization: round half away from zero in both
    Spark and DuckDB; float inputs are exactly represented in double."""
    return F.transform(vec, lambda x: F.round(x.cast("double") * MILLI).cast("long"))


def _check_exact(mat: np.ndarray, dim: int) -> None:
    """Raise if float64 matmul could round: every pairwise product sum
    must stay below 2^53 (integers below that are exact in IEEE double
    under any summation order)."""
    m = float(np.abs(mat).max(initial=0.0))
    if dim * m * m >= _F64_EXACT_LIMIT:
        raise ValueError(
            f"milli-int magnitude {m:.3g} too large for exact float64 "
            f"distance arithmetic at dim={dim} — re-scale the embeddings"
        )


def _sq_dist_matrix(V: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Exact integer squared distances |v-c|^2 as float64: (n, k) from
    (n, dim) x (k, dim) milli-int inputs.  All intermediates are
    integers < 2^53 (guarded), so BLAS order cannot round."""
    dim = V.shape[1]
    _check_exact(V, dim)
    _check_exact(C, dim)
    v2 = np.einsum("ij,ij->i", V, V)
    c2 = np.einsum("ij,ij->i", C, C)
    return v2[:, None] - 2.0 * (V @ C.T) + c2[None, :]


def _stack_milli(vs: pd.Series) -> np.ndarray:
    return np.stack(vs.to_numpy()).astype(np.float64)


def _nearest_udf(vecs: DataFrame, centers: list[list[int]], n: int = 1):
    """Vectorized nearest-centroid kernel: a pandas UDF over the
    milli-int vector column returning the ``n`` nearest centroid
    indices by (distance, index) — ``argmin`` keeps the first (lowest
    index) minimum and stable ``argsort`` preserves index order on
    ties, matching the documented tie-break exactly.  The centroid
    matrix rides a SparkContext broadcast (k x dim ints — KBs at demo
    scale, still executor-memory-bounded at k = 10^5)."""
    sc = vecs.sparkSession.sparkContext
    bc = sc.broadcast(np.asarray(centers, dtype=np.float64))

    if n == 1:

        @F.pandas_udf("int")
        def nearest1(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
            C = bc.value
            for vs in it:
                d = _sq_dist_matrix(_stack_milli(vs), C)
                yield pd.Series(np.argmin(d, axis=1).astype(np.int32))

        return nearest1

    @F.pandas_udf("array<int>")
    def nearestn(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        C = bc.value
        for vs in it:
            d = _sq_dist_matrix(_stack_milli(vs), C)
            idx = np.argsort(d, axis=1, kind="stable")[:, :n].astype(np.int32)
            yield pd.Series(list(idx))

    return nearestn


def kmeans_fit(
    vecs: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[int]]:
    """Lloyd's algorithm with deterministic init (the k lowest-id
    vectors).  Returns the final integer centroids (k x dim, driver
    side — the model is k x dim ints; the update aggregate is k*dim
    rows after map-side combine, one driver collect per iteration)."""
    q = vecs.select(F.col(id_col).alias("_id"), _milli(F.col(vec_col)).alias("_v"))
    init = q.orderBy("_id").limit(k).collect()
    if len(init) < k:
        raise ValueError(
            f"kmeans_fit: corpus has only {len(init)} vectors for k={k} — "
            "lower k to at most the corpus size"
        )
    centers = [list(r["_v"]) for r in init]
    for _ in range(iters):
        assigned = q.select(
            _nearest_udf(vecs, centers)(F.col("_v")).alias("cl"),
            F.posexplode("_v").alias("pos", "val"),
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
        _nearest_udf(vecs, centers)(_milli(F.col(vec_col))).alias("cluster"),
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
        "cluster", _nearest_udf(vecs, centers)(F.col("_v"))
    )
    q = (
        base.filter(F.col(id_col).isin([int(i) for i in query_ids]))
        .withColumn("_probes", _nearest_udf(vecs, centers, nprobe)(F.col("_v")))
        .select(
            F.col(id_col).alias("query_id"),
            F.col("_v").alias("qvec"),
            F.explode("_probes").alias("cluster"),
        )
    )
    cand = base.join(F.broadcast(q), on="cluster").filter(
        F.col(id_col) != F.col("query_id")
    )

    # exact integer distance in one Arrow batch: every (x-y)^2 partial
    # sum of milli-ints is an integer < 2^53 (guarded), so float64
    # arithmetic is exact under ANY summation order — bit-identical to
    # the former interpreted zip_with/aggregate fold, which evaluated
    # one lambda per element per row (the candidate set grows ~nprobe/k
    # of the corpus, so that fold dominated at 100x bench scale)
    @F.pandas_udf("long")
    def dist_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series(np.array([], dtype=np.int64))
        D = np.stack(a.to_numpy()).astype(np.float64) - np.stack(b.to_numpy()).astype(
            np.float64
        )
        _check_exact(D, D.shape[1])
        return pd.Series(np.einsum("ij,ij->i", D, D).astype(np.int64))

    scored = cand.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        dist_udf(F.col("_v"), F.col("qvec")).alias("dist_milli2"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist_milli2").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "dist_milli2")
    )


# pair-scan cell budget: each distance block is at most this many
# float64 cells (~32 MB of temporaries) regardless of cluster size
_PAIR_CELLS = 1 << 22


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
    Returns the surviving ids.

    The candidate scan is keyed on the cluster id (occupancy-bounded,
    never all-pairs over the corpus): one exchange groups each cluster,
    then a blocked exact matmul inside ``applyInPandas`` marks rows
    with a lower-id neighbor inside the radius.  Every id lands in
    exactly one cluster, so emitting each cluster's survivors directly
    is identical to the former dropped-id anti-join.

    Intra-cluster fan-out: a row's keep-decision (``no lower-id row of
    the cluster within the radius``) is independent of every other
    decision, so when the cluster count is below the cluster width the
    rows of each cluster are additionally split over ``n_sub`` hash
    sub-groups — every sub-group task receives the FULL cluster (the
    explode below) but scans only its own rows against the lower-id
    prefix, giving k x n_sub parallel tasks with the same total
    distance work and byte-identical survivors.  ``n_sub`` derives from
    defaultParallelism / len(centers): at the production shape
    (k >= cluster width, SemDeDup's own k ~ n/1k) it is 1 and the plan
    is exactly the former one-exchange shape."""
    thr = float(int(max_dist_milli2))

    par = vecs.sparkSession.sparkContext.defaultParallelism
    n_sub = max(1, -(-2 * par // max(len(centers), 1)))

    def survivors(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_id", kind="mergesort")
        ids = pdf["_id"].to_numpy()
        V = _stack_milli(pdf["_v"])
        dim = V.shape[1]
        _check_exact(V, dim)
        v2 = np.einsum("ij,ij->i", V, V)
        if "_sub" in pdf.columns:
            own = np.flatnonzero((pdf["_own"] == pdf["_sub"]).to_numpy())
        else:
            own = np.arange(len(ids))
        if len(own) == 0:
            return pd.DataFrame({id_col: np.array([], dtype=np.int64)})
        keep = np.zeros(len(own), dtype=bool)
        i = 0
        while i < len(own):
            # grow the block while its (rows x prefix) stays in budget
            j = i + 1
            while j < len(own) and (j - i + 1) * (int(own[j]) + 1) <= _PAIR_CELLS:
                j += 1
            P = own[i:j]
            e = int(P[-1]) + 1
            # distances of the own rows to every strictly-lower row (< e)
            d = v2[P, None] - 2.0 * (V[P] @ V[:e].T) + v2[None, :e]
            lower = np.arange(e)[None, :] < P[:, None]
            keep[i:j] = ~np.any((d <= thr) & lower, axis=1)
            i = j
        return pd.DataFrame({id_col: ids[own[keep]]})

    base = vecs.select(F.col(id_col), _milli(F.col(vec_col)).alias("_v")).withColumn(
        "cluster", _nearest_udf(vecs, centers)(F.col("_v"))
    )
    rows = base.select(F.col(id_col).alias("_id"), "_v", "cluster")
    if n_sub == 1:
        return rows.groupBy("cluster").applyInPandas(survivors, schema=f"{id_col} long")
    rows = rows.withColumn(
        "_own", F.pmod(F.xxhash64("_id"), F.lit(n_sub)).cast("int")
    ).withColumn("_sub", F.explode(F.array(*[F.lit(i) for i in range(n_sub)])))
    return rows.groupBy("cluster", "_sub").applyInPandas(survivors, schema=f"{id_col} long")
