"""Deduplication operators for web-scale corpus construction.

Not part of the reference engine (it has no aggregations at all —
SURVEY.md §2.10); these are the training-data-pipeline operators a
100 TB Common-Crawl-style corpus needs before KG extraction.  All
JVM-side (built-in functions only): hashing is md5-derived 60-bit ints
so a DuckDB oracle can replicate results bit-for-bit.

Scale notes:
- exact dedup: one hash-partitioned groupBy on the digest (map-side
  partial aggregation applies);
- MinHash+LSH: O(n) signature computation per doc, candidate pairs only
  from band-bucket collisions (self-join on the band key, never n²);
- SimHash: O(n) bitwise aggregate per doc, no shuffle beyond the
  initial token explode.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def md5_int(col: Column) -> Column:
    """Deterministic 60-bit int from md5 — reproducible in DuckDB as
    ('0x' || substr(md5(x),1,15))::BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def norm_tokens(text: Column) -> Column:
    """Lowercased alnum tokens, empties removed (order preserved)."""
    return F.filter(F.split(F.lower(text), "[^a-z0-9]+"), lambda x: F.length(x) > 0)


def word_shingles(tokens: Column, k: int) -> Column:
    """Distinct k-word shingles of an ordered token array."""
    n = F.size(tokens)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, k)))
    return F.when(n >= k, F.array_distinct(sh)).otherwise(F.array().cast("array<string>"))


# ------------------------------------------------------------ exact


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by content digest: rank within digest group, keep rank 1.

    Returns (id, dup_key, group_size, keep)."""
    w = Window.partitionBy("dup_key").orderBy(F.col(id_col))
    # group_size over the SAME ordered window spec (full-partition frame):
    # identical partition+order lets Catalyst evaluate both functions in
    # ONE WindowExec over one exchange+sort — a separate unordered window
    # was a second Window pass over the same partitioning
    wsz = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("dup_key"))
        .withColumn("rnk", F.row_number().over(w))
        .withColumn("group_size", F.count("*").over(wsz))
        .select(id_col, "dup_key", "group_size", (F.col("rnk") == 1).alias("keep"))
    )


# ------------------------------------------------------------ minhash


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    shingle_words: int = 3,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """MinHash signatures, 4 hashes per md5 digest: hash j = the 32-bit
    hex window ``(j%4)`` of ``md5((j//4) || ':' || shingle)`` — 4x fewer
    digest computations than one md5 per hash; windows of one digest are
    independent bits.

    Physical shape: explode shingles -> one md5 per (row, seed group) ->
    16 ``min`` aggregates with map-side partial aggregation, so the
    shuffle carries only per-partition minima per doc.  Docs with no
    shingles get an all-null signature."""
    assert n_hashes % 4 == 0, "n_hashes must be a multiple of 4"
    if shingles is not None:
        # caller supplies a (possibly cached) (id, shingles) table — the
        # near-dup path reuses it for both signatures and verify
        ex = shingles.select(F.col(id_col), F.explode("shingles").alias("g"))
    else:
        toks = norm_tokens(F.col(text_col))
        ex = docs.select(
            F.col(id_col), F.explode(word_shingles(toks, shingle_words)).alias("g")
        )
    for s in range(n_hashes // 4):
        ex = ex.withColumn(f"_m{s}", F.md5(F.concat(F.lit(f"{s}:"), F.col("g"))))
    hs = [
        F.conv(F.substring(F.col(f"_m{j // 4}"), (j % 4) * 8 + 1, 8), 16, 10)
        .cast("long")
        .alias(f"h{j}")
        for j in range(n_hashes)
    ]
    agg = (
        ex.select(id_col, *hs)
        .groupBy(id_col)
        .agg(*[F.min(f"h{j}").alias(f"h{j}") for j in range(n_hashes)])
    )
    full = docs.select(id_col).join(agg, on=id_col, how="left")
    return full.select(
        F.col(id_col), F.array(*[F.col(f"h{j}") for j in range(n_hashes)]).alias("sig")
    )


def spread_input(df: DataFrame) -> DataFrame:
    """Ensure the input has at least cluster-width partitions.

    A small input (one parquet split) otherwise serializes every
    downstream explode/hash/aggregate on a single task — measured 4.8s
    single-threaded vs <1s spread for the sf0.1 shingle build.  At
    production scale the input already has >= cluster-width splits and
    this is a no-op (partition count check only, no shuffle)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def lsh_bands(sigs: DataFrame, bands: int, n_hashes: int, id_col: str = "doc_id") -> DataFrame:
    """Split signatures into bands; band key = md5 of the band slice.
    (doc, band, bucket) rows — join on (band, bucket) for candidates.

    ONE pass over ``sigs``: all band keys are computed in a single
    projection and ``posexplode``d — a per-band union of projections
    would scan (and, if unpersisted, recompute) the signature aggregate
    ``bands`` times."""
    rows_per = n_hashes // bands
    keys = [
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.slice(F.col("sig"), b * rows_per + 1, rows_per),
                    lambda x: x.cast("string"),
                ),
            )
        )
        for b in range(bands)
    ]
    return sigs.select(
        F.col(id_col), F.posexplode(F.array(*keys)).alias("band", "bucket")
    )


def minhash_near_dup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    bands: int = 4,
    shingle_words: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Candidate pairs from LSH band collisions, verified by exact
    shingle-set Jaccard ≥ threshold.  Output (id_a, id_b, jaccard_micro)
    with jaccard scaled to integer micro-units for engine-stable compare.

    Cache lifecycle: the shingle and band tables are persisted only for
    the duration of this call (each feeds two scans — signature+verify,
    and the band self-join) and unpersisted before returning.  The
    returned pair table is localCheckpoint-materialized (disk-evictable)
    so it does not recompute through the released caches; callers that
    repeat this per batch therefore retain only their own results."""
    from pyspark.storagelevel import StorageLevel

    docs = spread_input(docs)
    toks = norm_tokens(F.col(text_col))
    # persist: shingle arrays feed both the signature pass and the verify
    # join, and the band table self-joins — without caching each side of
    # the self-join would recompute every md5
    base = docs.select(
        F.col(id_col),
        word_shingles(toks, shingle_words).alias("shingles"),
    ).persist(StorageLevel.MEMORY_AND_DISK_DESER)
    sigs = minhash_signatures(docs, text_col, id_col, n_hashes, shingle_words, shingles=base)
    bandsdf = lsh_bands(sigs, bands, n_hashes, id_col).persist(StorageLevel.MEMORY_AND_DISK_DESER)
    a = bandsdf.select(F.col(id_col).alias("id_a"), "band", "bucket")
    b = bandsdf.select(F.col(id_col).alias("id_b"), "band", "bucket")
    cands = (
        a.join(b, on=["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates()
    )
    sa = base.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    sb = base.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    verified = (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("uni", F.size(F.array_union("sh_a", "sh_b")))
        .withColumn("jaccard", F.col("inter") / F.col("uni"))
        .filter(F.col("jaccard") >= threshold)
    )
    out = verified.select(
        "id_a", "id_b", F.floor(F.col("jaccard") * 1e6).cast("long").alias("jaccard_micro")
    )
    try:
        return out.localCheckpoint(eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK_DESER)
    finally:
        base.unpersist()
        bandsdf.unpersist()


# ------------------------------------------------------------ simhash


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 16) -> DataFrame:
    """SimHash over distinct tokens: bit b set iff sum of (±1 per token,
    sign from token-hash bit b) is positive.  Output (id, simhash)."""
    toks = docs.select(
        F.col(id_col), F.explode(F.array_distinct(norm_tokens(F.col(text_col)))).alias("tok")
    ).withColumn("h", md5_int(F.col("tok")))
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(bits)
    ]
    per = toks.groupBy(id_col).agg(*aggs)
    sh = F.lit(0).cast("long")
    for b in range(bits):
        sh = sh + F.when(F.col(f"s{b}") > 0, F.lit(2**b).cast("long")).otherwise(F.lit(0).cast("long"))
    return per.select(F.col(id_col), sh.alias("simhash"))


# ------------------------------------------------------------ n-gram jaccard


def ngram_jaccard_consecutive(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", shingle_words: int = 2
) -> DataFrame:
    """Shingle-set Jaccard between each doc and its id-successor —
    an O(n) oracle-checkable probe of the jaccard machinery."""
    base = docs.select(
        F.col(id_col),
        word_shingles(norm_tokens(F.col(text_col)), shingle_words).alias("sh"),
    )
    nxt = base.select((F.col(id_col) - 1).alias(id_col), F.col("sh").alias("sh_next"))
    return (
        base.join(nxt, on=id_col)
        .withColumn("inter", F.size(F.array_intersect("sh", "sh_next")))
        .withColumn("uni", F.size(F.array_union("sh", "sh_next")))
        .select(
            id_col,
            F.floor(F.col("inter") / F.col("uni") * 1e6).cast("long").alias("jaccard_micro"),
        )
    )


# ------------------------------------------------------------ dedup groups


def dedup_groups(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    pairs: DataFrame | None = None,
    **near_dup_kwargs,
) -> DataFrame:
    """Duplicate CLUSTERS from verified near-dup pairs: connected
    components over the pair graph, one canonical representative (the
    minimum doc id) per cluster.  This is the step a corpus pipeline
    actually needs after pair generation — "keep one of each group",
    which pairwise output alone cannot answer when duplicates chain
    (A~B, B~C but A!~C must still collapse to ONE keeper).

    Output: (doc_id, rep_id, cluster_size) for every clustered doc;
    singletons (no near-dup) are absent — their "cluster" is themselves.

    Reuses the KG engine's Shiloach-Vishkin eq-closure (hook +
    pointer-jump, O(log chain) rounds — operators/eqclosure.py), the
    same machinery that merges owl:sameAs resources: doc-dedup IS
    entity resolution over the similarity graph.  Scale shape: the
    closure shuffles only CLUSTERED ids (a tiny fraction of the corpus),
    never the corpus itself; cluster_size is one small groupBy over the
    mapping.

    ``pairs``: pre-computed (id_a, id_b) pairs; default runs
    ``minhash_near_dup_pairs`` with ``near_dup_kwargs``.
    """
    from .eqclosure import eq_closure

    if pairs is None:
        pairs = minhash_near_dup_pairs(docs, text_col, id_col, **near_dup_kwargs)
    mapping = eq_closure(
        pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    )
    sizes = mapping.groupBy("res").agg(F.count("*").alias("cluster_size"))
    return (
        mapping.join(sizes, "res")
        .select(
            F.col("term_id").alias(id_col),
            F.col("res").alias("rep_id"),
            "cluster_size",
        )
    )


def drop_near_dups(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    groups: DataFrame | None = None,
    **near_dup_kwargs,
) -> DataFrame:
    """The deduplicated corpus: every singleton plus each cluster's
    representative.  A broadcast-able anti-join at 100 TB — the drop
    list (clustered non-representatives) is tiny relative to the
    corpus, so Spark broadcasts it and the corpus never shuffles."""
    if groups is None:
        groups = dedup_groups(docs, text_col, id_col, **near_dup_kwargs)
    drop = groups.filter(F.col(id_col) != F.col("rep_id")).select(id_col)
    return docs.join(drop, id_col, "left_anti")
