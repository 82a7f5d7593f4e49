"""Deterministic KG synthesis over the driver's TPC-H-ish testdata.

Per FIXTURES.md §7, the driver-oracle mapping expresses the rule-engine
operators over triples synthesized from the synthetic tables (e.g.
``(doc://id, kg:mentions, token)``) so every Spark result can be
reproduced by a DuckDB SQL oracle on the same parquet inputs.

Everything here is bulk Spark-side encoding: raw lexical columns →
``xxhash64`` term ids (terms.term_id_col) → signed triples. No driver
loops, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..encode import encode_edges as encode_edges, iri_edges
from ..engine import Dataset
from ..schemas import KIND_LITERAL, XSD

KG = "kg:"
TOKEN_SPLIT = "[^a-z0-9]+"

# Session-scoped cache of the encoded fixture datasets.  A real
# deployment dictionary-encodes its store ONCE and queries it many
# times; without this, every harness query re-runs the bulk encode of
# the same table (round-1 bench: pattern_scan spent ~90% of its 7.7s
# re-encoding the mentions KG).  Keyed by session identity so a fresh
# driver session rebuilds from scratch.
_DS_CACHE: dict[tuple, Dataset] = {}


def _cached_dataset(spark: SparkSession, key: tuple, build) -> Dataset:
    # applicationId, not id(spark): a new session object at a recycled
    # address must never hit a dead context's checkpoint blocks
    k = (spark.sparkContext.applicationId, *key)
    ds = _DS_CACHE.get(k)
    if ds is None:
        raw = build()
        ds = Dataset(
            raw.triples.localCheckpoint(eager=True), raw.terms.localCheckpoint(eager=True)
        )
        if len(_DS_CACHE) > 64:
            _DS_CACHE.clear()
        _DS_CACHE[k] = ds
    return ds


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def doc_tokens(docs: DataFrame, min_len: int = 1) -> DataFrame:
    """(doc_id, token) distinct, token = lowercase alnum run of len>=min_len."""
    return (
        docs.select(
            "doc_id", F.explode(F.split(F.lower("text"), TOKEN_SPLIT)).alias("token")
        )
        .filter(F.length("token") >= min_len)
        .dropDuplicates(["doc_id", "token"])
    )


def _build_mentions_dataset(spark: SparkSession, sf_dir: str, min_token_len: int = 4) -> Dataset:
    """(doc://id, kg:mentions, "token"^^xsd:string) triples."""
    toks = doc_tokens(load(spark, sf_dir, "documents"), min_token_len)
    edges = toks.select(
        F.concat(F.lit("doc://"), F.col("doc_id")).alias("s_lex"),
        F.lit(KG + "mentions").alias("p_lex"),
        F.lit(KIND_LITERAL).alias("o_kind"),
        F.col("token").alias("o_lex"),
        F.lit(XSD + "string").alias("o_dt"),
    )
    return encode_edges(spark, edges)


def _build_nchars_dataset(spark: SparkSession, sf_dir: str) -> Dataset:
    """(doc://id, kg:n_chars, "n"^^xsd:long) triples."""
    docs = load(spark, sf_dir, "documents")
    edges = docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id")).alias("s_lex"),
        F.lit(KG + "n_chars").alias("p_lex"),
        F.lit(KIND_LITERAL).alias("o_kind"),
        F.col("n_chars").cast("string").alias("o_lex"),
        F.lit(XSD + "long").alias("o_dt"),
    )
    return encode_edges(spark, edges)


def _build_geo_dataset(spark: SparkSession, sf_dir: str) -> Dataset:
    """customer→nation (kg:from) and nation→region (kg:in) edges."""
    cust = load(spark, sf_dir, "customer")
    nat = load(spark, sf_dir, "nation")
    e1 = cust.select(
        F.concat(F.lit("cust://"), F.col("c_custkey")).alias("s_lex"),
        F.lit(KG + "from").alias("p_lex"),
        F.concat(F.lit("nation://"), F.col("c_nationkey")).alias("o_lex"),
    )
    e2 = nat.select(
        F.concat(F.lit("nation://"), F.col("n_nationkey")).alias("s_lex"),
        F.lit(KG + "in").alias("p_lex"),
        F.concat(F.lit("region://"), F.col("n_regionkey")).alias("o_lex"),
    )
    return encode_edges(spark, iri_edges(e1.unionByName(e2)))


def _build_chain_dataset(spark: SparkSession, sf_dir: str) -> Dataset:
    """nation-key chain i → i+1 (kg:next) — transitive-closure fixture."""
    nat = load(spark, sf_dir, "nation")
    mx = nat.agg(F.max("n_nationkey")).collect()[0][0]
    edges = nat.filter(F.col("n_nationkey") < mx).select(
        F.concat(F.lit("n://"), F.col("n_nationkey")).alias("s_lex"),
        F.lit(KG + "next").alias("p_lex"),
        F.concat(F.lit("n://"), F.col("n_nationkey") + 1).alias("o_lex"),
    )
    return encode_edges(spark, iri_edges(edges))


def _build_lineitem_rel_dataset(spark: SparkSession, sf_dir: str) -> Dataset:
    """(res://partkey, kg:rel, res://suppkey) — non-linear pattern fixture."""
    li = load(spark, sf_dir, "lineitem")
    edges = li.select(
        F.concat(F.lit("res://"), F.col("l_partkey")).alias("s_lex"),
        F.lit(KG + "rel").alias("p_lex"),
        F.concat(F.lit("res://"), F.col("l_suppkey")).alias("o_lex"),
    ).dropDuplicates()
    return encode_edges(spark, iri_edges(edges))


def _build_orders_signed_dataset(spark: SparkSession, sf_dir: str) -> Dataset:
    """(order://key, kg:open, "1") signed by order status — negative
    facts (sign=false) for non-open orders; the S3 negative-pattern
    fixture over a genuinely signed store."""
    orders = load(spark, sf_dir, "orders")
    edges = orders.select(
        F.concat(F.lit("order://"), F.col("o_orderkey")).alias("s_lex"),
        F.lit(KG + "open").alias("p_lex"),
        F.lit(KIND_LITERAL).alias("o_kind"),
        F.lit("1").alias("o_lex"),
        F.lit(XSD + "string").alias("o_dt"),
        (F.col("o_orderstatus") == "O").alias("sign"),
    )
    return encode_edges(spark, edges)


def _build_orders_conflict_dataset(spark: SparkSession, sf_dir: str) -> Dataset:
    """Signed store with genuine sign conflicts: each order asserts
    (order://key, kg:open, "1") twice — once signed by order status,
    once by priority class.  Orders where the two assertions disagree
    carry BOTH (t, +) and (t, −): the `find_contradictions` fixture."""
    orders = load(spark, sf_dir, "orders")

    def edges(sign_col):
        return orders.select(
            F.concat(F.lit("order://"), F.col("o_orderkey")).alias("s_lex"),
            F.lit(KG + "open").alias("p_lex"),
            F.lit(KIND_LITERAL).alias("o_kind"),
            F.lit("1").alias("o_lex"),
            F.lit(XSD + "string").alias("o_dt"),
            sign_col.alias("sign"),
        )

    e1 = edges(F.col("o_orderstatus") == "O")
    e2 = edges(F.col("o_orderpriority").startswith("1-"))
    return encode_edges(spark, e1.unionByName(e2))


def orders_conflict_dataset(spark: SparkSession, sf_dir: str) -> Dataset:
    return _cached_dataset(
        spark,
        ("orders_conflict", sf_dir),
        lambda: _build_orders_conflict_dataset(spark, sf_dir),
    )


def _build_samever_dataset(spark: SparkSession, sf_dir: str) -> Dataset:
    """Literal-identity fixture for the Eq-merge flow: for each customer
    key v the DECIMAL literals "v" and "v'" are asserted kg:sameVal — a
    sameAs-style equivalence between LITERAL resources (the reference
    interpretation merges literals like any resource).  Odd v pairs two
    DIFFERENT decimals (v' = v + 1_000_000, disjoint from every custkey
    at the tested SFs, so components stay size 2 and the merged facets
    conflict → AmbiguousLiteral); even v self-asserts (v' = v) — a merge
    with a single facet, which must stay clean."""
    cust = load(spark, sf_dir, "customer")
    v = F.col("c_custkey").cast("long")
    edges = cust.select(
        v.cast("string").alias("s_lex"),
        F.lit(KIND_LITERAL).alias("s_kind"),
        F.lit(XSD + "decimal").alias("s_dt"),
        F.lit(KG + "sameVal").alias("p_lex"),
        F.lit(KIND_LITERAL).alias("o_kind"),
        F.when(v % 2 == 1, v + 1_000_000).otherwise(v).cast("string").alias("o_lex"),
        F.lit(XSD + "decimal").alias("o_dt"),
    )
    return encode_edges(spark, edges)


def samever_dataset(spark: SparkSession, sf_dir: str) -> Dataset:
    return _cached_dataset(
        spark, ("samever", sf_dir), lambda: _build_samever_dataset(spark, sf_dir)
    )


def orders_signed_dataset(spark: SparkSession, sf_dir: str) -> Dataset:
    return _cached_dataset(
        spark, ("orders_signed", sf_dir), lambda: _build_orders_signed_dataset(spark, sf_dir)
    )


def mentions_dataset(spark: SparkSession, sf_dir: str, min_token_len: int = 4) -> Dataset:
    return _cached_dataset(
        spark, ("mentions", sf_dir, min_token_len),
        lambda: _build_mentions_dataset(spark, sf_dir, min_token_len),
    )


def nchars_dataset(spark: SparkSession, sf_dir: str) -> Dataset:
    return _cached_dataset(spark, ("nchars", sf_dir), lambda: _build_nchars_dataset(spark, sf_dir))


def geo_dataset(spark: SparkSession, sf_dir: str) -> Dataset:
    return _cached_dataset(spark, ("geo", sf_dir), lambda: _build_geo_dataset(spark, sf_dir))


def chain_dataset(spark: SparkSession, sf_dir: str) -> Dataset:
    return _cached_dataset(spark, ("chain", sf_dir), lambda: _build_chain_dataset(spark, sf_dir))


def lineitem_rel_dataset(spark: SparkSession, sf_dir: str) -> Dataset:
    return _cached_dataset(
        spark, ("lineitem_rel", sf_dir), lambda: _build_lineitem_rel_dataset(spark, sf_dir)
    )


def decode_col(df: DataFrame, terms: DataFrame, id_col: str, out_col: str) -> DataFrame:
    """Decode one id column back to its lexical form via the dictionary."""
    dim = terms.select(F.col("term_id").alias(f"_{id_col}"), F.col("lexical").alias(out_col))
    return df.join(dim, df[id_col] == dim[f"_{id_col}"], "left").drop(f"_{id_col}", id_col)
