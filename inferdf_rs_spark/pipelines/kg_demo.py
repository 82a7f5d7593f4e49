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

from ..engine import Dataset
from ..schemas import CAUSE_STATED, KIND_IRI, KIND_LITERAL, XSD
from ..terms import term_id_col

KG = "kg:"
TOKEN_SPLIT = "[^a-z0-9]+"


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


def _edges_to_dataset(spark: SparkSession, edges: DataFrame) -> Dataset:
    """Encode an edge DataFrame into a (triples, terms) Dataset.

    ``edges`` columns: s_lex (iri), p_lex (iri), o_kind, o_lex, o_dt.
    """
    null_s = F.lit(None).cast("string")
    terms = (
        edges.select(F.lit(KIND_IRI).alias("kind"), F.col("s_lex").alias("lexical"), null_s.alias("datatype"))
        .unionByName(edges.select(F.lit(KIND_IRI).alias("kind"), F.col("p_lex").alias("lexical"), null_s.alias("datatype")))
        .unionByName(edges.select(F.col("o_kind").alias("kind"), F.col("o_lex").alias("lexical"), F.col("o_dt").alias("datatype")))
        .dropDuplicates()
        .select(
            term_id_col(F.col("kind"), F.col("lexical"), F.col("datatype"), null_s).alias("term_id"),
            "kind",
            "lexical",
            "datatype",
            null_s.alias("lang"),
        )
    )
    triples = edges.select(
        term_id_col(F.lit(KIND_IRI), F.col("s_lex"), null_s, null_s).alias("s"),
        term_id_col(F.lit(KIND_IRI), F.col("p_lex"), null_s, null_s).alias("p"),
        term_id_col(F.col("o_kind"), F.col("o_lex"), F.col("o_dt"), null_s).alias("o"),
        F.lit(True).alias("sign"),
        F.lit(CAUSE_STATED).alias("cause_kind"),
        F.lit(None).cast("long").alias("rule_id"),
        F.lit(None).cast("long").alias("subst_hash"),
        F.lit(0).alias("round"),
        F.lit("stated").alias("src_partition"),
    )
    return Dataset(triples, terms)


def _iri_obj(edges: DataFrame) -> DataFrame:
    return edges.withColumn("o_kind", F.lit(KIND_IRI)).withColumn("o_dt", F.lit(None).cast("string"))


def mentions_dataset(spark: SparkSession, sf_dir: str, min_token_len: int = 4) -> Dataset:
    """(doc://id, kg:mentions, "token"^^xsd:string) triples."""
    toks = doc_tokens(load(spark, sf_dir, "documents"), min_token_len)
    edges = toks.select(
        F.concat(F.lit("doc://"), F.col("doc_id")).alias("s_lex"),
        F.lit(KG + "mentions").alias("p_lex"),
        F.lit(KIND_LITERAL).alias("o_kind"),
        F.col("token").alias("o_lex"),
        F.lit(XSD + "string").alias("o_dt"),
    )
    return _edges_to_dataset(spark, edges)


def nchars_dataset(spark: SparkSession, sf_dir: str) -> Dataset:
    """(doc://id, kg:n_chars, "n"^^xsd:long) triples."""
    docs = load(spark, sf_dir, "documents")
    edges = docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id")).alias("s_lex"),
        F.lit(KG + "n_chars").alias("p_lex"),
        F.lit(KIND_LITERAL).alias("o_kind"),
        F.col("n_chars").cast("string").alias("o_lex"),
        F.lit(XSD + "long").alias("o_dt"),
    )
    return _edges_to_dataset(spark, edges)


def geo_dataset(spark: SparkSession, sf_dir: str) -> Dataset:
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
    return _edges_to_dataset(spark, _iri_obj(e1.unionByName(e2)))


def chain_dataset(spark: SparkSession, sf_dir: str) -> Dataset:
    """nation-key chain i → i+1 (kg:next) — transitive-closure fixture."""
    nat = load(spark, sf_dir, "nation")
    mx = nat.agg(F.max("n_nationkey")).collect()[0][0]
    edges = nat.filter(F.col("n_nationkey") < mx).select(
        F.concat(F.lit("n://"), F.col("n_nationkey")).alias("s_lex"),
        F.lit(KG + "next").alias("p_lex"),
        F.concat(F.lit("n://"), F.col("n_nationkey") + 1).alias("o_lex"),
    )
    return _edges_to_dataset(spark, _iri_obj(edges))


def lineitem_rel_dataset(spark: SparkSession, sf_dir: str) -> Dataset:
    """(res://partkey, kg:rel, res://suppkey) — non-linear pattern fixture."""
    li = load(spark, sf_dir, "lineitem")
    edges = li.select(
        F.concat(F.lit("res://"), F.col("l_partkey")).alias("s_lex"),
        F.lit(KG + "rel").alias("p_lex"),
        F.concat(F.lit("res://"), F.col("l_suppkey")).alias("o_lex"),
    ).dropDuplicates()
    return _edges_to_dataset(spark, _iri_obj(edges))


def decode_col(df: DataFrame, terms: DataFrame, id_col: str, out_col: str) -> DataFrame:
    """Decode one id column back to its lexical form via the dictionary."""
    dim = terms.select(F.col("term_id").alias(f"_{id_col}"), F.col("lexical").alias(out_col))
    return df.join(dim, df[id_col] == dim[f"_{id_col}"], "left").drop(f"_{id_col}", id_col)
