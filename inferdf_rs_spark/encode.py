"""Bulk dataset encoding: raw lexical edge tables → (triples, terms).

The distributed form of the reference's interpretation insertion
(caller-side ``insert`` of stated facts, src/lib.rs:66,
src/dataset.rs:106-108): every term is hashed to its id in one map-only
pass (no sequential interner), the dictionary is the distinct union of
the three term positions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .engine import Dataset
from .schemas import CAUSE_STATED, KIND_IRI, TRIPLE_KEY
from .terms import term_id_col


def dedup_triples(df: DataFrame) -> DataFrame:
    """Set-collapse stated facts on the triple key with a DETERMINISTIC
    tie-break on the remaining columns (lexicographically-least struct,
    so e.g. the minimum named-graph id survives).

    ``dropDuplicates(TRIPLE_KEY)`` keeps an *arbitrary* row per key: when
    one (s,p,o,sign) is stated in several named graphs the retained ``g``
    (and provenance) would vary across runs — at odds with the engine's
    determinism guarantees.  Same shuffle cost as dropDuplicates (one
    hash exchange + partial agg), plus a cheap struct assembly."""
    others = [c for c in df.columns if c not in TRIPLE_KEY]
    if not others:
        return df.dropDuplicates(TRIPLE_KEY)
    return (
        df.groupBy(*TRIPLE_KEY)
        .agg(F.min(F.struct(*[F.col(c) for c in others])).alias("_rest"))
        .select(*TRIPLE_KEY, "_rest.*")
    )


def term_rows(df: DataFrame, kind, lexical, datatype=None, distinct: bool = True) -> DataFrame:
    """Build dictionary rows from one lexical column (pre-deduped sources
    can pass distinct=False and skip the shuffle)."""
    null_s = F.lit(None).cast("string")
    out = df.select(
        (F.lit(kind) if isinstance(kind, int) else kind).alias("kind"),
        F.col(lexical).alias("lexical") if isinstance(lexical, str) else lexical.alias("lexical"),
        (null_s if datatype is None else (F.lit(datatype) if isinstance(datatype, str) else datatype)).alias(
            "datatype"
        ),
    )
    if distinct:
        out = out.dropDuplicates()
    return out.select(
        term_id_col(F.col("kind"), F.col("lexical"), F.col("datatype"), null_s).alias("term_id"),
        "kind",
        "lexical",
        "datatype",
        null_s.alias("lang"),
    )


def encode_edges(
    spark: SparkSession,
    edges: DataFrame,
    src_partition: str = "stated",
    terms: DataFrame | None = None,
) -> Dataset:
    """Encode an edge DataFrame into a (triples, terms) Dataset.

    ``edges`` columns: ``s_lex`` (iri), ``p_lex`` (iri), ``o_kind``,
    ``o_lex``, ``o_dt`` (datatype for literal objects, null otherwise),
    plus optional ``g_lex`` (named-graph iri — reference quads; null or
    absent = default graph) and optional ``sign`` (explicitly-negative
    facts, reference Signed wrapper src/sign.rs:123-129; absent = all
    positive).  Optional ``s_kind``/``s_dt`` columns generalize the
    subject position beyond IRIs (the reference's subjects are arbitrary
    interpreted resources, literals included — src/dataset.rs:13-24).

    ``terms``: optionally a pre-built dictionary covering every term in
    the edges — callers that know their term sources (e.g. urls are
    unique per page, entities come from a broadcast dict) skip the
    expensive 3-projection distinct over the full edge table.
    """
    null_s = F.lit(None).cast("string")
    has_g = "g_lex" in edges.columns
    s_kind = F.col("s_kind") if "s_kind" in edges.columns else F.lit(KIND_IRI)
    s_dt = F.col("s_dt") if "s_dt" in edges.columns else null_s
    if terms is None:
        terms = (
            edges.select(s_kind.alias("kind"), F.col("s_lex").alias("lexical"), s_dt.alias("datatype"))
            .unionByName(
                edges.select(F.lit(KIND_IRI).alias("kind"), F.col("p_lex").alias("lexical"), null_s.alias("datatype"))
            )
            .unionByName(
                edges.select(F.col("o_kind").alias("kind"), F.col("o_lex").alias("lexical"), F.col("o_dt").alias("datatype"))
            )
        )
        if has_g:
            terms = terms.unionByName(
                edges.filter(F.col("g_lex").isNotNull()).select(
                    F.lit(KIND_IRI).alias("kind"), F.col("g_lex").alias("lexical"), null_s.alias("datatype")
                )
            )
        terms = terms.dropDuplicates().select(
            term_id_col(F.col("kind"), F.col("lexical"), F.col("datatype"), null_s).alias("term_id"),
            "kind",
            "lexical",
            "datatype",
            null_s.alias("lang"),
        )
    g_col = (
        F.when(
            F.col("g_lex").isNotNull(),
            term_id_col(F.lit(KIND_IRI), F.col("g_lex"), null_s, null_s),
        )
        if has_g
        else F.lit(None).cast("long")
    )
    triples = edges.select(
        term_id_col(s_kind, F.col("s_lex"), s_dt, null_s).alias("s"),
        term_id_col(F.lit(KIND_IRI), F.col("p_lex"), null_s, null_s).alias("p"),
        term_id_col(F.col("o_kind"), F.col("o_lex"), F.col("o_dt"), null_s).alias("o"),
        (F.col("sign") if "sign" in edges.columns else F.lit(True)).alias("sign"),
        F.lit(CAUSE_STATED).alias("cause_kind"),
        F.lit(None).cast("long").alias("rule_id"),
        F.lit(None).cast("long").alias("subst_hash"),
        F.lit(0).alias("round"),
        F.lit(src_partition).alias("src_partition"),
        g_col.alias("g"),
    )
    return Dataset(triples, terms)


def iri_edges(edges: DataFrame) -> DataFrame:
    """Mark the object column of an (s_lex, p_lex, o_lex) table as IRIs."""
    return edges.withColumn("o_kind", F.lit(KIND_IRI)).withColumn("o_dt", F.lit(None).cast("string"))
