"""Interpretation layer: dictionary-encoding of RDF terms to int64 ids.

The reference is generic over an ``Interpretation`` mapping resources to
lexical terms (reference: src/lib.rs:104, interpretation traits used at
src/system/deduction.rs:136-137, src/expression/mod.rs:380-394).  Spark
equivalent: a ``terms`` dimension DataFrame with **deterministic**
hash-based ids — ``xxhash64(kind, lexical, datatype, lang)`` — so that
re-runs, resumed checkpoints and independently-encoded rule constants
all agree without any sequential id generator (which cannot be
replicated distributedly; reference's generator: src/rule/mod.rs:230-233).

One resource id may carry several literal facets only after Eq-closure
merging (reference ReverseTermInterpretation allows several literals per
resource); ``resource_facets`` exposes the parsed-facet view with the
reference's refine/ambiguity semantics
(src/expression/value/comparable.rs:39-89).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .schemas import (
    DECIMAL_T,
    ERR_AMBIGUOUS_LITERAL,
    ERR_INVALID_LITERAL,
    ERR_NONE,
    KIND_BLANK,
    KIND_IRI,
    KIND_LITERAL,
    REGEX_TYPE_IRI,
    TERMS_SCHEMA,
    VT_ANY,
    VT_BOOL,
    VT_DECIMAL,
    VT_REGEX,
    VT_STRING,
    XSD_BOOLEAN,
    XSD_DECIMAL_FAMILY,
    XSD_STRING,
)

# sentinel for null datatype/lang inside the hash (never a legal IRI/tag)
_NULL_S = "\x00"


@dataclass(frozen=True)
class Term:
    """Driver-side term value: IRI | blank node | literal.

    Mirrors the three lexical forms of the reference's ``Term``
    (reference README.md:9-13).
    """

    kind: int
    lexical: str
    datatype: str | None = None
    lang: str | None = None

    @staticmethod
    def iri(value: str) -> "Term":
        return Term(KIND_IRI, value)

    @staticmethod
    def blank(label: str) -> "Term":
        return Term(KIND_BLANK, label)

    @staticmethod
    def literal(value: str, datatype: str = XSD_STRING, lang: str | None = None) -> "Term":
        return Term(KIND_LITERAL, value, datatype, lang)


def term_id_col(kind: Column, lexical: Column, datatype: Column, lang: Column) -> Column:
    """Deterministic term id: xxhash64 over the four facets (nulls → sentinel)."""
    return F.xxhash64(
        kind.cast("int"),
        lexical,
        F.coalesce(datatype, F.lit(_NULL_S)),
        F.coalesce(lang, F.lit(_NULL_S)),
    )


def terms_df(spark: SparkSession, terms: list[Term]) -> DataFrame:
    """Build a ``terms`` dimension DataFrame (with ids) from driver-side terms."""
    rows = [(t.kind, t.lexical, t.datatype, t.lang) for t in sorted(set(terms), key=lambda t: (t.kind, t.lexical, t.datatype or "", t.lang or ""))]
    base = spark.createDataFrame(rows, schema="kind int, lexical string, datatype string, lang string")
    return base.select(
        term_id_col(F.col("kind"), F.col("lexical"), F.col("datatype"), F.col("lang")).alias("term_id"),
        "kind",
        "lexical",
        "datatype",
        "lang",
    )


def encode_terms(spark: SparkSession, terms: list[Term]) -> dict[Term, int]:
    """Resolve driver-side terms (rule constants, test fixtures) to ids.

    Runs one tiny Spark job so the ids are byte-identical with the
    Spark-side ``xxhash64`` used for bulk encoding — no Python
    reimplementation of the hash to drift.
    """
    uniq = list(dict.fromkeys(terms))
    if not uniq:
        return {}
    df = terms_df(spark, uniq)
    out: dict[Term, int] = {}
    for r in df.collect():
        out[Term(r["kind"], r["lexical"], r["datatype"], r["lang"])] = r["term_id"]
    return {t: out[t] for t in uniq}


def encode_term_batch(df: DataFrame, kind: str = "kind", lexical: str = "lexical", datatype: str = "datatype", lang: str = "lang") -> DataFrame:
    """Add a ``term_id`` column to a DataFrame of raw term facets."""
    return df.withColumn(
        "term_id", term_id_col(F.col(kind), F.col(lexical), F.col(datatype), F.col(lang))
    )


def empty_terms(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], TERMS_SCHEMA)


def merge_terms(*dfs: DataFrame) -> DataFrame:
    """Union + dedup of terms dimensions (id is function of content)."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out.dropDuplicates(["term_id"])


def audit_collisions(terms: DataFrame) -> DataFrame:
    """64-bit hash-collision audit: ids carrying >1 distinct lexical form.

    At 10^12-term scale the birthday bound makes collisions possible;
    run this after bulk encoding and fail the job if non-empty (the
    mitigation is a 128-bit id mode — out of scope until it trips).
    """
    return (
        terms.groupBy("term_id")
        .agg(F.count_distinct("kind", "lexical", "datatype", "lang").alias("n"))
        .filter(F.col("n") > 1)
    )


# --------------------------------------------------------------- facets


def resource_facets(terms: DataFrame, eq_mapping: DataFrame | None = None) -> DataFrame:
    """Parsed literal facets per resource.

    Implements the reference's typed-literal refinement
    (src/expression/value/comparable.rs:39-89): per literal, the
    datatype IRI selects the facet space — xsd:boolean → Boolean,
    any XSD decimal-family type → Decimal, xsd:string → String, the
    spruceid Regex IRI → Regex; anything else contributes no facet
    (the resource stays opaque/Any).  Unparseable lexical forms are
    InvalidLiteral errors; conflicting facets on one (Eq-merged)
    resource are AmbiguousLiteral errors.

    Returns columns: ``res, vtype, b, d, s, r, lex, lex_ambig, err``.
    ``lex`` is the raw lexical form of the resource's literal — kept for
    *all* literals, even non-facet datatypes, because the reference's
    ``require_any_literal`` (src/expression/value/mod.rs:83-126) returns
    the raw lexical regardless of datatype and reports AmbiguousLiteral
    on distinct lexicals.

    ``eq_mapping`` (optional): DataFrame ``(term_id, res)`` from
    Eq-closure; without it each term is its own resource.
    """
    lit = terms.filter(F.col("kind") == KIND_LITERAL)

    dt = F.col("datatype")
    lex = F.col("lexical")
    # Null-safe datatype predicates: with a null datatype, ``dt.isin(...)``
    # is NULL (not false) and ``And(null, x)`` still evaluates x — which
    # under an ANSI-on session makes the decimal cast below throw on
    # non-numeric lexicals.  The engine must be ANSI-robust regardless of
    # session config, so every predicate is coalesced to false.
    is_bool = F.coalesce(dt == XSD_BOOLEAN, F.lit(False))
    is_dec = F.coalesce(dt.isin(list(XSD_DECIMAL_FAMILY)), F.lit(False))
    is_str = F.coalesce(dt == XSD_STRING, F.lit(False))
    is_re = F.coalesce(dt == REGEX_TYPE_IRI, F.lit(False))

    b = F.when(lex.isin("true", "1"), F.lit(True)).when(lex.isin("false", "0"), F.lit(False))
    # try_cast, never cast: malformed decimals must become NULL (then an
    # InvalidLiteral error row, matching reference
    # src/expression/value/literal.rs:86-101) — not an ANSI runtime crash.
    d = lex.try_cast(DECIMAL_T)

    parsed = lit.select(
        F.col("term_id").alias("res"),
        F.when(is_bool, VT_BOOL)
        .when(is_dec, VT_DECIMAL)
        .when(is_str, VT_STRING)
        .when(is_re, VT_REGEX)
        .otherwise(VT_ANY)
        .alias("vtype"),
        F.when(is_bool, b).alias("b"),
        F.when(is_dec, d).alias("d"),
        F.when(is_str, lex).alias("s"),
        F.when(is_re, lex).alias("r"),
        lex.alias("lex"),
        F.lit(False).alias("lex_ambig"),
        F.when(is_bool & b.isNull(), ERR_INVALID_LITERAL)
        .when(is_dec & d.isNull(), ERR_INVALID_LITERAL)
        .otherwise(ERR_NONE)
        .alias("err"),
    )

    if eq_mapping is None:
        return parsed

    # Eq-merged resources: re-key literals to their canonical resource and
    # apply the refine rule — distinct facets conflict ⇒ AmbiguousLiteral
    # (src/expression/value/comparable.rs:80-89).
    mapped = (
        parsed.join(eq_mapping.withColumnRenamed("res", "canon"), parsed.res == eq_mapping.term_id, "left")
        .withColumn("res2", F.coalesce(F.col("canon"), F.col("res")))
        .select(F.col("res2").alias("res"), "vtype", "b", "d", "s", "r", "lex", "err")
    )
    agg = mapped.groupBy("res").agg(
        F.collect_set(
            F.when(F.col("vtype") != VT_ANY, F.struct("vtype", "b", "d", "s", "r"))
        ).alias("facets"),
        F.collect_set("lex").alias("lexs"),
        F.max("err").alias("perr"),
    )
    f0 = F.col("facets")[0]
    one = F.size("facets") == 1
    return agg.select(
        "res",
        F.when(one, f0["vtype"]).otherwise(F.lit(VT_ANY)).alias("vtype"),
        F.when(one, f0["b"]).alias("b"),
        F.when(one, f0["d"]).alias("d"),
        F.when(one, f0["s"]).alias("s"),
        F.when(one, f0["r"]).alias("r"),
        F.col("lexs")[0].alias("lex"),
        (F.size("lexs") > 1).alias("lex_ambig"),
        F.when(F.col("perr") != ERR_NONE, F.col("perr"))
        .when(F.size("facets") > 1, F.lit(ERR_AMBIGUOUS_LITERAL))
        .otherwise(F.lit(ERR_NONE))
        .alias("err"),
    )


def decode_triples(triples: DataFrame, terms: DataFrame) -> DataFrame:
    """Join triple ids back to lexical forms for human-readable output.

    Three broadcast-able joins against the dictionary (the dimension is
    tiny relative to the fact table only in tests; at scale Catalyst/AQE
    picks sort-merge — decode is an output-edge op, not a hot path).
    """
    t = terms.select("term_id", "kind", "lexical", "datatype")
    out = triples
    for pos in ("s", "p", "o"):
        tt = t.select(
            F.col("term_id").alias(f"_{pos}_id"),
            F.col("kind").alias(f"{pos}_kind"),
            F.col("lexical").alias(f"{pos}_lex"),
            F.col("datatype").alias(f"{pos}_dt"),
        )
        out = out.join(tt, out[pos] == tt[f"_{pos}_id"], "left").drop(f"_{pos}_id")
    return out
