"""Fixed StructTypes for every table the engine touches.

The reference data model is a set of *signed quads* over interpreted
resources (reference: src/lib.rs:140-141 ``Fact<T> = Signed<Triple>``,
src/sign.rs Positive|Negative, src/cause.rs Stated|Entailed).  Spark-side
we dictionary-encode every term to an int64 id (``terms`` dimension) and
keep the fact table fully columnar.
"""

from __future__ import annotations

from pyspark.sql import types as T

# term kinds (reference Term: iri | blank | literal, src/lib.rs:104, README.md:9-13)
KIND_IRI = 0
KIND_BLANK = 1
KIND_LITERAL = 2

XSD = "http://www.w3.org/2001/XMLSchema#"
XSD_STRING = XSD + "string"
XSD_BOOLEAN = XSD + "boolean"
XSD_DECIMAL = XSD + "decimal"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
# reference regex literal datatype (src/expression/value/regex.rs:13)
REGEX_TYPE_IRI = "https://schema.spruceid.com/#Regex"

# the XSD decimal family accepted by the reference's decimal parse
# (xsd_types::DecimalDatatype::from_iri, used at
# src/expression/value/literal.rs:86-101)
XSD_DECIMAL_FAMILY = tuple(
    XSD + n
    for n in (
        "decimal",
        "integer",
        "long",
        "int",
        "short",
        "byte",
        "nonNegativeInteger",
        "nonPositiveInteger",
        "positiveInteger",
        "negativeInteger",
        "unsignedLong",
        "unsignedInt",
        "unsignedShort",
        "unsignedByte",
    )
)

# ---------------------------------------------------------------- terms
# interpretation dictionary: resource id <-> lexical term
TERMS_SCHEMA = T.StructType(
    [
        T.StructField("term_id", T.LongType(), False),
        T.StructField("kind", T.IntegerType(), False),  # 0=iri 1=blank 2=literal
        T.StructField("lexical", T.StringType(), False),
        T.StructField("datatype", T.StringType(), True),  # literals only
        T.StructField("lang", T.StringType(), True),
    ]
)

# --------------------------------------------------------------- triples
# signed fact store with lineage (cause: src/cause.rs:9-40)
CAUSE_STATED = 0
CAUSE_ENTAILED = 1

TRIPLES_SCHEMA = T.StructType(
    [
        T.StructField("s", T.LongType(), False),
        T.StructField("p", T.LongType(), False),
        T.StructField("o", T.LongType(), False),
        T.StructField("sign", T.BooleanType(), False),  # True=Positive
        T.StructField("cause_kind", T.IntegerType(), False),
        T.StructField("rule_id", T.LongType(), True),
        T.StructField("subst_hash", T.LongType(), True),
        T.StructField("round", T.IntegerType(), False),
        T.StructField("src_partition", T.StringType(), True),
        # optional named graph (reference quads: statements carry an
        # optional graph via TripleStatement::with_graph,
        # src/statement.rs:23-29; datasets iterate Signed<Quad>,
        # src/dataset.rs:14-20).  Matching and containment are
        # graph-AGNOSTIC exactly like the reference (canonical patterns
        # match "any graph", src/dataset.rs:55) — g rides through
        # ingest/store/output only; deduced facts land in the default
        # graph (g = null).
        T.StructField("g", T.LongType(), True),
    ]
)

TRIPLE_KEY = ["s", "p", "o", "sign"]

# ---------------------------------------------------------------- pages
# web-pipeline input (BASELINE.json input_hint)
PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

ALIAS_DICT_SCHEMA = T.StructType(
    [
        T.StructField("alias", T.StringType(), False),
        T.StructField("iri", T.StringType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)

# ------------------------------------------------------------- rules
RULES_SCHEMA = T.StructType(
    [
        T.StructField("rule_id", T.LongType(), False),
        T.StructField("spec", T.StringType(), False),  # JSON, serde shape
    ]
)

# value-type codes for the expression compiler (Comparable lattice,
# reference src/expression/value/comparable.rs:11-17)
VT_ANY = 0  # opaque resource
VT_BOOL = 1
VT_DECIMAL = 2
VT_STRING = 3
VT_REGEX = 4

DECIMAL_T = T.DecimalType(38, 18)

# expression-error codes (reference expression::Error,
# src/expression/mod.rs:222-235)
ERR_NONE = 0
ERR_INVALID_LITERAL = 1
ERR_AMBIGUOUS_LITERAL = 2
ERR_UNEXPECTED = 3
ERR_ARITY = 4
