"""N-Triples / N-Quads interop (W3C RDF 1.1 plain-text syntax).

The reference engine is generic over ``rdf_types`` terms
(src/lib.rs:104-108) whose lexical forms ARE the N-Triples forms
(``<iri>``, ``_:blank``, ``"literal"^^<dt>`` — README.md:9-13); this
module is the X2 generic-backend extension that lets a store round-trip
through the standard interchange format.

Everything is JVM-side string expressions — serialization is a map-only
projection after the dictionary decode joins, parsing is a map-only
regexp_extract pass before the bulk encode.  Both directions stream at
scan speed at any corpus size; neither introduces a shuffle beyond the
dictionary join / encode the engine already does.

N-Triples has no negative facts: ``to_ntriples`` exports the positive
slice by default; ``signed=True`` writes the nonstandard ``# neg``
comment prefix before each negative fact so a signed store survives the
round-trip (foreign consumers simply skip comments).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..encode import encode_edges
from ..engine import Dataset
from ..schemas import KIND_BLANK, KIND_IRI, KIND_LITERAL, XSD_STRING

_RDF_LANGSTRING = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"


def _escape_literal(col: Column) -> Column:
    """RDF 1.1 string escape: backslash first, then quote + controls."""
    out = F.regexp_replace(col, r"\\", r"\\\\")
    out = F.regexp_replace(out, '"', '\\\\"')
    out = F.regexp_replace(out, "\n", "\\\\n")
    out = F.regexp_replace(out, "\r", "\\\\r")
    out = F.regexp_replace(out, "\t", "\\\\t")
    return out


def _unescape_literal(col: Column) -> Column:
    """Single-pass unescape: split on ESCAPED BACKSLASH first, apply the
    named escapes inside each segment (where every remaining backslash
    begins a named escape), then re-join with a literal backslash.
    Applying named escapes over the whole string first mis-parsed an
    escaped backslash followed by t/r/n (``C:\\\\temp`` serialized from
    ``C:\\temp`` came back as ``C:<TAB>emp``) — the round-trip guarantee
    requires the ``\\\\`` boundary to win, exactly as a left-to-right
    scanner would."""

    def _named(s: Column) -> Column:
        out = F.regexp_replace(s, r"\\t", "\t")
        out = F.regexp_replace(out, r"\\r", "\r")
        out = F.regexp_replace(out, r"\\n", "\n")
        return F.regexp_replace(out, r'\\"', '"')

    return F.array_join(F.transform(F.split(col, r"\\\\"), _named), "\\")


def format_term(kind: Column, lexical: Column, datatype: Column, lang: Column) -> Column:
    """One term's N-Triples token from its dictionary row."""
    lit_body = F.concat(F.lit('"'), _escape_literal(lexical), F.lit('"'))
    lit = (
        F.when(lang.isNotNull(), F.concat(lit_body, F.lit("@"), lang))
        .when(
            datatype.isNotNull() & (datatype != XSD_STRING),
            F.concat(lit_body, F.lit("^^<"), datatype, F.lit(">")),
        )
        .otherwise(lit_body)  # xsd:string stays bare per RDF 1.1
    )
    return (
        F.when(kind == KIND_IRI, F.concat(F.lit("<"), lexical, F.lit(">")))
        .when(kind == KIND_BLANK, F.concat(F.lit("_:"), lexical))
        .otherwise(lit)
    )


def _decode_position(df: DataFrame, terms: DataFrame, id_col: str, out: str) -> DataFrame:
    dim = terms.select(
        F.col("term_id").alias(f"_{id_col}_id"),
        format_term(
            F.col("kind"), F.col("lexical"), F.col("datatype"), F.col("lang")
        ).alias(out),
    )
    return df.join(dim, df[id_col] == dim[f"_{id_col}_id"]).drop(f"_{id_col}_id", id_col)


def to_ntriples(ds: Dataset, signed: bool = False, quads: bool = False) -> DataFrame:
    """Serialize the store: one ``line`` per fact, ``<s> <p> <o> .``
    (``quads=True`` appends the graph label for non-default graphs —
    N-Quads).  Negative facts are dropped unless ``signed=True``, which
    prefixes them with ``# neg `` (a comment to standard parsers)."""
    trips = ds.triples if signed else ds.triples.filter(F.col("sign"))
    cols = ["s", "p", "o"] + (["g"] if quads and "g" in ds.triples.columns else [])
    proj = trips.select(*cols, "sign")
    out = _decode_position(proj, ds.terms, "s", "ts")
    out = _decode_position(out, ds.terms, "p", "tp")
    out = _decode_position(out, ds.terms, "o", "to")
    body = [F.col("ts"), F.lit(" "), F.col("tp"), F.lit(" "), F.col("to")]
    if quads and "g" in cols:
        gdim = ds.terms.select(
            F.col("term_id").alias("_g_id"),
            F.concat(F.lit(" <"), F.col("lexical"), F.lit(">")).alias("tg"),
        )
        out = out.join(gdim, out["g"] == gdim["_g_id"], "left").drop("_g_id", "g")
        body.append(F.coalesce(F.col("tg"), F.lit("")))
    line = F.concat(*body, F.lit(" ."))
    if signed:
        line = F.when(F.col("sign"), line).otherwise(F.concat(F.lit("# neg "), line))
    return out.select(line.alias("line"))


# one term token: <iri> | _:bnode | "lit"(@lang | ^^<dt>)?
_TERM_RX = r'(<[^>]*>|_:[^ \t]+|"(?:[^"\\]|\\.)*"(?:@[A-Za-z0-9-]+|\^\^<[^>]*>)?)'
_WS = r"[ \t]+"
_LINE_RX = f"^(# neg )?{_TERM_RX}{_WS}{_TERM_RX}{_WS}{_TERM_RX}({_WS}{_TERM_RX})?{_WS}?\\.$"


def _parse_term(tok: Column, prefix: str) -> dict[str, Column]:
    """Split one token into (kind, lex, dt, lang) edge columns."""
    is_iri = tok.startswith("<")
    is_blank = tok.startswith("_:")
    body = F.regexp_extract(tok, r'^"((?:[^"\\]|\\.)*)"', 1)
    dt = F.regexp_extract(tok, r'\^\^<([^>]*)>$', 1)
    lang = F.regexp_extract(tok, r'@([A-Za-z0-9-]+)$', 1)
    return {
        f"{prefix}_kind": F.when(is_iri, F.lit(KIND_IRI))
        .when(is_blank, F.lit(KIND_BLANK))
        .otherwise(F.lit(KIND_LITERAL)),
        f"{prefix}_lex": F.when(is_iri, F.expr(f"substring({prefix}_tok, 2, length({prefix}_tok) - 2)"))
        .when(is_blank, F.substring(tok, 3, 1 << 24))
        .otherwise(_unescape_literal(body)),
        f"{prefix}_dt": F.when(is_iri | is_blank, F.lit(None).cast("string"))
        .when(dt != "", dt)
        .when(lang != "", F.lit(_RDF_LANGSTRING))
        .otherwise(F.lit(XSD_STRING)),
        f"{prefix}_lang": F.when(
            ~is_iri & ~is_blank & (lang != ""), lang
        ).otherwise(F.lit(None).cast("string")),
    }


def from_ntriples(spark: SparkSession, lines: DataFrame, strict: bool = True) -> Dataset:
    """Parse a ``line: string`` frame (``spark.read.text`` output) back
    into an encoded Dataset.  Comment/blank lines are skipped — except
    the ``# neg`` signed extension, which parses as a negative fact.
    ``strict=True`` raises on any non-comment line that fails to parse
    (a silently dropped fact would corrupt the store)."""
    raw = lines.select(F.trim(F.col(lines.columns[0])).alias("line")).filter(
        F.length("line") > 0
    )
    content = raw.filter(
        ~F.col("line").startswith("#") | F.col("line").startswith("# neg ")
    )
    toks = content.select(
        "line",
        (~F.col("line").startswith("# neg ")).alias("sign"),
        F.regexp_extract("line", _LINE_RX, 2).alias("s_tok"),
        F.regexp_extract("line", _LINE_RX, 3).alias("p_tok"),
        F.regexp_extract("line", _LINE_RX, 4).alias("o_tok"),
        F.regexp_extract("line", _LINE_RX, 6).alias("g_tok"),
    )
    if strict:
        # one probe action for both failure classes: unparseable lines,
        # and lang-tagged literals (the dictionary has no lang facet on
        # the encode path yet — dropping the tag silently would corrupt
        # the store, so refuse loudly)
        has_lang = F.col("o_tok").rlike(r'"@[A-Za-z0-9-]+$')
        bad = (
            toks.select(
                "line",
                F.when(F.col("s_tok") == "", F.lit("unparseable"))
                .when(has_lang, F.lit("lang-tagged literal (unsupported)"))
                .alias("why"),
            )
            .filter(F.col("why").isNotNull())
            .limit(5)
            .collect()
        )
        if bad:
            raise ValueError(
                f"N-Triples import rejected: {bad[0]['why']}: {bad[0]['line']!r}"
            )
    toks = toks.filter(F.col("s_tok") != "")
    edges = toks
    for prefix in ("s", "p", "o"):
        for name, col in _parse_term(F.col(f"{prefix}_tok"), prefix).items():
            edges = edges.withColumn(name, col)
    edges = edges.select(
        F.col("s_lex"),
        F.col("s_kind"),
        F.col("s_dt"),
        F.col("p_lex").alias("p_lex"),
        F.col("o_kind"),
        F.col("o_lex"),
        F.col("o_dt"),
        F.col("sign"),
        F.when(F.col("g_tok") != "", F.expr("substring(g_tok, 2, length(g_tok) - 2)"))
        .otherwise(F.lit(None).cast("string"))
        .alias("g_lex"),
    )
    return encode_edges(spark, edges)
