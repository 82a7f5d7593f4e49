"""N-Triples / N-Quads round-trip tests (sources/ntriples.py)."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from inferdf_rs_spark import build_dataset, blank, iri  # noqa: E402
from inferdf_rs_spark.rules import lit  # noqa: E402
from inferdf_rs_spark.schemas import XSD  # noqa: E402
from inferdf_rs_spark.sources.ntriples import from_ntriples, to_ntriples  # noqa: E402


def _decoded(ds):
    """Store as a sorted set of lexical 6-tuples (kind-tagged)."""
    t = ds.terms
    out = ds.triples.select("s", "p", "o", "sign")
    for c in ("s", "p", "o"):
        dim = t.select(
            F.col("term_id").alias(f"{c}_id"),
            F.col("kind").alias(f"{c}_kind"),
            F.col("lexical").alias(f"{c}_lex"),
            F.col("datatype").alias(f"{c}_dt"),
        )
        out = out.join(dim, out[c] == dim[f"{c}_id"]).drop(f"{c}_id", c)
    return sorted(tuple(r) for r in out.collect())


FIXTURE = [
    (iri("http://a"), iri("http://p"), iri("http://b")),
    (blank("x7"), iri("http://p"), lit('he said "hi"\tthen\n\\done')),
    (iri("http://a"), iri("http://q"), lit("3.50", XSD + "decimal")),
    (iri("http://a"), iri("http://q"), lit("plain")),
]


def test_ntriples_roundtrip_positive(spark):
    ds = build_dataset(spark, FIXTURE)
    lines = to_ntriples(ds)
    assert lines.count() == 4
    back = from_ntriples(spark, lines)
    assert _decoded(back) == _decoded(ds)


def test_ntriples_signed_roundtrip_and_standard_skip(spark):
    facts = FIXTURE + [(iri("http://a"), iri("http://p"), iri("http://c"), False)]
    ds = build_dataset(spark, facts)
    lines = to_ntriples(ds, signed=True)
    neg = [r["line"] for r in lines.collect() if r["line"].startswith("# neg ")]
    assert len(neg) == 1 and neg[0].endswith("<http://c> .")
    # signed import restores the negative fact
    assert _decoded(from_ntriples(spark, lines)) == _decoded(ds)
    # a standard parser path (signed=False export) never emits it
    assert to_ntriples(ds).count() == 4


def test_nquads_graph_column(spark):
    facts = [
        (iri("http://a"), iri("http://p"), iri("http://b"), True, iri("http://g1")),
        (iri("http://a"), iri("http://p"), iri("http://c")),
    ]
    ds = build_dataset(spark, facts)
    lines = sorted(r["line"] for r in to_ntriples(ds, quads=True).collect())
    assert lines[0] == "<http://a> <http://p> <http://b> <http://g1> ."
    assert lines[1] == "<http://a> <http://p> <http://c> ."
    back = from_ntriples(spark, to_ntriples(ds, quads=True))
    g_lex = (
        back.triples.join(back.terms, back.triples["g"] == back.terms["term_id"])
        .select("lexical")
        .collect()
    )
    assert [r["lexical"] for r in g_lex] == ["http://g1"]


def test_ntriples_strict_rejects_garbage_and_lang(spark):
    bad = spark.createDataFrame([("<a> <b> not-a-term .",)], "line string")
    with pytest.raises(ValueError, match="unparseable"):
        from_ntriples(spark, bad)
    lang = spark.createDataFrame([('<http://a> <http://p> "hi"@en .',)], "line string")
    with pytest.raises(ValueError, match="lang"):
        from_ntriples(spark, lang)
    # comments and blank lines are skipped, not errors
    ok = spark.createDataFrame(
        [("# a comment",), ("",), ("<http://a> <http://p> <http://b> .",)],
        "line string",
    )
    assert from_ntriples(spark, ok).triples.count() == 1


def test_ntriples_roundtrip_backslash_before_named_escape_chars(spark):
    """ADVICE r5 (high): an escaped backslash immediately followed by
    t/r/n/quote must NOT re-parse as a named escape — '\\\\' boundaries
    win, as in a left-to-right scanner.  The old two-pass unescape
    turned 'C:\\temp' (serialized 'C:\\\\temp') into 'C:<TAB>emp'."""
    nasty = [
        lit("C:\\temp"),            # \ + t
        lit("a\\rest"),             # \ + r
        lit("b\\nope"),             # \ + n
        lit('c\\"quoted'),          # \ + "
        lit("d\\\\tdouble"),        # \ \ + t  (two escaped backslashes)
        lit("e\\\ttab"),            # \ + real TAB
        lit("\\"),                  # lone backslash
    ]
    facts = [(iri(f"http://s{i}"), iri("http://p"), o) for i, o in enumerate(nasty)]
    ds = build_dataset(spark, facts)
    back = from_ntriples(spark, to_ntriples(ds))
    assert _decoded(back) == _decoded(ds)
