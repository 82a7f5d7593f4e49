"""Golden e2e tests ported from the reference test suite.

- citizenship deduction doc-test (reference src/lib.rs:40-77)
- validate_comparison / validation_failure (reference tests/validation.rs:4-21,42-59)
- validate_regex (reference tests/validation.rs:23-40)
"""

from inferdf_rs_spark import (
    System,
    Term,
    blank,
    build_dataset,
    call,
    dec,
    iri,
    pat,
    regex,
    rule,
    stmt_triple,
    stmt_true,
    v,
)
from inferdf_rs_spark.schemas import RDF_TYPE, XSD
from inferdf_rs_spark.terms import decode_triples

EX = "https://example.org/#"


def citizenship_rule():
    # for ?person, ?country { ?person <#citizenOf> ?country } =>
    #   { ?person rdf:type <#Human> }
    return rule(
        variables=2,
        hypothesis=[pat("+", v(0), iri(EX + "citizenOf"), v(1))],
        statements=[stmt_triple("+", v(0), iri(RDF_TYPE), iri(EX + "Human"))],
    )


def test_citizenship_deduction(spark):
    ds = build_dataset(
        spark,
        [(blank("FrançoisDupont"), iri(EX + "citizenOf"), blank("France"))],
    )
    sysm = System(spark, [citizenship_rule()])
    res = sysm.fixpoint(ds)

    assert res.rounds == 2  # round 1 deduces, round 2 is the empty fixpoint check
    decoded = decode_triples(res.store, res.terms.unionByName(sysm.rule_constants_terms()))
    rows = {(r.s_lex, r.p_lex, r.o_lex) for r in decoded.collect()}
    assert rows == {
        ("FrançoisDupont", EX + "citizenOf", "France"),
        ("FrançoisDupont", RDF_TYPE, EX + "Human"),
    }


def test_citizenship_validation_ok(spark):
    # complete graph validates (reference doc-test src/lib.rs:86-103)
    ds = build_dataset(
        spark,
        [
            (blank("FrançoisDupont"), iri(EX + "citizenOf"), blank("France")),
            (blank("FrançoisDupont"), iri(RDF_TYPE), iri(EX + "Human")),
        ],
    )
    sysm = System(spark, [citizenship_rule()])
    assert sysm.validate(ds).is_valid()


def test_citizenship_validation_missing(spark):
    ds = build_dataset(
        spark,
        [(blank("FrançoisDupont"), iri(EX + "citizenOf"), blank("France"))],
    )
    sysm = System(spark, [citizenship_rule()])
    vr = sysm.validate(ds)
    assert not vr.is_valid()
    reasons = [r.reason_kind for r in vr.violations.collect()]
    assert reasons == [0]  # MissingTriple


def age_rule(threshold: int = 18):
    # for ?x, ?age { ?x <#age> ?age } => { (>= ?age 18) }
    return rule(
        variables=2,
        hypothesis=[pat("+", v(0), iri(EX + "age"), v(1))],
        statements=[stmt_true("+", call("geq", v(1), dec(threshold)))],
    )


def test_validate_comparison_ok(spark):
    ds = build_dataset(
        spark,
        [(blank("0"), iri(EX + "age"), Term.literal("21", XSD + "int"))],
    )
    sysm = System(spark, [age_rule()])
    assert sysm.validate(ds).is_valid()


def test_validate_comparison_failure(spark):
    ds = build_dataset(
        spark,
        [(blank("0"), iri(EX + "age"), Term.literal("12", XSD + "int"))],
    )
    sysm = System(spark, [age_rule()])
    vr = sysm.validate(ds)
    assert not vr.is_valid()
    reasons = [r.reason_kind for r in vr.violations.collect()]
    assert reasons == [3]  # NotTrue


def test_validate_regex(spark):
    ds = build_dataset(
        spark,
        [(blank("0"), iri(EX + "email"), Term.literal("user@domain.com"))],
    )
    r = rule(
        variables=2,
        hypothesis=[pat("+", v(0), iri(EX + "email"), v(1))],
        statements=[stmt_true("+", call("matches", regex(r"^[\w\-\.]+@([\w-]+\.)+[\w-]{2,}$"), v(1)))],
    )
    sysm = System(spark, [r])
    assert sysm.validate(ds).is_valid()


def test_validate_regex_failure(spark):
    ds = build_dataset(
        spark,
        [(blank("0"), iri(EX + "email"), Term.literal("not an email"))],
    )
    r = rule(
        variables=2,
        hypothesis=[pat("+", v(0), iri(EX + "email"), v(1))],
        statements=[stmt_true("+", call("matches", regex(r"^[\w\-\.]+@([\w-]+\.)+[\w-]{2,}$"), v(1)))],
    )
    sysm = System(spark, [r])
    assert not sysm.validate(ds).is_valid()
