"""Text-DSL parser unit tests (mirror of the reference macro tests,
src/macros.rs:571-621).  Pure Python — no Spark session needed."""

from inferdf_rs_spark.rule_text import parse_rule
from inferdf_rs_spark.rules import (
    Call,
    EqStmt,
    Lit,
    TripleStmt,
    TrueStmt,
    Var,
    rule_from_json,
    rule_to_json,
)
from inferdf_rs_spark.terms import Term


def test_citizenship_rule_text():
    r = parse_rule(
        """
        for ?person, ?country {
            ?person <"https://example.org/#citizenOf"> ?country .
        } => {
            ?person <"http://www.w3.org/1999/02/22-rdf-syntax-ns#type"> <"https://example.org/#Human"> .
        }
        """
    )
    assert r.variables == 2
    assert len(r.hypothesis) == 1
    assert r.hypothesis[0].sign is True
    assert r.hypothesis[0].s == Var(0)
    st = r.conclusion.statements[0].stmt
    assert isinstance(st, TripleStmt) and st.p == Term.iri(
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    )


def test_age_rule_with_expression():
    r = parse_rule(
        """
        for ?x, ?age { ?x <"https://example.org/#age"> ?age . }
        => { (>= ?age 18) . }
        """
    )
    st = r.conclusion.statements[0].stmt
    assert isinstance(st, TrueStmt)
    assert isinstance(st.e, Call) and st.e.fn == "geq"
    assert st.e.args == (Var(1), Lit("dec", "18"))


def test_regex_negative_eq_and_existential():
    r = parse_rule(
        """
        for ?x, ?email {
            ?x <"https://example.org/#email"> ?email .
            !?x <"https://example.org/#banned"> ?x .
        } => for ?z {
            (matches /"^[a-z]+@[a-z]+\\.com$"/ ?email) .
            ?x = ?z .
            ?x <"https://example.org/#verifiedBy"> ?z .
        }
        """
    )
    assert r.variables == 2 and r.conclusion.variables == 1
    neg = r.hypothesis[1]
    assert neg.sign is False and neg.s == Var(0) and neg.o == Var(0)
    kinds = [type(s.stmt) for s in r.conclusion.statements]
    assert kinds == [TrueStmt, EqStmt, TripleStmt]
    m = r.conclusion.statements[0].stmt.e
    assert m.fn == "matches" and m.args[0] == Lit("regex", "^[a-z]+@[a-z]+\\.com$")
    assert r.conclusion.statements[2].stmt.o == Var(2)  # existential numbered after


def test_typed_literal_constants_and_blanks():
    r = parse_rule(
        """
        for ?x {
            _:"node0" <"https://example.org/#age"> "21"^^"http://www.w3.org/2001/XMLSchema#int" .
            ?x <"https://example.org/#knows"> _:alice .
        } => { ?x <"https://example.org/#ok"> "yes" . }
        """
    )
    p0 = r.hypothesis[0]
    assert p0.s == Term.blank("node0")
    assert p0.o == Term.literal("21", "http://www.w3.org/2001/XMLSchema#int")
    assert r.hypothesis[1].o == Term.blank("alice")
    assert r.conclusion.statements[0].stmt.o == Lit("str", "yes")


def test_roundtrip_json():
    r = parse_rule(
        """
        for ?a, ?b { ?a <"kg:next"> ?b . } => { ?b <"kg:prev"> ?a . }
        """
    )
    assert rule_from_json(rule_to_json(r)) == r
