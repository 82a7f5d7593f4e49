"""Property-based parity for the expression lattice: 200 seeded random
expression trees evaluated by the Spark compiler (one deduce job) must
agree case-for-case with a pure-Python reference evaluator implementing
the Comparable semantics of src/expression/value/comparable.rs:102-124
and the call semantics of src/expression/mod.rs:266-299:

- Eq only within one value space; ordering only Decimal/String;
  Any/Boolean ordered-equal to themselves; incomparable ⇒ false;
- chained n-ary compares convert every REACHED arg to Comparable (the
  loop stops at the first false pair, so conversions past it — and
  their errors — never happen);
- Or/And coerce via require_boolean and short-circuit (a decisive
  earlier arg masks later errors, an earlier error wins);
- resource facets parse by datatype IRI (InvalidLiteral on failure).

The handpicked tests in test_operators pin individual corners; this
fuzz pins the long tail of their compositions.
"""

import random
from decimal import Decimal

from inferdf_rs_spark import Term, call, dec, s_
from inferdf_rs_spark.rules import Call, Lit
from inferdf_rs_spark.schemas import XSD

ERR_NONE, ERR_INV, ERR_UNEXP = 0, 1, 3
EX = "https://example.org/fuzz#"

# term pool (each literal term is one resource carrying one facet)
T_DEC_5 = Term.literal("5", XSD + "int")
T_DEC_2 = Term.literal("2", XSD + "decimal")
T_DEC_BAD = Term.literal("abc", XSD + "int")  # InvalidLiteral facet
T_STR_A = Term.literal("a")
T_STR_AB = Term.literal("ab")
T_BOOL_T = Term.literal("true", XSD + "boolean")
T_BOOL_F = Term.literal("0", XSD + "boolean")
T_IRI_1 = Term.iri(EX + "r1")
T_IRI_2 = Term.iri(EX + "r2")

CMP_LEAVES = [
    dec(1), dec(2), dec("2.5"), s_("a"), s_("b"),
    T_DEC_5, T_DEC_2, T_DEC_BAD, T_STR_A, T_STR_AB,
    T_BOOL_T, T_BOOL_F, T_IRI_1, T_IRI_2,
]
# or/and args: booleans, an Unexpected-producing string, and resources
# whose facets are NOT boolean (require_boolean skips those facet
# spaces entirely → Unexpected, value/literal.rs:32-64 — even when the
# non-boolean facet itself is unparsable)
BOOL_LEAVES = [T_BOOL_T, T_BOOL_F, s_("a"), T_DEC_5, T_DEC_BAD, T_IRI_1]
CMP_OPS = ["eq", "ne", "lt", "leq", "gt", "geq"]


def gen_expr(rng: random.Random, depth: int):
    kind = rng.choice(["cmp", "cmp", "cmp", "bool"])  # compare-heavy
    if kind == "cmp":
        n = rng.choice([1, 2, 2, 3, 3, 4])
        args = [
            gen_expr(rng, depth - 1)
            if depth > 0 and rng.random() < 0.25
            else rng.choice(CMP_LEAVES)
            for _ in range(n)
        ]
        return call(rng.choice(CMP_OPS), *args)
    n = rng.choice([1, 2, 3])
    args = [
        gen_expr(rng, depth - 1)
        if depth > 0 and rng.random() < 0.4
        else rng.choice(BOOL_LEAVES)
        for _ in range(n)
    ]
    return call(rng.choice(["or", "and"]), *args)


# ---------------------------------------------------- reference evaluator


def _conv(term: Term):
    """Comparable::from_resource over the term's single facet."""
    if term.kind != 2:  # iri/blank → Any(identity)
        return ("ok", ("any", (term.kind, term.lexical)))
    dt = term.datatype or XSD + "string"
    if dt == XSD + "boolean":
        if term.lexical in ("true", "1"):
            return ("ok", ("bool", True))
        if term.lexical in ("false", "0"):
            return ("ok", ("bool", False))
        return ("err", ERR_INV)
    if dt in (XSD + "int", XSD + "decimal", XSD + "integer", XSD + "long"):
        try:
            return ("ok", ("dec", Decimal(term.lexical)))
        except Exception:
            return ("err", ERR_INV)
    return ("ok", ("str", term.lexical))


def _cmp_pair(op: str, a, b) -> bool:
    if op in ("eq", "ne"):
        eq = a[0] == b[0] and a[1] == b[1]
        return eq if op == "eq" else not eq
    if a[0] == b[0] and a[0] in ("dec", "str"):
        x, y = a[1], b[1]
        return {"lt": x < y, "leq": x <= y, "gt": x > y, "geq": x >= y}[op]
    if op in ("leq", "geq") and a[0] == b[0] and a[1] == b[1]:
        return True  # Any/Boolean are ordered-equal to themselves
    return False


def ref_eval(e):
    """→ ('ok', value) | ('err', code); value is a Comparable tuple."""
    if isinstance(e, Lit):
        return ("ok", ("dec", Decimal(e.value)) if e.space == "dec" else ("str", e.value))
    if isinstance(e, Term):
        return ("ok", ("res", e))  # conversion is deferred to use sites
    assert isinstance(e, Call)
    vals = []
    for a in e.args:  # arg evaluation precedes the call; first error wins
        r = ref_eval(a)
        if r[0] == "err":
            return r
        vals.append(r[1])
    if e.fn in ("or", "and"):
        decisive = e.fn == "or"
        for v in vals:
            if v[0] == "res":
                # Boolean::from_resource: ONLY boolean-datatype facets
                # are even looked at; others (valid or not) ⇒ Unexpected
                t = v[1]
                if t.kind == 2 and (t.datatype or "") == XSD + "boolean":
                    if t.lexical in ("true", "1"):
                        v = ("bool", True)
                    elif t.lexical in ("false", "0"):
                        v = ("bool", False)
                    else:
                        return ("err", ERR_INV)
                else:
                    return ("err", ERR_UNEXP)
            if v[0] != "bool":
                return ("err", ERR_UNEXP)
            if v[1] == decisive:
                return ("ok", ("bool", decisive))
        return ("ok", ("bool", not decisive))
    # chained comparison — EXACT reference loop shape (mod.rs:284-299):
    # every arg the loop reaches is converted (its error propagates),
    # and the loop stops at the first false adjacent pair
    prev = None
    for v in vals:
        c = _conv(v[1]) if v[0] == "res" else ("ok", v)
        if c[0] == "err":
            return c
        if prev is not None and not _cmp_pair(e.fn, prev, c[1]):
            return ("ok", ("bool", False))
        prev = c[1]
    return ("ok", ("bool", True))


def test_expression_lattice_fuzz_parity(spark):
    # ALL cases compile into ONE single-row projection (the 200-rule
    # deduce alternative builds a 200-way union plan that takes minutes
    # of Catalyst analysis for the same coverage of the value lattice)
    from pyspark.sql import functions as F

    from inferdf_rs_spark.operators.expr import ExprCompiler
    from inferdf_rs_spark.terms import encode_terms

    rng = random.Random(42)
    cases, seen = [], set()
    while len(cases) < 200:
        e = gen_expr(rng, depth=2)
        if repr(e) in seen:
            continue
        seen.add(repr(e))
        cases.append(e)

    all_terms = [T_DEC_5, T_DEC_2, T_DEC_BAD, T_STR_A, T_STR_AB, T_BOOL_T, T_BOOL_F, T_IRI_1, T_IRI_2]
    const_ids = encode_terms(spark, all_terms)
    comp = ExprCompiler(const_ids, facet_vars=set())
    cols = []
    for i, e in enumerate(cases):
        cv = comp.compile(e)
        cols += [cv.b.alias(f"b{i}"), cv.err.alias(f"e{i}")]
    row = spark.range(1).select(*cols).collect()[0]

    mismatches = []
    for i, e in enumerate(cases):
        expected = ref_eval(e)
        got_err, got_b = row[f"e{i}"], row[f"b{i}"]
        if expected[0] == "err":
            ok = got_err == expected[1]
        else:
            ok = got_err == ERR_NONE and got_b == expected[1][1]
        if not ok:
            mismatches.append((e, expected, (got_err, got_b)))
    assert not mismatches, f"{len(mismatches)} parity mismatches; first: {mismatches[0]}"
