"""Rule IR: the engine's "query language".

Mirrors the serde shape of the reference rule types — ``Rule { variables,
hypothesis, conclusion }`` (reference src/rule/mod.rs:28-34), hypothesis
= conjunction of signed triple patterns (src/rule/hypothesis.rs:11-13),
conclusion = existential-variable count + signed statements
(src/rule/conclusion.rs:8-14), statements = Triple | Eq | True
(src/statement.rs:11-20) over expression trees Resource | Literal | Call
(src/expression/mod.rs:28-32) with built-ins Or/And/Compare/Matches
(src/expression/mod.rs:207-220).

Rules are data (JSON rows), not macros: the reference's ``rule!`` macro
is a compile-time convenience; our loader performs the same variable
counting/validation at load time.
"""

from __future__ import annotations

import hashlib
import json
import re as _re
from dataclasses import dataclass, field

from .terms import Term

# built-in function names (reference BuiltInFunction + ComparisonOperator,
# src/expression/mod.rs:207-220, 315-334)
BUILTINS = {"or", "and", "eq", "ne", "lt", "leq", "gt", "geq", "matches"}
COMPARE_OPS = {"eq", "ne", "lt", "leq", "gt", "geq"}


# Regex-dialect lint (SURVEY §2.5 F4): the reference evaluates Matches
# with the Rust `regex` crate (src/expression/value/regex.rs:19-30); we
# evaluate with the JVM's java.util.regex.  Rules must stay in the
# common subset, so constructs that exist in only one dialect (or change
# meaning) are rejected at load time rather than silently diverging:
# backreferences / lookaround / atomic groups / possessive quantifiers
# (Java-only — Rust's regex crate has none of them) and Java-only escapes.

_JAVA_ONLY_ESCAPES = set("GhHRXv")  # \v: vertical-ws class in Java, VT in Rust


_INTERVAL_RE = _re.compile(r"\{\d+(,\d*)?\}")


def _find_divergent(pattern: str) -> str | None:
    """Left-to-right scan honoring escapes (a single regex over the
    pattern misreads e.g. ``\\++`` — escaped plus then quantifier — as a
    possessive quantifier, and ``\\\\1`` — escaped backslash then '1' —
    as a backreference).  ``[...]`` character classes are skipped (a
    ``+`` after ``*`` *inside a class*, e.g. ``[*+]``, is a literal, not
    a possessive quantifier), and ``}`` counts as quantifiable only when
    it closes a real ``{m,n}`` interval — a literal ``}`` followed by
    ``+`` is an ordinary repeated literal in both dialects."""
    i, n = 0, len(pattern)
    prev_quantifiable = False  # prev token was *, +, ? or an interval closer
    in_class = False
    class_start = -1  # position just after '[' (or '[^') for ']'-literal rule
    interval_close = -1  # index of the '}' closing a pending {m,n}
    while i < n:
        ch = pattern[i]
        if ch == "\\":
            if i + 1 >= n:
                return "\\"
            nxt = pattern[i + 1]
            if not in_class:
                if nxt.isdigit() and nxt != "0":
                    return pattern[i : i + 2]  # numbered backreference
                if nxt in _JAVA_ONLY_ESCAPES:
                    return pattern[i : i + 2]
                if nxt == "k" and i + 2 < n and pattern[i + 2] == "<":
                    return "\\k<"  # named backreference
            elif nxt in _JAVA_ONLY_ESCAPES:
                return pattern[i : i + 2]  # class escapes diverge too
            i += 2
            prev_quantifiable = False
            continue
        if in_class:
            # ']' immediately after '[' / '[^' is a literal in both dialects
            if ch == "]" and i > class_start:
                in_class = False
                # '[..]+' is a plain greedy quantifier (']' itself is not
                # one), so a possessive flag only fires at '[..]++'
                prev_quantifiable = False
            i += 1
            continue
        if ch == "[":
            in_class = True
            class_start = i + (2 if pattern.startswith("[^", i) else 1)
            prev_quantifiable = False
            i += 1
            continue
        if ch == "(" and pattern.startswith("(?", i):
            for bad in ("(?=", "(?!", "(?<=", "(?<!", "(?>"):
                if pattern.startswith(bad, i):
                    return bad
        if ch == "+" and prev_quantifiable:
            return pattern[i - 1 : i + 1]  # possessive quantifier *+ ++ ?+ }+
        if ch == "{" and interval_close < i:
            m = _INTERVAL_RE.match(pattern, i)
            if m:
                interval_close = m.end() - 1
        prev_quantifiable = ch in "*+?" or (ch == "}" and i == interval_close)
        i += 1
    return None


def lint_regex_dialect(pattern: str) -> None:
    """Reject regexes outside the Rust-regex ∩ java.util.regex common
    subset; also reject anything Python's re cannot compile (syntax
    errors diverge unpredictably between engines)."""
    bad = _find_divergent(pattern)
    if bad is not None:
        raise ValueError(
            f"regex {pattern!r} uses {bad!r}: outside the Rust/Java common "
            "dialect subset (backrefs, lookaround, atomic groups, possessive "
            "quantifiers and Java-only escapes are rejected at rule load)"
        )
    try:
        # Python's re spells named groups (?P<name>…) only; Java and Rust
        # both also accept (?<name>…) — translate for the sanity compile
        # (lookbehinds (?<= / (?<! were already handled by the scanner)
        _re.compile(_re.sub(r"\(\?<(?=[A-Za-z])", "(?P<", pattern))
    except _re.error as e:
        raise ValueError(f"regex {pattern!r} does not compile: {e}") from e


@dataclass(frozen=True)
class Var:
    index: int


@dataclass(frozen=True)
class Lit:
    """Expression literal: Decimal | String | Regex
    (reference src/expression/literal.rs:10-19)."""

    space: str  # 'dec' | 'str' | 'regex'
    value: str


@dataclass(frozen=True)
class Call:
    fn: str
    args: tuple  # of Expr


# Expr = Var | Term | Lit | Call
Expr = object


@dataclass(frozen=True)
class SignedPattern:
    """Signed triple pattern; positions are Var or constant Term.

    Non-linear patterns (same var twice) are equality constraints
    (reference src/lib.rs:8-10, src/pattern/mod.rs:16-26).
    """

    sign: bool
    s: Expr
    p: Expr
    o: Expr

    def positions(self):
        return (self.s, self.p, self.o)


@dataclass(frozen=True)
class TripleStmt:
    s: Expr
    p: Expr
    o: Expr


@dataclass(frozen=True)
class EqStmt:
    a: Expr
    b: Expr


@dataclass(frozen=True)
class TrueStmt:
    e: Expr


@dataclass(frozen=True)
class SignedStatement:
    sign: bool
    stmt: object  # TripleStmt | EqStmt | TrueStmt


@dataclass(frozen=True)
class Conclusion:
    variables: int  # existential vars, numbered after rule vars
    statements: tuple = field(default_factory=tuple)


@dataclass(frozen=True)
class Rule:
    variables: int
    hypothesis: tuple  # of SignedPattern
    conclusion: Conclusion

    @property
    def rule_id(self) -> int:
        """Deterministic 63-bit id from the canonical JSON encoding."""
        h = hashlib.sha256(rule_to_json(self).encode()).digest()
        return int.from_bytes(h[:8], "big") & 0x7FFF_FFFF_FFFF_FFFF

    def hypothesis_vars(self) -> set[int]:
        out: set[int] = set()
        for pat in self.hypothesis:
            for pos in pat.positions():
                if isinstance(pos, Var):
                    out.add(pos.index)
        return out

    def conclusion_vars(self) -> set[int]:
        out: set[int] = set()

        def walk(e):
            if isinstance(e, Var):
                out.add(e.index)
            elif isinstance(e, Call):
                for a in e.args:
                    walk(a)

        for st in self.conclusion.statements:
            s = st.stmt
            if isinstance(s, TripleStmt):
                walk(s.s), walk(s.p), walk(s.o)
            elif isinstance(s, EqStmt):
                walk(s.a), walk(s.b)
            else:
                walk(s.e)
        return out

    def constants(self) -> list[Term]:
        """All constant Terms appearing anywhere in the rule (for encoding)."""
        out: list[Term] = []

        def walk(e):
            if isinstance(e, Term):
                out.append(e)
            elif isinstance(e, Call):
                for a in e.args:
                    walk(a)

        for pat in self.hypothesis:
            for pos in pat.positions():
                walk(pos)
        for st in self.conclusion.statements:
            s = st.stmt
            if isinstance(s, TripleStmt):
                walk(s.s), walk(s.p), walk(s.o)
            elif isinstance(s, EqStmt):
                walk(s.a), walk(s.b)
            else:
                walk(s.e)
        return out

    def mints_terms(self) -> bool:
        """True if evaluating this rule can add dictionary entries: it has
        existential variables (fresh blanks) or a non-resource expression
        in a statement position (interned computed literal)."""
        if self.conclusion.variables > 0:
            return True

        def computed(e) -> bool:
            return isinstance(e, (Lit, Call))

        for st in self.conclusion.statements:
            s = st.stmt
            if isinstance(s, TripleStmt) and any(map(computed, (s.s, s.p, s.o))):
                return True
            if isinstance(s, EqStmt) and any(map(computed, (s.a, s.b))):
                return True
            if isinstance(s, TrueStmt) and computed(s.e):
                return True
        return False

    def has_expressions(self) -> bool:
        """True if any statement contains a Call or expression literal —
        i.e. evaluation can produce expression errors."""

        def computed(e) -> bool:
            return isinstance(e, (Lit, Call))

        for st in self.conclusion.statements:
            s = st.stmt
            if isinstance(s, TripleStmt) and any(map(computed, (s.s, s.p, s.o))):
                return True
            if isinstance(s, EqStmt) and any(map(computed, (s.a, s.b))):
                return True
            if isinstance(s, TrueStmt) and computed(s.e):
                return True
        return False

    def has_eq_statements(self) -> bool:
        return any(isinstance(st.stmt, EqStmt) for st in self.conclusion.statements)

    def has_true_statements(self) -> bool:
        return any(isinstance(st.stmt, TrueStmt) for st in self.conclusion.statements)

    def regex_literals(self) -> list[str]:
        """All regex patterns appearing in this rule (expression literals
        with space='regex' and constant Terms typed with the spruceid
        Regex IRI)."""
        from .schemas import REGEX_TYPE_IRI

        out: list[str] = []

        def walk(e):
            if isinstance(e, Lit) and e.space == "regex":
                out.append(e.value)
            elif isinstance(e, Term) and e.datatype == REGEX_TYPE_IRI:
                out.append(e.lexical)
            elif isinstance(e, Call):
                for a in e.args:
                    walk(a)

        for st in self.conclusion.statements:
            s = st.stmt
            if isinstance(s, TripleStmt):
                walk(s.s), walk(s.p), walk(s.o)
            elif isinstance(s, EqStmt):
                walk(s.a), walk(s.b)
            else:
                walk(s.e)
        return out

    def _expression_literals(self) -> list["Lit"]:
        out: list[Lit] = []

        def walk(e):
            if isinstance(e, Lit):
                out.append(e)
            elif isinstance(e, Call):
                for a in e.args:
                    walk(a)

        for st in self.conclusion.statements:
            s = st.stmt
            if isinstance(s, TripleStmt):
                walk(s.s), walk(s.p), walk(s.o)
            elif isinstance(s, EqStmt):
                walk(s.a), walk(s.b)
            else:
                walk(s.e)
        return out

    def validate(self) -> None:
        """Load-time variable sanity (the reference panics at eval time on
        an unbound conclusion var — src/system/deduction.rs:234 unwrap),
        plus literal parsing: the reference's rule! macro parses Decimal
        literals at compile time (src/expression/literal.rs:10-19), so a
        malformed decimal is a LOAD error here, never a silent NULL at
        eval; regex literals get the dialect lint."""
        from decimal import Decimal, InvalidOperation

        for rx in self.regex_literals():
            lint_regex_dialect(rx)
        for lit_ in self._expression_literals():
            if lit_.space == "dec":
                try:
                    Decimal(str(lit_.value))
                except InvalidOperation:
                    raise ValueError(f"malformed decimal literal {lit_.value!r} in rule")
        hvars = self.hypothesis_vars()
        for x in hvars:
            if x >= self.variables:
                raise ValueError(f"hypothesis var ?{x} out of range (variables={self.variables})")
        limit = self.variables + self.conclusion.variables
        for x in self.conclusion_vars():
            if x >= limit:
                raise ValueError(f"conclusion var ?{x} out of range (limit={limit})")
            if x < self.variables and x not in hvars:
                raise ValueError(f"conclusion uses rule var ?{x} not bound by any hypothesis")


# ------------------------------------------------------------- builders


def v(i: int) -> Var:
    return Var(i)


def iri(x: str) -> Term:
    return Term.iri(x)


def blank(x: str) -> Term:
    return Term.blank(x)


def lit(value: str, datatype: str | None = None) -> Term:
    from .schemas import XSD_STRING

    return Term.literal(value, datatype or XSD_STRING)


def dec(x) -> Lit:
    return Lit("dec", str(x))


def s_(x: str) -> Lit:
    return Lit("str", x)


def regex(x: str) -> Lit:
    return Lit("regex", x)


def call(fn: str, *args) -> Call:
    return Call(fn, tuple(args))


def pat(sign, s, p, o) -> SignedPattern:
    return SignedPattern(sign in (True, "+"), s, p, o)


def stmt_triple(sign, s, p, o) -> SignedStatement:
    return SignedStatement(sign in (True, "+"), TripleStmt(s, p, o))


def stmt_eq(sign, a, b) -> SignedStatement:
    return SignedStatement(sign in (True, "+"), EqStmt(a, b))


def stmt_true(sign, e) -> SignedStatement:
    return SignedStatement(sign in (True, "+"), TrueStmt(e))


def rule(variables: int, hypothesis, statements, existentials: int = 0) -> Rule:
    r = Rule(variables, tuple(hypothesis), Conclusion(existentials, tuple(statements)))
    r.validate()
    return r


# ----------------------------------------------------------- JSON codec


def _expr_to_obj(e):
    if isinstance(e, Var):
        return {"var": e.index}
    if isinstance(e, Term):
        from .schemas import KIND_BLANK, KIND_IRI

        if e.kind == KIND_IRI:
            return {"iri": e.lexical}
        if e.kind == KIND_BLANK:
            return {"blank": e.lexical}
        out = {"literal": {"value": e.lexical, "datatype": e.datatype}}
        if e.lang:
            out["literal"]["lang"] = e.lang
        return out
    if isinstance(e, Lit):
        return {"lit": {"space": e.space, "value": e.value}}
    if isinstance(e, Call):
        return {"call": {"fn": e.fn, "args": [_expr_to_obj(a) for a in e.args]}}
    raise TypeError(f"not an expression node: {e!r}")


def _expr_from_obj(o):
    if "var" in o:
        return Var(int(o["var"]))
    if "iri" in o:
        return Term.iri(o["iri"])
    if "blank" in o:
        return Term.blank(o["blank"])
    if "literal" in o:
        from .schemas import XSD_STRING

        lo = o["literal"]
        return Term.literal(lo["value"], lo.get("datatype") or XSD_STRING, lo.get("lang"))
    if "lit" in o:
        return Lit(o["lit"]["space"], o["lit"]["value"])
    if "call" in o:
        fn = o["call"]["fn"]
        return Call(fn, tuple(_expr_from_obj(a) for a in o["call"]["args"]))
    raise ValueError(f"bad expression object: {o!r}")


def _sign_str(sign: bool) -> str:
    return "+" if sign else "-"


def rule_to_obj(r: Rule) -> dict:
    return {
        "variables": r.variables,
        "hypothesis": [
            {"sign": _sign_str(p.sign), "s": _expr_to_obj(p.s), "p": _expr_to_obj(p.p), "o": _expr_to_obj(p.o)}
            for p in r.hypothesis
        ],
        "conclusion": {
            "variables": r.conclusion.variables,
            "statements": [_stmt_to_obj(st) for st in r.conclusion.statements],
        },
    }


def _stmt_to_obj(st: SignedStatement) -> dict:
    s = st.stmt
    if isinstance(s, TripleStmt):
        body = {"triple": {"s": _expr_to_obj(s.s), "p": _expr_to_obj(s.p), "o": _expr_to_obj(s.o)}}
    elif isinstance(s, EqStmt):
        body = {"eq": [_expr_to_obj(s.a), _expr_to_obj(s.b)]}
    else:
        body = {"true": _expr_to_obj(s.e)}
    return {"sign": _sign_str(st.sign), **body}


def _stmt_from_obj(o: dict) -> SignedStatement:
    sign = o.get("sign", "+") == "+"
    if "triple" in o:
        t = o["triple"]
        return SignedStatement(sign, TripleStmt(_expr_from_obj(t["s"]), _expr_from_obj(t["p"]), _expr_from_obj(t["o"])))
    if "eq" in o:
        a, b = o["eq"]
        return SignedStatement(sign, EqStmt(_expr_from_obj(a), _expr_from_obj(b)))
    if "true" in o:
        return SignedStatement(sign, TrueStmt(_expr_from_obj(o["true"])))
    raise ValueError(f"bad statement object: {o!r}")


def rule_to_json(r: Rule) -> str:
    return json.dumps(rule_to_obj(r), sort_keys=True, separators=(",", ":"))


def rule_from_obj(o: dict) -> Rule:
    hyp = tuple(
        SignedPattern(
            p.get("sign", "+") == "+",
            _expr_from_obj(p["s"]),
            _expr_from_obj(p["p"]),
            _expr_from_obj(p["o"]),
        )
        for p in o["hypothesis"]
    )
    concl = o.get("conclusion", {})
    r = Rule(
        int(o["variables"]),
        hyp,
        Conclusion(int(concl.get("variables", 0)), tuple(_stmt_from_obj(s) for s in concl.get("statements", []))),
    )
    r.validate()
    return r


def rule_from_json(s: str) -> Rule:
    return rule_from_obj(json.loads(s))


def load_rules(specs: list[str | dict | Rule]) -> list[Rule]:
    """Parse + dedup a rule list (reference System::insert dedups via a
    HashMap — src/system/mod.rs:58-72; here dedup on canonical JSON)."""
    out: list[Rule] = []
    seen: set[str] = set()
    for spec in specs:
        if isinstance(spec, Rule):
            r = spec
        elif isinstance(spec, dict):
            r = rule_from_obj(spec)
        else:
            r = rule_from_json(spec)
        key = rule_to_json(r)
        if key not in seen:
            seen.add(key)
            out.append(r)
    return out
