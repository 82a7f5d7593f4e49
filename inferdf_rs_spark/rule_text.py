"""Text DSL for rules — the runtime counterpart of the reference's
compile-time macros (rule!/patterns!/statements!/expressions!,
src/macros.rs:11-569).

Grammar (whitespace-insensitive):

    for ?v1, ?v2 { <hypothesis patterns> } => [for ?e1, ?e2] { <statements> }

patterns (each '.'-terminated; leading '!' = negative sign):
    ?x <"iri"> "literal" .            constants: <"iri"> | _:"blank" |
    !?x <"iri"> ?y .                  "str" | "lex"^^"datatype-iri"

statements (each '.'-terminated):
    ?x <"iri"> ?y .                   triple
    ?a = ?b .                         Eq
    (>= ?age 18) .                    True(expression)
    !(...) / !?x <...> ?y .           negative sign

expressions:
    ?var | <"iri"> | _:"blank" | "str" | 123 | 12.5 | /"regex"/ |
    (op e1 e2 ...)  with op ∈ {=, !=, <, <=, >, >=, matches, or, and}
    or any registered custom function name.
"""

from __future__ import annotations

import re

from .rules import (
    Call,
    Conclusion,
    Lit,
    Rule,
    SignedPattern,
    SignedStatement,
    EqStmt,
    TripleStmt,
    TrueStmt,
    Var,
)
from .schemas import XSD_STRING
from .terms import Term

_OPS = {
    "=": "eq",
    "!=": "ne",
    "<": "lt",
    "<=": "leq",
    ">": "gt",
    ">=": "geq",
    "matches": "matches",
    "or": "or",
    "and": "and",
}

_TOKEN_RE = re.compile(
    r"""
    \s*(
        "(?:[^"\\]|\\.)*"      # quoted string
      | \?[A-Za-z_][\w]*       # variable
      | _:(?:"(?:[^"\\]|\\.)*"|[\w]+)   # blank
      | <"(?:[^"\\]|\\.)*">    # iri
      | \^\^ | => | != | <= | >= | [{}().,!=<>/] | for
      | -?\d+(?:\.\d+)?        # number
      | [A-Za-z_][\w]*         # bare word (function name / for)
    )""",
    re.X,
)


def _tokenize(src: str) -> list[str]:
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            if src[pos:].strip() == "":
                break
            raise SyntaxError(f"bad token at: {src[pos:pos+30]!r}")
        out.append(m.group(1))
        pos = m.end()
    return out


def _unquote(s: str) -> str:
    # only quote/backslash escapes are consumed; other backslash
    # sequences (regex escapes like \. \w) pass through untouched
    return re.sub(r'\\(["\\])', r"\1", s[1:-1])


class _P:
    def __init__(self, toks: list[str]):
        self.toks = toks
        self.i = 0
        self.vars: dict[str, int] = {}

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self):
        t = self.peek()
        if t is None:
            raise SyntaxError("unexpected end of rule")
        self.i += 1
        return t

    def expect(self, t):
        got = self.next()
        if got != t:
            raise SyntaxError(f"expected {t!r}, got {got!r}")

    # --- var binding (bind-by-position like the macro's @bind)
    def bind_var(self, name: str) -> int:
        if name not in self.vars:
            self.vars[name] = len(self.vars)
        return self.vars[name]

    def var_list(self):
        names = []
        if self.peek() == "for":
            self.next()
            while True:
                t = self.next()
                if not t.startswith("?"):
                    raise SyntaxError(f"expected ?var, got {t!r}")
                names.append(t)
                if self.peek() == ",":
                    self.next()
                else:
                    break
        return names

    # --- terms/positions
    def position(self):
        t = self.next()
        if t.startswith("?"):
            if t not in self.vars:
                raise SyntaxError(f"unbound variable {t}")
            return Var(self.vars[t])
        return self.constant(t)

    def constant(self, t: str):
        if t.startswith('<"'):
            return Term.iri(_unquote(t[1:-1]))
        if t.startswith("_:"):
            label = t[2:]
            return Term.blank(_unquote(label) if label.startswith('"') else label)
        if t.startswith('"'):
            lex = _unquote(t)
            if self.peek() == "^^":
                self.next()
                dt = self.next()
                if not dt.startswith('"'):
                    raise SyntaxError("datatype must be quoted IRI")
                return Term.literal(lex, _unquote(dt))
            return Term.literal(lex, XSD_STRING)
        raise SyntaxError(f"expected term, got {t!r}")

    # --- expressions
    def expression(self):
        t = self.peek()
        if t == "(":
            self.next()
            op = self.next()
            fn = _OPS.get(op, op)
            args = []
            while self.peek() != ")":
                args.append(self.expression())
            self.expect(")")
            return Call(fn, tuple(args))
        if t == "/":
            self.next()
            rx = self.next()
            if not rx.startswith('"'):
                raise SyntaxError("regex literal must be /\"...\"/")
            self.expect("/")
            return Lit("regex", _unquote(rx))
        if re.fullmatch(r"-?\d+(\.\d+)?", t):
            self.next()
            return Lit("dec", t)
        if t.startswith("?"):
            self.next()
            if t not in self.vars:
                raise SyntaxError(f"unbound variable {t}")
            return Var(self.vars[t])
        if t.startswith('"'):
            self.next()
            if self.peek() == "^^":  # typed literal resource constant
                self.i -= 1
                return self.constant(self.next())
            return Lit("str", _unquote(t))
        return self.constant(self.next())

    # --- patterns / statements
    def sign(self) -> bool:
        if self.peek() == "!":
            self.next()
            return False
        return True

    def pattern(self) -> SignedPattern:
        sg = self.sign()
        s = self.position()
        p = self.position()
        o = self.position()
        self.expect(".")
        return SignedPattern(sg, s, p, o)

    def statement(self) -> SignedStatement:
        sg = self.sign()
        if self.peek() == "(":
            e = self.expression()
            self.expect(".")
            return SignedStatement(sg, TrueStmt(e))
        a = self.expression()
        if self.peek() == "=":
            self.next()
            b = self.expression()
            self.expect(".")
            return SignedStatement(sg, EqStmt(a, b))
        p = self.expression()
        o = self.expression()
        self.expect(".")
        return SignedStatement(sg, TripleStmt(a, p, o))


def parse_rule(src: str) -> Rule:
    p = _P(_tokenize(src))
    hyp_names = p.var_list()
    for n in hyp_names:
        p.bind_var(n)
    n_vars = len(p.vars)

    p.expect("{")
    patterns = []
    while p.peek() != "}":
        patterns.append(p.pattern())
    p.expect("}")
    p.expect("=>")

    ex_names = p.var_list()
    for n in ex_names:
        if n in p.vars:
            raise SyntaxError(f"existential {n} shadows a rule variable")
        p.bind_var(n)
    n_ex = len(ex_names)

    p.expect("{")
    statements = []
    while p.peek() != "}":
        statements.append(p.statement())
    p.expect("}")
    if p.peek() is not None:
        raise SyntaxError(f"trailing tokens: {p.toks[p.i:]}")

    r = Rule(n_vars, tuple(patterns), Conclusion(n_ex, tuple(statements)))
    r.validate()
    return r
