"""R-formula mini-compiler (SURVEY.md §1.2) — the reference's query
language, compiled to pyspark Columns instead of model matrices.

Supported surface = exactly what the reference's formulas use
(example-analysis.R:25-32, simulation.R:28-35, awcls.R:114-126):

  response ~ term + term + ...
  ``0`` / ``-1``     suppress the intercept
  ``1``              explicit intercept
  bare names         columns (x1, x2, ...)
  ``a:b`` / ``a*b``  interaction (``*`` expands to mains + interaction)
  ``I(expr)``        arithmetic island: + - * / ^ ( ), numeric
                     literals, ``as.numeric(col)``; inside I(), ``*``
                     is plain multiplication
  ``as.numeric(x)``  cast to double
  ``poly(x, n, raw=TRUE)``-style powers via I(x^k)

Each term compiles to (name, Column); the design is the list of terms
with the intercept first (matching model.matrix column order for these
formulas). ``split_treatment`` factors a moderated term
``I(a_centered * m)`` into its moderator, which is how estimators
consume beta_r formulas.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass
class CompiledFormula:
    response: str | None
    intercept: bool
    terms: list[tuple[str, Column]]  # excludes the intercept

    def design(self) -> list[tuple[str, Column]]:
        out: list[tuple[str, Column]] = []
        if self.intercept:
            out.append(("(Intercept)", F.lit(1.0)))
        out.extend(self.terms)
        return out


_TOKEN_RE = re.compile(
    r"\s*(as\.numeric|[A-Za-z_.][A-Za-z0-9_.]*|\d+\.?\d*|\^|\*|/|\+|-|\(|\))"
)


def _tokenize(s: str) -> list[str]:
    out, i = [], 0
    while i < len(s):
        m = _TOKEN_RE.match(s, i)
        if not m:
            raise ValueError(f"cannot tokenize {s[i:]!r}")
        out.append(m.group(1))
        i = m.end()
    return out


class _ExprParser:
    """Recursive-descent arithmetic for I() islands."""

    def __init__(self, tokens: list[str]):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def eat(self, tok=None):
        t = self.peek()
        if tok is not None and t != tok:
            raise ValueError(f"expected {tok}, got {t}")
        self.i += 1
        return t

    def parse(self) -> Column:
        e = self.expr()
        if self.peek() is not None:
            raise ValueError(f"trailing tokens: {self.toks[self.i:]}")
        return e

    def expr(self) -> Column:
        node = self.term()
        while self.peek() in ("+", "-"):
            op = self.eat()
            rhs = self.term()
            node = node + rhs if op == "+" else node - rhs
        return node

    def term(self) -> Column:
        node = self.power()
        while self.peek() in ("*", "/"):
            op = self.eat()
            rhs = self.power()
            node = node * rhs if op == "*" else node / rhs
        return node

    def power(self) -> Column:
        base = self.atom()
        if self.peek() == "^":
            self.eat("^")
            exp = self.atom()
            return F.pow(base, exp)
        return base

    def atom(self) -> Column:
        t = self.peek()
        if t == "(":
            self.eat("(")
            e = self.expr()
            self.eat(")")
            return e
        if t == "-":
            self.eat("-")
            return -self.atom()
        if t == "as.numeric":
            self.eat()
            self.eat("(")
            e = self.expr()
            self.eat(")")
            return e.cast("double")
        if re.fullmatch(r"\d+\.?\d*", t):
            self.eat()
            return F.lit(float(t))
        # bare column
        self.eat()
        return F.col(t).cast("double")


def _split_top_level(s: str, sep: str) -> list[str]:
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == sep and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


def _compile_term(term: str) -> list[tuple[str, Column]]:
    """One formula term → design columns (a*b expands to 3 columns)."""
    if term.startswith("I(") and term.endswith(")"):
        inner = term[2:-1]
        return [(term, _ExprParser(_tokenize(inner)).parse())]
    if term == "1":
        return [("(Intercept)", F.lit(1.0))]
    if "*" in term:
        a, b = (t.strip() for t in term.split("*", 1))
        a_cols = _compile_term(a)
        b_cols = _compile_term(b)
        out = a_cols + b_cols
        for bn, bc in b_cols:
            for an, ac in a_cols:
                out.append((f"{an}:{bn}", ac * bc))
        return out
    if ":" in term:
        a, b = (t.strip() for t in term.split(":", 1))
        (an, ac), (bn, bc) = _compile_term(a)[0], _compile_term(b)[0]
        return [(f"{an}:{bn}", ac * bc)]
    if term.startswith("as.numeric(") and term.endswith(")"):
        return [(term, _ExprParser(_tokenize(term)).parse())]
    return [(term, F.col(term).cast("double"))]


def compile_formula(formula: str) -> CompiledFormula:
    """Parse ``y ~ rhs`` (or bare ``~ rhs``) into design columns."""
    if "~" in formula:
        lhs, rhs = formula.split("~", 1)
        response = lhs.strip() or None
    else:
        response, rhs = None, formula
    intercept = True
    terms: list[tuple[str, Column]] = []
    seen: set[str] = set()
    for raw in _split_top_level(rhs.strip(), "+"):
        if raw == "0" or raw == "-1":
            intercept = False
            continue
        if raw == "1":
            intercept = True
            continue
        for name, col in _compile_term(raw):
            if name == "(Intercept)":
                intercept = True
                continue
            if name not in seen:
                seen.add(name)
                terms.append((name, col))
    return CompiledFormula(response=response, intercept=intercept, terms=terms)


def split_treatment(
    formula: str, treatment: str = "a_centered"
) -> list[tuple[str, Column]]:
    """Factor each beta_r-style term ``I(a_centered * m1 * m2)`` into
    its moderator product (reference: X_beta_r / a_centered). The
    treatment symbol must appear as a top-level factor of every term."""
    cf = compile_formula(formula)
    if cf.intercept:
        raise ValueError("treatment formulas must suppress the intercept (0 + ...)")
    mods: list[tuple[str, Column]] = []
    for name, _ in cf.terms:
        if not (name.startswith("I(") and name.endswith(")")):
            if name == treatment:
                mods.append(("1", F.lit(1.0)))
                continue
            raise ValueError(f"term {name!r} does not contain {treatment}")
        inner = name[2:-1]
        factors = _split_top_level(inner, "*")
        if treatment not in factors:
            raise ValueError(f"term {name!r} does not contain {treatment}")
        rest = [f for f in factors if f != treatment]
        if not rest:
            mods.append(("1", F.lit(1.0)))
        else:
            expr = _ExprParser(_tokenize("*".join(rest))).parse()
            mods.append(("*".join(rest), expr))
    return mods
