"""Tokenizer + recursive-descent parser for the reference dialect.

The grammar is LALR-trivial (see ``dialect/__init__`` docstring for the
spec, derived from ``/root/reference/src/qp/parser/parser.cup:53-268``),
so a ~150-line hand parser replaces the reference's JLex+CUP toolchain.
"""

from __future__ import annotations

import re

from kaj_query_engine_spark.dialect.ast import (
    AggType,
    Attribute,
    CompareOp,
    Condition,
    SQLQuery,
)

KEYWORDS = {
    "SELECT",
    "FROM",
    "WHERE",
    "GROUPBY",
    "ORDERBY",
    "DESC",
    "DISTINCT",
    "MIN",
    "MAX",
    "SUM",
    "COUNT",
    "AVG",
}

_TOKEN_RE = re.compile(
    r"""
    \s+
  | (?P<strlit>"[^"]*")
  | (?P<op><=|>=|!=|=|<|>)
  | (?P<punct>[(),.*])
  | (?P<word>[A-Za-z_][A-Za-z_0-9]*)
    """,
    re.VERBOSE,
)


class ParseError(ValueError):
    pass


def tokenize(text: str) -> list[tuple[str, str]]:
    """Returns (kind, value) pairs; kind ∈ {KW, ID, STRLIT, OP, PUNCT}.

    Keywords are case-insensitive (the reference lexer matches them
    case-insensitively, ``scaner.lex:37-99``); identifiers keep their
    original spelling.
    """
    tokens: list[tuple[str, str]] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise ParseError(f"lex error at offset {pos}: {text[pos:pos + 20]!r}")
        pos = m.end()
        if m.lastgroup is None:
            continue  # whitespace
        value = m.group(m.lastgroup)
        if m.lastgroup == "word":
            upper = value.upper()
            if upper in KEYWORDS:
                tokens.append(("KW", upper))
            else:
                tokens.append(("ID", value))
        elif m.lastgroup == "strlit":
            tokens.append(("STRLIT", value[1:-1]))
        elif m.lastgroup == "op":
            tokens.append(("OP", value))
        else:
            tokens.append(("PUNCT", value))
    tokens.append(("EOF", ""))
    return tokens


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.tokens = tokens
        self.i = 0

    def peek(self) -> tuple[str, str]:
        return self.tokens[self.i]

    def next(self) -> tuple[str, str]:
        tok = self.tokens[self.i]
        self.i += 1
        return tok

    def expect(self, kind: str, value: str | None = None) -> str:
        k, v = self.next()
        if k != kind or (value is not None and v != value):
            raise ParseError(f"expected {value or kind}, got {v!r}")
        return v

    def accept(self, kind: str, value: str | None = None) -> bool:
        k, v = self.peek()
        if k == kind and (value is None or v == value):
            self.i += 1
            return True
        return False

    # query := SELECT [DISTINCT] (attlist | *) FROM tablelist
    #          [WHERE conditionlist] [GROUPBY attlist] [ORDERBY attlist [DESC]]
    def parse_query(self) -> SQLQuery:
        self.expect("KW", "SELECT")
        is_distinct = self.accept("KW", "DISTINCT")
        if self.accept("PUNCT", "*"):
            project: list[Attribute] = []  # SELECT * == empty projectList
        else:
            project = self.parse_attlist()
        self.expect("KW", "FROM")
        tables = self.parse_tablelist()
        conditions: list[Condition] = []
        if self.accept("KW", "WHERE"):
            conditions = self.parse_conditionlist()
        groupby: list[Attribute] = []
        orderby: list[Attribute] = []
        is_desc = False
        if self.accept("KW", "GROUPBY"):
            groupby = self.parse_attlist()
        if self.accept("KW", "ORDERBY"):
            orderby = self.parse_attlist()
            is_desc = self.accept("KW", "DESC")
        self.expect("EOF")
        return SQLQuery(
            project_list=project,
            from_list=tables,
            condition_list=conditions,
            groupby_list=groupby,
            orderby_list=orderby,
            is_distinct=is_distinct,
            is_desc=is_desc,
        )

    def parse_attlist(self) -> list[Attribute]:
        attrs = [self.parse_attribute()]
        while self.accept("PUNCT", ","):
            attrs.append(self.parse_attribute())
        return attrs

    def parse_tablelist(self) -> list[str]:
        tables = [self.expect("ID")]
        while self.accept("PUNCT", ","):
            tables.append(self.expect("ID"))
        return tables

    # attribute := tab.col | AGG ( tab.col )
    def parse_attribute(self) -> Attribute:
        kind, value = self.peek()
        if kind == "KW" and value in ("MIN", "MAX", "SUM", "COUNT", "AVG"):
            self.next()
            self.expect("PUNCT", "(")
            inner = self.parse_attribute()
            self.expect("PUNCT", ")")
            if inner.agg is not AggType.NONE:
                raise ParseError("nested aggregates are not allowed")
            return Attribute(inner.table, inner.column, AggType[value])
        table = self.expect("ID")
        self.expect("PUNCT", ".")
        column = self.expect("ID")
        return Attribute(table, column)

    def parse_conditionlist(self) -> list[Condition]:
        conds = [self.parse_condition()]
        while self.accept("PUNCT", ","):
            conds.append(self.parse_condition())
        return conds

    # condition := attribute op ("lit" | attribute)
    def parse_condition(self) -> Condition:
        lhs = self.parse_attribute()
        if lhs.agg is not AggType.NONE:
            raise ParseError("aggregates are not allowed in WHERE")
        op = CompareOp(self.expect("OP"))
        kind, value = self.peek()
        if kind == "STRLIT":
            self.next()
            return Condition(lhs, op, value)
        rhs = self.parse_attribute()
        if rhs.agg is not AggType.NONE:
            raise ParseError("aggregates are not allowed in WHERE")
        return Condition(lhs, op, rhs)


def parse(text: str) -> SQLQuery:
    """Parse one dialect query string into the SQLQuery IR."""
    return _Parser(tokenize(text)).parse_query()
