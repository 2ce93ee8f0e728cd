"""Dialect IR — the analog of the reference's ``SQLQuery`` clause-list IR
(``/root/reference/src/qp/utils/SQLQuery.java:11-25``) plus its
``Attribute``/``Condition`` helpers, as plain dataclasses.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum


class AggType(Enum):
    NONE = "none"
    MIN = "min"
    MAX = "max"
    SUM = "sum"
    COUNT = "count"
    AVG = "avg"


class CompareOp(Enum):
    LT = "<"
    GT = ">"
    LTE = "<="
    GTE = ">="
    EQ = "="
    NEQ = "!="


@dataclass(frozen=True)
class Attribute:
    """``tab.col`` with an optional aggregate wrapper
    (cf. ``src/qp/utils/Attribute.java:26-57``)."""

    table: str
    column: str
    agg: AggType = AggType.NONE

    def display(self) -> str:
        """Output header name, matching the reference's result printer:
        plain columns print as ``col``; aggregated ones as
        ``AGG(tab.col)`` (``src/QueryMain.java:276-290``)."""
        if self.agg is AggType.NONE:
            return self.column
        return f"{self.agg.name}({self.table}.{self.column})"

    def qualified(self) -> str:
        return f"{self.table}.{self.column}"


@dataclass(frozen=True)
class Condition:
    """One WHERE conjunct: ``lhs op rhs`` where rhs is a quoted string
    literal (selection) or another attribute
    (cf. ``src/qp/utils/Condition.java``)."""

    lhs: Attribute
    op: CompareOp
    rhs: "Attribute | str"  # str = literal (always lexed as a string)

    @property
    def is_join(self) -> bool:
        """Cross-table attr-vs-attr conditions are joins; everything
        else (literal rhs, or same-table attr-vs-attr) is a selection —
        classification purely by table name, mirroring
        ``SQLQuery.java:51-69``."""
        return isinstance(self.rhs, Attribute) and self.rhs.table != self.lhs.table


@dataclass
class SQLQuery:
    """Parsed query: plain clause lists, nothing resolved yet."""

    project_list: list[Attribute]  # empty == SELECT *
    from_list: list[str]
    condition_list: list[Condition] = field(default_factory=list)
    groupby_list: list[Attribute] = field(default_factory=list)
    orderby_list: list[Attribute] = field(default_factory=list)
    is_distinct: bool = False
    is_desc: bool = False

    @property
    def selections(self) -> list[Condition]:
        return [c for c in self.condition_list if not c.is_join]

    @property
    def joins(self) -> list[Condition]:
        return [c for c in self.condition_list if c.is_join]

    @property
    def has_aggregates(self) -> bool:
        return any(a.agg is not AggType.NONE for a in self.project_list)
