"""Front-end for the reference SQL dialect.

Grammar (from ``/root/reference/src/qp/parser/parser.cup:53-268`` and
``scaner.lex:37-163``)::

    query     := SELECT [DISTINCT] (attlist | *) FROM tablelist
                 [WHERE conditionlist]
                 [GROUPBY attlist] [ORDERBY attlist [DESC]]
    attlist   := attribute (, attribute)*
    attribute := tab.col | MIN(tab.col) | MAX(tab.col) | SUM(tab.col)
               | COUNT(tab.col) | AVG(tab.col)
    conditionlist := condition (, condition)*        -- comma = AND
    condition := attribute op "literal" | attribute op attribute
    op        := < | > | <= | >= | = | !=

Dialect quirks replicated deliberately (SURVEY.md §2.3):
- literals are always quoted strings, cast to the LHS column type;
- same-table conditions are selections, cross-table are joins
  (classified by table name, ``SQLQuery.java:51-69``);
- GROUPBY/ORDERBY are single keywords; DESC applies to the whole
  ORDER BY key list;
- ``SELECT *`` is an empty projection list.
"""

from kaj_query_engine_spark.dialect.ast import (
    Attribute,
    Condition,
    SQLQuery,
)
from kaj_query_engine_spark.dialect.parser import parse
from kaj_query_engine_spark.dialect.lowering import lower

__all__ = ["Attribute", "Condition", "SQLQuery", "parse", "lower"]
