"""Logical-plan pretty printer mirroring the reference's ``Debug.PPrint``
(``/root/reference/src/qp/operators/Debug.java:79-121``), which renders
a plan like ``NestedJoin(CUSTOMER [(CUSTOMER.cid)==(CART.cid)] CART)``.

We render the *declared* plan (Scan → Select → Join → Project →
Distinct/OrderBy). The *executed* plan is Catalyst's — inspect it with
``df.explain("formatted")``; this printer exists for parity with the
reference's debugging surface, not as the source of truth.
"""

from __future__ import annotations

from kaj_query_engine_spark.dialect.ast import AggType, Attribute, SQLQuery


def _attr(a: Attribute) -> str:
    if a.agg is not AggType.NONE:
        return f"{a.agg.name}({a.table}.{a.column})"
    return f"{a.table}.{a.column}"


def pprint_query(q: SQLQuery) -> str:
    # scans + selections per table, then join chain in condition order,
    # like RandomInitialPlan's plan construction
    rendered: dict[str, str] = {}
    for t in q.from_list:
        scan = f"Scan({t})"
        for c in q.selections:
            if c.lhs.table.lower() == t.lower():
                rhs = _attr(c.rhs) if isinstance(c.rhs, Attribute) else f'"{c.rhs}"'
                scan = f"Select({scan} [{_attr(c.lhs)}{c.op.value}{rhs}])"
        rendered[t.lower()] = scan
    group: dict[str, str] = {t.lower(): t.lower() for t in q.from_list}

    def find(k: str) -> str:
        while group[k] != k:
            k = group[k]
        return k

    for c in q.joins:
        assert isinstance(c.rhs, Attribute)
        lk, rk = find(c.lhs.table.lower()), find(c.rhs.table.lower())
        expr = f"[({_attr(c.lhs)}){c.op.value}({_attr(c.rhs)})]"
        if lk == rk:
            rendered[lk] = f"Filter({rendered[lk]} {expr})"
        else:
            rendered[lk] = f"Join({rendered[lk]} {expr} {rendered[rk]})"
            group[rk] = lk
    roots = [rendered[k] for k in rendered if find(k) == k]
    node = roots[0]
    for other in roots[1:]:
        node = f"CrossJoin({node} {other})"

    if q.groupby_list:
        keys = ",".join(_attr(a) for a in q.groupby_list)
        node = f"GroupBy({node} [{keys}])"
    if q.project_list:
        cols = ",".join(_attr(a) for a in q.project_list)
        node = f"Project({node} [{cols}])"
    if q.is_distinct:
        node = f"Distinct({node})"
    if q.orderby_list:
        keys = ",".join(_attr(a) for a in q.orderby_list)
        node = f"OrderBy({node} [{keys}]{' DESC' if q.is_desc else ''})"
    return node
