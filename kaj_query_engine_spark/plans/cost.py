"""Plan cost estimation — the analog of the reference's ``PlanCost``
(``/root/reference/src/qp/optimizer/PlanCost.java:23-266``) and the
``EXPLAIN COST`` half of ``QueryMain.printFinalPlan``
(``/root/reference/src/QueryMain.java:142-180``).

Same estimation rules, Spark-native stats source:

- The reference reads ``<table>.stat`` files (row count + one distinct
  count per attribute, ``PlanCost.java:215-266``). Here
  :func:`collect_stats` derives the same numbers from the DataFrame in
  ONE column-pruned scan with ``approx_count_distinct`` (HLL++ —
  mergeable partial aggregates, so the stats pass itself scales).
- Selectivities mirror ``PlanCost.getStatistics(Select)``
  (``PlanCost.java:170-211``): ``=`` → 1/V(attr), ``!=`` → 1 - 1/V,
  range → 1/2; distinct counts scale down with the output.
- Join cardinality mirrors ``getStatistics(Join)``
  (``PlanCost.java:117-137``): |L|·|R| / max(V_l, V_r) per equality
  conjunct, V updated to min(V_l, V_r).
- Page-I/O cost formulas mirror ``PlanCost.java:144-159`` for the
  reference's three join algorithms, plus Spark-strategy formulas
  (broadcast-hash / shuffle-hash) so the estimate can be read against
  what Catalyst actually picks.

This is a *declared-plan* estimator for the reference dialect; the
executed plan is Catalyst's (inspect with ``df.explain("cost")`` once
CBO stats exist — ``session.py`` enables ``spark.sql.cbo.enabled``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kaj_query_engine_spark.dialect.ast import Attribute, CompareOp, SQLQuery
from kaj_query_engine_spark.plans.pprint import pprint_query

PAGE_SIZE = 8192  # bytes/page; the reference's Batch.getPageSize() analog
ATTR_BYTES = 8  # flat per-attribute width (reference uses typed widths)


@dataclass
class TableStats:
    """Row count + per-column distinct counts — the ``.stat`` file
    payload (``PlanCost.java:215-266``)."""

    num_rows: int
    distinct: dict[str, int] = field(default_factory=dict)
    num_cols: int = 0

    def v(self, column: str, default_rows: int) -> int:
        return max(1, self.distinct.get(column.lower(), default_rows))


def collect_stats(df: DataFrame, columns: list[str] | None = None) -> TableStats:
    """One scan → TableStats: count(*) + approx_count_distinct per
    column, all as partial aggregates (no shuffle of data rows, only
    the HLL sketches merge). The Spark analog of generating a
    ``.stat`` file."""
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("_n")] + [
        F.approx_count_distinct(c).alias(c) for c in cols
    ]
    row = df.agg(*aggs).collect()[0]
    return TableStats(
        num_rows=int(row["_n"]),
        distinct={c.lower(): max(1, int(row[c])) for c in cols},
        num_cols=len(df.columns),
    )


def _pages(rows: int, num_cols: int) -> int:
    capacity = max(1, PAGE_SIZE // max(1, num_cols * ATTR_BYTES))
    return math.ceil(rows / capacity)


@dataclass
class CostEstimate:
    rows: int
    pages_io: int
    details: list[str] = field(default_factory=list)


class PlanCost:
    """Estimate (rows, page I/Os) for a dialect query bottom-up:
    Scan → Select (free, on the fly) → Join chain (cost by strategy),
    mirroring the reference's traversal (``PlanCost.java:71-85``)."""

    def __init__(
        self,
        stats: dict[str, TableStats],
        join_type: str = "broadcast",
        strict_compat: bool = False,
    ):
        self.stats = {k.lower(): v for k, v in stats.items()}
        self.join_type = join_type
        self.strict_compat = strict_compat
        self.num_buff = 10  # BufferManager.getBuffersPerJoin() analog

    def estimate(self, q: SQLQuery) -> CostEstimate:
        # live per-table (rows, distinct-map) after selections
        rows: dict[str, int] = {}
        dv: dict[str, dict[str, int]] = {}
        details: list[str] = []
        for t in q.from_list:
            tl = t.lower()
            if tl not in self.stats:
                raise KeyError(f"no stats for table {t}; collect_stats() it first")
            st = self.stats[tl]
            rows[tl] = st.num_rows
            dv[tl] = dict(st.distinct)
            details.append(f"Scan({t}): {st.num_rows} rows")
        # selections: on-the-fly, no I/O cost (PlanCost.java:168-170)
        for c in q.selections:
            if self.strict_compat and isinstance(c.rhs, Attribute):
                # the reference never builds a Select operator for a
                # same-table attr-op-attr condition (quirk §2.3.8), so
                # its cost walk never sees one — strict estimates must
                # not charge selectivity for a condition the engine
                # drops
                continue
            tl = c.lhs.table.lower()
            n = rows[tl]
            v = max(1, dv[tl].get(c.lhs.column.lower(), n))
            if c.op is CompareOp.EQ and not isinstance(c.rhs, Attribute):
                out = math.ceil(n / v)
            elif c.op is CompareOp.NEQ and not isinstance(c.rhs, Attribute):
                out = math.ceil(n - n / v)
            else:
                out = math.ceil(0.5 * n)
            if self.strict_compat:
                # Reproduce the reference's selectivity-propagation BUG
                # verbatim (PlanCost.java:204-209): the loop computes
                # ``newvalue = ceil(outtuples/intuples * oldvalue)`` —
                # the intended uniform rescale — but then executes
                # ``ht.put(attri, outtuples)``, so every attribute's
                # distinct count becomes the OUTPUT ROW COUNT. For a
                # low-cardinality column (V(gender)=2) a selection that
                # keeps 100 rows RAISES its distinct count to 100,
                # deflating every later join-cardinality estimate that
                # divides by max(V_l, V_r). Bit-faithful display for
                # compat mode (including storing a raw 0 when the
                # estimate is 0 rows — use sites guard their own
                # divisions); never the default.
                for col in dv[tl]:
                    dv[tl][col] = out
            else:
                # corrected propagation: distinct counts can only
                # shrink with the surviving rows
                for col in dv[tl]:
                    dv[tl][col] = min(dv[tl][col], max(1, out))
            rows[tl] = max(0, out)
            details.append(
                f"Select({c.lhs.qualified()}{c.op.value}…): → {rows[tl]} rows"
            )
        # join chain in condition order, page-cost per strategy
        group = {t.lower(): t.lower() for t in q.from_list}

        def find(k: str) -> str:
            while group[k] != k:
                k = group[k]
            return k

        cost_pages = 0
        for c in q.joins:
            assert isinstance(c.rhs, Attribute)
            lk, rk = find(c.lhs.table.lower()), find(c.rhs.table.lower())
            vl = dv[lk].get(c.lhs.column.lower(), rows[lk])
            vr = dv[rk].get(c.rhs.column.lower(), rows[rk])
            if lk == rk:  # second condition on an already-joined pair
                rows[lk] = math.ceil(rows[lk] / max(1, max(vl, vr)))
                continue
            ncl = max(1, self.stats[lk].num_cols if lk in self.stats else 8)
            ncr = max(1, self.stats[rk].num_cols if rk in self.stats else 8)
            lp, rp = _pages(rows[lk], ncl), _pages(rows[rk], ncr)
            out = math.ceil(rows[lk] * rows[rk] / max(1, max(vl, vr)))
            jc = self._join_pages(lp, rp)
            cost_pages += jc
            details.append(
                f"Join[{self.join_type}]({lk}⋈{rk} on "
                f"{c.lhs.qualified()}{c.op.value}{c.rhs.qualified()}): "
                f"{jc} page I/Os → {out} rows"
            )
            # merged stats: min distinct on the join key (PlanCost.java:133-136)
            mind = min(vl, vr)
            dv[lk].update(dv[rk])
            dv[lk][c.lhs.column.lower()] = mind
            dv[lk][c.rhs.column.lower()] = mind
            rows[lk] = out
            group[rk] = lk
        roots = [k for k in rows if find(k) == k]
        total = 1
        for r in roots:
            total *= max(rows[r], 0) if rows[r] else 0
        if q.is_distinct or q.groupby_list:
            keys = q.groupby_list or q.project_list
            caps = []
            root = roots[0] if roots else None
            for a in keys:
                tl = a.table.lower()
                caps.append(dv.get(tl, {}).get(a.column.lower(), total))
            if caps:
                total = min(total, math.prod(caps))
        return CostEstimate(rows=total, pages_io=cost_pages, details=details)

    def _join_pages(self, lp: int, rp: int) -> int:
        # reference formulas (PlanCost.java:144-159) + Spark strategies
        if self.join_type == "nested":
            return lp + lp * rp
        if self.join_type == "blocknested":
            return lp + math.ceil(lp / max(1, self.num_buff - 2)) * rp
        if self.join_type == "sortmerge":
            def sort_cost(p: int) -> int:
                if p <= 1:
                    return 2 * p
                passes = 1 + math.ceil(
                    math.log(max(1, math.ceil(p / self.num_buff)))
                    / math.log(max(2, self.num_buff - 1))
                )
                return 2 * p * passes

            return sort_cost(lp) + sort_cost(rp) + lp + rp
        if self.join_type == "shufflehash":
            # shuffle write+read both sides, then one probe pass
            return 3 * (lp + rp)
        # broadcast-hash: stream the big side once, ship the small side
        return max(lp, rp) + 2 * min(lp, rp)


def explain_cost(
    q: SQLQuery,
    stats: dict[str, TableStats],
    join_type: str = "broadcast",
    strict_compat: bool = False,
) -> str:
    """``printFinalPlan``-style rendering: the declared plan, the
    estimated page-I/O cost, and the estimated output rows
    (``QueryMain.java:142-180`` prints the plan then
    ``Expected cost: <pc.getCost(root)>``).

    ``strict_compat=True`` reproduces the reference's
    selectivity-propagation bug (see ``PlanCost.estimate``) so the
    cost display matches the reference number-for-number; the default
    uses the corrected propagation."""
    est = PlanCost(stats, join_type, strict_compat=strict_compat).estimate(q)
    lines = [
        "----------------------Execution Plan----------------",
        pprint_query(q),
        f"Expected cost: {est.pages_io} page I/Os, ~{est.rows} rows",
    ]
    lines += [f"  {d}" for d in est.details]
    return "\n".join(lines)
