"""Core workload: the reference's query surface (SURVEY.md §2.1/§2.3),
transliterated onto the driver's TPC-H-ish fixture schema, plus the
§2.4 categories Spark provides natively (joins beyond inner, windows,
set ops, cube/rollup, limit, scalar functions).

The reference-surface queries (q01–q10) run through the dialect
front-end (``KajEngine.sql``) so the correctness gate exercises the
parser + lowering, not just hand-built DataFrames. Everything else is
DataFrame-API.

Determinism notes (the driver hash-compares against DuckDB):
- aggregates over doubles are rounded on BOTH sides (summation order
  differs at the last bit between engines);
- every window/top-k orders by a unique key as tiebreak;
- integer sums are cast to BIGINT in the oracle (DuckDB widens to
  HUGEINT, Spark to long).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kaj_query_engine_spark.catalog import _read_parquet
from kaj_query_engine_spark.engine import KajEngine
from kaj_query_engine_spark.workload.registry import register


import weakref

# per-session fixture memo: every workload builder re-reading its
# tables through _read_parquet costs a conf round-trip + parquet
# footer probe + scan analysis (~0.1 s each, ~100 table-loads over
# the 50-query bench). DataFrames are immutable plans, so handing the
# same object back is safe; keying by the session object (weakly)
# keeps nothing alive after the session is stopped.
_FIXTURE_MEMO: weakref.WeakKeyDictionary = weakref.WeakKeyDictionary()


def source_token(path: str) -> tuple:
    """Cheap staleness token for anything derived from a fixture file:
    the driver regenerates fixture parquet BETWEEN rounds, and a
    memoized DataFrame (or a materialized layout copy) derived from
    the old file would otherwise be served stale. stat() of the
    parquet dir/file (mtime ticks on rewrite) invalidates. Shared by
    the fixture memo here and the q35 layout cache in workload.scale —
    one rule, one implementation."""
    import os

    try:
        st = os.stat(path)
        return (st.st_mtime_ns, st.st_size)
    except OSError:
        return ("missing",)


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    per_session = _FIXTURE_MEMO.setdefault(spark, {})
    path = f"{sf_dir}/{name}.parquet"
    key = (sf_dir, name, source_token(path))
    if key not in per_session:
        # drop any entry for an older generation of the same table
        for stale in [k for k in per_session if k[:2] == (sf_dir, name)]:
            del per_session[stale]
        per_session[key] = _read_parquet(spark, path)
    return per_session[key]


# DuckDB oracle mirror of dsum() below — keep in lockstep
DSUM_V_SQL = "CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)"

# DuckDB mirror of functions.text.doc_fingerprint — ONE definition for
# the q50 / q40 / q82 oracles ({col} is the qualified text column); a
# normalization change must never need a three-file hunt.
# EXPLICIT whitespace class, not \s: Java \s includes vertical tab
# (\x0B) but RE2's does not, so a \x0B doc would fingerprint
# differently across the two engines — both dialects now spell the
# Java set [ \t\n\x0B\f\r] out (parity pinned in test_text_filters)
FP_SQL = "md5(regexp_replace(lower(trim({col})), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))"


def dsum(col, scale: int = 2):
    """Hash-stable SUM over doubles: cast each term to DECIMAL(18,6) so
    the sum is exact and independent of partition/summation order (a
    double sum differs between engines at the last bit, which flips
    round() at boundaries). The ROUND happens on the DECIMAL — both
    engines round decimals HALF_UP (away from zero), while rounding the
    intermediate double diverges on exact half-boundaries. Oracle-side
    mirror: ``CAST(round(sum(CAST(x AS DECIMAL(18,6))), scale) AS DOUBLE)``."""
    return F.round(F.sum(col.cast("decimal(18,6)")), scale).cast("double")


def _dialect(query_text: str):
    """Run a reference-dialect query through the full front-end."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        eng = KajEngine(spark)
        eng.load_fixtures(sf_dir)
        return eng.sql(query_text)

    return run


# --------------------------------------------------------------------
# Reference surface via the dialect front-end (SURVEY §2.1)
# --------------------------------------------------------------------

register(
    "q01_scan",
    "SELECT * FROM region",
    "full table scan (reference query1.sql; Scan operator, "
    "src/qp/operators/Scan.java:30-117)",
)(_dialect("SELECT * FROM region"))

register(
    "q02_select_distinct_orderby",
    "SELECT DISTINCT c_custkey, c_acctbal FROM customer "
    "WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 9000",
    "filter (string-cast + numeric-cast literals, comma-AND) + project "
    "+ driver-side DISTINCT + whole-list-DESC ORDER BY in one dialect "
    "query (reference query2/query9/query10.sql; Select/Project "
    "operators, QueryMain.java:205-261 DISTINCT/ORDER-BY-last quirk). "
    "Hash compare is order-insensitive; the sort itself is covered in "
    "tests/.",
)(
    _dialect(
        "SELECT DISTINCT customer.c_custkey, customer.c_acctbal FROM customer "
        'WHERE customer.c_mktsegment = "BUILDING", customer.c_acctbal>"9000" '
        "ORDERBY customer.c_custkey DESC"
    )
)

register(
    "q03_agg_witness",
    "SELECT DISTINCT o_orderstatus, "
    '(SELECT count(*) FROM orders) AS "COUNT(orders.o_orderkey)", '
    '(SELECT CAST(sum(o_custkey) AS BIGINT) FROM orders) AS "SUM(orders.o_custkey)", '
    '(SELECT min(o_totalprice) FROM orders) AS "MIN(orders.o_totalprice)", '
    '(SELECT max(o_orderkey) FROM orders) AS "MAX(orders.o_orderkey)", '
    "o_totalprice FROM orders "
    "WHERE o_totalprice = (SELECT min(o_totalprice) FROM orders)",
    "ungrouped aggregate: all four accumulators (COUNT/SUM/MIN/MAX, "
    "AggregateAttribute.java:38-115) + bare columns resolved by "
    "witness-row semantics — MIN beats MAX, ties emit all tying "
    "distinct rows (reference query3.sql; Aggregate.java:123-150)",
)(
    _dialect(
        "SELECT orders.o_orderstatus, COUNT(orders.o_orderkey), "
        "SUM(orders.o_custkey), MIN(orders.o_totalprice), "
        "MAX(orders.o_orderkey), orders.o_totalprice FROM orders"
    )
)

register(
    "q07_join4",
    "SELECT c_name, o_orderkey, p_name, l_quantity "
    "FROM customer JOIN orders ON c_custkey = o_custkey "
    "JOIN lineitem ON o_orderkey = l_orderkey "
    "JOIN part ON l_partkey = p_partkey "
    "WHERE p_retailprice > 950 AND p_retailprice < 960",
    "4-way join chain (reference query5/query10.sql shape)",
)(
    _dialect(
        "SELECT customer.c_name, orders.o_orderkey, part.p_name, lineitem.l_quantity "
        "FROM customer,orders,lineitem,part "
        "WHERE customer.c_custkey=orders.o_custkey,"
        "orders.o_orderkey=lineitem.l_orderkey,lineitem.l_partkey=part.p_partkey,"
        'part.p_retailprice>"950",part.p_retailprice<"960"'
    )
)

register(
    "q10_theta_join",
    "SELECT s_suppkey, n_nationkey FROM supplier JOIN nation "
    "ON s_nationkey < n_nationkey",
    "theta-join executed with its real comparator (the reference parses "
    "any op but executes equality — SURVEY §2.3.2; we do it right)",
)(
    _dialect(
        "SELECT supplier.s_suppkey, nation.n_nationkey FROM supplier,nation "
        "WHERE supplier.s_nationkey<nation.n_nationkey"
    )
)


# --------------------------------------------------------------------
# GROUP BY (parseable in the reference, unimplemented there — §2.2)
# --------------------------------------------------------------------


@register(
    "q11_groupby_having",
    "SELECT l_returnflag, l_linestatus, "
    "CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty, "
    "CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_base, "
    "CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_disc, "
    "count(*) AS n FROM lineitem GROUP BY l_returnflag, l_linestatus "
    "HAVING count(*) >= 1000",
    "TPC-H Q1-style grouped aggregation (map-side partial agg + one "
    "shuffle) + HAVING filter on the aggregate",
)
def q11(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "sum_disc"
            ),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("n") >= 1000)
    )


# --------------------------------------------------------------------
# Join family beyond inner (SURVEY §2.4 — free in Spark, exposed here)
# --------------------------------------------------------------------


@register(
    "q13_join_variants",
    "SELECT 'outer' AS tag, n_nationkey AS k, n_name AS nm, "
    "s_suppkey AS extra FROM nation "
    "LEFT JOIN supplier ON n_nationkey = s_nationkey "
    "UNION ALL "
    "SELECT 'semi', c_custkey, c_name, NULL FROM customer c "
    "WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
    "AND o.o_totalprice > 400000) "
    "UNION ALL "
    "SELECT 'anti', c_custkey, c_name, NULL FROM customer c "
    "WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)",
    "join family beyond inner, one tagged result: left outer (NULL "
    "right side preserved), left-semi (EXISTS), left-anti (NOT EXISTS)",
)
def q13(spark, sf_dir):
    n, s = t(spark, sf_dir, "nation"), t(spark, sf_dir, "supplier")
    c, o = t(spark, sf_dir, "customer"), t(spark, sf_dir, "orders")
    outer = n.join(s, n.n_nationkey == s.s_nationkey, "left").select(
        F.lit("outer").alias("tag"),
        F.col("n_nationkey").alias("k"),
        F.col("n_name").alias("nm"),
        F.col("s_suppkey").alias("extra"),
    )
    big = o.filter(F.col("o_totalprice") > 400000)
    semi = c.join(big, c.c_custkey == big.o_custkey, "left_semi").select(
        F.lit("semi").alias("tag"),
        F.col("c_custkey").alias("k"),
        F.col("c_name").alias("nm"),
        F.lit(None).cast("long").alias("extra"),
    )
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        F.lit("anti").alias("tag"),
        F.col("c_custkey").alias("k"),
        F.col("c_name").alias("nm"),
        F.lit(None).cast("long").alias("extra"),
    )
    return outer.unionByName(semi).unionByName(anti)


@register(
    "q16_cross_join",
    "SELECT r_name, n_name FROM region CROSS JOIN nation",
    "cross join (two unconnected FROM tables in the dialect)",
)
def q16(spark, sf_dir):
    r, n = t(spark, sf_dir, "region"), t(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


# --------------------------------------------------------------------
# Window functions (§2.4)
# --------------------------------------------------------------------


@register(
    "q17_window_funcs",
    "SELECT * FROM (SELECT o_custkey, o_orderkey, o_totalprice, "
    "CAST(row_number() OVER wrank AS INT) AS rn, "
    "round(sum(o_totalprice) OVER wrun, 2) AS running, "
    "lag(o_orderkey) OVER wasc AS prev_key, "
    "lead(o_orderkey) OVER wasc AS next_key FROM orders "
    "WINDOW wrank AS (PARTITION BY o_custkey "
    "ORDER BY o_totalprice DESC, o_orderkey), "
    "wasc AS (PARTITION BY o_custkey ORDER BY o_orderkey), "
    "wrun AS (PARTITION BY o_custkey ORDER BY o_orderkey "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) "
    "WHERE rn <= 3",
    "window-function family in one pass: per-group top-k rank "
    "(unique-key tiebreak), running aggregate over a ROWS frame, "
    "lag/lead — three window specs, shared shuffle on o_custkey",
)
def q17(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    wrank = W.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    wasc = W.partitionBy("o_custkey").orderBy("o_orderkey")
    wrun = wasc.rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(wrank).alias("rn"),
            F.round(F.sum("o_totalprice").over(wrun), 2).alias("running"),
            F.lag("o_orderkey").over(wasc).alias("prev_key"),
            F.lead("o_orderkey").over(wasc).alias("next_key"),
        )
        .filter(F.col("rn") <= 3)
    )


# --------------------------------------------------------------------
# Set operations (§2.4)
# --------------------------------------------------------------------


@register(
    "q20_set_ops",
    "SELECT 'union_except' AS tag, CAST(nk AS BIGINT) AS k, "
    "CAST(1 AS BIGINT) AS n FROM ("
    "SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 9000 "
    "UNION SELECT s_nationkey AS nk FROM supplier "
    "EXCEPT SELECT n_nationkey AS nk FROM nation WHERE n_regionkey = 0) "
    "UNION ALL "
    "SELECT 'intersect', CAST(nk AS BIGINT), CAST(1 AS BIGINT) FROM ("
    "SELECT c_nationkey AS nk FROM customer "
    "INTERSECT SELECT s_nationkey AS nk FROM supplier) "
    "UNION ALL "
    "SELECT 'bag_hist', CAST(bag_n AS BIGINT), count(*) FROM ("
    "SELECT count(*) AS bag_n FROM ("
    "SELECT o_orderkey AS bk FROM orders UNION ALL "
    "SELECT l_orderkey AS bk FROM lineitem) GROUP BY bk) GROUP BY bag_n",
    "set-operation family, one tagged result: UNION (distinct) then "
    "EXCEPT; INTERSECT (distinct); UNION ALL (bag semantics) + regroup "
    "compressed to a per-multiplicity histogram",
)
def q20(spark, sf_dir):
    c = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_nationkey").alias("nk"))
    )
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    n = (
        t(spark, sf_dir, "nation")
        .filter(F.col("n_regionkey") == 0)
        .select(F.col("n_nationkey").alias("nk"))
    )
    ue = c.union(s).distinct().subtract(n)
    inter = (
        t(spark, sf_dir, "customer")
        .select(F.col("c_nationkey").alias("nk"))
        .intersect(s)
    )
    o = t(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("bk"))
    li = t(spark, sf_dir, "lineitem").select(F.col("l_orderkey").alias("bk"))
    bag_hist = (
        o.unionAll(li)
        .groupBy("bk")
        .agg(F.count(F.lit(1)).alias("bag_n"))
        .groupBy("bag_n")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("bag_hist").alias("tag"),
            F.col("bag_n").cast("long").alias("k"),
            "n",
        )
    )
    one = F.lit(1).cast("long").alias("n")
    return (
        ue.select(
            F.lit("union_except").alias("tag"),
            F.col("nk").cast("long").alias("k"),
            one,
        )
        .unionByName(
            inter.select(
                F.lit("intersect").alias("tag"),
                F.col("nk").cast("long").alias("k"),
                one,
            )
        )
        .unionByName(bag_hist)
    )


# --------------------------------------------------------------------
# LIMIT / top-k, scalar functions, CASE, multi-dim aggregation (§2.4)
# --------------------------------------------------------------------


@register(
    "q23_limit_topk",
    "SELECT o_orderkey, o_totalprice FROM orders "
    "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
    "global top-k (TakeOrderedAndProject — no full sort at scale)",
)
def q23(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(10)
    )


@register(
    "q24_scalar_string_math",
    "SELECT p_partkey, upper(p_brand) AS brand_u, "
    "CAST(length(p_name) AS INT) AS name_len, "
    "substr(p_type, 1, 5) AS type_pfx, "
    "concat(p_brand, '#', p_type) AS brand_type, "
    "abs(p_size - 25) AS size_dev FROM part",
    "string + math scalar functions (pyspark.sql.functions, JVM-side)",
)
def q24(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.length("p_name").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_pfx"),
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_type")).alias("brand_type"),
        F.abs(F.col("p_size") - 25).alias("size_dev"),
    )


@register(
    "q25_date_case",
    "SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS y, "
    "CAST(month(o_orderdate) AS INT) AS m, CAST(day(o_orderdate) AS INT) AS d, "
    "CASE WHEN o_totalprice < 100000 THEN 'low' "
    "WHEN o_totalprice < 300000 THEN 'mid' ELSE 'high' END AS bucket "
    "FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'",
    "timestamp extraction + timestamp range filter (UTC-pinned "
    "session) + CASE bucketing expression",
)
def q25(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 100000, "low")
        .when(F.col("o_totalprice") < 300000, "mid")
        .otherwise("high")
    )
    return o.filter(
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")
    ).select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        bucket.alias("bucket"),
    )


@register(
    "q27_grouped_analytics",
    "SELECT 'cube' AS tag, l_returnflag AS k1, l_linestatus AS k2, "
    "count(*) AS n FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus) "
    "UNION ALL "
    "SELECT 'rollup', CAST(y AS VARCHAR), CAST(m AS VARCHAR), count(*) "
    "FROM (SELECT CAST(year(o_orderdate) AS INT) AS y, "
    "CAST(month(o_orderdate) AS INT) AS m FROM orders) GROUP BY ROLLUP (y, m) "
    "UNION ALL "
    "SELECT 'gsets', o_orderstatus, o_orderpriority, count(*) FROM orders "
    "GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))",
    "multi-dimensional aggregation family, one tagged result: CUBE, "
    "ROLLUP over computed keys, GROUPING SETS — each branch is one "
    "Expand + shuffle",
)
def q27(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    cube = (
        l.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("cube").alias("tag"),
            F.col("l_returnflag").alias("k1"),
            F.col("l_linestatus").alias("k2"),
            "n",
        )
    )
    o = t(spark, sf_dir, "orders")
    rollup = (
        o.select(F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m"))
        .rollup("y", "m")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("rollup").alias("tag"),
            F.col("y").cast("string").alias("k1"),
            F.col("m").cast("string").alias("k2"),
            "n",
        )
    )
    o.createOrReplaceTempView("orders_gs")
    gsets = spark.sql(
        "SELECT 'gsets' AS tag, o_orderstatus AS k1, o_orderpriority AS k2, "
        "count(*) AS n FROM orders_gs "
        "GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))"
    )
    return cube.unionByName(rollup).unionByName(gsets)


@register(
    "q29_pivot",
    "SELECT o_orderpriority, "
    "count(*) FILTER (WHERE o_orderstatus = 'O') AS \"O\", "
    "count(*) FILTER (WHERE o_orderstatus = 'F') AS \"F\", "
    "count(*) FILTER (WHERE o_orderstatus = 'P') AS \"P\" "
    "FROM orders GROUP BY o_orderpriority",
    "pivot (status → columns)",
)
def q29(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "o_orderpriority",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in ("O", "F", "P")],
    )


@register(
    "q30_count_distinct",
    "SELECT count(DISTINCT l_partkey) AS n_parts, "
    "count(DISTINCT l_suppkey) AS n_supps FROM lineitem",
    "exact multi-column COUNT DISTINCT (expand + two-phase agg)",
)
def q30(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    return l.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


# --------------------------------------------------------------------
# Flagship (entry(); TPC-H Q3 shape)
# --------------------------------------------------------------------


@register(
    "q00_flagship_revenue",
    "SELECT o_orderkey, "
    "CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue, "
    "max(o_totalprice) AS o_totalprice FROM customer "
    "JOIN orders ON c_custkey = o_custkey "
    "JOIN lineitem ON o_orderkey = l_orderkey "
    "WHERE c_mktsegment = 'BUILDING' GROUP BY o_orderkey",
    "flagship: selective dim filter → fact join → grouped revenue "
    "(size-based join strategy; single shuffle on o_orderkey)",
)
def q00(spark, sf_dir):
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem")
    # NO broadcast hint on `c`: filtered customer is ~1/5 of an O(N)
    # dimension, so at 100 TB it cannot be a build side — and a hint
    # OVERRIDES autoBroadcastJoinThreshold, turning graceful SHJ/SMJ
    # degradation into an executor OOM. The join is equi-keyed; AQE
    # broadcasts from runtime stats while the side is actually small
    # (the explain_audit gate pins BHJ at test scale) and degrades to
    # a shuffled join when it isn't.
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.max("o_totalprice").alias("o_totalprice"),
        )
    )
