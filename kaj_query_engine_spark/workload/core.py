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


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return _read_parquet(spark, f"{sf_dir}/{name}.parquet")


# DuckDB oracle mirror of dsum() below — keep in lockstep
DSUM_V_SQL = "CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)"


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
    "q02_filter_project",
    "SELECT c_custkey, c_name, c_acctbal FROM customer "
    "WHERE c_mktsegment = 'BUILDING'",
    "filter + project (reference query2.sql; Select/Project operators)",
)(
    _dialect(
        "SELECT customer.c_custkey, customer.c_name, customer.c_acctbal "
        'FROM customer WHERE customer.c_mktsegment = "BUILDING"'
    )
)

register(
    "q03_agg_witness",
    'SELECT DISTINCT o_orderstatus, '
    '(SELECT max(o_orderkey) FROM orders) AS "MAX(orders.o_orderkey)", '
    "o_totalprice FROM orders "
    "WHERE o_orderkey = (SELECT max(o_orderkey) FROM orders)",
    "ungrouped aggregate with bare columns — witness-row semantics "
    "(reference query3.sql; Aggregate.java:123-150)",
)(
    _dialect(
        "SELECT orders.o_orderstatus, MAX(orders.o_orderkey), orders.o_totalprice "
        "FROM orders"
    )
)

register(
    "q04_pure_aggregates",
    'SELECT count(*) AS "COUNT(lineitem.l_orderkey)", '
    'CAST(sum(l_linenumber) AS BIGINT) AS "SUM(lineitem.l_linenumber)", '
    'min(l_quantity) AS "MIN(lineitem.l_quantity)", '
    'max(l_extendedprice) AS "MAX(lineitem.l_extendedprice)" FROM lineitem',
    "ungrouped MIN/MAX/COUNT/SUM accumulators (AggregateAttribute.java:38-115)",
)(
    _dialect(
        "SELECT COUNT(lineitem.l_orderkey), SUM(lineitem.l_linenumber), "
        "MIN(lineitem.l_quantity), MAX(lineitem.l_extendedprice) FROM lineitem"
    )
)

register(
    "q05_join2",
    "SELECT c_name, o_orderkey, o_totalprice FROM customer "
    "JOIN orders ON c_custkey = o_custkey",
    "2-way equi-join (reference query4.sql; NestedJoin → Catalyst join)",
)(
    _dialect(
        "SELECT customer.c_name, orders.o_orderkey, orders.o_totalprice "
        "FROM customer,orders WHERE customer.c_custkey=orders.o_custkey"
    )
)

register(
    "q06_join3_filters",
    "SELECT c_custkey, o_orderkey, l_linenumber, l_quantity "
    "FROM customer JOIN orders ON c_custkey = o_custkey "
    "JOIN lineitem ON o_orderkey = l_orderkey "
    "WHERE o_totalprice < 100000 AND l_quantity > 30",
    "3-way join chain + range filters (reference query6.sql)",
)(
    _dialect(
        "SELECT customer.c_custkey, orders.o_orderkey, lineitem.l_linenumber, "
        "lineitem.l_quantity FROM customer,orders,lineitem "
        "WHERE customer.c_custkey=orders.o_custkey,"
        'orders.o_orderkey=lineitem.l_orderkey,orders.o_totalprice<"100000",'
        'lineitem.l_quantity>"30"'
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
    "q08_distinct",
    "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
    "duplicate elimination (reference query9.sql; driver-side Distinct)",
)(_dialect("SELECT DISTINCT orders.o_orderstatus, orders.o_orderpriority FROM orders"))

register(
    "q09_orderby",
    "SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9000",
    "ORDER BY DESC on the projected result (reference query10.sql; "
    "driver-side sort, QueryMain.java:248-261). Hash compare is "
    "order-insensitive; the sort itself is covered in tests/.",
)(
    _dialect(
        "SELECT customer.c_custkey, customer.c_acctbal FROM customer "
        'WHERE customer.c_acctbal>"9000" ORDERBY customer.c_custkey DESC'
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
    "q11_groupby_agg",
    "SELECT l_returnflag, l_linestatus, "
    "CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty, "
    "CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_base, "
    "CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_disc, "
    "count(*) AS n FROM lineitem GROUP BY l_returnflag, l_linestatus",
    "TPC-H Q1-style grouped aggregation (map-side partial agg + one shuffle)",
)
def q11(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        dsum(F.col("l_quantity")).alias("sum_qty"),
        dsum(F.col("l_extendedprice")).alias("sum_base"),
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q12_groupby_having",
    "SELECT o_custkey, count(*) AS n_orders, "
    "CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total "
    "FROM orders GROUP BY o_custkey HAVING count(*) >= 15",
    "GROUP BY + HAVING",
)
def q12(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("total"),
        )
        .filter(F.col("n_orders") >= 15)
    )


# --------------------------------------------------------------------
# Join family beyond inner (SURVEY §2.4 — free in Spark, exposed here)
# --------------------------------------------------------------------


@register(
    "q13_left_outer_join",
    "SELECT n_nationkey, n_name, s_suppkey FROM nation "
    "LEFT JOIN supplier ON n_nationkey = s_nationkey",
    "left outer join (nations with no supplier keep NULL s_suppkey)",
)
def q13(spark, sf_dir):
    n, s = t(spark, sf_dir, "nation"), t(spark, sf_dir, "supplier")
    return n.join(s, n.n_nationkey == s.s_nationkey, "left").select(
        "n_nationkey", "n_name", "s_suppkey"
    )


@register(
    "q14_semi_join",
    "SELECT c_custkey, c_name FROM customer c "
    "WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
    "AND o.o_totalprice > 400000)",
    "left-semi join (EXISTS)",
)
def q14(spark, sf_dir):
    c, o = t(spark, sf_dir, "customer"), t(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 400000)
    return c.join(big, c.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "q15_anti_join",
    "SELECT c_custkey, c_name FROM customer c "
    "WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)",
    "left-anti join (NOT EXISTS)",
)
def q15(spark, sf_dir):
    c, o = t(spark, sf_dir, "customer"), t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


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
    "q17_window_topk",
    "SELECT * FROM (SELECT o_custkey, o_orderkey, o_totalprice, "
    "CAST(row_number() OVER (PARTITION BY o_custkey "
    "ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn FROM orders) "
    "WHERE rn <= 3",
    "top-k per group via row_number window (unique-key tiebreak)",
)
def q17(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "q18_window_running",
    "SELECT o_custkey, o_orderkey, "
    "round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running "
    "FROM orders",
    "running aggregate window (frame order fixed by unique key)",
)
def q18(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running"),
    )


@register(
    "q19_window_lag_lead",
    "SELECT o_custkey, o_orderkey, "
    "lag(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS prev_key, "
    "lead(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS next_key "
    "FROM orders",
    "lag/lead window functions",
)
def q19(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_orderkey").over(w).alias("prev_key"),
        F.lead("o_orderkey").over(w).alias("next_key"),
    )


# --------------------------------------------------------------------
# Set operations (§2.4)
# --------------------------------------------------------------------


@register(
    "q20_union_except",
    "SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 9000 "
    "UNION SELECT s_nationkey AS nk FROM supplier "
    "EXCEPT SELECT n_nationkey AS nk FROM nation WHERE n_regionkey = 0",
    "UNION (distinct) then EXCEPT",
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
    return c.union(s).distinct().subtract(n)


@register(
    "q21_intersect",
    "SELECT c_nationkey AS nk FROM customer "
    "INTERSECT SELECT s_nationkey AS nk FROM supplier",
    "INTERSECT (distinct)",
)
def q21(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.intersect(s)


@register(
    "q22_union_all_groupby",
    "SELECT k, count(*) AS n FROM ("
    "SELECT o_orderkey AS k FROM orders UNION ALL "
    "SELECT l_orderkey AS k FROM lineitem) GROUP BY k",
    "UNION ALL (bag semantics) + regroup",
)
def q22(spark, sf_dir):
    o = t(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("k"))
    l = t(spark, sf_dir, "lineitem").select(F.col("l_orderkey").alias("k"))
    return o.unionAll(l).groupBy("k").agg(F.count(F.lit(1)).alias("n"))


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
    "q25_date_functions",
    "SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS y, "
    "CAST(month(o_orderdate) AS INT) AS m, CAST(day(o_orderdate) AS INT) AS d "
    "FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'",
    "timestamp extraction + timestamp range filter (UTC-pinned session)",
)
def q25(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")).select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
    )


@register(
    "q26_case_buckets",
    "SELECT CASE WHEN o_totalprice < 100000 THEN 'low' "
    "WHEN o_totalprice < 300000 THEN 'mid' ELSE 'high' END AS bucket, "
    "count(*) AS n FROM orders GROUP BY 1",
    "CASE expression + group",
)
def q26(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 100000, "low")
        .when(F.col("o_totalprice") < 300000, "mid")
        .otherwise("high")
    )
    return o.groupBy(bucket.alias("bucket")).agg(F.count(F.lit(1)).alias("n"))


@register(
    "q27_cube",
    "SELECT l_returnflag, l_linestatus, count(*) AS n, "
    "CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty "
    "FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)",
    "CUBE multi-dimensional aggregate",
)
def q27(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    return l.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(F.col("l_quantity")).alias("sum_qty"),
    )


@register(
    "q28_rollup",
    "SELECT CAST(year(o_orderdate) AS INT) AS y, CAST(month(o_orderdate) AS INT) AS m, "
    "count(*) AS n FROM orders GROUP BY ROLLUP (y, m)",
    "ROLLUP hierarchy aggregate",
)
def q28(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return (
        o.select(
            F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m")
        )
        .rollup("y", "m")
        .agg(F.count(F.lit(1)).alias("n"))
    )


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


@register(
    "q31_grouping_sets",
    "SELECT o_orderstatus, o_orderpriority, count(*) AS n FROM orders "
    "GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))",
    "GROUPING SETS via Spark SQL",
)
def q31(spark, sf_dir):
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        "SELECT o_orderstatus, o_orderpriority, count(*) AS n FROM orders_gs "
        "GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))"
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
    "(broadcast the filtered customer side; single shuffle on o_orderkey)",
)
def q00(spark, sf_dir):
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.max("o_totalprice").alias("o_totalprice"),
        )
    )
