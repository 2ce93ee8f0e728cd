"""Property-based differential testing: randomized dialect queries run
through the full parse → lower → execute path and compared against
DuckDB on the same rows. Complements the hand-written cases by
sweeping the filter/aggregate grammar corners (SURVEY §5)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kaj_query_engine_spark.engine import KajEngine
from tests.conftest import assert_same_result

INT_COLS = ["cid", "gender"]
STR_COLS = ["firstname", "lastname"]
OPS = ["<", "<=", ">", ">=", "=", "!="]
DUCK_OP = {"!=": "<>"}


@pytest.fixture(scope="module")
def engine(spark, ref_tables):
    eng = KajEngine(spark)
    for name, (df, _rows, _cols) in ref_tables.items():
        eng.register(name, df)
    return eng


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    col=st.sampled_from(INT_COLS),
    op=st.sampled_from(OPS),
    lit=st.integers(min_value=0, max_value=199),
)
def test_random_int_filters(engine, duck, col, op, lit):
    q = (
        f"SELECT customer_ref.cid, customer_ref.{col} FROM customer_ref "
        f'WHERE customer_ref.{col}{op}"{lit}"'
    )
    sql = (
        f"SELECT cid, {col} FROM customer_ref "
        f"WHERE {col} {DUCK_OP.get(op, op)} {lit}"
    )
    assert_same_result(engine.sql(q), duck, sql)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    agg=st.sampled_from(["MIN", "MAX", "SUM", "COUNT", "AVG"]),
    col=st.sampled_from(["amount", "iid"]),
    op=st.sampled_from(OPS),
    lit=st.integers(min_value=0, max_value=2500),
)
def test_random_aggregates_with_filter(engine, duck, agg, col, op, lit):
    q = (
        f"SELECT {agg}(bill_ref.{col}) FROM bill_ref "
        f'WHERE bill_ref.amount{op}"{lit}"'
    )
    duck_agg = "count(*)" if agg == "COUNT" else f"{agg.lower()}({col})"
    cast = "CAST(%s AS BIGINT)" if agg in ("SUM", "COUNT") else "%s"
    sql = (
        f'SELECT {cast % duck_agg} AS "{agg}(bill_ref.{col})" FROM bill_ref '
        f"WHERE amount {DUCK_OP.get(op, op)} {lit} "
        f"HAVING count(*) > 0"  # empty input: reference emits no row
    )
    df = engine.sql(q)
    assert_same_result(df, duck, sql)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    op=st.sampled_from(OPS),
    lit=st.integers(min_value=0, max_value=2500),
)
def test_count_with_nonconstant_bare_column_is_deterministic(
    engine, duck, op, lit
):
    """COUNT/SUM-only aggregates with a NON-constant bare column: the
    witness is the row with the smallest bare tuple (min_by), so the
    answer is a pure function of the row set — any run, partitioning,
    or cluster size agrees with the oracle's min()."""
    q = (
        "SELECT COUNT(bill_ref.amount), bill_ref.iid FROM bill_ref "
        f'WHERE bill_ref.amount{op}"{lit}"'
    )
    sql = (
        'SELECT CAST(count(*) AS BIGINT) AS "COUNT(bill_ref.amount)", '
        "min(iid) AS iid FROM bill_ref "
        f"WHERE amount {DUCK_OP.get(op, op)} {lit} HAVING count(*) > 0"
    )
    assert_same_result(engine.sql(q), duck, sql)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    op=st.sampled_from(OPS),
    lit=st.integers(min_value=0, max_value=2500),
)
def test_sum_with_two_bare_columns_single_witness_row(engine, duck, op, lit):
    """Both bare columns come from the SAME witness row (the
    lexicographically smallest (iid, billid) tuple), not independent
    mins."""
    q = (
        "SELECT SUM(bill_ref.amount), bill_ref.iid, bill_ref.billid "
        f'FROM bill_ref WHERE bill_ref.amount{op}"{lit}"'
    )
    sql = (
        "SELECT s.s AS \"SUM(bill_ref.amount)\", w.iid, w.billid FROM "
        "(SELECT CAST(sum(amount) AS BIGINT) AS s FROM bill_ref "
        f"WHERE amount {DUCK_OP.get(op, op)} {lit} HAVING count(*) > 0) s, "
        "(SELECT iid, billid FROM bill_ref "
        f"WHERE amount {DUCK_OP.get(op, op)} {lit} "
        "ORDER BY iid, billid LIMIT 1) w"
    )
    assert_same_result(engine.sql(q), duck, sql)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    col=st.sampled_from(STR_COLS),
    op=st.sampled_from(OPS),
    lit=st.text(alphabet="abcdefgh", min_size=1, max_size=3),
)
def test_random_string_filters(engine, duck, col, op, lit):
    q = (
        f"SELECT customer_ref.cid FROM customer_ref "
        f'WHERE customer_ref.{col}{op}"{lit}"'
    )
    sql = (
        f"SELECT cid FROM customer_ref "
        f"WHERE {col} {DUCK_OP.get(op, op)} '{lit}'"
    )
    assert_same_result(engine.sql(q), duck, sql)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    op=st.sampled_from(OPS),
    lit=st.integers(min_value=0, max_value=199),
)
def test_random_equi_join_with_filter(engine, duck, op, lit):
    """Join + selection split: the comma-AND WHERE mixes an equi-join
    predicate with a single-table filter; the lowering must route the
    former to the join and push the latter to the scan."""
    q = (
        "SELECT customer_ref.cid, cart_ref.cartid FROM customer_ref, "
        "cart_ref WHERE customer_ref.cid=cart_ref.cid, "
        f'customer_ref.gender{op}"{lit % 2}"'
    )
    sql = (
        "SELECT c.cid, k.cartid FROM customer_ref c JOIN cart_ref k "
        f"ON c.cid = k.cid WHERE c.gender {DUCK_OP.get(op, op)} {lit % 2}"
    )
    assert_same_result(engine.sql(q), duck, sql)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    op=st.sampled_from(["<", "<=", ">", ">=", "!="]),
)
def test_random_theta_join(engine, duck, op):
    """Non-equi comparator joins (reference grammar allows any OP in
    the join condition); row sets must match DuckDB's theta join."""
    q = (
        "SELECT customer_ref.cid, cart_ref.cartid FROM customer_ref, "
        f"cart_ref WHERE customer_ref.cid{op}cart_ref.cid, "
        'customer_ref.cid<"12", cart_ref.cartid<"12"'
    )
    sql = (
        "SELECT c.cid, k.cartid FROM customer_ref c JOIN cart_ref k "
        f"ON c.cid {DUCK_OP.get(op, op)} k.cid "
        "WHERE c.cid < 12 AND k.cartid < 12"
    )
    assert_same_result(engine.sql(q), duck, sql)


# ---- grouped aggregates (default mode) vs DuckDB -------------------
#
# The compiled-reference golden fuzzer cannot cover GROUP BY (the
# reference parses GROUPBY but aborts planning with "GroupBy is not
# implemented.", src/qp/optimizer/RandomInitialPlan.java:51-54), so
# the grouped lowering path previously rode on the two hand-written
# queries alone. This class sweeps it differentially against DuckDB:
# 1-2 group keys ⊆ the select list, 1-2 of the five aggregates,
# optional quoted-literal filter, optional ORDERBY on a key.

GROUP_TABLES = {
    # table: (candidate group keys, aggregatable int columns, filter col)
    "customer_ref": (["gender", "firstname"], ["cid", "gender"], "cid"),
    "cart_ref": (["status", "cid"], ["cartid", "cid"], "cid"),
    "cartdetails_ref": (["qty", "cartid"], ["iid", "qty"], "qty"),
    "bill_ref": (["iid", "remarks"], ["amount", "billid"], "amount"),
}


@settings(
    max_examples=16,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_random_grouped_aggregates(engine, duck, data):
    tbl = data.draw(st.sampled_from(sorted(GROUP_TABLES)), label="table")
    keys_pool, agg_cols, fcol = GROUP_TABLES[tbl]
    keys = data.draw(
        st.lists(st.sampled_from(keys_pool), min_size=1, max_size=2,
                 unique=True),
        label="keys",
    )
    aggs = data.draw(
        st.lists(
            st.tuples(
                st.sampled_from(["MIN", "MAX", "SUM", "COUNT", "AVG"]),
                st.sampled_from(agg_cols),
            ),
            min_size=1, max_size=2, unique=True,
        ),
        label="aggs",
    )
    where = data.draw(
        st.none()
        | st.tuples(st.sampled_from(OPS), st.integers(0, 2500)),
        label="where",
    )
    # ORDERBY target: a group key, or one of the DRAWN AGGREGATES —
    # the dialect's attlist accepts AGG(tab.col) and the lowering
    # resolves it positionally against the project list (round-9
    # review item 6: this path previously rode on zero fuzz cases)
    order_on_agg = data.draw(st.booleans(), label="order_on_agg")
    order = data.draw(
        st.none() | st.sampled_from(["", " DESC"]), label="order"
    )

    sel = [f"{tbl}.{k}" for k in keys] + [
        f"{a}({tbl}.{c})" for a, c in aggs
    ]
    q = f"SELECT {', '.join(sel)} FROM {tbl}"
    sql_where = ""
    if where is not None:
        op, lit = where
        q += f' WHERE {tbl}.{fcol}{op}"{lit}"'
        sql_where = f"WHERE {fcol} {DUCK_OP.get(op, op)} {lit}"
    q += f" GROUPBY {', '.join(f'{tbl}.{k}' for k in keys)}"
    ordered = order is not None
    if ordered:
        # lead with the drawn target, tiebreak on every group key so
        # the order is TOTAL (keys are unique per group) and the
        # row sequence itself becomes comparable; the dialect's DESC
        # is whole-list (SURVEY §2.3 quirk), mirrored in the oracle
        oa, oc = aggs[0]
        lead = f"{oa}({tbl}.{oc})" if order_on_agg else f"{tbl}.{keys[0]}"
        tail = ", ".join(f"{tbl}.{k}" for k in keys)
        q += f" ORDERBY {lead}, {tail}{order}"

    def duck_agg(a, c):
        # COUNT counts rows (the reference's ungrouped semantics carry
        # over); SUM/COUNT surface as BIGINT like the Spark lowering
        expr = "count(*)" if a == "COUNT" else f"{a.lower()}({c})"
        if a in ("SUM", "COUNT"):
            expr = f"CAST({expr} AS BIGINT)"
        return f'{expr} AS "{a}({tbl}.{c})"'

    sql = (
        f"SELECT {', '.join(keys)}, "
        f"{', '.join(duck_agg(a, c) for a, c in aggs)} "
        f"FROM {tbl} {sql_where} GROUP BY {', '.join(keys)}"
    )
    if ordered:
        # Spark defaults: ASC = NULLS FIRST, DESC = NULLS LAST —
        # pinned explicitly so DuckDB's defaults can't mask a drift
        null_rule = "NULLS LAST" if order == " DESC" else "NULLS FIRST"
        lead_sql = (
            f'"{aggs[0][0]}({tbl}.{aggs[0][1]})"'
            if order_on_agg
            else keys[0]
        )
        okeys = [lead_sql] + keys
        sql += " ORDER BY " + ", ".join(
            f"{k}{order} {null_rule}" for k in okeys
        )
        assert_same_result_ordered(engine.sql(q), duck, sql)
    else:
        assert_same_result(engine.sql(q), duck, sql)


def assert_same_result_ordered(spark_df, duck_con, sql):
    """Order-SENSITIVE differential check: the row SEQUENCES must
    match, not just the row sets — this is what actually pins ORDERBY
    (the shared order-insensitive helper would pass a broken sort).
    Callers guarantee both sides emit a total order."""
    from tests.conftest import _canon_value

    expected = duck_con.execute(sql)
    exp_cols = [d[0] for d in expected.description]
    want = [
        tuple(_canon_value(v) for v in row) for row in expected.fetchall()
    ]
    assert list(spark_df.columns) == exp_cols
    got = [
        tuple(_canon_value(v) for v in row) for row in spark_df.collect()
    ]
    assert got == want, f"sequence mismatch\n spark={got[:5]}\n duck={want[:5]}"


# ---- grouped HAVING (the q11 workload shape) vs DuckDB --------------
#
# The dialect grammar has no HAVING (the reference's doesn't either),
# so the HAVING path lives in the WORKLOAD layer: groupBy().agg()
# followed by a filter on an aggregate output — q11's shape. Round-9
# review item 6: that path rode on the one pinned query; this class
# sweeps it differentially — random keys/aggregates, a HAVING
# predicate over a drawn aggregate, optional WHERE — against DuckDB's
# native GROUP BY ... HAVING.


@settings(
    max_examples=16,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_random_grouped_having_on_aggregates(spark, ref_tables, duck, data):
    from pyspark.sql import functions as F

    tbl = data.draw(st.sampled_from(sorted(GROUP_TABLES)), label="table")
    keys_pool, agg_cols, fcol = GROUP_TABLES[tbl]
    df = ref_tables[tbl][0]
    keys = data.draw(
        st.lists(st.sampled_from(keys_pool), min_size=1, max_size=2,
                 unique=True),
        label="keys",
    )
    aggs = data.draw(
        st.lists(
            st.tuples(
                st.sampled_from(["MIN", "MAX", "SUM", "COUNT", "AVG"]),
                st.sampled_from(agg_cols),
            ),
            min_size=1, max_size=2, unique=True,
        ),
        label="aggs",
    )
    hop = data.draw(st.sampled_from(OPS), label="having_op")
    hlit = data.draw(st.integers(0, 2500), label="having_lit")
    where = data.draw(
        st.none() | st.tuples(st.sampled_from(OPS), st.integers(0, 2500)),
        label="where",
    )

    SPARK_AGG = {
        "MIN": F.min, "MAX": F.max, "SUM": F.sum, "AVG": F.avg,
        "COUNT": lambda c: F.count(F.lit(1)),
    }
    aliases = [f"{a}_{c}" for a, c in aggs]
    out = df
    sql_where = ""
    if where is not None:
        op, lit = where
        out = out.filter(F.expr(f"{fcol} {op} {lit}"))
        sql_where = f"WHERE {fcol} {DUCK_OP.get(op, op)} {lit}"
    out = out.groupBy(*keys).agg(*[
        SPARK_AGG[a](F.col(c)).alias(al) for (a, c), al in zip(aggs, aliases)
    ])
    # HAVING over the FIRST drawn aggregate (q11's filter-on-agg shape)
    out = out.filter(F.expr(f"{aliases[0]} {hop} {hlit}"))

    def duck_agg(a, c, al):
        expr = "count(*)" if a == "COUNT" else f"{a.lower()}({c})"
        if a in ("SUM", "COUNT"):
            expr = f"CAST({expr} AS BIGINT)"
        return f"{expr} AS {al}", expr

    exprs = [duck_agg(a, c, al) for (a, c), al in zip(aggs, aliases)]
    sql = (
        f"SELECT {', '.join(keys)}, "
        f"{', '.join(e[0] for e in exprs)} "
        f"FROM {tbl} {sql_where} GROUP BY {', '.join(keys)} "
        f"HAVING {exprs[0][1]} {DUCK_OP.get(hop, hop)} {hlit}"
    )
    assert_same_result(out, duck, sql)
