"""Parser unit tests over the reference's own 9-query suite
(``/root/reference/testcases/query{1-7,9,10}.sql``) plus quirk cases.
"""

import pytest

from kaj_query_engine_spark.dialect.ast import AggType, Attribute, CompareOp
from kaj_query_engine_spark.dialect.parser import ParseError, parse

Q3 = (
    "SELECT CUSTOMER.cid, CUSTOMER.firstname, CUSTOMER.gender, "
    "MAX(CART.cartid), CART.status FROM CUSTOMER,CART WHERE CUSTOMER.cid=CART.cid"
)
Q10 = (
    'SELECT * FROM CUSTOMER,CART,CARTDETAILS,BILL '
    'WHERE CUSTOMER.cid=CART.cid,CART.cartid=CARTDETAILS.cartid,'
    'CARTDETAILS.iid=BILL.iid,BILL.amount<"1000",BILL.amount>"500" '
    "ORDERBY BILL.amount"
)


def test_query1_star():
    q = parse("SELECT * FROM CUSTOMER")
    assert q.project_list == []  # SELECT * == empty projectList
    assert q.from_list == ["CUSTOMER"]
    assert not q.is_distinct


def test_query2_filter_project():
    q = parse(
        'SELECT CUSTOMER.cid,CUSTOMER.gender,CUSTOMER.firstname '
        'FROM CUSTOMER WHERE CUSTOMER.gender="1"'
    )
    assert [a.column for a in q.project_list] == ["cid", "gender", "firstname"]
    (sel,) = q.condition_list
    assert not sel.is_join and sel.rhs == "1" and sel.op is CompareOp.EQ


def test_query3_aggregate_with_bare_columns():
    q = parse(Q3)
    aggs = [a for a in q.project_list if a.agg is not AggType.NONE]
    assert aggs == [Attribute("CART", "cartid", AggType.MAX)]
    assert q.has_aggregates
    (join,) = q.condition_list
    assert join.is_join


def test_query9_distinct():
    q = parse("SELECT DISTINCT CUSTOMER.gender FROM CUSTOMER")
    assert q.is_distinct
    assert q.project_list == [Attribute("CUSTOMER", "gender")]


def test_query10_joins_filters_orderby():
    q = parse(Q10)
    assert len(q.joins) == 3 and len(q.selections) == 2
    assert q.orderby_list == [Attribute("BILL", "amount")]
    assert not q.is_desc


def test_orderby_desc_applies_to_whole_list():
    q = parse("SELECT A.x, A.y FROM A ORDERBY A.x, A.y DESC")
    assert q.is_desc and len(q.orderby_list) == 2


def test_groupby_parses():
    q = parse("SELECT A.x, COUNT(A.y) FROM A GROUPBY A.x")
    assert q.groupby_list == [Attribute("A", "x")]


def test_same_table_condition_is_selection():
    q = parse("SELECT * FROM A WHERE A.x=A.y")
    assert q.condition_list[0].is_join is False


def test_all_six_comparators():
    for op in ("<", ">", "<=", ">=", "=", "!="):
        q = parse(f'SELECT * FROM A WHERE A.x{op}"5"')
        assert q.condition_list[0].op is CompareOp(op)


def test_keywords_case_insensitive():
    q = parse("select distinct A.x from A orderby A.x desc")
    assert q.is_distinct and q.is_desc


def test_rejects_nested_aggregates():
    with pytest.raises(ParseError):
        parse("SELECT MAX(MIN(A.x)) FROM A")


def test_rejects_aggregate_in_where():
    with pytest.raises(ParseError):
        parse('SELECT * FROM A WHERE MAX(A.x)="3"')


def test_rejects_unqualified_attribute():
    with pytest.raises(ParseError):
        parse("SELECT x FROM A")
