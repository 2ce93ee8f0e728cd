"""Tests for the RandomDB analog (sources/datagen.py): .det parsing,
distributed deterministic generation, PK uniqueness, value ranges, and
the .stat side-channel."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kaj_query_engine_spark.sources import datagen as G

# mirrors the shape of the reference's testcases/CUSTOMER.det
CUSTOMER_DET = """\
5
100
cid INTEGER 200 PK 4
gender INTEGER 2 NK 4
firstname STRING 10 NK 20
lastname STRING 10 NK 20
address STRING 26 NK 52
"""


def test_parse_det():
    det = G.parse_det(CUSTOMER_DET)
    assert det.tuple_bytes == 100
    assert det.names == ["cid", "gender", "firstname", "lastname", "address"]
    assert det.columns[0].keytype == "PK" and det.columns[0].range == 200
    assert det.columns[2].dtype == "STRING" and det.columns[2].range == 10


def test_parse_det_rejects_bad_type():
    with pytest.raises(ValueError, match="invalid data type"):
        G.parse_det("1\n4\nx BLOB 5 NK 4\n")


def test_generate_pk_unique_and_in_range(spark):
    det = G.parse_det(CUSTOMER_DET)
    df = G.generate_table(spark, det, 150, seed=7)
    rows = df.collect()
    cids = [r.cid for r in rows]
    assert len(set(cids)) == 150  # PK unique
    assert all(0 <= c < 200 for c in cids)
    assert all(r.gender in (0, 1) for r in rows)
    assert all(len(r.firstname) == 10 for r in rows)
    assert all(set(r.address) <= set("abcdefghijklmnopqrstuvwxyz") for r in rows)


def test_generate_pk_range_too_small(spark):
    det = G.parse_det(CUSTOMER_DET)
    with pytest.raises(ValueError, match="unique PK"):
        G.generate_table(spark, det, 500)


def test_generate_deterministic_across_partitionings(spark):
    det = G.parse_det(CUSTOMER_DET)
    a = sorted(map(tuple, G.generate_table(spark, det, 100, 3, 1).collect()))
    b = sorted(map(tuple, G.generate_table(spark, det, 100, 3, 16).collect()))
    assert a == b  # same seed -> same table at any parallelism
    c = sorted(map(tuple, G.generate_table(spark, det, 100, 4).collect()))
    assert a != c  # different seed -> different table


def test_real_column_range(spark):
    det = G.parse_det("1\n4\namount REAL 1500 NK 4\n")
    df = G.generate_table(spark, det, 200, seed=1)
    mm = df.agg(F.min("amount").alias("lo"), F.max("amount").alias("hi")).collect()[0]
    assert 0 <= mm.lo and mm.hi < 1500
    # spread sanity: uniform over [0,1500) should cover most of it
    assert mm.hi - mm.lo > 750


def test_write_random_db_stat_file(spark, tmp_path):
    det_path = tmp_path / "customer.det"
    det_path.write_text(CUSTOMER_DET)
    df = G.write_random_db(
        spark, str(det_path), 120, str(tmp_path), "customer", seed=5
    )
    assert df.count() == 120
    stat = (tmp_path / "customer.stat").read_text().splitlines()
    assert stat[0] == "120"
    # cid PK -> 120 distinct; gender NK range 2 -> 2; strings -> 120
    assert stat[1].split("\t") == ["120", "2", "120", "120", "120"]
    back = spark.read.parquet(str(tmp_path / "customer"))
    assert back.count() == 120


def test_det_stats_feed_plan_cost():
    det = G.parse_det(CUSTOMER_DET)
    st = G.det_stats(det, 150)
    from kaj_query_engine_spark.dialect.parser import parse
    from kaj_query_engine_spark.plans.cost import PlanCost

    est = PlanCost({"customer": st}).estimate(
        parse('SELECT customer.cid FROM customer WHERE customer.gender="1"')
    )
    assert est.rows == 75  # 150 / V(gender)=2
