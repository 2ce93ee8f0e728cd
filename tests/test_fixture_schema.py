"""Fixture-drift guard: the driver regenerates its parquet fixtures
between rounds, and a physical-type change there surfaces as analysis
errors deep inside operators (round 2: ``events.ts`` moved from
timestamp[ns] to timestamp[us]/NTZ and broke every event-time call
site). Pin the POST-CATALOG logical schema here so the next drift
fails this suite with a clear message instead of failing 8 driver
queries.

The contract under test is ``catalog._read_parquet``'s normalization:
whatever unit/annotation the fixture uses, downstream code sees
classic ``TimestampType`` (never TIMESTAMP_NTZ, never raw int64
nanos) and stable numeric/string types.
"""

from __future__ import annotations

import os

import pytest

from kaj_query_engine_spark.catalog import load_fixture_catalog
from tests.conftest import SF_DIR

# table -> {column: simpleString type}, snapshot of the POST-CATALOG
# schema every operator in the repo was written against (r3 fixtures).
# Re-pin deliberately when the driver adds tables/columns; a surprise
# diff here means _read_parquet needs a new normalization rule.
PINNED = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp",
    },
    "events": {
        "event_id": "bigint",
        "ts": "timestamp",  # the round-2 regression: must NEVER be timestamp_ntz
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    },
}


@pytest.fixture(scope="module")
def catalog(spark):
    return load_fixture_catalog(spark, SF_DIR)


def test_fixture_dir_exists():
    assert os.path.isdir(SF_DIR), f"driver fixtures missing at {SF_DIR}"


@pytest.mark.parametrize("table", sorted(PINNED))
def test_post_catalog_schema_is_pinned(catalog, table):
    assert catalog.has(table), f"fixture table {table} not loaded"
    actual = {f.name: f.dataType.simpleString() for f in catalog.table(table).schema}
    for col, typ in PINNED[table].items():
        assert col in actual, f"{table}.{col} missing (fixture drift?)"
        assert actual[col] == typ, (
            f"{table}.{col} is {actual[col]}, pinned {typ} — the driver "
            "fixtures changed physical type and catalog._read_parquet "
            "did not normalize it; fix the repair there, then re-pin."
        )


def test_no_ntz_or_raw_nanos_survive(catalog):
    """No TIMESTAMP_NTZ anywhere, and every column that is a parquet
    timestamp in the FOOTER (any unit/annotation — including columns
    the driver adds later that PINNED doesn't know about) must land as
    classic TimestampType, not raw int64 nanos or NTZ."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    for name in catalog.names():
        actual = {
            f.name: f.dataType.simpleString()
            for f in catalog.table(name).schema.fields
        }
        for t in actual.values():
            assert t != "timestamp_ntz", (
                f"{name}: TIMESTAMP_NTZ survived catalog load — "
                "unix_micros()/withWatermark() will throw on it"
            )
        footer = pq.read_schema(os.path.join(SF_DIR, f"{name}.parquet"))
        for field in footer:
            if pa.types.is_timestamp(field.type):
                assert actual.get(field.name) == "timestamp", (
                    f"{name}.{field.name} is parquet timestamp[{field.type.unit}] "
                    f"in the footer but {actual.get(field.name)!r} after catalog "
                    "load — _read_parquet needs a normalization rule for this "
                    "unit/annotation (round-2 failure mode)"
                )


def test_events_ts_values_are_plausible(catalog, spark):
    """Beyond the type: the normalized values must decode to the 2024
    fixture epoch, not nanos-misread-as-micros (off by 1000×)."""
    from pyspark.sql import functions as F

    row = (
        catalog.table("events")
        .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
        .collect()[0]
    )
    assert row.lo.year >= 2000, f"events.ts min {row.lo} — unit misread"
    assert row.hi.year <= 2100, f"events.ts max {row.hi} — unit misread"
