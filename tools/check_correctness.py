"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB over the same parquet dir, comparing row count, column names,
and an order-insensitive value hash (columns sorted by name, floats
rounded to 9 significant-ish decimals).

Usage: python tools/check_correctness.py [sf_dir] [name_filter] [--vanilla]

``--vanilla`` runs against a bone-stock SparkSession (no UTC pin, no
AQE/Arrow/shuffle tuning, default 200 shuffle partitions) — the
environment the external driver may hand us. Every query must be a
pure function of the data, not of our session config; combine with
``TZ=America/New_York`` to also vary the process timezone.
"""

from __future__ import annotations

import datetime
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

import __spark_entry__ as entrymod
from kaj_query_engine_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}"
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    body = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    return sorted(cols), body


def main():
    args = [a for a in sys.argv[1:] if a != "--vanilla"]
    vanilla = "--vanilla" in sys.argv[1:]
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    name_filter = args[1] if len(args) > 1 else ""
    if vanilla:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.appName("check-correctness-vanilla")
            .master("local[8]")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        spark = get_spark(
            "check-correctness", master="local[8]", shuffle_partitions=8
        )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name in sorted(qs):
        if name_filter and name_filter not in name:
            continue
        t0 = time.time()
        try:
            df = qs[name](spark, sf_dir)
            s_rows = [tuple(r) for r in df.collect()]
            s_cols = list(df.columns)
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {str(e).splitlines()[0][:120]}")
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(s_rows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {str(e).splitlines()[0][:120]}")
            continue
        sc, sb = normalize(s_rows, s_cols)
        dc, db = normalize(d_rows, d_cols)
        if sc != dc:
            failures.append(name)
            print(f"FAIL {name}: columns spark={sc} duck={dc}")
        elif len(sb) != len(db):
            failures.append(name)
            print(f"FAIL {name}: rowcount spark={len(sb)} duck={len(db)}")
        elif sb != db:
            failures.append(name)
            diff = next(
                (i, a, b) for i, (a, b) in enumerate(zip(sb, db)) if a != b
            )
            print(f"FAIL {name}: values differ at sorted row {diff[0]}:")
            print(f"   spark: {diff[1][:200]}")
            print(f"   duck : {diff[2][:200]}")
        else:
            print(f"PASS {name} ({len(sb)} rows, {time.time()-t0:.1f}s)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
