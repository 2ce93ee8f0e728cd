"""CLI mirroring the reference driver's interface:

    java QueryMain <query.in> <query.out> <pagesize> <numbuff>
        (/root/reference/src/QueryMain.java:26-41)
    python -m kaj_query_engine_spark <query.in> <query.out>
        [--tables DIR] [--strict]

Reads a dialect query from ``query.in``, prints the declared plan
(the ``Debug.PPrint`` analog) and the Catalyst physical plan, executes,
writes a tab-separated result file with a header line, and prints the
wall time — the reference's ``Execution time = …`` line. Page size and
buffer count have no Spark analog (Tungsten/AQE manage memory), so
they are intentionally absent.
"""

from __future__ import annotations

import argparse
import sys

from kaj_query_engine_spark.engine import KajEngine
from kaj_query_engine_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="kaj_query_engine_spark")
    ap.add_argument("query_in", help="file containing one dialect query")
    ap.add_argument("query_out", help="tab-separated result file to write")
    ap.add_argument(
        "--tables",
        default="/root/testdata/sf0.01",
        help="directory of <table>.parquet files to register",
    )
    ap.add_argument(
        "--strict",
        action="store_true",
        help="strict reference-compat mode (joins coerce to equality, "
        "GROUPBY rejected)",
    )
    args = ap.parse_args(argv)

    with open(args.query_in) as fh:
        query_text = fh.read().strip()

    spark = get_spark("kaj-cli")
    eng = KajEngine(spark, strict_compat=args.strict)
    eng.load_fixtures(args.tables)

    print(eng.explain_plan(query_text))
    df = eng.sql(query_text)
    df.explain("formatted")
    # the CLI mirrors the reference's one-file query.out UX, so it
    # opts into the driver-collect path explicitly; library callers
    # get the distributed writer by default
    elapsed = eng.execute_to_file(query_text, args.query_out, small_result=True)
    print(f"Execution time = {elapsed:.3f} seconds")
    return 0


if __name__ == "__main__":
    sys.exit(main())
