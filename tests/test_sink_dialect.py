"""Byte-compatibility of the distributed raw TSV sink with the
driver-collect ``str(value)`` dialect (``engine.execute_to_file``,
mirroring the reference sink ``/root/reference/src/QueryMain.java:
276-306``): empty strings, NULLs, and timestamps with and without a
fractional second must render identically on both paths.
"""

from __future__ import annotations

import datetime
import glob

from pyspark.sql import functions as F


def _read_tsv_dir(path: str) -> list[str]:
    lines: list[str] = []
    for part in sorted(glob.glob(f"{path}/part-*")):
        with open(part) as fh:
            body = fh.read().splitlines()
        lines.extend(body[1:])  # drop per-part header
    return sorted(lines)


def _fmt_row(row, null="-NULL-"):
    return "\t".join(null if v is None else str(v) for v in row)


def test_raw_sink_matches_driver_collect_dialect(spark, tmp_path):
    from kaj_query_engine_spark.sources.sink import write_result_tsv

    rows = [
        (1, "plain", datetime.datetime(2024, 1, 2, 3, 4, 5)),
        (2, "", datetime.datetime(2024, 1, 2, 3, 4, 5, 500000)),
        (3, None, datetime.datetime(1969, 12, 31, 23, 59, 59, 250000)),
        (4, "x y", None),
    ]
    df = spark.createDataFrame(rows, "id long, s string, ts timestamp")
    out = str(tmp_path / "raw_out")
    write_result_tsv(df, out, null_value="-NULL-", raw=True)
    got = _read_tsv_dir(out)
    expected = sorted(_fmt_row(r) for r in df.collect())
    assert got == expected
    # the load-bearing cells, pinned explicitly:
    by_id = {line.split("\t")[0]: line for line in got}
    # empty string -> empty cell, not ""
    assert by_id["2"].split("\t")[1] == ""
    # zero-microsecond timestamp -> no fractional part
    assert by_id["1"].split("\t")[2] == "2024-01-02 03:04:05"
    # nonzero microseconds -> 6 lpad'ed digits, like str(datetime)
    assert by_id["2"].split("\t")[2] == "2024-01-02 03:04:05.500000"
    # pre-epoch timestamps keep a positive fraction (pmod, not %)
    assert by_id["3"].split("\t")[2] == "1969-12-31 23:59:59.250000"
    # NULLs -> -NULL- (QueryMain.java:299-300)
    assert by_id["3"].split("\t")[1] == "-NULL-"
    assert by_id["4"].split("\t")[2] == "-NULL-"


def test_raw_sink_ntz_timestamps_match(spark, tmp_path):
    """NTZ columns (the driver-fixture physical type) take the same
    str(datetime) form via the UTC-wall-clock cast."""
    from kaj_query_engine_spark.sources.sink import write_result_tsv

    df = spark.createDataFrame(
        [(1, datetime.datetime(2024, 6, 1, 12, 0, 0, 123456))],
        "id long, ts timestamp_ntz",
    )
    out = str(tmp_path / "ntz_out")
    write_result_tsv(df, out, null_value="-NULL-", raw=True)
    (line,) = _read_tsv_dir(out)
    assert line == "1\t2024-06-01 12:00:00.123456"


def test_raw_sink_warns_on_session_process_tz_mismatch(spark, tmp_path):
    """The raw sink's TimestampType byte-compatibility assumes process
    tz == session tz; when they diverge the documented assumption must
    fail loudly (a warning), and stay silent when they match or when
    no TimestampType column is present."""
    import warnings

    from kaj_query_engine_spark.sources.sink import write_result_tsv

    df = spark.createDataFrame(
        [(1, datetime.datetime(2024, 3, 1, 10, 30))], "id long, ts timestamp"
    )
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Pacific/Kiritimati")
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            write_result_tsv(df, str(tmp_path / "o1"), raw=True)
        assert any("byte-compatible" in str(w.message) for w in caught)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    # silent cases: a timestamp-free frame never warns, and a frame
    # with timestamps stays silent when session tz == process tz —
    # the latter only assertable when this machine's process tz
    # actually matches the session's UTC pin
    from zoneinfo import ZoneInfo

    now = datetime.datetime.now(tz=ZoneInfo("UTC"))
    process_is_utc = now.astimezone().utcoffset() == datetime.timedelta(0)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        if process_is_utc:
            write_result_tsv(df, str(tmp_path / "o2"), raw=True)
        write_result_tsv(
            df.select("id"), str(tmp_path / "o3"), raw=True
        )
    assert not [w for w in caught if "byte-compatible" in str(w.message)]
