"""Result sink.

The reference's sink is a driver-side tab-separated text writer with a
schema header line; aggregate columns print as ``AGG(tab.col)``
(``/root/reference/src/QueryMain.java:276-306``). The Spark analog
keeps the same on-disk shape but writes distributed: header via CSV
options, tabs via ``sep``, and the file count controlled by the caller
(coalesce only for small final results — a 100 TB result stays
many-file).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType


def _py_str_timestamp(c: Column) -> Column:
    """Render a timestamp exactly like Python ``str(datetime)``: the
    fractional part is six lpad'ed digits when microsecond != 0 and
    ABSENT when it is zero — no single Java ``timestampFormat`` pattern
    can express that conditional, so the raw sink formats explicitly.
    ``pmod`` keeps the remainder positive for pre-epoch timestamps.
    """
    base = F.date_format(c, "yyyy-MM-dd HH:mm:ss")
    micro = F.pmod(F.unix_micros(c), F.lit(1_000_000))
    return F.when(micro == F.lit(0), base).otherwise(
        F.concat(base, F.lit("."), F.lpad(micro.cast("string"), 6, "0"))
    )


def _warn_if_tz_mismatch(df: DataFrame) -> None:
    """Raw mode's timestamp byte-compatibility with the driver-collect
    path assumes process tz == ``spark.sql.session.timeZone`` (see the
    docstring below). A documented assumption should fail LOUDLY, so
    warn when it doesn't hold and the frame actually carries
    TimestampType (NTZ is wall-clock, unaffected)."""
    if not any(isinstance(f.dataType, TimestampType) for f in df.schema.fields):
        return
    import datetime
    import warnings
    from zoneinfo import ZoneInfo

    session_tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
    try:
        now_utc = datetime.datetime.now(tz=ZoneInfo("UTC"))
        # convert the aware instant INTO the session zone — calling
        # utcoffset(now_utc) directly would misread the UTC wall clock
        # as zone-local time and compute the offset at the wrong
        # instant inside DST transition windows
        session_off = now_utc.astimezone(ZoneInfo(session_tz)).utcoffset()
        process_off = now_utc.astimezone().utcoffset()
    except Exception:
        return  # unparseable tz id — nothing reliable to compare
    if session_off != process_off:
        warnings.warn(
            f"raw TSV sink: session timezone {session_tz!r} differs from "
            "the process timezone — TimestampType cells will not be "
            "byte-compatible with driver-collect str(datetime) output",
            stacklevel=3,
        )


def write_result_tsv(
    df: DataFrame,
    path: str,
    single_file: bool = False,
    null_value: str | None = None,
    raw: bool = False,
) -> None:
    """Write ``df`` as tab-separated text with a header line.

    ``single_file=True`` coalesces to one partition — the literal
    analog of the reference's one ``query.out`` file; leave False for
    large results so every executor writes its own part file (each
    part carries its own header line).
    ``null_value`` renders NULL cells (the reference prints
    ``-NULL-``, ``QueryMain.java:299-300``); default empty.
    ``raw=True`` emits cells like the reference's ``str(value)`` sink
    (and the driver-collect path in ``engine.execute_to_file``): no
    CSV quoting/escaping, empty strings as empty cells (not ``""``),
    timestamps in Python ``str(datetime)`` form (fraction only when
    nonzero). Known residual divergence from ``str(value)``: doubles
    that Java renders in scientific notation (``1.0E20`` vs Python's
    ``1e+20``) — cast such columns to DECIMAL/string upstream if they
    must round-trip byte-identically. Timestamp byte-compatibility
    with the driver-collect path additionally assumes the PROCESS
    timezone equals the session timezone (UTC here): ``collect()``
    localizes TimestampType with the process tz while this sink uses
    the session tz. Inherited from the reference: an embedded tab
    breaks the column grid.
    """
    out = df.coalesce(1) if single_file else df
    if raw:
        _warn_if_tz_mismatch(df)
        # timestamp cells must match str(datetime); NTZ first casts to
        # TIMESTAMP (UTC session -> identical wall clock)
        for f in out.schema.fields:
            if isinstance(f.dataType, TimestampNTZType):
                out = out.withColumn(
                    f.name, _py_str_timestamp(F.col(f.name).cast("timestamp"))
                )
            elif isinstance(f.dataType, TimestampType):
                out = out.withColumn(f.name, _py_str_timestamp(F.col(f.name)))
    writer = out.write.mode("overwrite").options(sep="\t", header="true")
    if null_value is not None:
        writer = writer.option("nullValue", null_value)
    if raw:
        writer = (
            writer.option("quote", "")
            .option("escapeQuotes", "false")
            # the write-side default renders empty strings as literal
            # "" even with quoting disabled; the reference prints them
            # as empty cells
            .option("emptyValue", "")
        )
    writer.csv(path)
