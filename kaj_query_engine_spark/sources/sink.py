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

from pyspark.sql import DataFrame


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
    ``raw=True`` disables CSV quoting/escaping so cells are emitted as
    bare strings exactly like the reference's ``str(value)`` sink —
    byte-compatible with the driver-collect path, at the (inherited)
    cost that an embedded tab breaks the column grid.
    """
    out = df.coalesce(1) if single_file else df
    writer = out.write.mode("overwrite").options(sep="\t", header="true")
    if null_value is not None:
        writer = writer.option("nullValue", null_value)
    if raw:
        writer = writer.option("quote", "").option("escapeQuotes", "false")
    writer.csv(path)
