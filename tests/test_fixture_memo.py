"""The per-session fixture memo must invalidate when the driver
regenerates a fixture parquet mid-session (the documented
between-rounds behavior): the staleness token (``source_token``:
mtime_ns + size) keys the memo, so a rewritten file yields a FRESH
DataFrame instead of one analyzed against the old footer.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

from kaj_query_engine_spark.workload.core import source_token, t


def _write(path, ids):
    pq.write_table(pa.table({"x_id": pa.array(ids, pa.int64())}), path)


def test_memo_invalidates_on_fixture_rewrite(spark, tmp_path):
    sf_dir = str(tmp_path)
    path = f"{sf_dir}/memotest.parquet"
    _write(path, [1, 2, 3])
    df1 = t(spark, sf_dir, "memotest")
    assert df1.count() == 3
    # same file, untouched -> same memoized plan object
    assert t(spark, sf_dir, "memotest") is df1
    # regenerate with different contents (and force a distinct mtime —
    # same-second rewrites are exactly what mtime_ns granularity is for,
    # but belt-and-braces against coarse filesystem clocks)
    _write(path, [1, 2, 3, 4, 5])
    st = os.stat(path)
    os.utime(path, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    df2 = t(spark, sf_dir, "memotest")
    assert df2 is not df1
    assert df2.count() == 5


def test_source_token_missing_file(tmp_path):
    assert source_token(str(tmp_path / "nope.parquet")) == ("missing",)


def test_layout_cache_rebuilds_on_source_change(spark, tmp_path):
    """The q35 layout cache shares the same source token: a rewritten
    source, a changed layout-params string, or a marker with no data
    files behind it all invalidate the copy; tokens computed BEFORE
    the write stamp the generation they actually read."""
    from kaj_query_engine_spark.workload.scale import (
        _layout_current,
        _layout_token,
        _stamp_layout,
    )

    src = str(tmp_path / "events.parquet")
    dst = tmp_path / "layout_copy"
    dst.mkdir()
    _write(src, [1, 2, 3])
    tok = _layout_token(src, "hive:x:v1")
    # marker present but NO data files -> not current
    _stamp_layout(tok, str(dst))
    assert not _layout_current(tok, str(dst))
    # with a data file it is current
    _write(str(dst / "part-00000.parquet"), [1])
    assert _layout_current(tok, str(dst))
    # different layout params -> different token -> stale
    assert not _layout_current(_layout_token(src, "zorder:x:v1"), str(dst))
    # rewrite the source -> the OLD stamped token no longer matches
    _write(src, [9, 9, 9])
    st = os.stat(src)
    os.utime(src, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    assert not _layout_current(_layout_token(src, "hive:x:v1"), str(dst))
    # missing source -> never current
    assert not _layout_current(
        _layout_token(str(tmp_path / "gone.parquet"), "hive:x:v1"), str(dst)
    )
