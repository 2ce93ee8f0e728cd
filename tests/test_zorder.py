"""Z-order clustering: files must be prunable on BOTH clustered
columns via parquet min/max footer stats — the property single-column
sorting cannot give."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from kaj_query_engine_spark.sources.layout import write_zordered, zorder_value

# a slab predicate on one of two z-ordered dims intersects ~sqrt(F) of
# F files, so pruning only shows at a reasonable file count
N_FILES = 32


def _files_matching(path: str, col: str, lo, hi) -> int:
    """Count parquet files whose [min,max] for col intersects [lo,hi]
    — what a footer-stats scan would have to open."""
    n = 0
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        fmin, fmax = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    fmin = s.min if fmin is None else min(fmin, s.min)
                    fmax = s.max if fmax is None else max(fmax, s.max)
        if fmin is None or (fmax >= lo and fmin <= hi):
            n += 1
    return n


def test_zorder_prunes_both_columns(spark, tmp_path):
    df = spark.createDataFrame(
        [(i % 500, (i * 37) % 1000) for i in range(20000)], "a long, b long"
    )
    zpath = str(tmp_path / "zorder")
    apath = str(tmp_path / "asort")
    write_zordered(df, zpath, ["a", "b"], num_files=N_FILES)
    # baseline: cluster on `a` alone
    df.repartitionByRange(N_FILES, "a").sortWithinPartitions("a").write.mode(
        "overwrite"
    ).parquet(apath)

    # narrow predicates on each dimension (~2% of the value space)
    za = _files_matching(zpath, "a", 100, 110)
    zb = _files_matching(zpath, "b", 400, 420)
    aa = _files_matching(apath, "a", 100, 110)
    ab = _files_matching(apath, "b", 400, 420)

    assert aa <= 2  # single-column sort prunes its own column...
    assert ab == N_FILES  # ...but is blind on the other
    # z-order prunes BOTH dimensions (~sqrt(F) files each, far from F)
    assert za <= N_FILES // 2
    assert zb <= N_FILES // 2
    assert za + zb < aa + ab  # strictly better combined

    # round trip preserves the data
    back = spark.read.parquet(zpath)
    assert back.count() == 20000


def test_zorder_value_interleaves(spark):
    df = spark.createDataFrame([(0, 0), (1, 1)], "a long, b long")
    vals = sorted(
        r[0] for r in df.select(zorder_value(df, ["a", "b"], bits=2)).collect()
    )
    # rank-normalized: ntile(4) over 2 rows -> ranks {0,1} per column;
    # (0,0) -> 0b00 = 0, (1,1) -> 0b11 = 3
    assert vals == [0, 3]
