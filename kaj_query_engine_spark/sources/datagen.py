"""Synthetic table generation from ``.det`` specs — the analog of the
reference's third entry point ``RandomDB``
(``/root/reference/src/RandomDB.java:17-176``), which reads
``<table>.det`` (column name/type/range/keytype/size, e.g.
``testcases/CUSTOMER.det``) and emits ``<table>.txt`` (TSV),
``<table>.stat`` (row count + per-column distinct counts) and a
serialized schema.

Spark-first redesign — the reference loops ``random.nextInt`` on one
thread; at 100 TB generation itself must be distributed:

- ``spark.range(n)`` is the backbone: each row's values are pure
  JVM-side functions of its row id (xxhash64-seeded), so generation is
  embarrassingly parallel, deterministic under a seed, and re-runnable
  (same seed → byte-identical table at any parallelism — the
  reference's time-seeded RNG can't reproduce anything).
- PK INTEGER columns need *unique* values in [0, range): the reference
  rejection-samples against an in-memory bitmap (RandomDB.java:126-133)
  — inherently serial. We use an affine permutation
  ``(a*i + b) mod range`` with gcd(a, range) = 1: a bijection on
  [0, range), random-looking, computed per-row with no coordination.
- STRING columns: per-character hash → 'a'..'z', matching the
  reference's ``randString`` alphabet (RandomDB.java:180-186).
- REAL columns: ``range * u`` with u ∈ [0,1) from the row hash
  (RandomDB.java:122-124).
- The ``.stat`` side-channel (row count + distinct counts,
  RandomDB.java:148-170) becomes a :class:`TableStats` feeding
  ``EXPLAIN COST`` directly, plus an optional written file.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kaj_query_engine_spark.plans.cost import TableStats


@dataclass(frozen=True)
class DetColumn:
    name: str
    dtype: str  # INTEGER | STRING | REAL
    range: int  # ints: values in [0, range); strings: length; reals: scale
    keytype: str  # PK | FK | NK
    attr_bytes: int


@dataclass(frozen=True)
class DetSchema:
    columns: tuple[DetColumn, ...]
    tuple_bytes: int

    @property
    def names(self) -> list[str]:
        return [c.name for c in self.columns]


def parse_det(text: str) -> DetSchema:
    """Parse the reference's ``.det`` format: line 1 = #columns,
    line 2 = tuple size in bytes, then one
    ``<name> <type> <range> <keytype> <bytes>`` line per column
    (RandomDB.java:41-111)."""
    lines = [ln.split() for ln in text.strip().splitlines() if ln.strip()]
    n_cols = int(lines[0][0])
    tuple_bytes = int(lines[1][0])
    cols = []
    for parts in lines[2 : 2 + n_cols]:
        name, dtype, rng, keytype, nbytes = parts[:5]
        if dtype not in ("INTEGER", "STRING", "REAL"):
            raise ValueError(f"invalid data type {dtype!r} for column {name}")
        cols.append(DetColumn(name, dtype, int(rng), keytype, int(nbytes)))
    if len(cols) != n_cols:
        raise ValueError(f"expected {n_cols} column lines, got {len(cols)}")
    return DetSchema(tuple(cols), tuple_bytes)


def load_det(path: str) -> DetSchema:
    with open(path) as fh:
        return parse_det(fh.read())


def _coprime_multiplier(modulus: int, seed: int) -> int:
    """Deterministic a with gcd(a, modulus) = 1 for the affine PK
    permutation."""
    a = (2 * seed + 1) % modulus or 1
    while math.gcd(a, modulus) != 1:
        a = (a + 2) % modulus or 1
    return a


def generate_table(
    spark: SparkSession,
    det: DetSchema,
    num_rows: int,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic generation: one ``spark.range`` pass,
    every column a codegen-friendly expression of the row id."""
    pk_ranges = [c.range for c in det.columns if c.keytype == "PK"]
    for r in pk_ranges:
        if num_rows > r:
            raise ValueError(
                f"cannot generate {num_rows} unique PK values in range {r}"
            )
    base = (
        spark.range(0, num_rows, 1, num_partitions)
        if num_partitions
        else spark.range(num_rows)
    )
    out_cols = []
    for idx, c in enumerate(det.columns):
        h = F.xxhash64(F.col("id"), F.lit(seed), F.lit(idx), F.lit(c.name))
        if c.dtype == "INTEGER":
            if c.keytype == "PK":
                a = _coprime_multiplier(c.range, seed + idx)
                b = (seed * 2654435761 + idx) % c.range
                col = F.pmod(F.col("id") * F.lit(a) + F.lit(b), F.lit(c.range))
            else:
                col = F.pmod(h, F.lit(c.range))
            out_cols.append(col.cast("int").alias(c.name))
        elif c.dtype == "REAL":
            u = F.pmod(h, F.lit(1 << 53)) / F.lit(float(1 << 53))
            out_cols.append((F.lit(float(c.range)) * u).cast("float").alias(c.name))
        else:  # STRING of length `range`, alphabet a-z
            chars = F.transform(
                F.sequence(F.lit(1), F.lit(c.range)),
                lambda i: F.char(
                    F.pmod(
                        F.xxhash64(F.col("id"), F.lit(seed), F.lit(idx), i),
                        F.lit(26),
                    )
                    + F.lit(97)
                ),
            )
            out_cols.append(F.array_join(chars, "").alias(c.name))
    return base.select(*out_cols)


def det_stats(det: DetSchema, num_rows: int) -> TableStats:
    """The ``.stat`` numbers as the reference derives them
    (RandomDB.java:148-170): STRING/REAL → num_rows; INTEGER PK →
    num_rows (all distinct by construction); INTEGER NK/FK →
    min(num_rows, range)."""
    distinct = {}
    for c in det.columns:
        if c.dtype == "INTEGER" and c.keytype not in ("PK",):
            distinct[c.name.lower()] = min(num_rows, c.range)
        else:
            distinct[c.name.lower()] = num_rows
    return TableStats(
        num_rows=num_rows, distinct=distinct, num_cols=len(det.columns)
    )


def write_random_db(
    spark: SparkSession,
    det_path: str,
    num_rows: int,
    out_dir: str,
    table_name: str,
    seed: int = 42,
    fmt: str = "parquet",
) -> DataFrame:
    """End-to-end ``RandomDB`` run: spec → distributed table on disk +
    ``<table>.stat`` (first line row count, second line per-column
    distinct counts, tab-separated — the reference's file layout,
    RandomDB.java:37-39,148-170)."""
    import os

    det = load_det(det_path)
    df = generate_table(spark, det, num_rows, seed)
    path = os.path.join(out_dir, table_name)
    if fmt == "tsv":  # the reference's .txt shape
        df.select(
            F.concat_ws("\t", *[F.col(c).cast("string") for c in det.names])
        ).write.mode("overwrite").text(path)
    else:
        df.write.mode("overwrite").parquet(path)
    st = det_stats(det, num_rows)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, f"{table_name}.stat"), "w") as fh:
        fh.write(f"{st.num_rows}\n")
        fh.write(
            "\t".join(str(st.distinct[c.name.lower()]) for c in det.columns)
            + "\n"
        )
    return df
