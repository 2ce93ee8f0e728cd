"""Multimodal workload over ``documents`` — binary media columns with
typed metadata, Arrow-batched feature extraction, decode-free frame
sampling (operators/multimodal.py; no reference counterpart — the
reference has exactly INT/STRING/REAL, ``Attribute.java:11-13``).

Oracle trick: the fake media payload is sha256-derived from doc_id, so
DuckDB can recompute every checked feature in pure SQL (its ``sha256``
matches Spark's ``sha2(·, 256)`` lowercase hex) — the Spark side still
runs the real binary plumbing (to_binary, mapInPandas, substring on
binary) that a real decoder would use. Only Shannon entropy (libm
``log2`` isn't bit-portable across engines) and the sha256-of-BLOB
dedup key (DuckDB's ``sha256`` is VARCHAR-only) stay out of the
oracle-checked output; both are pinned against math/hashlib in tests/.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kaj_query_engine_spark.operators import multimodal as M
from kaj_query_engine_spark.workload.core import t
from kaj_query_engine_spark.workload.registry import register

# payload block i of doc d = sha256('<d>:<i>'); 2 + d % 3 blocks
_N_BLOCKS = "(2 + doc_id % 3)"


@register(
    "q90_media_frames",
    "SELECT doc_id, frame_idx, "
    "substr(sha256(concat(CAST(doc_id AS VARCHAR), ':', "
    "CAST(frame_idx AS VARCHAR))), 1, 16) AS frame_sig, "
    f"CAST(32 * {_N_BLOCKS} AS INT) AS n_bytes, "
    "CAST(64 + (doc_id % 8) * 32 AS INT) AS width, "
    "CAST(64 + (doc_id % 5) * 32 AS INT) AS height, "
    "CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format "
    "FROM documents, "
    f"LATERAL (SELECT unnest(range(0, {_N_BLOCKS})) AS frame_idx)",
    "media ingest + decode-free frame sampling in one result: binary "
    "payload with typed metadata struct (pushdown on metadata prunes "
    "media I/O), exploded into per-frame rows whose 8-byte signature "
    "is sliced JVM-side (substring on binary — whole-stage codegen, "
    "no Python); each frame row carries the media's metadata through "
    "the explode, join-free",
)
def q90(spark, sf_dir):
    d = M.attach_fake_media(t(spark, sf_dir, "documents")).withColumn(
        "n_bytes", F.octet_length("media")
    )
    frames = M.frame_sample(d, keep_cols=("n_bytes", "media_meta"))
    return frames.select(
        "doc_id",
        "frame_idx",
        F.lower(F.hex(F.expr("substring(frame, 1, 8)"))).alias("frame_sig"),
        "n_bytes",
        F.col("media_meta.width").alias("width"),
        F.col("media_meta.height").alias("height"),
        F.col("media_meta.format").alias("format"),
    )


# the payload's hex string, reconstructed in DuckDB SQL
_HEX = (
    f"array_to_string(list_transform(generate_series(0, {_N_BLOCKS} - 1), "
    "i -> sha256(concat(CAST(doc_id AS VARCHAR), ':', CAST(i AS VARCHAR)))"
    "), '')"
)
# byte values of that payload as an INT list
_BYTES = (
    "list_transform(generate_series(1, len(hex)//2), "
    "i -> ('0x' || substr(hex, 2*i - 1, 2))::INT)"
)


@register(
    "q92_media_features",
    "WITH h AS (SELECT doc_id, "
    f"{_HEX} AS hex FROM documents), "
    f"b AS (SELECT doc_id, hex, {_BYTES} AS bytes FROM h), "
    "e AS (SELECT doc_id, unnest(bytes) AS byte FROM b), "
    "hist AS (SELECT doc_id, byte, count(*) AS c FROM e GROUP BY 1, 2), "
    "agg AS (SELECT doc_id, CAST(count(*) AS INT) AS n_distinct_bytes, "
    "CAST(max(c) AS INT) AS mode_count FROM hist GROUP BY 1) "
    "SELECT b.doc_id, CAST(len(bytes) AS INT) AS n_bytes, "
    "substr(hex, 1, 2) AS first_byte_hex, "
    "floor((list_sum(bytes) * 1.0 / len(bytes)) * 1000000 + 0.5) / 1000000 "
    "AS mean_byte, "
    "agg.n_distinct_bytes, agg.mode_count "
    "FROM b JOIN agg ON b.doc_id = agg.doc_id",
    "Arrow-batched byte features over binary media (n_bytes, first "
    "byte, HALF_UP mean byte, histogram distinct/mode counts) — the "
    "mapInPandas path a real decoder would ride; the oracle "
    "reconstructs the sha256-derived payload and every feature in "
    "pure SQL. Shannon entropy + the full-payload sha256 dedup key "
    "stay in the operator (log2 and sha-of-BLOB aren't bit-portable "
    "across engines) and are pinned against math/hashlib in tests/",
)
def q92(spark, sf_dir):
    d = M.attach_fake_media(t(spark, sf_dir, "documents"))
    return M.media_byte_features(d).select(
        "doc_id",
        "n_bytes",
        "first_byte_hex",
        "mean_byte",
        "n_distinct_bytes",
        "mode_count",
    )
