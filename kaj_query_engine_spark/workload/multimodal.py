"""Multimodal workload over ``documents`` — binary media columns with
typed metadata, Arrow-batched feature extraction, decode-free frame
sampling (operators/multimodal.py; no reference counterpart — the
reference has exactly INT/STRING/REAL, ``Attribute.java:11-13``).

Oracle trick: the fake media payload is sha256-derived from doc_id, so
DuckDB can recompute every checked feature in pure SQL (its ``sha256``
matches Spark's ``sha2(·, 256)`` lowercase hex) — the Spark side still
runs the real binary plumbing (to_binary, mapInPandas, substring on
binary) that a real decoder would use. Entropy/mean-byte features
aren't SQL-expressible → q92 is a rows-only check (the driver records
the weaker gate; by design).
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


@register(
    "q92_media_features",
    None,  # entropy/mean-byte/blob-sha aren't SQL-expressible in the
    # oracle → rows-only check; tests pin both ops against hashlib/math
    "Arrow-batched byte features (n_bytes, first byte, mean, Shannon "
    "entropy) + full-payload sha256 dedup key — both mapInPandas "
    "paths (media_byte_features ⋈ media_checksum)",
)
def q92(spark, sf_dir):
    d = M.attach_fake_media(t(spark, sf_dir, "documents"))
    return M.media_byte_features(d).join(M.media_checksum(d), "doc_id")
