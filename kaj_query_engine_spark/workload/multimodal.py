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


# q93: REAL PNG codec, oracle-checked. attach_png_media's pixel model
# is scanline i = first W bytes of sha256('<doc_id>:r<i>'), W ≤ 32, so
# DuckDB reconstructs the decoded pixel buffer's hex (one digest per
# scanline, substr'd to the row stride) with zero PNG code — while the
# Spark side goes the long way: encode (cycling all 5 PNG filters) →
# zlib → chunk framing → decode → pixels. A digest match means the
# whole codec (filter math included) is exact. The 'resize' branch
# re-encodes the nearest-neighbor-sampled image and decodes it AGAIN,
# pinning encoder and decoder twice with the floor index rule
# yi = ti·H//8 reproduced in SQL.
_PNG_W = "(16 + (doc_id % 4) * 4)"
_PNG_H = "(12 + (doc_id % 3) * 6)"
_PNG_DECODE_SQL = (
    "SELECT 'decode' AS path, doc_id, "
    f"CAST({_PNG_W} AS INT) AS width, CAST({_PNG_H} AS INT) AS height, "
    "md5(array_to_string(list_transform("
    f"generate_series(0, {_PNG_H} - 1), "
    "i -> substr(sha256(concat(CAST(doc_id AS VARCHAR), ':r', "
    f"CAST(i AS VARCHAR))), 1, 2 * {_PNG_W})), '')) AS pix_md5 "
    "FROM documents"
)
_PNG_RESIZE_SQL = (
    "SELECT 'resize' AS path, doc_id, "
    "CAST(8 AS INT) AS width, CAST(8 AS INT) AS height, "
    "md5(string_agg("
    "substr(sha256(concat(CAST(doc_id AS VARCHAR), ':r', "
    f"CAST((ti * {_PNG_H}) // 8 AS VARCHAR))), "
    f"CAST((tj * {_PNG_W}) // 8 AS INT) * 2 + 1, 2), "
    "'' ORDER BY ti, tj)) AS pix_md5 "
    "FROM documents, generate_series(0, 7) g1(ti), "
    "generate_series(0, 7) g2(tj) GROUP BY doc_id"
)


@register(
    "q93_png_decode",
    f"{_PNG_DECODE_SQL} UNION ALL {_PNG_RESIZE_SQL}",
    "REAL image decode, oracle-checked: genuine PNG bytes (pure-stdlib "
    "encoder cycling all five scanline filters) are decoded by the "
    "pure-stdlib codec inside mapInPandas; the oracle reconstructs the "
    "decoded pixel buffer from the sha256 scanline model in pure SQL, "
    "so a digest match pins zlib framing, CRCs, and the filter math "
    "end-to-end. 'resize' re-encodes the nearest-neighbor 8x8 sample "
    "and decodes it again (floor index rule reproduced oracle-side). "
    "Non-PNG codecs stay honestly guarded (no libraries here)",
)
def q93(spark, sf_dir):
    d = M.attach_png_media(t(spark, sf_dir, "documents"))
    dec = M.decode_media(d)
    pix_md5 = F.md5(F.lower(F.hex(F.col("pixels"))))
    decoded = dec.select(
        F.lit("decode").alias("path"),
        "doc_id",
        "width",
        "height",
        pix_md5.alias("pix_md5"),
    )
    resized = M.decode_media(M.resize_decoded_media(d, 8, 8)).select(
        F.lit("resize").alias("path"),
        "doc_id",
        "width",
        "height",
        pix_md5.alias("pix_md5"),
    )
    return decoded.unionAll(resized)
