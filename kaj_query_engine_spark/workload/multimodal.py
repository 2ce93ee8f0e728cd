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


# round 13 registry discipline: the former q90_media_frames,
# q92_media_features and q96_stream_media_decode are MERGED into ONE
# tagged query q90_media_pipeline (the q57/q63 pattern — one shared
# superset schema, every branch keeping its own plan shape), freeing
# two registry slots for the 50-query rotation window. The per-branch
# oracles below are UNCHANGED; the merged oracle pads each to the
# union schema.
_Q90_FRAMES_ORACLE = (
    "SELECT doc_id, frame_idx, "
    "substr(sha256(concat(CAST(doc_id AS VARCHAR), ':', "
    "CAST(frame_idx AS VARCHAR))), 1, 16) AS frame_sig, "
    f"CAST(32 * {_N_BLOCKS} AS INT) AS n_bytes, "
    "CAST(64 + (doc_id % 8) * 32 AS INT) AS width, "
    "CAST(64 + (doc_id % 5) * 32 AS INT) AS height, "
    "CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format "
    "FROM documents, "
    f"LATERAL (SELECT unnest(range(0, {_N_BLOCKS})) AS frame_idx)"
)


def _media_frames(spark, sf_dir):
    """media ingest + decode-free frame sampling: binary payload with
    typed metadata struct (pushdown on metadata prunes media I/O),
    exploded into per-frame rows whose 8-byte signature is sliced
    JVM-side (substring on binary — whole-stage codegen, no Python);
    each frame row carries the media's metadata through the explode,
    join-free."""
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


_Q92_FEATURES_ORACLE = (
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
    "FROM b JOIN agg ON b.doc_id = agg.doc_id"
)


def _media_features(spark, sf_dir):
    """Arrow-batched byte features over binary media (n_bytes, first
    byte, HALF_UP mean byte, histogram distinct/mode counts) — the
    mapInPandas path a real decoder would ride; the oracle
    reconstructs the sha256-derived payload and every feature in pure
    SQL. Shannon entropy + the full-payload sha256 dedup key stay in
    the operator (log2 and sha-of-BLOB aren't bit-portable across
    engines) and are pinned against math/hashlib in tests/."""
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


def _png_decode_sql(path: str) -> str:
    # pixel reconstruction is path-independent: the 'adam7' branch
    # decodes the SAME model through interlaced framing, so any pass-
    # geometry or scatter bug diverges from this SQL
    return (
        f"SELECT '{path}' AS path, doc_id, "
        f"CAST({_PNG_W} AS INT) AS width, CAST({_PNG_H} AS INT) AS height, "
        "md5(array_to_string(list_transform("
        f"generate_series(0, {_PNG_H} - 1), "
        "i -> substr(sha256(concat(CAST(doc_id AS VARCHAR), ':r', "
        f"CAST(i AS VARCHAR))), 1, 2 * {_PNG_W})), '')) AS pix_md5 "
        "FROM documents"
    )


_PNG_DECODE_SQL = _png_decode_sql("decode")

# grey16: the SAME first-W-bytes row model read as W/2 big-endian
# uint16 samples — decoded sample bytes equal the 8-bit model's, so
# only the width column halves (depth-16 filtering and BE sample
# order ride the shared digest)
_PNG_GREY16_SQL = (
    "SELECT 'grey16' AS path, doc_id, "
    f"CAST({_PNG_W} // 2 AS INT) AS width, "
    f"CAST({_PNG_H} AS INT) AS height, "
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


# palette: the same row model as palette INDICES through the ramp
# palette[i] = (i, 255-i, 7i mod 256); decoded RGB pixel = that triple
# per model byte — real PLTE indexing, one printf away in SQL
_PNG_PALETTE_SQL = (
    "WITH px AS (SELECT doc_id, i, j, "
    "(strpos('0123456789abcdef', hx[2*j-1]) - 1) * 16 "
    "+ (strpos('0123456789abcdef', hx[2*j]) - 1) AS b "
    "FROM (SELECT doc_id, i, sha256(concat(CAST(doc_id AS VARCHAR), "
    "':r', CAST(i AS VARCHAR))) AS hx FROM documents, "
    f"generate_series(0, 23) g(i) WHERE i < {_PNG_H}), "
    f"generate_series(1, 32) gj(j) WHERE j <= {_PNG_W}) "
    "SELECT 'palette' AS path, doc_id, "
    f"CAST({_PNG_W} AS INT) AS width, CAST({_PNG_H} AS INT) AS height, "
    "md5(string_agg(printf('%02x%02x%02x', b, 255 - b, (b * 7) % 256), "
    "'' ORDER BY i, j)) AS pix_md5 FROM px GROUP BY doc_id"
)
# rgba: row r = first 4W bytes of four concatenated digests — the
# decoded RGBA buffer is the model byte-for-byte
_PNG_RGBA_SQL = (
    "SELECT 'rgba' AS path, doc_id, "
    f"CAST({_PNG_W} AS INT) AS width, CAST({_PNG_H} AS INT) AS height, "
    "md5(array_to_string(list_transform("
    f"generate_series(0, 23), "
    "i -> CASE WHEN i < " + _PNG_H + " THEN "
    "substr(concat("
    "sha256(concat(CAST(doc_id AS VARCHAR), ':q', CAST(i AS VARCHAR), ':0')), "
    "sha256(concat(CAST(doc_id AS VARCHAR), ':q', CAST(i AS VARCHAR), ':1')), "
    "sha256(concat(CAST(doc_id AS VARCHAR), ':q', CAST(i AS VARCHAR), ':2')), "
    "sha256(concat(CAST(doc_id AS VARCHAR), ':q', CAST(i AS VARCHAR), ':3'))"
    f"), 1, 8 * {_PNG_W}) ELSE '' END), '')) AS pix_md5 "
    "FROM documents"
)


_PNG_ORACLE = (
    f"{_PNG_DECODE_SQL} UNION ALL {_PNG_RESIZE_SQL} "
    f"UNION ALL ({_png_decode_sql('adam7')}) "
    f"UNION ALL ({_PNG_GREY16_SQL}) "
    f"UNION ALL ({_PNG_PALETTE_SQL}) UNION ALL ({_PNG_RGBA_SQL})"
)


def _png_branches(spark, sf_dir):
    """REAL image decode, oracle-checked: genuine PNG bytes (pure-
    stdlib encoder cycling all five scanline filters) are decoded by
    the pure-stdlib codec inside mapInPandas; the oracle reconstructs
    the decoded pixel buffer from the sha256 scanline model in pure
    SQL, so a digest match pins zlib framing, CRCs, and the filter
    math end-to-end. 'resize' re-encodes the nearest-neighbor 8x8
    sample and decodes it again (floor index rule reproduced
    oracle-side); 'adam7' re-encodes the same pixels INTERLACED
    (seven independently-filtered reduced passes) against the same
    decode oracle — pass geometry and scatter pinned; 'grey16' reads
    the same byte model as big-endian uint16 samples through DEPTH-16
    streams (2-byte filter offset, BE wire order) against the same
    digest; 'palette' writes color type 3 (PLTE) — the row model as
    indices through the ramp palette (i, 255-i, 7i mod 256), so the
    decoded RGB pins real palette indexing; 'rgba' writes color
    type 6 (4-byte pixels, 4 digests per row)."""
    # persist the generated PNG corpus: BOTH branches of the union read
    # it, and without the cache Spark re-runs the whole encode pass per
    # branch (a real corpus would be read from storage, not generated —
    # the cache stands in for that table, a few MB per fixture scale)
    d = M.attach_png_media(t(spark, sf_dir, "documents")).persist()
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
    adam7 = M.decode_media(
        M.attach_png_media(t(spark, sf_dir, "documents"), interlace=True)
    ).select(
        F.lit("adam7").alias("path"),
        "doc_id",
        "width",
        "height",
        pix_md5.alias("pix_md5"),
    )
    grey16 = M.decode_media(
        M.attach_png_media(t(spark, sf_dir, "documents"), depth16=True)
    ).select(
        F.lit("grey16").alias("path"),
        "doc_id",
        "width",
        "height",
        pix_md5.alias("pix_md5"),
    )
    paletted = M.decode_media(
        M.attach_png_media(t(spark, sf_dir, "documents"), palette=True)
    ).select(
        F.lit("palette").alias("path"),
        "doc_id",
        "width",
        "height",
        pix_md5.alias("pix_md5"),
    )
    rgba = M.decode_media(
        M.attach_png_media(t(spark, sf_dir, "documents"), rgba=True)
    ).select(
        F.lit("rgba").alias("path"),
        "doc_id",
        "width",
        "height",
        pix_md5.alias("pix_md5"),
    )
    return (
        decoded.unionAll(resized).unionAll(adam7).unionAll(grey16)
        .unionAll(paletted).unionAll(rgba)
    )


# q94: REAL WAV/PCM codec, oracle-checked. attach_wav_media's sample
# model: block j of doc d = sha256('<d>:a<j>').digest() read as 16
# little-endian int16 samples, n = (6 + d%4)*16 samples, rate =
# 8000 + (d%3)*4000. The WAV data chunk is the digest concatenation
# byte-for-byte, so DuckDB reconstructs (1) the decoded PCM buffer's
# hex (digest concat), (2) every SAMPLE VALUE — a 4-hex-char window
# parsed via strpos nibble lookup — and hence every feature, and (3)
# the nearest-neighbor resample (floor rule k = ti*n//64) — with zero
# WAV code. Feature exactness: energy = Σv² stays in exact int64 (no
# float summation-order drift) and rms/duration derive from it via
# single correctly-rounded IEEE ops (sqrt(energy/n), n/rate), so both
# engines reach bit-identical doubles.
_WAV_N = "((6 + doc_id % 4) * 16)"
_WAV_RATE = "(8000 + (doc_id % 3) * 4000)"
_WAV_NULL_FEATURES = (
    "CAST(NULL AS DOUBLE) AS duration_s, CAST(NULL AS BIGINT) AS energy, "
    "CAST(NULL AS DOUBLE) AS rms, CAST(NULL AS INT) AS zcr, "
    "CAST(NULL AS INT) AS peak"
)
_WAV_DECODE_SQL = (
    "SELECT 'decode' AS path, doc_id, "
    f"CAST({_WAV_RATE} AS INT) AS rate, CAST({_WAV_N} AS INT) AS n_samples, "
    "md5(array_to_string(list_transform("
    "generate_series(0, 5 + doc_id % 4), "
    "j -> sha256(concat(CAST(doc_id AS VARCHAR), ':a', "
    "CAST(j AS VARCHAR)))), '')) AS buf_md5, "
    f"{_WAV_NULL_FEATURES} FROM documents"
)
# stereo: channel-interleaved buffer — sample i contributes 4 hex
# chars of the 'a' model then 4 of the 'b' model (the same interleave
# oracle q99's stereo FLAC branch uses: one oracle shape, two codecs)
_WAV_STEREO_SQL = (
    "WITH h AS (SELECT doc_id, "
    "array_to_string(list_transform(generate_series(0, 5 + doc_id % 4), "
    "j -> sha256(concat(CAST(doc_id AS VARCHAR), ':a', "
    "CAST(j AS VARCHAR)))), '') AS a, "
    "array_to_string(list_transform(generate_series(0, 5 + doc_id % 4), "
    "j -> sha256(concat(CAST(doc_id AS VARCHAR), ':b', "
    "CAST(j AS VARCHAR)))), '') AS b "
    "FROM documents) "
    "SELECT 'stereo' AS path, doc_id, "
    f"CAST({_WAV_RATE} AS INT) AS rate, CAST({_WAV_N} AS INT) AS n_samples, "
    "md5(array_to_string(list_transform("
    f"generate_series(0, {_WAV_N} - 1), "
    "i -> substr(a, 4 * i + 1, 4) || substr(b, 4 * i + 1, 4)), '')) "
    f"AS buf_md5, {_WAV_NULL_FEATURES} FROM h"
)
# one row per (doc, sample): quad = the sample's 4 hex chars (bytes in
# buffer order: lo then hi), val = the signed int16 it encodes
_WAV_SAMPLES_CTE = (
    "WITH s AS (SELECT doc_id, k, "
    f"substr(sha256(concat(CAST(doc_id AS VARCHAR), ':a', "
    "CAST(k // 16 AS VARCHAR))), (k % 16) * 4 + 1, 4) AS quad "
    f"FROM documents, generate_series(0, 143) g(k) WHERE k < {_WAV_N}), "
    "v AS (SELECT doc_id, k, "
    "(((strpos('0123456789abcdef', quad[3]) - 1) * 16 "
    "+ (strpos('0123456789abcdef', quad[4]) - 1)) * 256 "
    "+ (strpos('0123456789abcdef', quad[1]) - 1) * 16 "
    "+ (strpos('0123456789abcdef', quad[2]) - 1) "
    "+ 32768) % 65536 - 32768 AS val FROM s), "
    "w AS (SELECT doc_id, k, val, "
    "lag(val) OVER (PARTITION BY doc_id ORDER BY k) AS pval FROM v)"
)
_WAV_FEATURES_SQL = (
    f"{_WAV_SAMPLES_CTE} "
    "SELECT 'features' AS path, doc_id, "
    f"CAST({_WAV_RATE} AS INT) AS rate, CAST({_WAV_N} AS INT) AS n_samples, "
    "CAST(NULL AS VARCHAR) AS buf_md5, "
    f"CAST({_WAV_N} AS DOUBLE) / {_WAV_RATE} AS duration_s, "
    "CAST(SUM(CAST(val AS BIGINT) * val) AS BIGINT) AS energy, "
    f"sqrt(CAST(SUM(CAST(val AS BIGINT) * val) AS DOUBLE) / {_WAV_N}) "
    "AS rms, "
    "CAST(SUM(CASE WHEN val * pval < 0 THEN 1 ELSE 0 END) AS INT) AS zcr, "
    "CAST(MAX(ABS(val)) AS INT) AS peak "
    "FROM w GROUP BY doc_id"
)
_WAV_RESAMPLE_SQL = (
    "SELECT 'resample' AS path, doc_id, "
    "CAST(8000 AS INT) AS rate, CAST(64 AS INT) AS n_samples, "
    "md5(string_agg(substr(sha256(concat(CAST(doc_id AS VARCHAR), ':a', "
    f"CAST(((ti * {_WAV_N}) // 64) // 16 AS VARCHAR))), "
    f"(((ti * {_WAV_N}) // 64) % 16) * 4 + 1, 4), '' ORDER BY ti)) "
    "AS buf_md5, "
    f"{_WAV_NULL_FEATURES} "
    "FROM documents, generate_series(0, 63) g(ti) GROUP BY doc_id"
)


# pcm8: the same block model read as UNSIGNED bytes (WAV 8-bit PCM is
# offset-binary) — the decoded buffer is the digest concatenation with
# 32 samples per block
_WAV_PCM8_SQL = (
    "SELECT 'pcm8' AS path, doc_id, "
    f"CAST({_WAV_RATE} AS INT) AS rate, "
    "CAST((6 + doc_id % 4) * 32 AS INT) AS n_samples, "
    "md5(array_to_string(list_transform("
    "generate_series(0, 5 + doc_id % 4), "
    "j -> sha256(concat(CAST(doc_id AS VARCHAR), ':a', "
    "CAST(j AS VARCHAR)))), '')) AS buf_md5, "
    f"{_WAV_NULL_FEATURES} FROM documents"
)
# pcm24: first 30 bytes of each block as 10 three-byte LE signed
# samples; the oracle re-derives the SIGN EXTENSION (the real decode
# step) and re-packs each value as the int32 LE buffer the decoder
# emits
_WAV_PCM24_NIB = "(strpos('0123456789abcdef', hx[{p}]) - 1)"
_WAV_PCM24_SQL = (
    "WITH t AS (SELECT doc_id, k, "
    "substr(sha256(concat(CAST(doc_id AS VARCHAR), ':a', "
    "CAST(k // 10 AS VARCHAR))), (k % 10) * 6 + 1, 6) AS hx "
    "FROM documents, generate_series(0, 89) g(k) "
    "WHERE k < (6 + doc_id % 4) * 10), "
    "v AS (SELECT doc_id, k, (("
    + _WAV_PCM24_NIB.format(p=1) + " * 16 + " + _WAV_PCM24_NIB.format(p=2)
    + ") + 256 * ("
    + _WAV_PCM24_NIB.format(p=3) + " * 16 + " + _WAV_PCM24_NIB.format(p=4)
    + ") + 65536 * ("
    + _WAV_PCM24_NIB.format(p=5) + " * 16 + " + _WAV_PCM24_NIB.format(p=6)
    + ") + 8388608) % 16777216 - 8388608 AS val FROM t), "
    "u AS (SELECT doc_id, k, "
    "CAST((val + 4294967296) % 4294967296 AS BIGINT) AS uv FROM v) "
    "SELECT 'pcm24' AS path, doc_id, "
    f"CAST({_WAV_RATE} AS INT) AS rate, "
    "CAST((6 + doc_id % 4) * 10 AS INT) AS n_samples, "
    "md5(string_agg(printf('%02x%02x%02x%02x', "
    "CAST(uv % 256 AS INT), CAST((uv // 256) % 256 AS INT), "
    "CAST((uv // 65536) % 256 AS INT), "
    "CAST((uv // 16777216) % 256 AS INT)), '' ORDER BY k)) AS buf_md5, "
    f"{_WAV_NULL_FEATURES} FROM u GROUP BY doc_id"
)


_WAV_ORACLE = (
    f"{_WAV_DECODE_SQL} UNION ALL ({_WAV_FEATURES_SQL}) "
    f"UNION ALL ({_WAV_RESAMPLE_SQL}) UNION ALL ({_WAV_STEREO_SQL}) "
    f"UNION ALL ({_WAV_PCM8_SQL}) UNION ALL ({_WAV_PCM24_SQL})"
)


def _wav_branches(spark, sf_dir):
    """REAL audio decode, oracle-checked: genuine 16-bit PCM WAV bytes
    (pure-stdlib RIFF encoder) decode through the pure-stdlib codec
    inside mapInPandas; the oracle reconstructs the PCM buffer AND
    every sample value from the sha256 model in pure SQL, pinning
    RIFF framing, int16 little-endian layout, and the feature math
    (energy kept exact-int so rms/duration are bit-identical IEEE
    derivations). 'resample' re-encodes a nearest-neighbor 64-sample
    take and decodes it again; 'stereo' pins the two-channel
    interleave with the same hex-interleave oracle the stereo FLAC
    branch uses; 'pcm8' reads the model as UNSIGNED offset-binary
    bytes (the WAV 8-bit spec quirk), and 'pcm24' reads 3-byte
    little-endian samples whose SIGN EXTENSION the oracle re-derives
    and re-packs as the decoder's int32 buffer."""
    # persist: all three branches read the generated WAV corpus (same
    # rationale as q93 — the cache stands in for the stored table)
    a = M.attach_wav_media(t(spark, sf_dir, "documents")).persist()
    buf_md5 = F.md5(F.lower(F.hex(F.col("samples"))))
    null_feats = [
        F.lit(None).cast("double").alias("duration_s"),
        F.lit(None).cast("long").alias("energy"),
        F.lit(None).cast("double").alias("rms"),
        F.lit(None).cast("int").alias("zcr"),
        F.lit(None).cast("int").alias("peak"),
    ]
    decoded = M.decode_audio(a).select(
        F.lit("decode").alias("path"),
        "doc_id",
        "rate",
        "n_samples",
        buf_md5.alias("buf_md5"),
        *null_feats,
    )
    feats = M.audio_features(a).select(
        F.lit("features").alias("path"),
        "doc_id",
        "rate",
        "n_samples",
        F.lit(None).cast("string").alias("buf_md5"),
        "duration_s",
        "energy",
        "rms",
        "zcr",
        "peak",
    )
    resampled = M.decode_audio(M.resample_audio(a, 64, 8000)).select(
        F.lit("resample").alias("path"),
        "doc_id",
        "rate",
        "n_samples",
        buf_md5.alias("buf_md5"),
        *null_feats,
    )
    stereo = M.decode_audio(
        M.attach_wav_media(t(spark, sf_dir, "documents"), stereo=True)
    ).select(
        F.lit("stereo").alias("path"),
        "doc_id",
        "rate",
        "n_samples",
        buf_md5.alias("buf_md5"),
        *null_feats,
    )
    pcm8 = M.decode_audio(
        M.attach_wav_media(t(spark, sf_dir, "documents"), bits=8)
    ).select(
        F.lit("pcm8").alias("path"),
        "doc_id",
        "rate",
        "n_samples",
        buf_md5.alias("buf_md5"),
        *null_feats,
    )
    pcm24 = M.decode_audio(
        M.attach_wav_media(t(spark, sf_dir, "documents"), bits=24)
    ).select(
        F.lit("pcm24").alias("path"),
        "doc_id",
        "rate",
        "n_samples",
        buf_md5.alias("buf_md5"),
        *null_feats,
    )
    return (
        decoded.unionAll(feats).unionAll(resampled).unionAll(stereo)
        .unionAll(pcm8).unionAll(pcm24)
    )


# q95: REAL AVI video codec, oracle-checked. attach_avi_media's pixel
# model: row r of frame f of doc d = first 30 bytes of
# sha256('<d>:f<f>:r<r>') as a 10-px RGB scanline; n_frames = 2+d%3,
# height = 6+d%3, fps 10. Width 10 forces DIB row padding (30→32
# bytes), and the encoder stores bottom-up BGR — the decoder undoes
# padding, flip, and channel swap, so the oracle's digest match pins
# the whole container layout with zero video code. 'sample' re-encodes
# every-2nd-frame and decodes AGAIN (surviving frame fi holds original
# frame 2·fi's pixels); 'summary' keeps pix_sum exact-int so mean_byte
# is a bit-identical IEEE division in both engines (q94's energy rule).
_AVI_NF = "(2 + doc_id % 3)"
_AVI_H = "(6 + doc_id % 3)"
_AVI_ROW = (
    "substr(sha256(concat(CAST(doc_id AS VARCHAR), ':f', "
    "CAST({f} AS VARCHAR), ':r', CAST(r AS VARCHAR))), 1, 60)"
)
_AVI_FRAME_MD5 = (
    "md5(array_to_string(list_transform("
    f"generate_series(0, {_AVI_H} - 1), r -> {{row}}), ''))"
)
_AVI_NULL_TAIL = (
    "CAST(NULL AS BIGINT) AS pix_sum, CAST(NULL AS DOUBLE) AS mean_byte"
)
_AVI_NULL_AUDIO = "CAST(NULL AS INT) AS rate, CAST(NULL AS INT) AS n_samples"
_AVI_DIMS = (
    f"CAST(10 AS INT) AS width, CAST({_AVI_H} AS INT) AS height, "
    "CAST(10 AS INT) AS fps"
)
_AVI_FRAMES_SQL = (
    "SELECT 'frames' AS path, doc_id, CAST(fi AS INT) AS frame_idx, "
    f"{_AVI_DIMS}, CAST({_AVI_NF} AS INT) AS n_frames, "
    + _AVI_FRAME_MD5.format(row=_AVI_ROW.format(f="fi"))
    + f" AS frame_md5, {_AVI_NULL_TAIL}, {_AVI_NULL_AUDIO} "
    f"FROM documents, generate_series(0, 3) g(fi) WHERE fi < {_AVI_NF}"
)
# 'muxed': identical frame reconstruction — the interleaved audio
# chunks must be invisible to the video path
_AVI_MUXED_SQL = _AVI_FRAMES_SQL.replace("'frames'", "'muxed'")
# 'sound': the demuxed PCM digest — LITERALLY q94's buffer model
_AVI_SOUND_SQL = (
    "SELECT 'sound' AS path, doc_id, CAST(NULL AS INT) AS frame_idx, "
    "CAST(NULL AS INT) AS width, CAST(NULL AS INT) AS height, "
    f"CAST(10 AS INT) AS fps, CAST({_AVI_NF} AS INT) AS n_frames, "
    "md5(array_to_string(list_transform("
    "generate_series(0, 5 + doc_id % 4), "
    "j -> sha256(concat(CAST(doc_id AS VARCHAR), ':a', "
    "CAST(j AS VARCHAR)))), '')) AS frame_md5, "
    f"{_AVI_NULL_TAIL}, "
    f"CAST({_WAV_RATE} AS INT) AS rate, CAST({_WAV_N} AS INT) AS n_samples "
    "FROM documents"
)
_AVI_SAMPLE_SQL = (
    "SELECT 'sample' AS path, doc_id, CAST(fi AS INT) AS frame_idx, "
    f"{_AVI_DIMS}, CAST(({_AVI_NF} + 1) // 2 AS INT) AS n_frames, "
    + _AVI_FRAME_MD5.format(row=_AVI_ROW.format(f="2 * fi"))
    + f" AS frame_md5, {_AVI_NULL_TAIL}, {_AVI_NULL_AUDIO} "
    "FROM documents, generate_series(0, 1) g(fi) "
    f"WHERE fi < ({_AVI_NF} + 1) // 2"
)
# one row per (doc, frame, scanline); the 60 hex chars parse to 30
# byte values via strpos nibble lookup, summed exactly in integers
_AVI_SUMMARY_SQL = (
    "WITH rows_ AS (SELECT doc_id, "
    + _AVI_ROW.format(f="fi")
    + " AS hx "
    f"FROM documents, generate_series(0, 3) g(fi), "
    f"generate_series(0, 8) h(r) "
    f"WHERE fi < {_AVI_NF} AND r < {_AVI_H}), "
    "sums AS (SELECT doc_id, CAST(list_sum(list_transform("
    "generate_series(1, 30), i -> "
    "(strpos('0123456789abcdef', hx[2*i-1]) - 1) * 16 "
    "+ (strpos('0123456789abcdef', hx[2*i]) - 1))) AS BIGINT) AS s "
    "FROM rows_) "
    "SELECT 'summary' AS path, doc_id, CAST(NULL AS INT) AS frame_idx, "
    f"{_AVI_DIMS}, CAST({_AVI_NF} AS INT) AS n_frames, "
    "CAST(NULL AS VARCHAR) AS frame_md5, "
    "CAST(SUM(s) AS BIGINT) AS pix_sum, "
    "CAST(SUM(s) AS DOUBLE) / "
    f"({_AVI_NF} * {_AVI_H} * 30) AS mean_byte, "
    f"{_AVI_NULL_AUDIO} "
    "FROM sums GROUP BY doc_id"
)


# 'mjpg': COMPRESSED video — Motion-JPEG AVI (the q95 container around
# q97's JPEG entropy layer). Frames are DC-only grayscale JPEGs, so the
# decoded pixel layer is SQL-reconstructible (the dcpatch trick): block
# b of frame fi of doc d is a flat patch of floor((byte0 % 32 - 16)/8
# + 128.5), replicated grey->RGB by the demuxer. 16 px wide (2 blocks),
# 8*(1+d%3) tall, 2+d%3 frames.
_MJPG_H = "(8 * (1 + doc_id % 3))"
_MJPG_DIG = (
    "sha256(concat(CAST(doc_id AS VARCHAR), ':v', CAST(fi AS VARCHAR), "
    "'b', CAST((y // 8) * 2 + (x // 8) AS VARCHAR)))"
)
_AVI_MJPG_SQL = (
    "WITH px AS (SELECT doc_id, fi, y, x, CAST(floor(("
    f"((strpos('0123456789abcdef', {_MJPG_DIG}[1]) - 1) * 16 "
    f"+ (strpos('0123456789abcdef', {_MJPG_DIG}[2]) - 1))"
    " % 32 - 16) / 8.0 + 128.5) AS INT) AS pv "
    "FROM documents, generate_series(0, 3) g(fi), "
    "generate_series(0, 23) gy(y), generate_series(0, 15) gx(x) "
    f"WHERE fi < {_AVI_NF} AND y < {_MJPG_H}) "
    "SELECT 'mjpg' AS path, doc_id, CAST(fi AS INT) AS frame_idx, "
    f"CAST(16 AS INT) AS width, CAST({_MJPG_H} AS INT) AS height, "
    f"CAST(10 AS INT) AS fps, CAST({_AVI_NF} AS INT) AS n_frames, "
    "md5(string_agg(printf('%02x%02x%02x', pv, pv, pv), '' "
    "ORDER BY y, x)) AS frame_md5, "
    f"{_AVI_NULL_TAIL}, {_AVI_NULL_AUDIO} "
    "FROM px GROUP BY doc_id, fi"
)


_AVI_ORACLE = (
    f"{_AVI_FRAMES_SQL} UNION ALL ({_AVI_SAMPLE_SQL}) "
    f"UNION ALL ({_AVI_SUMMARY_SQL}) UNION ALL ({_AVI_MUXED_SQL}) "
    f"UNION ALL ({_AVI_SOUND_SQL}) UNION ALL ({_AVI_MJPG_SQL})"
)


def _avi_branches(spark, sf_dir):
    """REAL video decode, oracle-checked: genuine AVI bytes (pure-
    stdlib RIFF encoder, uncompressed 24-bit DIB frames stored
    bottom-up/BGR/row-padded) decode through the pure-stdlib container
    codec inside mapInPandas, exploded to one row per frame; the
    oracle reconstructs every frame's RGB buffer from the sha256 model
    in pure SQL, pinning the layout round trip. 'sample' re-encodes an
    every-2nd-frame subsample and decodes it again; 'muxed' decodes
    the SAME frames from containers carrying an interleaved PCM audio
    stream (audio chunks must be invisible to the video path), and
    'sound' pins the demuxed PCM against the WAV buffer digest — one
    audio model across WAV, FLAC, and AVI; 'summary' keeps the pixel
    sum exact-int so mean_byte is bit-identical IEEE. 'mjpg' is
    COMPRESSED video for real: Motion-JPEG AVI ('MJPG' streams are
    concatenated baseline JPEGs — this container composed with the
    JPEG entropy layer), DC-only grayscale frames keeping the pixel
    layer SQL-reconstructible (flat floor(DC/8+128.5) patches, grey
    replicated to RGB by the demuxer)."""
    # persist: all three branches read the generated AVI corpus (q93/94)
    v = M.attach_avi_media(t(spark, sf_dir, "documents")).persist()
    frame_md5 = F.md5(F.lower(F.hex(F.col("pixels"))))
    null_tail = [
        F.lit(None).cast("long").alias("pix_sum"),
        F.lit(None).cast("double").alias("mean_byte"),
    ]
    null_audio = [
        F.lit(None).cast("int").alias("rate"),
        F.lit(None).cast("int").alias("n_samples"),
    ]
    frame_cols = [
        "doc_id",
        "frame_idx",
        "width",
        "height",
        "fps",
        "n_frames",
    ]
    frames = M.decode_video(v).select(
        F.lit("frames").alias("path"),
        *frame_cols,
        frame_md5.alias("frame_md5"),
        *null_tail,
        *null_audio,
    )
    sampled = M.decode_video(M.subsample_video(v, 2)).select(
        F.lit("sample").alias("path"),
        *frame_cols,
        frame_md5.alias("frame_md5"),
        *null_tail,
        *null_audio,
    )
    av = M.attach_avi_media(
        t(spark, sf_dir, "documents"), with_audio=True
    ).persist()
    muxed = M.decode_video(av).select(
        F.lit("muxed").alias("path"),
        *frame_cols,
        frame_md5.alias("frame_md5"),
        *null_tail,
        *null_audio,
    )
    sound = M.demux_audio(av).select(
        F.lit("sound").alias("path"),
        "doc_id",
        F.lit(None).cast("int").alias("frame_idx"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(10).cast("int").alias("fps"),
        ((F.col("doc_id") % 3) + 2).cast("int").alias("n_frames"),
        F.md5(F.lower(F.hex(F.col("samples")))).alias("frame_md5"),
        *null_tail,
        "rate",
        "n_samples",
    )
    mjpg = M.decode_video(
        M.attach_mjpeg_media(t(spark, sf_dir, "documents"))
    ).select(
        F.lit("mjpg").alias("path"),
        *frame_cols,
        frame_md5.alias("frame_md5"),
        *null_tail,
        *null_audio,
    )
    summary = M.video_summary(v).select(
        F.lit("summary").alias("path"),
        "doc_id",
        F.lit(None).cast("int").alias("frame_idx"),
        "width",
        "height",
        "fps",
        "n_frames",
        F.lit(None).cast("string").alias("frame_md5"),
        "pix_sum",
        "mean_byte",
        *null_audio,
    )
    return (
        frames.unionAll(sampled).unionAll(summary).unionAll(muxed)
        .unionAll(sound).unionAll(mjpg)
    )


# q97: REAL baseline JPEG codec, oracle-checked ONE LAYER DOWN. JPEG's
# DCT is lossy, so unlike q93/q94/q95 the pixel buffer of a general
# image isn't SQL-reconstructible — but the QUANTIZED COEFFICIENTS are
# the lossless payload the entropy coding stores, and attach_jpeg_media
# specifies them directly from sha256: block b of doc d has DC =
# byte0%32-16 and AC_k = byte((7k+3)%32)%15-7 when (byte(k%32)+k)%5==0.
# The 'coeffs' branch digests the decoded int16-LE zigzag buffer
# against a pure-SQL reconstruction — pinning Huffman tables (read
# from the file's own DHT), run-length/ZRL/EOB, DPCM and bit packing.
# The 'dcpatch' branch decodes a DC-ONLY corpus where IDCT output is
# exact flat patches (pixel = floor(DC*q0/8 + 128.5), q0 = 1), so the
# PIXEL layer — IDCT normalization, level shift, clamp, raster
# placement — is oracle-pinned too; full-AC pixels are pinned against
# the literal T.81 cosine sum in pytest.
_JPG_BX = "(1 + doc_id % 2)"
_JPG_BY = "(1 + doc_id % 3)"
_JPG_HEX = "'0123456789abcdef'"


def _jpg_byte(hx: str, i: str) -> str:
    """SQL int value of byte i (0-based) of hex digest hx."""
    return (
        f"((strpos({_JPG_HEX}, {hx}[2*({i})+1]) - 1) * 16 "
        f"+ (strpos({_JPG_HEX}, {hx}[2*({i})+2]) - 1))"
    )


_JPG_DIG = (
    "sha256(concat(CAST(doc_id AS VARCHAR), ':j', CAST(b AS VARCHAR)))"
)
# coefficient value at zigzag k (1..63); k=0 handled separately
_JPG_AC = (
    f"CASE WHEN ({_jpg_byte('hx', 'k % 32')} + k) % 5 = 0 "
    f"THEN {_jpg_byte('hx', '(k * 7 + 3) % 32')} % 15 - 7 ELSE 0 END"
)
_JPG_DC = f"{_jpg_byte('hx', '0')} % 32 - 16"
def _jpg_coeffs_sql(path: str) -> str:
    # the coefficient reconstruction is path-independent: the 'rst'
    # branch decodes the SAME model through DRI/RSTm framing, so a
    # predictor-reset or marker-cadence bug diverges from this SQL
    return (
        "WITH g AS (SELECT doc_id, b, "
        f"{_JPG_DIG} AS hx FROM documents, generate_series(0, 5) gb(b) "
        f"WHERE b < {_JPG_BX} * {_JPG_BY}), "
        "c AS (SELECT doc_id, b, k, "
        f"CASE WHEN k = 0 THEN {_JPG_DC} ELSE {_JPG_AC} END AS v "
        "FROM g, generate_series(0, 63) gk(k)), "
        "q AS (SELECT doc_id, b, k, "
        "printf('%02x%02x', ((v + 65536) % 65536) % 256, "
        "((v + 65536) % 65536) // 256) AS quad FROM c) "
        f"SELECT '{path}' AS path, doc_id, "
        f"CAST({_JPG_BX} * 8 AS INT) AS width, "
        f"CAST({_JPG_BY} * 8 AS INT) AS height, "
        f"CAST({_JPG_BX} * {_JPG_BY} AS INT) AS n_blocks, "
        "md5(string_agg(quad, '' ORDER BY b, k)) AS payload_md5 "
        "FROM q GROUP BY doc_id"
    )


_JPG_COEFFS_SQL = _jpg_coeffs_sql("coeffs")

# color (YCbCr 4:4:4): MCU b, component c takes digest
# sha256('<d>:j<b>c<c>') through the same DC/AC formulas; the buffer
# is scan-interleaved, so quads order by (b, c, k) and n_blocks
# counts component blocks (3 per MCU)
_JPG_COLOR_DIG = (
    "sha256(concat(CAST(doc_id AS VARCHAR), ':j', CAST(b AS VARCHAR), "
    "'c', CAST(c AS VARCHAR)))"
)
_JPG_COLOR_SQL = (
    "WITH g AS (SELECT doc_id, b, c, "
    f"{_JPG_COLOR_DIG} AS hx FROM documents, generate_series(0, 5) gb(b), "
    f"generate_series(0, 2) gc(c) WHERE b < {_JPG_BX} * {_JPG_BY}), "
    "co AS (SELECT doc_id, b, c, k, "
    f"CASE WHEN k = 0 THEN {_JPG_DC} ELSE {_JPG_AC} END AS v "
    "FROM g, generate_series(0, 63) gk(k)), "
    "q AS (SELECT doc_id, b, c, k, "
    "printf('%02x%02x', ((v + 65536) % 65536) % 256, "
    "((v + 65536) % 65536) // 256) AS quad FROM co) "
    "SELECT 'color' AS path, doc_id, "
    f"CAST({_JPG_BX} * 8 AS INT) AS width, "
    f"CAST({_JPG_BY} * 8 AS INT) AS height, "
    f"CAST({_JPG_BX} * {_JPG_BY} * 3 AS INT) AS n_blocks, "
    "md5(string_agg(quad, '' ORDER BY b, c, k)) AS payload_md5 "
    "FROM q GROUP BY doc_id"
)

# dcrgb: the DC-only COLOR corpus decoded to RGB — flat per-block
# Y/Cb/Cr patches (q0 luma 1, chroma 2) through the JFIF fixed-point
# transform fx(v) = floor((v + 32768)/65536), written as positive-
# biased TRUNCATING division so DuckDB's // reproduces it bit-exactly
_JPG_DCRGB_FX = "({v} + 32768 + 1073741824) // 65536 - 16384"
_JPG_DCRGB_CH = (
    "CAST(LEAST(255, GREATEST(0, {expr})) AS INT)"
)
_JPG_DCRGB_SQL = (
    "WITH g AS (SELECT doc_id, b, c, "
    f"{_JPG_COLOR_DIG} AS hx FROM documents, generate_series(0, 5) gb(b), "
    f"generate_series(0, 2) gc(c) WHERE b < {_JPG_BX} * {_JPG_BY}), "
    f"d0 AS (SELECT doc_id, b, c, {_jpg_byte('hx', '0')} % 32 - 16 AS dc "
    "FROM g), "
    "pv AS (SELECT doc_id, b, "
    "CAST(floor(MAX(CASE WHEN c = 0 THEN dc END) / 8.0 + 128.5) AS BIGINT)"
    " AS yv, "
    "CAST(floor(MAX(CASE WHEN c = 1 THEN dc END) / 4.0 + 128.5) AS BIGINT)"
    " AS cbv, "
    "CAST(floor(MAX(CASE WHEN c = 2 THEN dc END) / 4.0 + 128.5) AS BIGINT)"
    " AS crv FROM d0 GROUP BY doc_id, b), "
    "rgb AS (SELECT doc_id, b, printf('%02x%02x%02x', "
    + _JPG_DCRGB_CH.format(
        expr="yv + (" + _JPG_DCRGB_FX.format(v="91881 * (crv - 128)") + ")"
    )
    + ", "
    + _JPG_DCRGB_CH.format(
        expr="yv + ("
        + _JPG_DCRGB_FX.format(v="-22554 * (cbv - 128) - 46802 * (crv - 128)")
        + ")"
    )
    + ", "
    + _JPG_DCRGB_CH.format(
        expr="yv + (" + _JPG_DCRGB_FX.format(v="116130 * (cbv - 128)") + ")"
    )
    + ") AS hexpix FROM pv) "
    "SELECT 'dcrgb' AS path, doc_id, "
    f"CAST({_JPG_BX} * 8 AS INT) AS width, "
    f"CAST({_JPG_BY} * 8 AS INT) AS height, "
    f"CAST({_JPG_BX} * {_JPG_BY} * 3 AS INT) AS n_blocks, "
    "md5(string_agg(hexpix, '' ORDER BY y, x)) AS payload_md5 "
    "FROM rgb, generate_series(0, 23) gy(y), generate_series(0, 15) gx(x) "
    f"WHERE y < {_JPG_BY} * 8 AND x < {_JPG_BX} * 8 "
    f"AND b = (y // 8) * {_JPG_BX} + (x // 8) GROUP BY doc_id"
)

# 4:2:0: 16x16 MCUs (mx = ceil(bx/2), my = ceil(by/2)), slot s of MCU
# m from sha256('<d>:j<m>s<s>') — four Y blocks then Cb, Cr per MCU
_JPG_MX = f"(({_JPG_BX} + 1) // 2)"
_JPG_MY = f"(({_JPG_BY} + 1) // 2)"
_JPG_420_DIG = (
    "sha256(concat(CAST(doc_id AS VARCHAR), ':j', CAST(m AS VARCHAR), "
    "'s', CAST(s AS VARCHAR)))"
)
_JPG_420_SQL = (
    "WITH g AS (SELECT doc_id, m, s, "
    f"{_JPG_420_DIG} AS hx FROM documents, generate_series(0, 1) gm(m), "
    f"generate_series(0, 5) gs(s) WHERE m < {_JPG_MX} * {_JPG_MY}), "
    "co AS (SELECT doc_id, m, s, k, "
    f"CASE WHEN k = 0 THEN {_JPG_DC} ELSE {_JPG_AC} END AS v "
    "FROM g, generate_series(0, 63) gk(k)), "
    "q AS (SELECT doc_id, m, s, k, "
    "printf('%02x%02x', ((v + 65536) % 65536) % 256, "
    "((v + 65536) % 65536) // 256) AS quad FROM co) "
    "SELECT 'sub420' AS path, doc_id, "
    f"CAST({_JPG_BX} * 8 AS INT) AS width, "
    f"CAST({_JPG_BY} * 8 AS INT) AS height, "
    f"CAST({_JPG_MX} * {_JPG_MY} * 6 AS INT) AS n_blocks, "
    "md5(string_agg(quad, '' ORDER BY m, s, k)) AS payload_md5 "
    "FROM q GROUP BY doc_id"
)
# DC-only pixels: block (y//8, x//8) is a flat patch of
# floor(DC/8 + 128.5) (q0 = 1, clamp is a no-op in DC's range)
_JPG_PIX_SQL = (
    "WITH g AS (SELECT doc_id, b, "
    f"CAST(floor(({_jpg_byte(_JPG_DIG, '0')} % 32 - 16) / 8.0 + 128.5) "
    "AS INT) AS pv "
    f"FROM documents, generate_series(0, 5) gb(b) "
    f"WHERE b < {_JPG_BX} * {_JPG_BY}), "
    "px AS (SELECT doc_id, y, x, pv "
    "FROM g, generate_series(0, 23) gy(y), generate_series(0, 15) gx(x) "
    f"WHERE y < {_JPG_BY} * 8 AND x < {_JPG_BX} * 8 "
    f"AND b = (y // 8) * {_JPG_BX} + (x // 8)) "
    "SELECT 'dcpatch' AS path, doc_id, "
    f"CAST({_JPG_BX} * 8 AS INT) AS width, "
    f"CAST({_JPG_BY} * 8 AS INT) AS height, "
    f"CAST({_JPG_BX} * {_JPG_BY} AS INT) AS n_blocks, "
    "md5(string_agg(printf('%02x', pv), '' ORDER BY y, x)) AS payload_md5 "
    "FROM px GROUP BY doc_id"
)


_JPG_ORACLE = (
    f"{_JPG_COEFFS_SQL} UNION ALL ({_jpg_coeffs_sql('rst')}) "
    f"UNION ALL ({_JPG_COLOR_SQL}) UNION ALL ({_JPG_420_SQL}) "
    f"UNION ALL ({_JPG_DCRGB_SQL}) UNION ALL ({_JPG_PIX_SQL})"
)


def _jpeg_branches(spark, sf_dir):
    """REAL baseline JPEG decode, oracle-checked at the lossless
    layer: genuine grayscale JPEGs (pure stdlib+numpy encoder,
    canonical Huffman tables carried in the file's DHT) decode
    through the pure-stdlib codec; the oracle digests a pure-SQL
    reconstruction of the quantized coefficient buffer (Huffman/RLE/
    ZRL/EOB/DPCM/bit-packing all pinned); the 'rst' branch re-encodes
    the same corpus WITH restart markers (DRI interval 2:
    byte-aligned fill, RSTm cadence, per-segment DC predictor reset)
    against the same coefficient oracle; the 'color' branch is YCbCr
    4:4:4 — interleaved MCUs, three DC predictor chains, luma/chroma
    quant+Huffman table routing — against a (b, c, k)-ordered oracle;
    the 'sub420' branch is 4:2:0 — 16x16 MCUs of four Y + Cb + Cr
    blocks, the sampling-factor interleave itself pinned by an
    (mcu, slot, k)-ordered oracle; the 'dcrgb' branch decodes the
    DC-only COLOR corpus all the way to RGB — flat Y/Cb/Cr patches
    through the JFIF fixed-point colorspace transform, integer-
    exactly reproduced in SQL; and a DC-only corpus ('dcpatch') makes
    the IDCT pixel layer itself SQL-reconstructible (flat 8x8
    patches). Full-AC pixels are pinned against the literal T.81
    cosine sum in pytest."""
    docs = t(spark, sf_dir, "documents")

    def coeff_branch(path, **attach_kw):
        return M.jpeg_coefficients(
            M.attach_jpeg_media(docs, **attach_kw)
        ).select(
            F.lit(path).alias("path"),
            "doc_id",
            "width",
            "height",
            "n_blocks",
            F.md5(F.lower(F.hex(F.col("coeffs")))).alias("payload_md5"),
        )

    coeffs = coeff_branch("coeffs")
    rst = coeff_branch("rst", restart_interval=2)
    colored = coeff_branch("color", color=True)
    sub420 = coeff_branch("sub420", color=True, subsampling="420")
    dcrgb = M.decode_media(
        M.attach_jpeg_media(docs, dc_only=True, color=True), rgb=True
    ).select(
        F.lit("dcrgb").alias("path"),
        "doc_id",
        "width",
        "height",
        ((F.col("width") / 8) * (F.col("height") / 8) * 3)
        .cast("int")
        .alias("n_blocks"),
        F.md5(F.lower(F.hex(F.col("pixels")))).alias("payload_md5"),
    )
    dc = M.decode_media(M.attach_jpeg_media(docs, dc_only=True)).select(
        F.lit("dcpatch").alias("path"),
        "doc_id",
        "width",
        "height",
        (
            (F.col("width") / 8) * (F.col("height") / 8)
        ).cast("int").alias("n_blocks"),
        F.md5(F.lower(F.hex(F.col("pixels")))).alias("payload_md5"),
    )
    return (
        coeffs.unionAll(rst).unionAll(colored).unionAll(sub420)
        .unionAll(dcrgb).unionAll(dc)
    )


# q98: REAL GIF codec, oracle-checked. attach_gif_media reuses the PNG
# twin's scanline model (row r = first W bytes of sha256('<d>:g<r>'))
# as palette INDICES through a grayscale ramp palette, so the decoded
# RGB buffer is each model byte tripled. LZW is lossless, so a digest
# match pins the whole LZW dictionary machinery — variable code width
# 9→12 bits, CLEAR resets when the table fills, the KwKwK
# first-reference case, LSB-first bit packing, sub-block framing — and
# the palette mapping, with zero GIF code in the oracle.
_GIF_W = "(16 + (doc_id % 4) * 4)"
_GIF_H = "(12 + (doc_id % 3) * 6)"
def _gif_sql(path: str) -> str:
    # pixel reconstruction is path-independent: the 'interlaced'
    # branch decodes the SAME model through the four-pass row
    # interleave, so a wrong pass order diverges from this SQL
    return (
        "WITH rows_ AS (SELECT doc_id, r, "
        "substr(sha256(concat(CAST(doc_id AS VARCHAR), ':g', "
        f"CAST(r AS VARCHAR))), 1, 2 * {_GIF_W}) AS hx "
        f"FROM documents, generate_series(0, 29) g(r) WHERE r < {_GIF_H}), "
        "px AS (SELECT doc_id, r, i, repeat(substr(hx, 2 * i - 1, 2), 3) "
        f"AS rgb FROM rows_, generate_series(1, 32) gi(i) WHERE i <= {_GIF_W}) "
        f"SELECT '{path}' AS path, doc_id, "
        f"CAST({_GIF_W} AS INT) AS width, CAST({_GIF_H} AS INT) AS height, "
        "CAST(3 AS INT) AS channels, "
        "md5(string_agg(rgb, '' ORDER BY r, i)) AS pix_md5 "
        "FROM px GROUP BY doc_id"
    )


_GIF_SQL = _gif_sql("plain")


_GIF_ORACLE = f"{_GIF_SQL} UNION ALL ({_gif_sql('interlaced')})"


def _gif_branches(spark, sf_dir):
    """REAL GIF decode, oracle-checked: genuine GIF87a bytes (pure-
    stdlib LZW encoder, grayscale palette) decode through the pure-
    stdlib codec inside mapInPandas; LZW is lossless, so the oracle's
    SQL reconstruction of the RGB buffer pins the full dictionary
    machinery (9-12 bit growth, CLEAR resets, KwKwK, LSB-first
    packing, sub-block framing) and the palette mapping byte-exactly.
    The 'interlaced' branch re-encodes the same pixels through the
    four-pass row interleave against the same oracle — a decoder that
    ignored the flag would scramble rows and diverge."""
    docs = t(spark, sf_dir, "documents")

    def branch(path, **kw):
        return M.decode_media(M.attach_gif_media(docs, **kw)).select(
            F.lit(path).alias("path"),
            "doc_id",
            "width",
            "height",
            "channels",
            F.md5(F.lower(F.hex(F.col("pixels")))).alias("pix_md5"),
        )

    return branch("plain").unionAll(branch("interlaced", interlace=True))


# q99: REAL FLAC codec — one oracle, two codecs. attach_flac_media
# reuses attach_wav_media's EXACT sample model, and FLAC is lossless,
# so the decoded PCM digest must match the SAME sha256-concat
# reconstruction q94's decode branch uses. A match therefore pins the
# whole compressed path — Rice coding (zigzag, unary+k-bit, method
# selection), FIXED predictor reconstruction (orders 0-2 cycle across
# docs), MSB-first bit packing, UTF-8 frame numbers, CRC-8/CRC-16,
# and STREAMINFO's embedded MD5 (verified in-decoder). The 'size'
# column also pins the compressed payload length per doc, so the
# encoder's exact bit output is covered too (any Rice/packing change
# shifts it). block_size=64 forces multi-frame streams on every doc.
_FLAC_SQL = (
    "SELECT 'mono' AS path, doc_id, "
    f"CAST({_WAV_RATE} AS INT) AS rate, CAST({_WAV_N} AS INT) AS n_samples, "
    "md5(array_to_string(list_transform("
    "generate_series(0, 5 + doc_id % 4), "
    "j -> sha256(concat(CAST(doc_id AS VARCHAR), ':a', "
    "CAST(j AS VARCHAR)))), '')) AS buf_md5 "
    "FROM documents"
)

# stereo: the decoded buffer is channel-INTERLEAVED int16 LE, i.e. in
# hex-string space sample i contributes 4 chars of the 'a' model then
# 4 chars of the 'b' model — sha256() in DuckDB returns lowercase hex,
# so the interleave is pure substring arithmetic
_FLAC_STEREO_SQL = (
    "WITH h AS (SELECT doc_id, "
    "array_to_string(list_transform(generate_series(0, 5 + doc_id % 4), "
    "j -> sha256(concat(CAST(doc_id AS VARCHAR), ':a', "
    "CAST(j AS VARCHAR)))), '') AS a, "
    "array_to_string(list_transform(generate_series(0, 5 + doc_id % 4), "
    "j -> sha256(concat(CAST(doc_id AS VARCHAR), ':b', "
    "CAST(j AS VARCHAR)))), '') AS b "
    "FROM documents) "
    "SELECT 'stereo' AS path, doc_id, "
    f"CAST({_WAV_RATE} AS INT) AS rate, CAST({_WAV_N} AS INT) AS n_samples, "
    "md5(array_to_string(list_transform("
    f"generate_series(0, {_WAV_N} - 1), "
    "i -> substr(a, 4 * i + 1, 4) || substr(b, 4 * i + 1, 4)), '')) "
    "AS buf_md5 FROM h"
)


_FLAC_ORACLE = (
    f"{_FLAC_SQL} UNION ALL ({_FLAC_STEREO_SQL}) "
    f"UNION ALL ({_FLAC_SQL.replace(chr(39) + 'mono' + chr(39), chr(39) + 'rice2' + chr(39))})"
)


def _flac_branches(spark, sf_dir):
    """REAL compressed-lossless audio decode: genuine FLAC bytes
    (pure-stdlib encoder — FIXED orders 0-2 on half the corpus,
    Levinson-Durbin LPC orders 1-3 on the other half, Rice-coded
    residuals, CRC-8/16, STREAMINFO MD5) decode through the
    pure-stdlib codec; the corpus reuses the WAV sample model, so the
    SAME SQL reconstruction must digest-match — one oracle pinning
    both the uncompressed and compressed audio paths. The 'stereo'
    branch adds a right channel and cycles all FOUR channel
    assignments (independent / left-side / right-side / mid-side,
    side subframes 17-bit) — the interleaved-buffer digest pins the
    whole decorrelation matrix. The 'rice2' branch re-encodes the
    mono corpus with PARTITIONED Rice residuals (2^2 partitions per
    subframe, per-partition parameters — what real encoders emit)
    against the same digest, so the multi-partition decode path is
    driver-pinned, not just unit-tested."""
    docs = t(spark, sf_dir, "documents")

    def branch(path, **kw):
        return M.decode_audio(M.attach_flac_media(docs, **kw)).select(
            F.lit(path).alias("path"),
            "doc_id",
            "rate",
            "n_samples",
            F.md5(F.lower(F.hex(F.col("samples")))).alias("buf_md5"),
        )

    return (
        branch("mono")
        .unionAll(branch("stereo", stereo=True))
        .unionAll(branch("rice2", rice_porder=2))
    )


# ---------------------------------------------------------------------
# Merged registry entries (round 13). Two registered queries cover the
# nine former media/codec slots: q90_media_pipeline (ex q90_media_frames
# + q92_media_features + q96_stream_media_decode) and q93_codec_decode
# (ex q93_png/q94_wav/q95_avi/q97_jpeg/q98_gif/q99_flac). The q57/q63
# tagged-union pattern: ONE superset schema and ONE oracle per merged
# query, every branch keeping its own per-branch plan shape and its
# own per-branch oracle SQL verbatim (padded to the union schema) —
# verification is identical, the 50-query rotation window just stops
# paying nine slots for one operator family.
# ---------------------------------------------------------------------


def _pad_df(df, lead, cols, rename):
    """Pad a branch DataFrame to the union schema: leading literal
    columns, then every (name, spark_type, _) column cast if present
    (after ``rename``) or NULL-typed if absent."""
    for src, dst in rename.items():
        df = df.withColumnRenamed(src, dst)
    sel = list(lead) + [F.col("doc_id")]
    for name, st, _dt in cols:
        c = F.col(name) if name in df.columns else F.lit(None)
        sel.append(c.cast(st).alias(name))
    return df.select(*sel)


def _pad_sql(inner, lead_sql, cols, have, rename):
    """The oracle twin of :func:`_pad_df`: wrap a branch oracle in a
    padding SELECT with identical names and types."""
    inv = {dst: src for src, dst in rename.items()}
    parts = [lead_sql, "doc_id"]
    for name, _st, dt in cols:
        if name in have:
            parts.append(f"CAST({inv.get(name, name)} AS {dt}) AS {name}")
        else:
            parts.append(f"CAST(NULL AS {dt}) AS {name}")
    return "SELECT " + ", ".join(parts) + f" FROM ({inner})"


# ------------------------------- q90 --------------------------------

# the former q96 oracle: WAV features from the shared sample CTE —
# the streaming branch must equal the batch featurizer byte-exact
_Q96_STREAM_ORACLE = (
    f"{_WAV_SAMPLES_CTE} "
    "SELECT doc_id, "
    f"CAST({_WAV_RATE} AS INT) AS rate, CAST({_WAV_N} AS INT) AS n_samples, "
    f"CAST({_WAV_N} AS DOUBLE) / {_WAV_RATE} AS duration_s, "
    "CAST(SUM(CAST(val AS BIGINT) * val) AS BIGINT) AS energy, "
    f"sqrt(CAST(SUM(CAST(val AS BIGINT) * val) AS DOUBLE) / {_WAV_N}) "
    "AS rms, "
    "CAST(SUM(CASE WHEN val * pval < 0 THEN 1 ELSE 0 END) AS INT) AS zcr, "
    "CAST(MAX(ABS(val)) AS INT) AS peak "
    "FROM w GROUP BY doc_id"
)


def _media_stream(spark, sf_dir):
    """streaming media admission: newly-landed docs get their audio
    decoded and featurized IN-FLIGHT (real WAV codec inside
    mapInPandas on a streaming plan, availableNow backfill) —
    streaming result must equal the batch featurizer byte-exact,
    extending the suite's streaming==batch law to the codec path.
    Stateless: no watermark, no state store, append mode."""
    from kaj_query_engine_spark.streaming.ops import (
        read_stream_table,
        run_available_now,
    )

    s = read_stream_table(spark, sf_dir, "documents")
    feats = M.audio_features(M.attach_wav_media(s))
    return run_available_now(feats, "append")


_MEDIA_COLS = [
    ("frame_idx", "int", "INT"),
    ("frame_sig", "string", "VARCHAR"),
    ("n_bytes", "int", "INT"),
    ("width", "int", "INT"),
    ("height", "int", "INT"),
    ("format", "string", "VARCHAR"),
    ("first_byte_hex", "string", "VARCHAR"),
    ("mean_byte", "double", "DOUBLE"),
    ("n_distinct_bytes", "int", "INT"),
    ("mode_count", "int", "INT"),
    ("rate", "int", "INT"),
    ("n_samples", "int", "INT"),
    ("duration_s", "double", "DOUBLE"),
    ("energy", "long", "BIGINT"),
    ("rms", "double", "DOUBLE"),
    ("zcr", "int", "INT"),
    ("peak", "int", "INT"),
]

_MEDIA_BRANCHES = [
    ("frames", _media_frames, _Q90_FRAMES_ORACLE,
     {"frame_idx", "frame_sig", "n_bytes", "width", "height", "format"}),
    ("features", _media_features, _Q92_FEATURES_ORACLE,
     {"n_bytes", "first_byte_hex", "mean_byte", "n_distinct_bytes",
      "mode_count"}),
    ("stream", _media_stream, _Q96_STREAM_ORACLE,
     {"rate", "n_samples", "duration_s", "energy", "rms", "zcr", "peak"}),
]

_Q90_ORACLE = " UNION ALL ".join(
    _pad_sql(inner, f"'{tag}' AS path", _MEDIA_COLS, have, {})
    for tag, _fn, inner, have in _MEDIA_BRANCHES
)


@register(
    "q90_media_pipeline",
    _Q90_ORACLE,
    "media pipeline, three former registry slots tagged in one result "
    "(the q57 merge pattern): 'frames' = media ingest + decode-free "
    "frame sampling (typed-metadata binary payloads exploded into "
    "per-frame rows, 8-byte signature sliced JVM-side in whole-stage "
    "codegen, join-free); 'features' = Arrow-batched byte features "
    "over the payload (n_bytes / first byte / HALF_UP mean / "
    "histogram distinct+mode) — the mapInPandas path a real decoder "
    "rides; 'stream' = streaming media admission (the real WAV codec "
    "featurizing newly-landed docs IN-FLIGHT on an availableNow "
    "streaming plan — streaming==batch law extended to codecs, "
    "stateless append). Each branch keeps its own plan shape and its "
    "own oracle SQL, padded to one superset schema",
)
def q90(spark, sf_dir):
    out = None
    for tag, fn, _inner, _have in _MEDIA_BRANCHES:
        part = _pad_df(fn(spark, sf_dir), [F.lit(tag).alias("path")],
                       _MEDIA_COLS, {})
        out = part if out is None else out.unionByName(part)
    return out


# ------------------------------- q93 --------------------------------

_CODEC_COLS = [
    ("frame_idx", "int", "INT"),
    ("width", "int", "INT"),
    ("height", "int", "INT"),
    ("fps", "int", "INT"),
    ("n_frames", "int", "INT"),
    ("n_blocks", "int", "INT"),
    ("channels", "int", "INT"),
    ("rate", "int", "INT"),
    ("n_samples", "int", "INT"),
    ("sig_md5", "string", "VARCHAR"),
    ("duration_s", "double", "DOUBLE"),
    ("energy", "long", "BIGINT"),
    ("rms", "double", "DOUBLE"),
    ("zcr", "int", "INT"),
    ("peak", "int", "INT"),
    ("pix_sum", "long", "BIGINT"),
    ("mean_byte", "double", "DOUBLE"),
]

_CODEC_BRANCHES = [
    ("png", _png_branches, _PNG_ORACLE, {"pix_md5": "sig_md5"},
     {"width", "height", "sig_md5"}),
    ("wav", _wav_branches, _WAV_ORACLE, {"buf_md5": "sig_md5"},
     {"rate", "n_samples", "sig_md5", "duration_s", "energy", "rms",
      "zcr", "peak"}),
    ("avi", _avi_branches, _AVI_ORACLE, {"frame_md5": "sig_md5"},
     {"frame_idx", "width", "height", "fps", "n_frames", "sig_md5",
      "pix_sum", "mean_byte", "rate", "n_samples"}),
    ("jpeg", _jpeg_branches, _JPG_ORACLE, {"payload_md5": "sig_md5"},
     {"width", "height", "n_blocks", "sig_md5"}),
    ("gif", _gif_branches, _GIF_ORACLE, {"pix_md5": "sig_md5"},
     {"width", "height", "channels", "sig_md5"}),
    ("flac", _flac_branches, _FLAC_ORACLE, {"buf_md5": "sig_md5"},
     {"rate", "n_samples", "sig_md5"}),
]

_Q93_ORACLE = " UNION ALL ".join(
    _pad_sql(inner, f"'{codec}' AS codec, path", _CODEC_COLS, have, rename)
    for codec, _fn, inner, rename, have in _CODEC_BRANCHES
)


@register(
    "q93_codec_decode",
    _Q93_ORACLE,
    "the full codec family, six former registry slots tagged in one "
    "result (the q57 merge pattern): REAL pure-stdlib decoders inside "
    "mapInPandas for PNG (all five scanline filters, Adam7 interlace, "
    "16-bit/palette/RGBA color types, nearest-neighbor resize round "
    "trip), WAV (RIFF int16-LE plus pcm8/pcm24/stereo and exact-int "
    "feature math), AVI (bottom-up BGR DIB frames, interleaved-audio "
    "demux, every-2nd-frame subsample, Motion-JPEG compressed "
    "frames), baseline JPEG (Huffman/RLE/DPCM entropy layer, restart "
    "markers, 4:4:4 + 4:2:0 color, DC-only IDCT and JFIF RGB "
    "pinned), GIF (full LZW dictionary machinery + interlace) and "
    "FLAC (FIXED+LPC predictors, partitioned Rice, all four stereo "
    "decorrelations). Every branch keeps its own sha256-model oracle "
    "SQL, padded to one superset schema; a digest match pins each "
    "codec end-to-end. mp3 / non-MJPEG compressed video stay "
    "honestly guarded",
)
def q93(spark, sf_dir):
    out = None
    for codec, fn, _inner, rename, _have in _CODEC_BRANCHES:
        part = _pad_df(fn(spark, sf_dir),
                       [F.lit(codec).alias("codec"), F.col("path")],
                       _CODEC_COLS, rename)
        out = part if out is None else out.unionByName(part)
    return out
