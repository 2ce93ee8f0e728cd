"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched Pandas UDFs.

No counterpart in the reference (3 scalar types only, no binary —
``/root/reference/src/qp/utils/Attribute.java:11-13``); this is the
training-data-pipeline extension surface. The design holds at 100 TB:

- media bytes live in a ``binary`` column next to a ``struct`` of
  typed metadata (width/height/format) — one parquet row group holds
  both, so predicate pushdown on metadata prunes media I/O;
- decode / feature-extraction runs in ``mapInPandas`` — Arrow moves
  whole columnar batches to Python, one python worker per partition,
  no per-row pickling;
- frame sampling is pure JVM (``substring`` on binary inside an
  exploded sequence) — no Python in that hot path at all.

PNG decode is REAL — a pure-stdlib codec (``functions.png``: zlib +
struct, all five scanline filters) runs inside ``decode_media``'s
``mapInPandas``, oracle-checked end-to-end as q93 against a DuckDB
reconstruction of the deterministic pixel model. WAV/PCM audio decode
is REAL too (``functions.wav``: struct-level RIFF, 16-bit PCM) — same
pattern, oracle-checked as q94 with decode/features/resample branches.
AVI video decode is REAL as well (``functions.avi``: RIFF container,
uncompressed 24-bit DIB frames — bottom-up/BGR/padded layout undone
and pinned) — oracle-checked as q95 with frames/sample/summary
branches. Baseline JPEG decode is REAL too (``functions.jpeg``:
Huffman entropy layer decoded losslessly and oracle-checked at the
quantized-coefficient layer, q97; the lossy IDCT pixel layer pinned
against the spec's literal cosine sum in pytest, with a DC-only
fixture making even pixels SQL-reconstructible). GIF decode is REAL
as well (``functions.gif``: the full variable-width LSB-first LZW
with CLEAR resets and the KwKwK case, palette mapping — q98).
FLAC decode is REAL (``functions.flac``: rice/LPC subframes, all four
stereo channel assignments — oracle-checked as q99). Compressed video
is REAL for Motion-JPEG AVI (q95's RIFF container composed with q97's
JPEG entropy layer — 'MJPG' streams are concatenated baseline JPEGs;
the q95 'mjpg' branch). Remaining codecs (mp3, non-MJPEG compressed
video) stay honestly guarded: the container ships no libraries for
them, and the decode operators raise per-task rather than silently
skipping media.
The fake payload generator and the
byte-level feature path stay codec-free and deterministic
(sha256-derived bytes), exercising the exact Spark plumbing — schema,
partitioning, UDF signature, batch shape — any decoder rides.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DIGEST_BYTES = 32  # sha256 block
# partition floor for the PNG generator's compute spread — see
# attach_png_media: python-worker startup dominates past ~8 workers
# per host JVM, and real inputs have more splits than this anyway
PNG_SPREAD = 8


def attach_fake_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic stand-in for real media ingest: a ``media`` binary
    column of 2–4 sha256 blocks keyed by id, plus ``media_meta``
    (width, height, format) — the schema a real pipeline would carry.

    Payload block i = sha256(f"{id}:{i}"); block count = 2 + id % 3.
    Pure JVM construction (sha2 + to_binary), so generation scales with
    the scan — no Python involved.
    """
    n_blocks = (F.col(id_col) % 3 + 2).cast("int")
    hex_payload = F.expr(
        f"array_join(transform(sequence(0, CAST({id_col} % 3 + 1 AS INT)), "
        f"i -> sha2(concat(cast({id_col} as string), ':', cast(i as string)), 256)"
        f"), '')"
    )
    return (
        df.withColumn("media", F.to_binary(hex_payload, F.lit("hex")))
        .withColumn(
            "media_meta",
            F.struct(
                (F.lit(64) + (F.col(id_col) % 8) * 32).cast("int").alias("width"),
                (F.lit(64) + (F.col(id_col) % 5) * 32).cast("int").alias("height"),
                F.when(F.col(id_col) % 2 == 0, "png").otherwise("jpeg").alias(
                    "format"
                ),
                n_blocks.alias("n_blocks"),
            ),
        )
    )


def attach_png_media(
    df: DataFrame,
    id_col: str = "doc_id",
    interlace: bool = False,
    depth16: bool = False,
    palette: bool = False,
    rgba: bool = False,
) -> DataFrame:
    """REAL media ingest: a ``media`` column holding genuine PNG bytes
    (pure-stdlib encoder, ``functions.png``) plus the same typed
    ``media_meta`` struct as :func:`attach_fake_media`.

    The pixel model is deterministic and — deliberately — SQL-
    reconstructible: scanline i of doc d = the first W bytes of
    sha256(f"{d}:r{i}"), W = 16 + d%4·4 ≤ 32 (one digest per row), so
    a DuckDB oracle can regenerate the exact decoded pixels without
    any PNG code and the full encode→decode path is hash-checkable
    end-to-end (q93). The encoder cycles all five PNG scanline
    filters, so the oracle match also pins the decoder's filter math.

    ``interlace=True`` writes Adam7 streams of the SAME pixels —
    deinterlacing is lossless, so q93's 'adam7' branch shares the
    plain decode oracle: a wrong pass geometry, within-pass filter
    neighbor, or scatter index diverges from the digest.

    ``depth16=True`` reads the SAME first-W-bytes model as W/2
    big-endian uint16 samples and writes 16-bit grayscale streams —
    the decoded sample buffer's bytes equal the 8-bit model's, so
    q93's 'grey16' branch shares the digest too (only the width
    column halves): depth-16 filtering (2-byte left offset) and the
    BE sample order are pinned for free.

    ``palette=True`` writes color type 3 (PLTE) streams: the SAME
    first-W-bytes rows become palette INDICES through the ramp
    palette[i] = (i, 255−i, (7i) mod 256) — a non-trivial mapping, so
    decoded RGB pixel (b, 255−b, 7b mod 256) pins real PLTE indexing
    while staying one printf away in SQL. ``rgba=True`` writes color
    type 6: row r = the first 4W bytes of sha256(f"{d}:q{r}:0..3")
    concatenated (4 bytes per pixel needs 4 digests per row).
    """
    from kaj_query_engine_spark.functions.png import encode_png

    import numpy as np

    if palette and (rgba or depth16):
        raise ValueError("palette excludes rgba/depth16")
    pal = (
        np.stack(
            [
                np.arange(256),
                255 - np.arange(256),
                (np.arange(256) * 7) % 256,
            ],
            axis=1,
        ).astype(np.uint8)
        if palette
        else None
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(d: int) -> bytes:
            w = 16 + (d % 4) * 4
            h = 12 + (d % 3) * 6
            if rgba:
                rows = [
                    np.frombuffer(
                        b"".join(
                            hashlib.sha256(f"{d}:q{i}:{s}".encode()).digest()
                            for s in range(4)
                        )[: 4 * w],
                        dtype=np.uint8,
                    ).reshape(w, 4)
                    for i in range(h)
                ]
            else:
                rows = [
                    np.frombuffer(
                        hashlib.sha256(f"{d}:r{i}".encode()).digest()[:w],
                        dtype=(">u2" if depth16 else np.uint8),
                    )
                    for i in range(h)
                ]
            px = np.stack(rows)
            if depth16:
                px = px.astype(np.uint16)
            return encode_png(
                px, filter_mode="cycle", interlace=interlace, palette=pal
            )

        for pdf in batches:
            yield pd.DataFrame(
                {id_col: pdf[id_col], "media": pdf[id_col].map(one)}
            )

    # no join back to df — a self-join would shuffle the corpus just to
    # reattach columns q93 never reads (callers needing other columns
    # join on id). The ONE deliberate exchange is the small-input /
    # large-compute spread (same rationale as dedup.shingle_table and
    # q40): a few-MB fixture arrives as one split and would serialize
    # every PNG encode on a single core. The spread is capped at
    # PNG_SPREAD=8, NOT defaultParallelism: every partition of every
    # downstream mapInPandas stage spawns an Arrow python worker, and
    # a fresh-session sweep measured cold 11/46/96 s at 8/16/32
    # partitions (worker interpreter+Arrow startup dwarfs the codec
    # work) against warm 2.6/5.1/… — 8 is the knee. At 100 TB the
    # input has more splits than this floor and the repartition is a
    # cheap id shuffle whose count the inputFiles() max takes over.
    base = df.select(id_col)
    if not df.isStreaming:  # stream partitioning governs there (q96)
        base = base.repartition(
            max(PNG_SPREAD, len(df.inputFiles())), F.col(id_col)
        )
    media = base.mapInPandas(gen, f"{id_col} long, media binary")
    return media.withColumn(
        "media_meta",
        F.struct(
            (F.lit(16) + (F.col(id_col) % 4) * 4).cast("int").alias("width"),
            (F.lit(12) + (F.col(id_col) % 3) * 6).cast("int").alias("height"),
            F.lit("png").alias("format"),
        ),
    )


def decode_media(
    df: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "media",
    rgb: bool = False,
) -> DataFrame:
    """Real codec decode — PNG, baseline JPEG and GIF for real,
    other codecs honestly guarded.

    PNG payloads (8-bit grey/RGB) decode via the pure-stdlib codec in
    ``functions.png``, baseline JPEGs (grayscale or YCbCr color) via
    ``functions.jpeg`` (Huffman → coefficients → IDCT), GIFs via
    ``functions.gif`` (LZW → palette RGB), all inside one
    ``mapInPandas`` — Arrow batches in, one (id, width, height,
    channels, pixels) row per media item out, with ``pixels`` the
    row-major uint8 buffer.

    ``rgb=True`` converts color-JPEG Y/Cb/Cr planes to RGB with the
    JFIF fixed-point transform (:func:`functions.jpeg.ycbcr_to_rgb` —
    deterministic integer math, oracle-reproducible); PNG/GIF output
    is already RGB and passes through, grayscale stays single-plane.
    Other payloads (mp3 &c.) raise ``NotImplementedError`` in the
    task: this container ships no codecs for them, and silently
    skipping media would corrupt a training corpus — fail loudly,
    filter by ``media_meta.format`` upstream (metadata pushdown makes
    that scan-cheap).
    """
    import numpy as np

    from kaj_query_engine_spark.functions.gif import decode_gif
    from kaj_query_engine_spark.functions.jpeg import decode_jpeg, ycbcr_to_rgb
    from kaj_query_engine_spark.functions.png import decode_png

    schema = (
        f"{id_col} long, width int, height int, channels int, pixels binary"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(b: bytes) -> tuple[int, int, int, bytes]:
            if bytes(b[:2]) == b"\xff\xd8":
                h, w, px, _co = decode_jpeg(bytes(b))
                if rgb and px.ndim == 3:
                    px = ycbcr_to_rgb(px)
                ch = 1 if px.ndim == 2 else px.shape[2]
                return w, h, ch, px.tobytes()
            if bytes(b[:4]) == b"GIF8":
                px = decode_gif(bytes(b))
                return px.shape[1], px.shape[0], 3, px.tobytes()
            if b[:8] != b"\x89PNG\r\n\x1a\n":
                raise NotImplementedError(
                    "decode_media: only PNG, baseline JPEG and GIF decode "
                    "in this environment (no codec libraries installed) — "
                    "filter on media_meta.format, or use "
                    "media_byte_features for the codec-free path"
                )
            px = decode_png(bytes(b))
            ch = 1 if px.ndim == 2 else px.shape[2]
            if px.dtype == np.uint16:
                # 16-bit grey: emit the wire order (big-endian), which
                # is also the fixture model's byte order
                return px.shape[1], px.shape[0], ch, px.astype(">u2").tobytes()
            return px.shape[1], px.shape[0], ch, px.tobytes()

        for pdf in batches:
            decoded = pdf[bin_col].map(one)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "width": decoded.map(lambda t: t[0]).astype("int32"),
                    "height": decoded.map(lambda t: t[1]).astype("int32"),
                    "channels": decoded.map(lambda t: t[2]).astype("int32"),
                    "pixels": decoded.map(lambda t: t[3]),
                }
            )

    return df.select(id_col, bin_col).mapInPandas(run, schema)


def resize_decoded_media(
    df: DataFrame,
    target_w: int,
    target_h: int,
    id_col: str = "doc_id",
    bin_col: str = "media",
) -> DataFrame:
    """Resize through the REAL codec: decode PNG → nearest-neighbor
    sample (the same floor index math as :func:`resize_media`'s fake
    path: yi = i·H//T) → re-encode PNG. Output (id, media, media_meta)
    — the decoded-for-real twin of :func:`resize_media`, exercising
    encoder and decoder once more per row.
    """
    import numpy as np

    from kaj_query_engine_spark.functions.png import decode_png, encode_png

    schema = f"{id_col} long, {bin_col} binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(b: bytes) -> bytes:
            px = decode_png(bytes(b))
            h, w = px.shape[:2]
            yi = np.arange(target_h) * h // target_h
            xi = np.arange(target_w) * w // target_w
            return encode_png(px[np.ix_(yi, xi)], filter_mode="cycle")

        for pdf in batches:
            yield pd.DataFrame(
                {id_col: pdf[id_col], bin_col: pdf[bin_col].map(one)}
            )

    out = df.select(id_col, bin_col).mapInPandas(run, schema)
    return out.withColumn(
        "media_meta",
        F.struct(
            F.lit(target_w).cast("int").alias("width"),
            F.lit(target_h).cast("int").alias("height"),
            F.lit("png").alias("format"),
        ),
    )


def media_byte_features(
    df: DataFrame, id_col: str = "doc_id", bin_col: str = "media"
) -> DataFrame:
    """Byte-level features via ``mapInPandas`` (Arrow batches in, Arrow
    batches out): (id, n_bytes, first_byte_hex, mean_byte, entropy).

    ``entropy`` is the Shannon entropy of the byte histogram — the
    standard cheap screen for corrupt/blank media before decode.
    """
    schema = (
        f"{id_col} long, n_bytes int, first_byte_hex string, "
        "mean_byte double, n_distinct_bytes int, mode_count int, "
        "entropy double"
    )

    def _mean6(b: bytes) -> float:
        if not b:
            return 0.0
        # HALF_UP to 6 decimals (the engine-portable convention —
        # Python's round() is half-to-even and can diverge from the
        # oracle's round() at exact half boundaries)
        x = sum(b) / len(b)
        return math.floor(x * 1e6 + 0.5) / 1e6

    def _hist(b: bytes) -> tuple[int, int]:
        if not b:
            return 0, 0
        counts: dict[int, int] = {}
        for x in b:
            counts[x] = counts.get(x, 0) + 1
        return len(counts), max(counts.values())

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[bin_col]
            hists = payloads.map(_hist)
            rows = {
                id_col: pdf[id_col],
                "n_bytes": payloads.map(len).astype("int32"),
                "first_byte_hex": payloads.map(lambda b: b[:1].hex()),
                "mean_byte": payloads.map(_mean6),
                "n_distinct_bytes": hists.map(lambda t: t[0]).astype("int32"),
                "mode_count": hists.map(lambda t: t[1]).astype("int32"),
                "entropy": payloads.map(_entropy),
            }
            yield pd.DataFrame(rows)

    return df.select(id_col, bin_col).mapInPandas(extract, schema)


def _entropy(b: bytes) -> float:
    if not b:
        return 0.0
    counts: dict[int, int] = {}
    for x in b:
        counts[x] = counts.get(x, 0) + 1
    n = len(b)
    return round(-sum(c / n * math.log2(c / n) for c in counts.values()), 6)


def media_checksum(
    df: DataFrame, id_col: str = "doc_id", bin_col: str = "media"
) -> DataFrame:
    """Content checksum of the raw bytes — mapInPandas + hashlib,
    the dedup key for binary media (exact dedup joins on this)."""
    schema = f"{id_col} long, media_sha string"

    def digest(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "media_sha": pdf[bin_col].map(
                        lambda b: hashlib.sha256(b).hexdigest()
                    ),
                }
            )

    return df.select(id_col, bin_col).mapInPandas(digest, schema)


def resize_media(
    df: DataFrame,
    target_w: int,
    target_h: int,
    id_col: str = "doc_id",
    bin_col: str = "media",
    meta_col: str = "media_meta",
) -> DataFrame:
    """Resize stage — the full Spark-side plumbing (Arrow
    ``mapInPandas`` batches, per-row pixel-buffer transform, metadata
    rewrite), decode-free: real codecs are absent in this container
    (see :func:`decode_media`), so the pixel buffer comes from the
    deterministic FAKE pixel model ``pixel(i, j) = payload[(i·W + j)
    mod len]`` and resizing is numpy nearest-neighbor index sampling.
    Swapping the fake expansion for a codec decode + PIL resize
    changes ONE function body; the batch shape, schema contract, and
    metadata handling are exactly what the real stage needs.

    Output: (id, media = target_h·target_w bytes, media_meta with the
    new dimensions, format preserved).
    """
    import numpy as np

    flat = df.select(
        id_col,
        bin_col,
        F.col(f"{meta_col}.width").alias("_w"),
        F.col(f"{meta_col}.height").alias("_h"),
        F.col(f"{meta_col}.format").alias("_fmt"),
    )
    schema = f"{id_col} long, {bin_col} binary, _fmt string"

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(payload: bytes, w: int, h: int) -> bytes:
            buf = np.frombuffer(payload, dtype=np.uint8)
            # degenerate rows (empty payload OR zero-area metadata)
            # zero-fill instead of crashing the task: a 0-width grid
            # would make the nearest-neighbor index math go out of
            # bounds even with a non-empty payload
            if buf.size == 0 or w <= 0 or h <= 0:
                return b"\x00" * (target_w * target_h)
            # fake decode: expand payload onto the H×W grid
            grid = buf[
                (np.arange(h)[:, None] * w + np.arange(w)[None, :]) % buf.size
            ]
            yi = np.arange(target_h) * h // target_h
            xi = np.arange(target_w) * w // target_w
            return grid[np.ix_(yi, xi)].tobytes()

        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    bin_col: [
                        one(b, w, h)
                        for b, w, h in zip(pdf[bin_col], pdf["_w"], pdf["_h"])
                    ],
                    "_fmt": pdf["_fmt"],
                }
            )

    out = flat.mapInPandas(resize, schema)
    return out.select(
        id_col,
        bin_col,
        F.struct(
            F.lit(target_w).cast("int").alias("width"),
            F.lit(target_h).cast("int").alias("height"),
            F.col("_fmt").alias("format"),
        ).alias(meta_col),
    )


def frame_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "media",
    frame_bytes: int = DIGEST_BYTES,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Sample fixed-size "frames" from a media payload — the video
    analog (decode-free): (id, frame_idx, frame[, *keep_cols]) with
    frame = ``payload[idx*frame_bytes : (idx+1)*frame_bytes]``.

    ``keep_cols`` are carried through the explode (e.g. the metadata
    struct) so no join is needed to reunite frames with their media's
    typed metadata.

    Pure JVM: explode over a sequence + substring on binary — the hot
    path has no Python, so it rides whole-stage codegen at any scale.
    """
    n_frames = (F.octet_length(F.col(bin_col)) / frame_bytes).cast("int")
    # guard n_frames == 0: sequence(0, -1) would run BACKWARDS and
    # emit two bogus frames; short/empty payloads must yield no rows
    idxs = F.when(n_frames > 0, F.sequence(F.lit(0), n_frames - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return (
        df.select(
            id_col,
            bin_col,
            *keep_cols,
            F.explode(idxs).alias("frame_idx"),
        )
        .select(
            id_col,
            "frame_idx",
            F.expr(
                f"substring({bin_col}, frame_idx * {frame_bytes} + 1, {frame_bytes})"
            ).alias("frame"),
            *keep_cols,
        )
    )


# --- audio: real WAV/PCM codec path (functions/wav.py) ---------------

# partition floor for the WAV generator, same sweep-measured rationale
# as PNG_SPREAD (python-worker startup dominates past ~8 per host JVM)
WAV_SPREAD = 8
_WAV_BLOCK = DIGEST_BYTES // 2  # int16 samples per sha256 digest


def attach_wav_media(
    df: DataFrame,
    id_col: str = "doc_id",
    stereo: bool = False,
    bits: int = 16,
) -> DataFrame:
    """REAL audio ingest: an ``audio`` column holding genuine 16-bit
    PCM WAV bytes (pure-stdlib encoder, ``functions.wav``) plus a typed
    ``audio_meta`` struct (rate, n_samples, format).

    The sample model is deterministic and SQL-reconstructible, like the
    PNG twin: sample block j of doc d = sha256(f"{d}:a{j}").digest()
    read as 16 little-endian int16 values; block count = 6 + d%4 (so
    96–144 samples), rate = 8000 + (d%3)·4000. The WAV ``data`` chunk
    is therefore the digest concatenation byte-for-byte, so a DuckDB
    oracle regenerates the decoded sample buffer — and every derived
    feature — with zero WAV code (q94).

    ``stereo=True`` adds a right channel from the sibling model
    sha256(f"{d}:b{j}") — the same two-channel model the stereo FLAC
    corpus uses, so the WAV interleave and the FLAC decorrelation
    matrix are pinned by ONE oracle shape (q94 'stereo' / q99
    'stereo').

    ``bits`` selects the PCM width over the SAME block model: 8 reads
    each digest as 32 unsigned bytes (offset-binary per the WAV spec),
    24 reads the first 30 bytes as 10 three-byte little-endian signed
    samples (sign extension is the decode step the q94 'pcm24' oracle
    pins), 16 (default) as 16 little-endian int16 values.
    """
    import numpy as np

    from kaj_query_engine_spark.functions.wav import encode_wav

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def chan(d: int, tag: str) -> np.ndarray:
            blocks = [
                hashlib.sha256(f"{d}:{tag}{j}".encode()).digest()
                for j in range(6 + d % 4)
            ]
            buf = b"".join(blocks)
            if bits == 8:
                return np.frombuffer(buf, dtype=np.uint8).copy()
            if bits == 24:
                tri = np.frombuffer(buf, dtype=np.uint8).reshape(-1, 32)[
                    :, :30
                ].reshape(-1, 3)
                quad = np.zeros((len(tri), 4), dtype=np.uint8)
                quad[:, :3] = tri
                return (
                    quad.view("<i4").reshape(-1).astype(np.int32) << 8
                ) >> 8
            return np.frombuffer(buf, dtype="<i2").astype(np.int16)

        def one(d: int) -> bytes:
            samples = chan(d, "a")
            if stereo:
                samples = np.column_stack([samples, chan(d, "b")])
            return encode_wav(samples, 8000 + (d % 3) * 4000, bits=bits)

        for pdf in batches:
            yield pd.DataFrame(
                {id_col: pdf[id_col], "audio": pdf[id_col].map(one)}
            )

    # same shape as attach_png_media: no join back to the corpus, one
    # deliberate small-input/large-compute spread capped at WAV_SPREAD
    # streaming inputs (q96's in-flight decode) can't be repartitioned
    # by inputFiles() — micro-batch partitioning governs the spread
    # there, and each batch is small anyway
    base = df.select(id_col)
    if not df.isStreaming:
        base = base.repartition(
            max(WAV_SPREAD, len(df.inputFiles())), F.col(id_col)
        )
    audio = base.mapInPandas(gen, f"{id_col} long, audio binary")
    per_block = {8: 32, 16: _WAV_BLOCK, 24: 10}[bits]
    n_samples = ((F.lit(6) + F.col(id_col) % 4) * per_block).cast("int")
    return audio.withColumn(
        "audio_meta",
        F.struct(
            (F.lit(8000) + (F.col(id_col) % 3) * 4000)
            .cast("int")
            .alias("rate"),
            n_samples.alias("n_samples"),
            F.lit("wav").alias("format"),
        ),
    )


def decode_audio(
    df: DataFrame, id_col: str = "doc_id", bin_col: str = "audio"
) -> DataFrame:
    """Real audio decode — WAV/PCM and FLAC for real, other codecs
    honestly guarded (same contract as :func:`decode_media`: this
    container ships no mp3/ogg libraries, and silently skipping media
    would corrupt a corpus — raise per-task, filter on
    ``audio_meta.format`` upstream).

    Output one row per item: (id, rate, channels, n_samples, samples)
    with ``samples`` the raw little-endian PCM buffer at the source's
    own width — uint8 bytes for 8-bit streams, int16 LE for 16-bit
    (and FLAC), int32 LE for 24-bit (sign-extended by the decoder).
    """
    from kaj_query_engine_spark.functions.flac import decode_flac
    from kaj_query_engine_spark.functions.wav import decode_wav

    schema = (
        f"{id_col} long, rate int, channels int, n_samples int, "
        "samples binary"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(b: bytes) -> tuple[int, int, int, bytes]:
            if bytes(b[:4]) == b"fLaC":
                rate, samples = decode_flac(bytes(b))
                # stereo decodes to (n, 2); row-major tobytes IS the
                # channel interleave, matching the WAV layout
                ch = 1 if samples.ndim == 1 else samples.shape[1]
                return (
                    rate, ch, samples.shape[0],
                    samples.astype("<i2").tobytes(),
                )
            if bytes(b[:4]) != b"RIFF":
                raise NotImplementedError(
                    "decode_audio: only WAV/PCM and FLAC decode in this "
                    "environment (no codec libraries installed) — "
                    "filter on audio_meta.format"
                )
            rate, channels, samples = decode_wav(bytes(b))
            n = samples.shape[0]
            wire = {
                1: samples,  # uint8: stored bytes ARE the wire form
                2: samples.astype("<i2"),
                4: samples.astype("<i4"),
            }[samples.dtype.itemsize]
            return rate, channels, n, wire.tobytes()

        for pdf in batches:
            dec = pdf[bin_col].map(one)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "rate": dec.map(lambda t: t[0]).astype("int32"),
                    "channels": dec.map(lambda t: t[1]).astype("int32"),
                    "n_samples": dec.map(lambda t: t[2]).astype("int32"),
                    "samples": dec.map(lambda t: t[3]),
                }
            )

    return df.select(id_col, bin_col).mapInPandas(run, schema)


def audio_features(
    df: DataFrame, id_col: str = "doc_id", bin_col: str = "audio"
) -> DataFrame:
    """Decode WAV and extract per-item audio features in ONE Arrow
    pass: (id, rate, n_samples, duration_s, energy, rms, zcr, peak).

    Oracle-exactness by construction: ``energy`` (Σ v²) is an EXACT
    int64 — no float summation-order drift — and ``rms``/``duration_s``
    derive from it via single correctly-rounded IEEE ops
    (sqrt(energy/n), n/rate), so the DuckDB oracle computing the same
    ints reaches bit-identical doubles. ``zcr`` counts strict sign
    changes between consecutive samples (v[i]·v[i+1] < 0); ``peak`` is
    max |v|. Multi-channel items are featurized on channel 0 (the
    fixture model is mono); duration still uses the frame count.
    """
    import math

    import numpy as np

    from kaj_query_engine_spark.functions.wav import decode_wav

    schema = (
        f"{id_col} long, rate int, n_samples int, duration_s double, "
        "energy long, rms double, zcr int, peak int"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(b: bytes) -> tuple:
            rate, channels, samples = decode_wav(bytes(b))
            n = samples.shape[0]
            v = (samples[:, 0] if channels > 1 else samples).astype(np.int64)
            energy = int(np.sum(v * v))
            rms = math.sqrt(energy / n) if n else 0.0
            zcr = int(np.count_nonzero(v[:-1] * v[1:] < 0))
            peak = int(np.max(np.abs(v))) if n else 0
            return rate, n, n / rate, energy, rms, zcr, peak

        for pdf in batches:
            feats = pdf[bin_col].map(one)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "rate": feats.map(lambda t: t[0]).astype("int32"),
                    "n_samples": feats.map(lambda t: t[1]).astype("int32"),
                    "duration_s": feats.map(lambda t: t[2]).astype("float64"),
                    "energy": feats.map(lambda t: t[3]).astype("int64"),
                    "rms": feats.map(lambda t: t[4]).astype("float64"),
                    "zcr": feats.map(lambda t: t[5]).astype("int32"),
                    "peak": feats.map(lambda t: t[6]).astype("int32"),
                }
            )

    return df.select(id_col, bin_col).mapInPandas(run, schema)


def resample_audio(
    df: DataFrame,
    target_n: int,
    target_rate: int,
    id_col: str = "doc_id",
    bin_col: str = "audio",
) -> DataFrame:
    """Resample through the REAL codec: decode WAV → nearest-neighbor
    sample (the floor index rule si = i·N//target_n, the exact audio
    analog of :func:`resize_decoded_media`'s yi = i·H//T) → re-encode
    at ``target_rate``. Output (id, audio, audio_meta) — pins encoder
    and decoder once more per row, SQL-reconstructible (q94 'resample').
    Multi-channel audio keeps its channels (frames are sampled whole).
    """
    import numpy as np

    from kaj_query_engine_spark.functions.wav import decode_wav, encode_wav

    schema = f"{id_col} long, {bin_col} binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(b: bytes) -> bytes:
            _rate, _channels, samples = decode_wav(bytes(b))
            idx = np.arange(target_n) * samples.shape[0] // target_n
            return encode_wav(samples[idx], target_rate)

        for pdf in batches:
            yield pd.DataFrame(
                {id_col: pdf[id_col], bin_col: pdf[bin_col].map(one)}
            )

    out = df.select(id_col, bin_col).mapInPandas(run, schema)
    return out.withColumn(
        "audio_meta",
        F.struct(
            F.lit(target_rate).cast("int").alias("rate"),
            F.lit(target_n).cast("int").alias("n_samples"),
            F.lit("wav").alias("format"),
        ),
    )


# --- video: real AVI container codec path (functions/avi.py) ---------

# partition floor for the AVI generator, same rationale as PNG_SPREAD
AVI_SPREAD = 8
# fixture geometry: width 10 forces DIB row padding (30 → 32 bytes),
# so the padding math is exercised on every frame
_AVI_W = 10


def attach_avi_media(
    df: DataFrame, id_col: str = "doc_id", with_audio: bool = False
) -> DataFrame:
    """REAL video ingest: a ``video`` column holding genuine AVI bytes
    (pure-stdlib RIFF encoder, ``functions.avi``, uncompressed 24-bit
    DIB frames) plus a typed ``video_meta`` struct.

    The pixel model is deterministic and SQL-reconstructible: row r of
    frame f of doc d = the first 30 bytes of sha256(f"{d}:f{f}:r{r}")
    as a 10-px RGB scanline; n_frames = 2 + d%3, height = 6 + d%3,
    fps = 10. The encoder converts to the DIB's bottom-up BGR padded
    layout and the decoder converts back, so the q95 oracle's digest
    match pins that whole layout round trip with zero video code.

    ``with_audio=True`` muxes the WAV twin's sample model (q94's
    ``:a`` blocks, same rate rule) as an interleaved PCM stream: the
    q95 'muxed' branch proves frames decode identically around the
    interleaved '01wb' chunks, and 'sound' pins the demuxed PCM
    against the same SQL digest q94 uses — one audio model, three
    containers (WAV, FLAC, AVI).
    """
    import numpy as np

    from kaj_query_engine_spark.functions.avi import encode_avi

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(d: int) -> bytes:
            h = 6 + d % 3
            frames = np.stack(
                [
                    np.stack(
                        [
                            np.frombuffer(
                                hashlib.sha256(
                                    f"{d}:f{f}:r{r}".encode()
                                ).digest()[: _AVI_W * 3],
                                dtype=np.uint8,
                            ).reshape(_AVI_W, 3)
                            for r in range(h)
                        ]
                    )
                    for f in range(2 + d % 3)
                ]
            )
            kw = {}
            if with_audio:
                blocks = [
                    hashlib.sha256(f"{d}:a{j}".encode()).digest()
                    for j in range(6 + d % 4)
                ]
                kw["audio"] = np.frombuffer(
                    b"".join(blocks), dtype="<i2"
                ).astype(np.int16)
                kw["audio_rate"] = 8000 + (d % 3) * 4000
            return encode_avi(frames, fps=10, **kw)

        for pdf in batches:
            yield pd.DataFrame(
                {id_col: pdf[id_col], "video": pdf[id_col].map(one)}
            )

    video = (
        df.select(id_col)
        .repartition(
            max(AVI_SPREAD, len(df.inputFiles())), F.col(id_col)
        )
        .mapInPandas(gen, f"{id_col} long, video binary")
    )
    return video.withColumn(
        "video_meta",
        F.struct(
            F.lit(_AVI_W).cast("int").alias("width"),
            (F.lit(6) + F.col(id_col) % 3).cast("int").alias("height"),
            (F.lit(2) + F.col(id_col) % 3).cast("int").alias("n_frames"),
            F.lit(10).cast("int").alias("fps"),
            F.lit("avi").alias("format"),
        ),
    )


# MJPEG fixture geometry: 2 blocks wide (16 px), 1-3 blocks tall
_MJPG_BX = 2


def attach_mjpeg_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """COMPRESSED video ingest: a ``video`` column holding genuine
    Motion-JPEG AVI bytes — q95's RIFF container composed with q97's
    JPEG entropy layer ('MJPG' streams are concatenated baseline
    JPEGs), the one compressed-video format this environment can
    verify with zero codec libraries.

    The frame model keeps the pixel layer SQL-reconstructible by the
    q97 'dcpatch' trick: every frame is a DC-ONLY grayscale JPEG
    (block b of frame f of doc d has DC = byte0(sha256(f"{d}:v{f}b{b}"))
    % 32 − 16, all ACs zero; luma quant q0 = 1), so the decoded frame
    is flat 8×8 patches of floor(DC/8 + 128.5), replicated grey→RGB
    by the demuxer. Geometry: 16×(8·(1+d%3)) px, 2+d%3 frames, fps 10.
    JPEG entropy framing inside a video container is pinned by the
    same digest the DIB branches use.
    """
    import numpy as np

    from kaj_query_engine_spark.functions.avi import encode_avi_mjpeg
    from kaj_query_engine_spark.functions.jpeg import encode_jpeg

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(d: int) -> bytes:
            by = 1 + d % 3
            jpegs = []
            for f in range(2 + d % 3):
                coeffs = np.zeros((_MJPG_BX * by, 64), dtype=np.int64)
                for b in range(_MJPG_BX * by):
                    digest = hashlib.sha256(f"{d}:v{f}b{b}".encode()).digest()
                    coeffs[b, 0] = digest[0] % 32 - 16
                jpegs.append(encode_jpeg(coeffs, by * 8, _MJPG_BX * 8))
            return encode_avi_mjpeg(jpegs, _MJPG_BX * 8, by * 8, fps=10)

        for pdf in batches:
            yield pd.DataFrame(
                {id_col: pdf[id_col], "video": pdf[id_col].map(one)}
            )

    video = (
        df.select(id_col)
        .repartition(
            max(AVI_SPREAD, len(df.inputFiles())), F.col(id_col)
        )
        .mapInPandas(gen, f"{id_col} long, video binary")
    )
    return video.withColumn(
        "video_meta",
        F.struct(
            F.lit(_MJPG_BX * 8).cast("int").alias("width"),
            ((F.lit(1) + F.col(id_col) % 3) * 8).cast("int").alias("height"),
            (F.lit(2) + F.col(id_col) % 3).cast("int").alias("n_frames"),
            F.lit(10).cast("int").alias("fps"),
            F.lit("mjpg").alias("format"),
        ),
    )


def decode_video(
    df: DataFrame, id_col: str = "doc_id", bin_col: str = "video"
) -> DataFrame:
    """Real video decode — AVI containers for real (uncompressed DIB
    and Motion-JPEG streams, ``functions.avi``), other containers
    honestly guarded (same contract as
    :func:`decode_media`/:func:`decode_audio`).

    Output EXPLODES the container: one row per frame,
    (id, frame_idx, width, height, fps, n_frames, pixels) with
    ``pixels`` the frame's row-major RGB uint8 buffer — the shape a
    per-frame featurizer or dedup stage consumes directly, no second
    pass over the container.
    """
    from kaj_query_engine_spark.functions.avi import decode_avi

    schema = (
        f"{id_col} long, frame_idx int, width int, height int, "
        "fps int, n_frames int, pixels binary"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d, b in zip(pdf[id_col], pdf[bin_col]):
                if bytes(b[:4]) != b"RIFF":
                    raise NotImplementedError(
                        "decode_video: only AVI containers (DIB or "
                        "MJPG streams) decode in this environment (no "
                        "codec libraries installed) — filter on "
                        "video_meta.format in ('avi', 'mjpg')"
                    )
                fps, frames = decode_avi(bytes(b))
                n, h, w = frames.shape[:3]
                for i in range(n):
                    rows.append((d, i, w, h, fps, n, frames[i].tobytes()))
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col,
                    "frame_idx",
                    "width",
                    "height",
                    "fps",
                    "n_frames",
                    "pixels",
                ],
            )

    return df.select(id_col, bin_col).mapInPandas(run, schema)


def demux_audio(
    df: DataFrame, id_col: str = "doc_id", bin_col: str = "video"
) -> DataFrame:
    """Demux the PCM audio stream out of muxed AVI containers: one
    (id, rate, n_samples, samples) row per item, ``samples`` the
    concatenated int16-LE buffer from the interleaved '01wb' chunks
    (:func:`functions.avi.decode_avi_av`). Items without an audio
    stream raise — a corpus stage that expects sound should fail
    loudly, not emit silence; filter upstream if audio is optional."""
    from kaj_query_engine_spark.functions.avi import decode_avi_av

    schema = f"{id_col} long, rate int, n_samples int, samples binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(b: bytes) -> tuple[int, int, bytes]:
            _fps, _frames, rate, audio = decode_avi_av(bytes(b))
            if rate is None:
                raise ValueError(
                    "demux_audio: AVI carries no audio stream — filter "
                    "on container metadata upstream"
                )
            return rate, audio.shape[0], audio.astype("<i2").tobytes()

        for pdf in batches:
            dec = pdf[bin_col].map(one)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "rate": dec.map(lambda t: t[0]).astype("int32"),
                    "n_samples": dec.map(lambda t: t[1]).astype("int32"),
                    "samples": dec.map(lambda t: t[2]),
                }
            )

    return df.select(id_col, bin_col).mapInPandas(run, schema)


def subsample_video(
    df: DataFrame,
    stride: int,
    id_col: str = "doc_id",
    bin_col: str = "video",
) -> DataFrame:
    """Temporal subsampling through the REAL codec: decode AVI → keep
    every ``stride``-th frame (0, stride, 2·stride, …) → re-encode.
    The video analog of :func:`resample_audio`'s fixed-take and
    :func:`resize_decoded_media`'s spatial sample — pins the container
    encoder and decoder once more per row (q95 'sample' branch decodes
    the result AGAIN and digest-checks each surviving frame).
    """
    from kaj_query_engine_spark.functions.avi import decode_avi, encode_avi

    if stride < 1:
        raise ValueError("stride must be >= 1")
    schema = f"{id_col} long, {bin_col} binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(b: bytes) -> bytes:
            fps, frames = decode_avi(bytes(b))
            return encode_avi(frames[::stride], fps=fps)

        for pdf in batches:
            yield pd.DataFrame(
                {id_col: pdf[id_col], bin_col: pdf[bin_col].map(one)}
            )

    return df.select(id_col, bin_col).mapInPandas(run, schema)


def video_summary(
    df: DataFrame, id_col: str = "doc_id", bin_col: str = "video"
) -> DataFrame:
    """Decode AVI and summarize per item in one Arrow pass:
    (id, n_frames, fps, width, height, pix_sum, mean_byte).

    Same oracle-exactness rule as :func:`audio_features`: ``pix_sum``
    (Σ of all pixel bytes) stays an exact int64, and ``mean_byte``
    derives from it via one correctly-rounded IEEE division, so the
    SQL oracle reaches a bit-identical double.
    """
    import numpy as np

    from kaj_query_engine_spark.functions.avi import decode_avi

    schema = (
        f"{id_col} long, n_frames int, fps int, width int, height int, "
        "pix_sum long, mean_byte double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(b: bytes) -> tuple:
            fps, frames = decode_avi(bytes(b))
            n, h, w = frames.shape[:3]
            pix_sum = int(frames.astype(np.int64).sum())
            return n, fps, w, h, pix_sum, pix_sum / (n * h * w * 3)

        for pdf in batches:
            s = pdf[bin_col].map(one)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_frames": s.map(lambda t: t[0]).astype("int32"),
                    "fps": s.map(lambda t: t[1]).astype("int32"),
                    "width": s.map(lambda t: t[2]).astype("int32"),
                    "height": s.map(lambda t: t[3]).astype("int32"),
                    "pix_sum": s.map(lambda t: t[4]).astype("int64"),
                    "mean_byte": s.map(lambda t: t[5]).astype("float64"),
                }
            )

    return df.select(id_col, bin_col).mapInPandas(run, schema)


# --- JPEG: real baseline codec path (functions/jpeg.py) --------------

JPEG_SPREAD = 8  # same sweep-measured partition floor as the others


def attach_jpeg_media(
    df: DataFrame,
    id_col: str = "doc_id",
    dc_only: bool = False,
    restart_interval: int = 0,
    color: bool = False,
    subsampling: str = "444",
) -> DataFrame:
    """REAL JPEG ingest: a ``media`` column holding genuine baseline
    grayscale JPEG bytes (pure stdlib+numpy encoder,
    ``functions.jpeg``) plus the typed ``media_meta`` struct.

    The coefficient model is deterministic and SQL-reconstructible —
    JPEG's fixture model lives at the QUANTIZED-COEFFICIENT layer
    (the lossless payload the entropy coding stores), not the pixel
    layer, because the DCT is lossy: block b of doc d takes digest
    sha256(f"{d}:j{b}"); DC = byte0 % 32 − 16, AC at zigzag k is
    byte((7k+3)%32) % 15 − 7 when (byte(k%32)+k) % 5 == 0 else 0.
    Geometry: width 8·(1+d%2), height 8·(1+d%3), blocks raster-order.

    ``dc_only=True`` zeroes every AC: the image is then exact flat
    8×8 patches (IDCT of a DC-only block is constant DC·q₀/8), which
    makes the PIXEL layer itself SQL-reconstructible — q97's
    'dcpatch' branch pins IDCT normalization, level shift, clamp and
    raster placement in the oracle, while full-AC pixels are pinned
    against the literal cosine-sum reference in pytest.

    ``restart_interval`` > 0 encodes the same coefficients WITH a DRI
    segment and RSTm markers (T.81 error-resilience framing): the
    decoded coefficients are identical by construction, so q97's
    'rst' branch shares the plain branch's oracle — any predictor-
    reset, byte-alignment, or marker-cadence bug shows up as a
    payload hash mismatch.

    ``color=True`` emits YCbCr 4:4:4 streams: MCU b's component c
    takes its own digest sha256(f"{d}:j{b}c{c}") through the SAME
    DC/AC formulas, so the q97 'color' oracle reconstructs the
    scan-interleaved (b, c, k) coefficient buffer — three DC
    predictor chains, table routing, and the two-quant-table layout
    all pinned. ``subsampling="420"`` (with ``color``) emits the
    4:2:0 layout instead — 16×16 MCUs of four Y + Cb + Cr blocks,
    slot s of MCU m from sha256(f"{d}:j{m}s{s}") — pinning the
    sampling-factor MCU interleave itself.
    """
    import numpy as np

    from kaj_query_engine_spark.functions.jpeg import encode_jpeg

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # (r14 negative result: a numpy-vectorized form of this k-loop
        # measured ~25 % SLOWER — 64-element array setup loses to the
        # plain loop; left as is)
        def block(dig: bytes) -> np.ndarray:
            co = np.zeros(64, dtype=np.int64)
            co[0] = dig[0] % 32 - 16
            if not dc_only:
                for k in range(1, 64):
                    if (dig[k % 32] + k) % 5 == 0:
                        co[k] = dig[(k * 7 + 3) % 32] % 15 - 7
            return co

        def dig_block(key: str) -> np.ndarray:
            return block(hashlib.sha256(key.encode()).digest())

        def one(d: int) -> bytes:
            bx, by = 1 + d % 2, 1 + d % 3
            if color and subsampling == "420":
                n_mcu = ((bx * 8 + 15) // 16) * ((by * 8 + 15) // 16)
                co = np.stack(
                    [
                        np.stack(
                            [dig_block(f"{d}:j{m}s{s}") for s in range(6)]
                        )
                        for m in range(n_mcu)
                    ]
                )
            elif color:
                co = np.stack(
                    [
                        np.stack(
                            [dig_block(f"{d}:j{b}c{c}") for c in range(3)]
                        )
                        for b in range(bx * by)
                    ]
                )
            else:
                co = np.stack(
                    [dig_block(f"{d}:j{b}") for b in range(bx * by)]
                )
            return encode_jpeg(
                co,
                by * 8,
                bx * 8,
                restart_interval=restart_interval,
                subsampling=subsampling,
            )

        for pdf in batches:
            yield pd.DataFrame(
                {id_col: pdf[id_col], "media": pdf[id_col].map(one)}
            )

    base = df.select(id_col)
    if not df.isStreaming:
        base = base.repartition(
            max(JPEG_SPREAD, len(df.inputFiles())), F.col(id_col)
        )
    media = base.mapInPandas(gen, f"{id_col} long, media binary")
    return media.withColumn(
        "media_meta",
        F.struct(
            ((F.lit(1) + F.col(id_col) % 2) * 8).cast("int").alias("width"),
            ((F.lit(1) + F.col(id_col) % 3) * 8).cast("int").alias("height"),
            F.lit("jpeg").alias("format"),
        ),
    )


def jpeg_coefficients(
    df: DataFrame, id_col: str = "doc_id", bin_col: str = "media"
) -> DataFrame:
    """Decode the LOSSLESS layer of baseline JPEGs: Huffman →
    run-length → DPCM → the quantized coefficient blocks, emitted as
    an int16-LE zigzag-order buffer per item (one Arrow pass). This is
    the byte-exact payload the encoder stored, so the q97 oracle can
    digest a pure-SQL reconstruction of it — the JPEG analog of the
    PNG/WAV/AVI buffer digests, one layer down the codec."""
    from kaj_query_engine_spark.functions.jpeg import decode_jpeg

    schema = (
        f"{id_col} long, width int, height int, n_blocks int, "
        "coeffs binary"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(b: bytes) -> tuple[int, int, int, bytes]:
            h, w, _px, co = decode_jpeg(bytes(b))
            # color coeffs are (n_mcus, 3, 64); flatten to scan order
            # so n_blocks counts COMPONENT blocks and the buffer is
            # the interleaved stream the oracle reconstructs
            co = co.reshape(-1, 64)
            return w, h, co.shape[0], co.astype("<i2").tobytes()

        for pdf in batches:
            dec = pdf[bin_col].map(one)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "width": dec.map(lambda t: t[0]).astype("int32"),
                    "height": dec.map(lambda t: t[1]).astype("int32"),
                    "n_blocks": dec.map(lambda t: t[2]).astype("int32"),
                    "coeffs": dec.map(lambda t: t[3]),
                }
            )

    return df.select(id_col, bin_col).mapInPandas(run, schema)


# --- GIF: real LZW codec path (functions/gif.py) ---------------------

GIF_SPREAD = 8  # same sweep-measured partition floor as the others


def attach_gif_media(
    df: DataFrame, id_col: str = "doc_id", interlace: bool = False
) -> DataFrame:
    """REAL GIF ingest: a ``media`` column holding genuine GIF87a
    bytes (pure-stdlib LZW encoder, ``functions.gif``, grayscale
    palette) plus the typed ``media_meta`` struct.

    Same SQL-reconstructible pixel model as the PNG twin: row r of
    doc d = the first W bytes of sha256(f"{d}:g{r}") as palette
    indices, W = 16 + d%4·4, H = 12 + d%3·6. LZW is lossless and the
    palette is the grayscale ramp, so the decoded RGB buffer is each
    model byte tripled — the q98 oracle rebuilds it with zero GIF
    code, pinning the LZW dictionary dynamics byte-exactly.

    ``interlace=True`` writes the same pixels through the four-pass
    row interleave — deinterlacing is lossless, so q98's 'interlaced'
    branch shares the plain oracle and a wrong pass order diverges.
    """
    import numpy as np

    from kaj_query_engine_spark.functions.gif import encode_gif

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(d: int) -> bytes:
            w = 16 + (d % 4) * 4
            h = 12 + (d % 3) * 6
            rows = [
                np.frombuffer(
                    hashlib.sha256(f"{d}:g{i}".encode()).digest()[:w],
                    dtype=np.uint8,
                )
                for i in range(h)
            ]
            return encode_gif(np.stack(rows), interlace=interlace)

        for pdf in batches:
            yield pd.DataFrame(
                {id_col: pdf[id_col], "media": pdf[id_col].map(one)}
            )

    base = df.select(id_col)
    if not df.isStreaming:
        base = base.repartition(
            max(GIF_SPREAD, len(df.inputFiles())), F.col(id_col)
        )
    media = base.mapInPandas(gen, f"{id_col} long, media binary")
    return media.withColumn(
        "media_meta",
        F.struct(
            (F.lit(16) + (F.col(id_col) % 4) * 4).cast("int").alias("width"),
            (F.lit(12) + (F.col(id_col) % 3) * 6).cast("int").alias("height"),
            F.lit("gif").alias("format"),
        ),
    )


def normalize_media(
    df: DataFrame, id_col: str = "doc_id", bin_col: str = "media"
) -> DataFrame:
    """Media normalization: decode WHATEVER still-image codec each
    payload uses (PNG, baseline JPEG, or GIF — sniffed by magic, the
    decode_media contract) and re-encode everything as PNG, the
    canonical lossless interchange form a mixed-format corpus is
    normalized to before training. Output (id, media, media_meta)
    with format='png' for every row.

    Grayscale sources stay (H, W); palette/RGB sources stay
    (H, W, 3) — PNG carries both natively. One Arrow pass, map-only;
    unsupported codecs raise per-task like every decode operator here.
    """
    import numpy as np

    from kaj_query_engine_spark.functions.gif import decode_gif
    from kaj_query_engine_spark.functions.jpeg import decode_jpeg
    from kaj_query_engine_spark.functions.png import decode_png, encode_png

    schema = f"{id_col} long, {bin_col} binary, width int, height int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(b: bytes) -> tuple[bytes, int, int]:
            raw = bytes(b)
            if raw[:2] == b"\xff\xd8":
                _h, _w, px, _co = decode_jpeg(raw)
            elif raw[:4] == b"GIF8":
                px = decode_gif(raw)
            elif raw[:8] == b"\x89PNG\r\n\x1a\n":
                px = decode_png(raw)
            else:
                raise NotImplementedError(
                    "normalize_media: unsupported codec (PNG/JPEG/GIF "
                    "decode here; no libraries for others) — filter on "
                    "media_meta.format upstream"
                )
            return encode_png(np.ascontiguousarray(px)), px.shape[1], px.shape[0]

        for pdf in batches:
            enc = pdf[bin_col].map(one)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    bin_col: enc.map(lambda t: t[0]),
                    "width": enc.map(lambda t: t[1]).astype("int32"),
                    "height": enc.map(lambda t: t[2]).astype("int32"),
                }
            )

    out = df.select(id_col, bin_col).mapInPandas(run, schema)
    return out.select(
        id_col,
        bin_col,
        F.struct(
            F.col("width"), F.col("height"), F.lit("png").alias("format")
        ).alias("media_meta"),
    )


_FLAC_MODES = ["independent", "left-side", "right-side", "mid-side"]


def attach_flac_media(
    df: DataFrame,
    id_col: str = "doc_id",
    stereo: bool = False,
    rice_porder: int = 0,
) -> DataFrame:
    """REAL compressed-audio ingest: an ``audio`` column holding
    genuine FLAC bytes (pure-stdlib encoder, ``functions.flac``) plus
    the same typed ``audio_meta`` struct as :func:`attach_wav_media`.

    Deliberately reuses the WAV twin's EXACT sample model (block j of
    doc d = sha256(f"{d}:a{j}") as 16 LE int16 samples, rate
    8000 + d%3·4000), so FLAC being lossless means the decoded PCM
    digest must match the SAME SQL reconstruction q94 uses — one
    oracle, two codecs (q99). block_size=64 forces the multi-frame
    path on every fixture; the predictor family alternates by d % 6:
    even halves get FIXED orders 0–2 (d % 3), odd halves get LPC
    orders 1–3 (Levinson-Durbin quantized coefficients), so every
    corpus slice pins both subframe families through the one digest
    oracle.

    ``stereo=True`` adds a right channel from the sibling model
    sha256(f"{d}:b{j}") and cycles the channel assignment by d % 4
    (independent / left-side / right-side / mid-side), so every
    decorrelation mode is pinned by the interleaved-buffer digest —
    a wrong side width, parity bit, or reconstruction sign diverges.

    ``rice_porder`` writes PARTITIONED Rice residuals (2^porder
    partitions per subframe, each with its own parameter — what real
    encoders emit at -l defaults); decode is identical, so the q99
    'rice2' branch shares the same digest oracle.
    """
    import numpy as np

    from kaj_query_engine_spark.functions.flac import encode_flac

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def chan(d: int, tag: str) -> np.ndarray:
            blocks = [
                hashlib.sha256(f"{d}:{tag}{j}".encode()).digest()
                for j in range(6 + d % 4)
            ]
            return np.frombuffer(b"".join(blocks), dtype="<i2").astype(
                np.int16
            )

        def one(d: int) -> bytes:
            samples = chan(d, "a")
            kw = {"rice_porder": rice_porder}
            if stereo:
                samples = np.column_stack([samples, chan(d, "b")])
                kw["channel_mode"] = _FLAC_MODES[d % 4]
            if d % 6 >= 3:  # LPC half of the corpus
                return encode_flac(
                    samples,
                    8000 + (d % 3) * 4000,
                    block_size=64,
                    lpc_order=1 + d % 3,
                    **kw,
                )
            return encode_flac(
                samples,
                8000 + (d % 3) * 4000,
                block_size=64,
                force_order=d % 3,
                **kw,
            )

        for pdf in batches:
            yield pd.DataFrame(
                {id_col: pdf[id_col], "audio": pdf[id_col].map(one)}
            )

    base = df.select(id_col)
    if not df.isStreaming:
        base = base.repartition(
            max(WAV_SPREAD, len(df.inputFiles())), F.col(id_col)
        )
    audio = base.mapInPandas(gen, f"{id_col} long, audio binary")
    n_samples = ((F.lit(6) + F.col(id_col) % 4) * _WAV_BLOCK).cast("int")
    return audio.withColumn(
        "audio_meta",
        F.struct(
            (F.lit(8000) + (F.col(id_col) % 3) * 4000)
            .cast("int")
            .alias("rate"),
            n_samples.alias("n_samples"),
            F.lit("flac").alias("format"),
        ),
    )
