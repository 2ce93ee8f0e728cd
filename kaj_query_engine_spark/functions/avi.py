"""Pure-stdlib AVI video codec (struct + numpy) — real video container
decode for :func:`operators.multimodal.decode_video`.

This container ships no video libraries, but uncompressed AVI needs
none: the format is a RIFF container (the same chunk grammar as WAV —
``functions/wav.py``) holding an ``hdrl`` header LIST (``avih`` main
header + one ``strl`` stream with ``strh``/``strf``) and a ``movi``
LIST of ``00db`` frame chunks, each an uncompressed Windows DIB:
bottom-up scanline order, BGR byte order, rows padded to 4 bytes
(Microsoft AVI/RIFF + BITMAPINFOHEADER specs — public). Supported
here: one 24-bit BI_RGB video stream ('vids'/'DIB '), optionally
muxed with one 16-bit mono PCM audio stream ('auds'/'01wb' chunks
interleaved with the frames, WAVEFORMATEX strf) — the layout real
muxers produce. Anything else raises loudly.

Same design rules as the PNG/WAV twins: encoder and decoder are
independent code paths (the decoder re-derives geometry from ``strf``
and validates it against ``avih`` and every frame chunk's size), and
the q95 oracle reconstructs each decoded frame from the sha256 fixture
model in pure SQL, so a digest match pins the container framing, the
bottom-up row flip, the BGR→RGB swap, and the row padding byte-exact.

No counterpart in the reference engine (3 scalar types only —
``/root/reference/src/qp/utils/Attribute.java:11-13``); this is
training-pipeline extension surface.
"""

from __future__ import annotations

import struct

import numpy as np


def _pad4(n: int) -> int:
    return (n + 3) & ~3


def _list(kind: bytes, payload: bytes) -> bytes:
    body = kind + payload
    return b"LIST" + struct.pack("<I", len(body)) + body


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        tag
        + struct.pack("<I", len(payload))
        + payload
        + (b"\x00" if len(payload) % 2 else b"")
    )


def encode_avi(
    frames: np.ndarray,
    fps: int = 10,
    audio: np.ndarray | None = None,
    audio_rate: int = 8000,
) -> bytes:
    """Encode an (N, H, W, 3) uint8 RGB frame stack to AVI bytes.

    Frames are stored as the spec demands for BI_RGB DIBs: BGR channel
    order, bottom-up rows, rows padded to 4-byte boundaries — the
    decoder undoes all three, so a round trip through both proves the
    layout math rather than assuming it.

    ``audio`` (1-D int16 mono PCM) adds a second stream the way real
    muxers do: an 'auds' strl (strh + WAVEFORMATEX strf) and '01wb'
    chunks INTERLEAVED with the frames in movi — frame i is followed
    by its ceil-even share of the samples, so a player can stream
    without seeking. Demuxing is pure concatenation in chunk order.
    """
    f = np.ascontiguousarray(frames, dtype=np.uint8)
    if f.ndim != 4 or f.shape[3] != 3:
        raise ValueError("frames must be (N, H, W, 3) uint8 RGB")
    n, h, w = f.shape[:3]
    if not (0 < fps <= 10**6):
        raise ValueError(f"bad fps {fps}")
    if audio is not None:
        audio = np.asarray(audio)
        if audio.dtype != np.int16 or audio.ndim != 1 or len(audio) == 0:
            raise ValueError("audio must be a non-empty 1-D int16 array")
        if not (1 <= audio_rate < 2**31):
            raise ValueError(f"bad audio_rate {audio_rate}")
    row_bytes = _pad4(w * 3)
    frame_bytes = row_bytes * h
    dib = np.zeros((n, h, row_bytes), dtype=np.uint8)
    dib[:, :, : w * 3] = f[:, ::-1, :, ::-1].reshape(n, h, w * 3)
    n_streams = 2 if audio is not None else 1
    avih = struct.pack(
        "<14I",
        10**6 // fps,  # dwMicroSecPerFrame
        frame_bytes * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0,  # dwFlags — no idx1 index is written, so HASINDEX stays off
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        n_streams,
        frame_bytes,  # dwSuggestedBufferSize
        w,
        h,
        0,
        0,
        0,
        0,  # dwReserved[4]
    )
    strh = (
        b"vids"
        + b"DIB "
        + struct.pack("<10I", 0, 0, 0, 1, fps, 0, n, frame_bytes, 0, 0)
        + struct.pack("<4h", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_bytes, 0, 0, 0, 0
    )
    strls = _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))
    if audio is not None:
        a_strh = (
            b"auds"
            + b"\x00\x00\x00\x00"
            + struct.pack(
                "<10I", 0, 0, 0, 1, audio_rate, 0, len(audio), 2 * len(audio),
                0, 2,  # dwSampleSize = 2 bytes (16-bit mono PCM)
            )
            + struct.pack("<4h", 0, 0, 0, 0)
        )
        a_strf = struct.pack(  # WAVEFORMATEX, PCM mono 16-bit
            "<HHIIHH", 1, 1, audio_rate, audio_rate * 2, 2, 16
        )
        strls += _list(
            b"strl", _chunk(b"strh", a_strh) + _chunk(b"strf", a_strf)
        )
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + strls)
    if audio is None:
        movi_body = b"".join(_chunk(b"00db", d.tobytes()) for d in dib)
    else:
        spf = -(-len(audio) // n)  # ceil: every frame gets a share
        parts = []
        for i, d in enumerate(dib):
            parts.append(_chunk(b"00db", d.tobytes()))
            seg = audio[i * spf : (i + 1) * spf]
            if len(seg):
                parts.append(_chunk(b"01wb", seg.astype("<i2").tobytes()))
        movi_body = b"".join(parts)
    movi = _list(b"movi", movi_body)
    return b"RIFF" + struct.pack("<I", len(b"AVI " + hdrl + movi)) + b"AVI " + hdrl + movi


_MJPG_FOURCC = 0x47504A4D  # "MJPG" little-endian


def encode_avi_mjpeg(
    jpegs: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Encode pre-compressed baseline JPEG frames as a Motion-JPEG
    AVI — the one compressed-video format this environment can build
    and verify without any codec library, because an 'MJPG' stream is
    just concatenated standalone JPEGs (each ``00dc`` chunk is one
    complete JFIF image, decoded by ``functions.jpeg``). Same RIFF
    grammar as :func:`encode_avi`; the video strl carries handler
    'MJPG' and ``biCompression = 'MJPG'``, and frames land in ``00dc``
    (compressed) chunks instead of ``00db``.
    """
    if not jpegs:
        raise ValueError("need at least one JPEG frame")
    for i, j in enumerate(jpegs):
        if j[:2] != b"\xff\xd8":
            raise ValueError(f"frame {i} is not a JPEG (missing SOI)")
    if not (0 < fps <= 10**6):
        raise ValueError(f"bad fps {fps}")
    n = len(jpegs)
    buf_size = max(len(j) for j in jpegs)
    avih = struct.pack(
        "<14I",
        10**6 // fps,
        buf_size * fps,
        0,
        0,
        n,
        0,
        1,  # one stream
        buf_size,
        width,
        height,
        0,
        0,
        0,
        0,
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack("<10I", 0, 0, 0, 1, fps, 0, n, buf_size, 0, 0)
        + struct.pack("<4h", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, width, height, 1, 24, _MJPG_FOURCC, buf_size, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00dc", j) for j in jpegs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_av(
    data: bytes,
) -> tuple[int, np.ndarray, int | None, np.ndarray | None]:
    """Demux AVI bytes to ``(fps, frames, audio_rate, audio)``.

    ``frames`` is (N, H, W, 3) uint8 RGB; ``audio`` is 1-D int16 mono
    PCM concatenated from the interleaved '01wb' chunks (None with
    rate None when the file carries no audio stream). Strict: one
    'vids' stream — 24-bit BI_RGB DIB ('00db' chunks) or Motion-JPEG
    ('MJPG' handler/compression, '00dc' chunks each holding one
    complete baseline JPEG, decoded through ``functions.jpeg``;
    grayscale frames replicate to RGB, color frames pass through the
    JFIF fixed-point YCbCr→RGB transform) — plus at most one 16-bit
    mono PCM 'auds' stream; frame geometry is cross-validated between
    ``avih``, ``strf``, and each frame chunk; the audio sample count
    is validated against the stream header's dwLength. Unknown chunks
    (idx1, JUNK, INFO…) are skipped per the RIFF spec.
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI: bad RIFF/AVI header")
    (riff_size,) = struct.unpack("<I", data[4:8])
    if riff_size + 8 > len(data):
        raise ValueError("truncated AVI: RIFF size exceeds payload")
    w = h = None
    fps = None
    n_frames = None
    raw_frames: list[bytes] = []
    cur_type = None  # stream type of the strl being parsed
    codec = "dib"
    audio_rate = None
    audio_len = None
    audio_parts: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal w, h, fps, n_frames, cur_type, codec
        nonlocal audio_rate, audio_len
        while pos + 8 <= end:
            tag = data[pos : pos + 4]
            (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            body_start = pos + 8
            if body_start + length > end:
                raise ValueError(f"truncated AVI chunk {tag!r}")
            if tag == b"LIST":
                walk(body_start + 4, body_start + length)
            elif tag == b"avih":
                if length < 56:
                    raise ValueError("malformed avih: chunk too short")
                vals = struct.unpack("<14I", data[body_start : body_start + 56])
                if vals[0] == 0:
                    raise ValueError("malformed avih: zero frame period")
                fps = round(10**6 / vals[0])
                n_frames = vals[4]
                w, h = vals[8], vals[9]
            elif tag == b"strh":
                if length < 8:
                    raise ValueError("malformed strh: chunk too short")
                fcc_type = data[body_start : body_start + 4]
                handler = data[body_start + 4 : body_start + 8]
                cur_type = fcc_type
                if fcc_type == b"vids":
                    if handler == b"MJPG":
                        codec = "mjpg"
                    elif handler not in (b"DIB ", b"\x00\x00\x00\x00"):
                        raise ValueError(
                            f"unsupported AVI codec {handler!r} (BI_RGB DIB "
                            "or MJPG only — no codec libraries in this "
                            "environment)"
                        )
                elif fcc_type == b"auds":
                    if length < 48:
                        raise ValueError("malformed auds strh: too short")
                    vals = struct.unpack(
                        "<10I", data[body_start + 8 : body_start + 48]
                    )
                    audio_len = vals[6]  # dwLength, in samples
                else:
                    raise ValueError(
                        f"unsupported AVI stream type {fcc_type!r} "
                        "(video + PCM audio only)"
                    )
            elif tag == b"strf":
                if cur_type == b"auds":
                    if length < 16:
                        raise ValueError("malformed WAVEFORMATEX: too short")
                    fmt, ch, rate, _bps, _align, bits = struct.unpack(
                        "<HHIIHH", data[body_start : body_start + 16]
                    )
                    if fmt != 1 or ch != 1 or bits != 16:
                        raise ValueError(
                            f"unsupported AVI audio: fmt={fmt} ch={ch} "
                            f"bits={bits} (16-bit mono PCM only)"
                        )
                    audio_rate = rate
                else:
                    if length < 20:
                        raise ValueError("malformed strf: chunk too short")
                    size, bw, bh, planes, bits, comp = struct.unpack(
                        "<IiiHHI", data[body_start : body_start + 20]
                    )
                    want_comp = _MJPG_FOURCC if codec == "mjpg" else 0
                    if bits != 24 or comp != want_comp:
                        raise ValueError(
                            f"unsupported AVI: bits={bits} compression={comp} "
                            "(24-bit BI_RGB or MJPG only)"
                        )
                    if (bw, abs(bh)) != (w, h):
                        raise ValueError(
                            "AVI strf geometry disagrees with avih"
                        )
            elif tag in (b"00db", b"00dc"):
                # the chunk tag must match the declared codec (00db =
                # uncompressed DIB, 00dc = compressed/MJPG): a DIB-
                # declared file carrying 00dc chunks would otherwise be
                # decoded as raw DIB and only fail later on a size
                # mismatch — or not at all if sizes coincide
                want_tag = b"00dc" if codec == "mjpg" else b"00db"
                if tag != want_tag:
                    raise ValueError(
                        f"AVI frame chunk {tag!r} disagrees with the "
                        f"declared codec ({'MJPG' if codec == 'mjpg' else 'DIB'} "
                        f"expects {want_tag!r})"
                    )
                raw_frames.append(data[body_start : body_start + length])
            elif tag == b"01wb":
                audio_parts.append(data[body_start : body_start + length])
            pos = body_start + length + (length % 2)

    walk(12, 8 + riff_size)
    if w is None or fps is None:
        raise ValueError("AVI missing avih header")
    if n_frames != len(raw_frames):
        raise ValueError(
            f"AVI frame count mismatch: header says {n_frames}, "
            f"movi holds {len(raw_frames)}"
        )
    out = np.empty((len(raw_frames), h, w, 3), dtype=np.uint8)
    if codec == "mjpg":
        from kaj_query_engine_spark.functions.jpeg import (
            decode_jpeg,
            ycbcr_to_rgb,
        )

        for i, fb in enumerate(raw_frames):
            fh, fw, px, _coeffs = decode_jpeg(bytes(fb))
            if (fh, fw) != (h, w):
                raise ValueError(
                    f"MJPG frame {i} geometry {fw}x{fh} disagrees with "
                    f"the AVI header's {w}x{h}"
                )
            if px.ndim == 2:  # grayscale: replicate to RGB
                out[i] = np.repeat(px[:, :, None], 3, axis=2)
            else:  # YCbCr planes -> RGB (JFIF fixed-point)
                out[i] = ycbcr_to_rgb(px)
    else:
        row_bytes = _pad4(w * 3)
        for i, fb in enumerate(raw_frames):
            if len(fb) != row_bytes * h:
                raise ValueError(f"AVI frame {i} has bad size {len(fb)}")
            dib = np.frombuffer(fb, dtype=np.uint8).reshape(h, row_bytes)
            out[i] = dib[::-1, : w * 3].reshape(h, w, 3)[:, :, ::-1]
    audio = None
    if audio_rate is not None:
        buf = b"".join(audio_parts)
        if len(buf) % 2:
            raise ValueError("AVI audio byte count is odd (int16 PCM)")
        audio = np.frombuffer(buf, dtype="<i2")
        if audio_len is not None and len(audio) != audio_len:
            raise ValueError(
                f"AVI audio length mismatch: header says {audio_len} "
                f"samples, movi holds {len(audio)}"
            )
    elif audio_parts:
        raise ValueError("AVI '01wb' chunks without an 'auds' stream")
    return fps, out, audio_rate, audio


def decode_avi(data: bytes) -> tuple[int, np.ndarray]:
    """Decode AVI bytes to ``(fps, frames)`` — the video-only view of
    :func:`decode_avi_av` (an interleaved audio stream, if present,
    demuxes cleanly and is simply not returned here)."""
    fps, frames, _rate, _audio = decode_avi_av(data)
    return fps, frames
