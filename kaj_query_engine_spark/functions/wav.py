"""Pure-stdlib WAV/PCM codec (struct + numpy) — real audio decode for
:func:`operators.multimodal.decode_audio`.

This container ships no audio libraries, but RIFF/WAVE PCM needs none:
the format is a chunked RIFF container holding a ``fmt `` descriptor
and a raw little-endian PCM ``data`` chunk (Microsoft/IBM WAVE spec —
public; also mirrored by the stdlib ``wave`` module, which this codec
deliberately does not use so the byte-level framing stays pinned by
our own tests). Supported here: PCM (format tag 1), 16-bit samples,
any sample rate, 1–2 channels interleaved. Anything else raises
loudly — a wrong waveform is worse than no waveform.

Same design rules as the PNG twin (``functions/png.py``): strict CRC-
style validation (chunk sizes must reconcile), encoder and decoder are
independent code paths so a round-trip pins both, and the q94 oracle
reconstructs the decoded sample buffer in pure SQL from the sha256
fixture model, so a digest match proves the RIFF framing byte-exact.

No counterpart in the reference engine (3 scalar types only —
``/root/reference/src/qp/utils/Attribute.java:11-13``); this is
training-pipeline extension surface.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, rate: int, bits: int = 16) -> bytes:
    """Encode PCM samples to WAV bytes.

    ``samples`` is (N,) for mono or (N, C) interleaved-on-write for
    C-channel audio (C ≤ 2); one ``fmt `` + one ``data`` chunk — the
    canonical minimal WAV. ``bits`` selects the wire format:

    - 16 (default): int16 samples, little-endian;
    - 8: **uint8** samples — WAV 8-bit PCM is offset-binary (unsigned,
      128 = silence), per spec;
    - 24: int32 samples within ±2²³, packed as 3-byte little-endian —
      the studio-capture depth every real ingest eventually meets.
    """
    s = np.asarray(samples)
    want = {8: np.uint8, 16: np.int16, 24: np.int32}.get(bits)
    if want is None:
        raise ValueError(f"bits must be 8, 16, or 24, not {bits}")
    if s.dtype != want:
        raise ValueError(
            f"{bits}-bit PCM takes {np.dtype(want).name} samples"
        )
    if s.ndim == 1:
        channels = 1
    elif s.ndim == 2 and s.shape[1] in (1, 2):
        channels = s.shape[1]
    else:
        raise ValueError("samples must be (N,) mono or (N, C<=2)")
    if not (0 < rate <= 2**31 - 1):
        raise ValueError(f"bad sample rate {rate}")
    if bits == 8:
        data = np.ascontiguousarray(s).tobytes()
    elif bits == 16:
        data = np.ascontiguousarray(s, dtype="<i2").tobytes()
    else:
        s64 = s.astype(np.int64)
        if (s64 < -(1 << 23)).any() or (s64 > (1 << 23) - 1).any():
            raise ValueError("24-bit samples must fit in [-2^23, 2^23)")
        # 3-byte little-endian: drop the high byte of the LE int32
        quads = np.ascontiguousarray(s, dtype="<i4").view(np.uint8)
        data = np.ascontiguousarray(
            quads.reshape(-1, 4)[:, :3]
        ).tobytes()
    block_align = channels * (bits // 8)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * block_align, block_align, bits
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
        + (b"\x00" if len(data) % 2 else b"")  # RIFF word alignment pad
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """Decode WAV bytes to ``(rate, channels, samples)``.

    ``samples`` is (N,) for mono or (N, C) for C channels; the dtype
    follows the wire format — uint8 for 8-bit PCM (offset-binary per
    spec, returned as stored), int16 for 16-bit, int32 for 24-bit
    (3-byte little-endian sign-extended). Unknown chunks (LIST,
    fact, …) are skipped per the RIFF spec, truncation and size
    mismatches raise ValueError.
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    (riff_size,) = struct.unpack("<I", data[4:8])
    if riff_size + 8 > len(data):
        raise ValueError("truncated WAV: RIFF size exceeds payload")
    pos = 12
    end = 8 + riff_size
    rate = channels = bits = None
    pcm = None
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError(f"truncated WAV chunk {tag!r}")
        if tag == b"fmt ":
            if length < 16:
                raise ValueError("malformed fmt chunk")
            audio_fmt, channels, rate, _brate, _align, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_fmt != 1 or bits not in (8, 16, 24):
                raise ValueError(
                    f"unsupported WAV: format_tag={audio_fmt} bits={bits} "
                    "(8/16/24-bit PCM only)"
                )
            if channels not in (1, 2):
                raise ValueError(f"unsupported WAV: {channels} channels")
        elif tag == b"data":
            pcm = body
        pos += 8 + length + (length % 2)  # skip the odd-size pad byte
    if rate is None:
        raise ValueError("WAV missing fmt chunk")
    if pcm is None:
        raise ValueError("WAV missing data chunk")
    if len(pcm) % ((bits // 8) * channels):
        raise ValueError("WAV data chunk not a whole number of frames")
    if bits == 8:
        samples = np.frombuffer(pcm, dtype=np.uint8).copy()
    elif bits == 16:
        samples = np.frombuffer(pcm, dtype="<i2").astype(np.int16, copy=True)
    else:
        # 3-byte LE -> int32 with sign extension: widen to 4 bytes with
        # a zero high byte, view as <i4, then arithmetic-shift the
        # value into the top and back down
        tri = np.frombuffer(pcm, dtype=np.uint8).reshape(-1, 3)
        quad = np.zeros((len(tri), 4), dtype=np.uint8)
        quad[:, :3] = tri
        samples = (
            quad.view("<i4").reshape(-1).astype(np.int32) << 8
        ) >> 8
    if channels > 1:
        samples = samples.reshape(-1, channels)
    return rate, channels, samples
