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


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Encode int16 PCM samples to WAV bytes.

    ``samples`` is (N,) for mono or (N, C) interleaved-on-write for
    C-channel audio (C ≤ 2). Little-endian 16-bit PCM, one ``fmt `` +
    one ``data`` chunk — the canonical minimal WAV.
    """
    s = np.asarray(samples)
    if s.dtype != np.int16:
        raise ValueError("samples must be int16 PCM")
    if s.ndim == 1:
        channels = 1
    elif s.ndim == 2 and s.shape[1] in (1, 2):
        channels = s.shape[1]
    else:
        raise ValueError("samples must be (N,) mono or (N, C<=2)")
    if not (0 < rate <= 2**31 - 1):
        raise ValueError(f"bad sample rate {rate}")
    data = np.ascontiguousarray(s, dtype="<i2").tobytes()
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * block_align, block_align, 16
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

    ``samples`` is an int16 array, (N,) for mono or (N, C) for C
    channels. Only PCM 16-bit is accepted; unknown chunks (LIST,
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
            if audio_fmt != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV: format_tag={audio_fmt} bits={bits} "
                    "(only 16-bit PCM)"
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
    if len(pcm) % (2 * channels):
        raise ValueError("WAV data chunk not a whole number of frames")
    samples = np.frombuffer(pcm, dtype="<i2").astype(np.int16, copy=True)
    if channels > 1:
        samples = samples.reshape(-1, channels)
    return rate, channels, samples
