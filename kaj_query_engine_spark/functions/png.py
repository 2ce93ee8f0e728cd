"""Pure-stdlib PNG codec (zlib + struct + numpy) — the real decode
behind :func:`operators.multimodal.decode_media`.

This container ships no image libraries, but PNG itself needs none:
the format is zlib-compressed filtered scanlines in a chunked
container (PNG spec, RFC 2083 / W3C PNG — public). Supported here:
8-bit greyscale (color type 0) and 8-bit RGB (color type 2), all five
scanline filters (None/Sub/Up/Average/Paeth), and Adam7 interlacing
(seven independently-filtered reduced passes).
That covers every fixture this repo constructs and the common output
of ``convert``-style tooling for these color types.

The ENCODER deliberately cycles the filter type per scanline
(``filter_mode="cycle"``): a decoder bug in any of the five unfilter
rules then breaks the round-trip and the q93 oracle match, so the
filter math is pinned by tests rather than trusted.

No counterpart in the reference engine (3 scalar types only —
``/root/reference/src/qp/utils/Attribute.java:11-13``); this is
training-pipeline extension surface.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized (int16 math: p can go negative)."""
    a16, b16, c16 = a.astype(np.int16), b.astype(np.int16), c.astype(np.int16)
    p = a16 + b16 - c16
    pa, pb, pc = np.abs(p - a16), np.abs(p - b16), np.abs(p - c16)
    out = np.where((pa <= pb) & (pa <= pc), a16, np.where(pb <= pc, b16, c16))
    return out.astype(np.uint8)


# Adam7 pass geometry: (x_start, y_start, x_step, y_step) per spec
_ADAM7 = [
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
]


def _filter_rows(flat: np.ndarray, bpp: int, filter_mode: str) -> bytes:
    """Filter one (sub)image's scanlines → the raw pre-zlib stream.

    Filtering reads only RAW neighbor values (left/up/upper-left of
    the ORIGINAL image, not the filtered output), so unlike decode it
    has no sequential dependency: build all three neighbor planes with
    two 2-D shifts each and compute every filter whole-image (fixture
    generation encodes tens of thousands of small images per batch;
    the per-scanline numpy version spent ~6 small allocations per row
    on framing overhead). In an interlaced stream each Adam7 pass is
    its own image for filtering purposes (spec §8.2) — neighbors are
    within-pass, which this helper gets for free by being handed the
    extracted pass."""
    h, stride = flat.shape
    left = np.zeros_like(flat)
    left[:, bpp:] = flat[:, :-bpp]
    prior = np.zeros_like(flat)
    prior[1:] = flat[:-1]
    ul = np.zeros_like(flat)
    ul[1:, bpp:] = flat[:-1, :-bpp]
    if filter_mode == "cycle":
        fts = np.arange(h) % 5
    else:
        fts = np.zeros(h, dtype=np.int64)
    stacked = np.stack(
        [
            flat,  # 0 None
            flat - left,  # 1 Sub
            flat - prior,  # 2 Up
            flat  # 3 Average: floor((left + up) / 2), full precision
            - (
                (left.astype(np.uint16) + prior.astype(np.uint16)) // 2
            ).astype(np.uint8),
            flat - _paeth(left, prior, ul),  # 4 Paeth
        ]
    )
    raw = np.empty((h, stride + 1), dtype=np.uint8)
    raw[:, 0] = fts
    raw[:, 1:] = stacked[fts, np.arange(h)]
    return raw.tobytes()


def encode_png(
    pixels: np.ndarray,
    filter_mode: str = "cycle",
    interlace: bool = False,
    palette: np.ndarray | None = None,
) -> bytes:
    """Encode an (H, W) uint8 greyscale, (H, W, 3) uint8 RGB,
    (H, W, 4) uint8 RGBA, or — with ``palette`` — (H, W) uint8
    palette-INDEX array (color type 3, the PLTE chunk carrying the
    (P, 3) uint8 palette).

    ``filter_mode="cycle"`` filters scanline i with type i % 5 —
    exercising every unfilter rule on decode; ``"none"`` writes
    filter 0 everywhere (the trivially-decodable form).

    ``interlace=True`` writes Adam7: seven reduced passes, each
    filtered as its own image (the progressive layout every browser-
    era PNG tool can emit); empty passes (images narrower/shorter
    than the pass grid) contribute no scanlines, per spec.

    A uint16 array encodes at depth 16 — (H, W) as 16-bit grayscale,
    (H, W, 3) as 16-bit RGB (big-endian sample bytes per spec;
    filters operate on BYTES with a 2- or 6-byte left offset — §7.2's
    bpp rule applied at depth 16).
    """
    plte = b""
    deep = (
        isinstance(pixels, np.ndarray)
        and pixels.dtype == np.uint16
        and palette is None
        and (pixels.ndim == 2 or (pixels.ndim == 3 and pixels.shape[2] == 3))
    )
    if deep:
        h, w = pixels.shape[:2]
        nch = 1 if pixels.ndim == 2 else 3
        color_type, bpp, depth = (0 if nch == 1 else 2), 2 * nch, 16
        # big-endian sample bytes are the wire format; filtering sees
        # the byte grid (h, 2*nch*w)
        px = np.frombuffer(
            np.ascontiguousarray(pixels).astype(">u2").tobytes(), np.uint8
        ).reshape(h, 2 * nch * w)
        px3 = px.reshape(h, w, 2 * nch)  # for interlace column slicing
    elif palette is not None:
        pal = np.ascontiguousarray(palette, dtype=np.uint8)
        px = np.ascontiguousarray(pixels, dtype=np.uint8)
        if pal.ndim != 2 or pal.shape[1] != 3 or not 1 <= len(pal) <= 256:
            raise ValueError("palette must be (P, 3) uint8, P in 1..256")
        if px.ndim != 2:
            raise ValueError("paletted pixels must be (H, W) uint8 indices")
        if px.max(initial=0) >= len(pal):
            raise ValueError("palette index out of range")
        h, w = px.shape
        color_type, bpp, depth = 3, 1, 8
        px3 = px
        plte = _chunk(b"PLTE", pal.tobytes())
    else:
        px = np.ascontiguousarray(pixels, dtype=np.uint8)
        depth = 8
        if px.ndim == 2:
            h, w = px.shape
            color_type, bpp = 0, 1
            px3 = px
        elif px.ndim == 3 and px.shape[2] in (3, 4):
            h, w = px.shape[:2]
            color_type = 2 if px.shape[2] == 3 else 6
            bpp = px.shape[2]
            px3 = px
            px = px.reshape(h, w * bpp)
        else:
            raise ValueError(
                "pixels must be (H, W) grey uint8/uint16, (H, W, 3) RGB, "
                "(H, W, 4) RGBA, or (H, W) indices with a palette"
            )
    if interlace:
        parts = []
        for x0, y0, xs, ys in _ADAM7:
            sub = px3[y0::ys, x0::xs]
            if sub.shape[0] and sub.shape[1]:
                parts.append(
                    _filter_rows(
                        np.ascontiguousarray(sub).reshape(sub.shape[0], -1),
                        bpp,
                        filter_mode,
                    )
                )
        raw = b"".join(parts)
    else:
        raw = _filter_rows(px.reshape(h, w * bpp), bpp, filter_mode)
    ihdr = struct.pack(
        ">IIBBBBB", w, h, depth, color_type, 0, 0, int(interlace)
    )
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + plte  # PLTE sits between IHDR and IDAT (spec §5.6), type 3 only
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Decode PNG bytes — uint8 (H, W) grey / (H, W, 3) RGB /
    (H, W, 4) RGBA for depth-8 streams, uint16 for depth-16 grey/RGB
    (big-endian sample bytes reassembled per spec). Paletted streams
    (color type 3) return the PLTE-mapped (H, W, 3) RGB image.

    Supports color types 0 (grey, 8/16-bit), 2 (RGB, 8/16-bit),
    3 (paletted, 8-bit), and 6 (RGBA, 8-bit), both non-interlaced and
    Adam7-interlaced streams; multiple IDAT chunks are concatenated
    per the spec. Raises ValueError on anything else — loudly, not
    with a wrong picture.
    """
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = None
    color_type = None
    plte = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        crc = data[pos + 8 + length : pos + 12 + length]
        if len(body) != length or len(crc) != 4:
            raise ValueError("truncated PNG chunk")
        if struct.unpack(">I", crc)[0] != (zlib.crc32(tag + body) & 0xFFFFFFFF):
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            ok = (color_type in (0, 2) and depth in (8, 16)) or (
                color_type in (3, 6) and depth == 8
            )
            if not ok:
                raise ValueError(
                    f"unsupported PNG: depth={depth} color_type={color_type} "
                    "(8/16-bit grey/RGB, 8-bit paletted/RGBA only)"
                )
            if comp != 0 or filt != 0 or interlace not in (0, 1):
                raise ValueError("unsupported PNG compression/filter/interlace")
        elif tag == b"PLTE":
            if length % 3 or not 3 <= length <= 768:
                raise ValueError("malformed PLTE chunk")
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("PNG missing IHDR")
    # bpp = filter byte offset = bytes per pixel (spec §7.2)
    bpp = {0: 1, 2: 3, 3: 1, 6: 4}[color_type] * (depth // 8)
    raw = zlib.decompress(bytes(idat))
    if interlace:
        # Adam7: seven independently-filtered reduced images,
        # concatenated in the IDAT stream; scatter each back onto the
        # full-resolution grid
        full = np.zeros((height, width * bpp), dtype=np.uint8)
        img = full.reshape(height, width, bpp)
        off = 0
        for x0, y0, xs, ys in _ADAM7:
            ph = len(range(y0, height, ys))
            pw = len(range(x0, width, xs))
            if not ph or not pw:
                continue
            sub, off = _unfilter(raw, off, ph, pw * bpp, bpp)
            img[y0::ys, x0::xs] = np.frombuffer(sub, np.uint8).reshape(
                ph, pw, bpp
            )
        if off != len(raw):
            raise ValueError("PNG IDAT length mismatch")
        arr = full
    else:
        stride = width * bpp
        if len(raw) != height * (stride + 1):
            raise ValueError("PNG IDAT length mismatch")
        out, _ = _unfilter(raw, 0, height, stride, bpp)
        # frombuffer over the bytearray keeps the array writable (bytes
        # would hand callers a read-only view) without an extra copy
        arr = np.frombuffer(out, dtype=np.uint8).reshape(height, stride)
    if depth == 16:
        # big-endian sample bytes -> native uint16 array
        deep = (
            np.frombuffer(arr.tobytes(), dtype=">u2").astype(np.uint16)
        )
        if color_type == 0:
            return deep.reshape(height, width)
        return deep.reshape(height, width, 3)
    if color_type == 0:
        return arr
    if color_type == 3:
        if plte is None:
            raise ValueError("paletted PNG missing PLTE")
        idx = np.asarray(arr).reshape(height, width)
        if idx.max(initial=0) >= len(plte):
            raise ValueError("palette index out of range")
        return plte[idx]  # (H, W, 3) RGB
    return arr.reshape(height, width, bpp)  # RGB (3) or RGBA (4)


def _unfilter(
    raw: bytes, off: int, height: int, stride: int, bpp: int
) -> tuple[bytearray, int]:
    """Undo scanline filtering for one (sub)image of ``height`` rows
    of ``stride`` bytes starting at ``raw[off]``; returns the pixel
    bytes and the offset past the consumed rows."""
    if off + height * (stride + 1) > len(raw):
        raise ValueError("PNG IDAT length mismatch")
    out = bytearray(height * stride)
    prior = bytes(stride)
    for i in range(height):
        base = off + i * (stride + 1)
        ft = raw[base]
        filt = raw[base + 1 : base + 1 + stride]
        if ft == 0:
            row = bytearray(filt)
        elif ft == 2:  # Up — no left dependency, whole-row numpy add
            row = bytearray(
                (
                    np.frombuffer(filt, np.uint8)
                    + np.frombuffer(prior, np.uint8)
                ).tobytes()
            )
        elif ft in (1, 3, 4):
            # left-dependent filters are sequential in j by definition;
            # loop over PYTHON ints in a bytearray — per-element numpy
            # indexing in this loop measured 7× slower (510→71 µs/img
            # on the q93 fixtures), since each scalar access boxes
            row = bytearray(filt)
            if ft == 1:  # Sub
                for j in range(bpp, stride):
                    row[j] = (row[j] + row[j - bpp]) & 0xFF
            elif ft == 3:  # Average
                for j in range(stride):
                    left = row[j - bpp] if j >= bpp else 0
                    row[j] = (row[j] + (left + prior[j]) // 2) & 0xFF
            else:  # Paeth
                for j in range(stride):
                    left = row[j - bpp] if j >= bpp else 0
                    up = prior[j]
                    ul = prior[j - bpp] if j >= bpp else 0
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if (pa <= pb and pa <= pc) else (
                        up if pb <= pc else ul
                    )
                    row[j] = (row[j] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[i * stride : (i + 1) * stride] = row
        prior = bytes(row)
    return out, off + height * (stride + 1)
