"""Pure-stdlib GIF codec (struct + numpy) — LZW-compressed palette
images, the last common still-image format after PNG/JPEG.

This container ships no image libraries, but GIF87a needs none: a
logical screen descriptor + global color table around an LZW-coded
index stream in length-prefixed sub-blocks (CompuServe GIF87a/89a
spec — public; GIF's LZW is the variable-width LSB-first variant with
in-band CLEAR/EOI codes). Supported here: single image,
interlaced or not (the four-pass row interleave of appendix E),
global or local color table, 8-bit indices. GIF89a extensions
(graphic control, comments, application) are SKIPPED per spec on
decode; multi-image animations raise loudly.

LZW is lossless, so unlike JPEG the full PNG-style verification works:
the q98 oracle reconstructs the decoded RGB buffer from the sha256
fixture model in pure SQL, and a digest match pins the LZW dictionary
dynamics (code growth 9→12 bits, CLEAR resets, the KwKwK case),
sub-block framing, and palette mapping byte-exactly. Encoder and
decoder are independent code paths.

No counterpart in the reference engine (3 scalar types only —
``/root/reference/src/qp/utils/Attribute.java:11-13``); this is
training-pipeline extension surface.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_CODE_BITS = 12


def _grayscale_palette() -> bytes:
    return bytes(v for i in range(256) for v in (i, i, i))


def _interlace_order(h: int) -> list[int]:
    """GIF's four-pass row interleave (spec appendix E): every 8th row
    from 0, every 8th from 4, every 4th from 2, every 2nd from 1."""
    return (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )


def encode_gif(
    indices: np.ndarray,
    palette: bytes | None = None,
    interlace: bool = False,
) -> bytes:
    """Encode an (H, W) uint8 index array as a single-image GIF87a.

    ``palette`` is 768 bytes of RGB triples (default: the grayscale
    ramp, palette[i] = (i, i, i)). The LZW encoder grows codes 9→12
    bits and emits CLEAR when the dictionary fills — the dynamics the
    decoder must reproduce exactly.

    ``interlace=True`` writes the four-pass row interleave (rows
    reordered in the pixel stream, descriptor bit 6 set — the LZW
    layer is untouched, which is exactly why a decoder that ignores
    the flag still 'works' and silently scrambles rows; the oracle
    digest catches that class).
    """
    px = np.ascontiguousarray(indices, dtype=np.uint8)
    if px.ndim != 2:
        raise ValueError("indices must be (H, W) uint8")
    h, w = px.shape
    pal = _grayscale_palette() if palette is None else palette
    if len(pal) != 768:
        raise ValueError("palette must be 768 bytes (256 RGB triples)")
    if interlace:
        data = np.ascontiguousarray(px[_interlace_order(h)]).tobytes()
    else:
        data = px.tobytes()

    # --- LZW compress (GIF variant, LSB-first) ---
    min_code_size = 8
    clear, eoi = 256, 257
    out_bits: list[tuple[int, int]] = []  # (code, width)

    def fresh() -> tuple[dict[tuple[int, ...], int], int, int]:
        return {(i,): i for i in range(256)}, eoi + 1, min_code_size + 1

    table, next_code, width = fresh()
    out_bits.append((clear, width))
    seq: tuple[int, ...] = ()
    for byte in data:
        cand = seq + (byte,)
        if cand in table:
            seq = cand
            continue
        out_bits.append((table[seq], width))
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < _MAX_CODE_BITS:
            width += 1
        elif next_code == (1 << _MAX_CODE_BITS) + 1:
            out_bits.append((clear, _MAX_CODE_BITS))
            table, next_code, width = fresh()
        seq = (byte,)
    if seq:
        out_bits.append((table[seq], width))
    out_bits.append((eoi, width))

    acc = nbits = 0
    packed = bytearray()
    for code, cw in out_bits:
        acc |= code << nbits  # LSB-first
        nbits += cw
        while nbits >= 8:
            packed.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        packed.append(acc & 0xFF)

    blocks = bytearray()
    for i in range(0, len(packed), 255):
        chunk = packed[i : i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)  # block terminator

    return (
        b"GIF87a"
        + struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # global table, 256 entries
        + pal
        + b"\x2c"
        # no local table; bit 6 = interlaced
        + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
        + bytes([min_code_size])
        + bytes(blocks)
        + b"\x3b"
    )


def decode_gif(data: bytes) -> np.ndarray:
    """Decode a single-image GIF to an (H, W, 3) uint8 RGB array.

    Implements the full GIF LZW decoder (variable width, CLEAR reset,
    the KwKwK first-use case) and four-pass deinterlacing; skips 89a
    extension blocks; raises on multiple images or framing damage.
    """
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF: bad signature")
    if len(data) < 13:
        raise ValueError("truncated GIF header")
    sw, sh, packed, _bg, _aspect = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    palette = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        palette = data[pos : pos + 3 * n]
        if len(palette) != 3 * n:
            raise ValueError("truncated GIF global color table")
        pos += 3 * n

    while pos < len(data) and data[pos] == 0x21:  # extensions: skip
        pos += 2  # introducer + label
        while pos < len(data) and data[pos] != 0:
            pos += 1 + data[pos]
        pos += 1  # sub-block terminator

    if pos >= len(data) or data[pos] != 0x2C:
        raise ValueError("GIF missing image descriptor")
    left, top, w, h, ipacked = struct.unpack("<HHHHB", data[pos + 1 : pos + 10])
    pos += 10
    interlaced = bool(ipacked & 0x40)
    if (left, top) != (0, 0) or (w, h) != (sw, sh):
        raise ValueError("GIF sub-rectangle images unsupported")
    if ipacked & 0x80:
        n = 2 << (ipacked & 0x07)
        palette = data[pos : pos + 3 * n]
        if len(palette) != 3 * n:
            raise ValueError("truncated GIF local color table")
        pos += 3 * n
    if palette is None:
        raise ValueError("GIF has neither global nor local color table")

    min_code_size = data[pos]
    pos += 1
    if not (2 <= min_code_size <= 8):
        raise ValueError(f"bad GIF LZW min code size {min_code_size}")
    stream = bytearray()
    while True:
        if pos >= len(data):
            raise ValueError("GIF image data missing block terminator")
        blen = data[pos]
        pos += 1
        if blen == 0:
            break
        stream += data[pos : pos + blen]
        if pos + blen > len(data):
            raise ValueError("truncated GIF data sub-block")
        pos += blen
    if pos >= len(data) or data[pos] == 0x2C:
        raise ValueError("multi-image GIF unsupported (animation)")
    if data[pos] != 0x3B:
        raise ValueError("GIF missing trailer")

    # --- LZW decompress (LSB-first, variable width) ---
    clear = 1 << min_code_size
    eoi = clear + 1
    acc = nbits = bitpos = 0
    out = bytearray()
    table: list[bytes] = []
    width = min_code_size + 1
    prev: bytes | None = None

    def reset_table() -> None:
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        prev = None

    reset_table()
    i = 0
    n_total = len(stream)
    done = False
    while not done:
        while nbits < width:
            if i >= n_total:
                raise ValueError("GIF LZW stream ended before EOI")
            acc |= stream[i] << nbits
            i += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            reset_table()
            continue
        if code == eoi:
            done = True
            continue
        if prev is None:
            if code >= len(table):
                raise ValueError("invalid first GIF LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt GIF LZW code past table end")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < _MAX_CODE_BITS:
            width += 1
    if len(out) != w * h:
        raise ValueError(
            f"GIF pixel count mismatch: expected {w * h}, decoded {len(out)}"
        )
    idx = np.frombuffer(bytes(out), np.uint8).reshape(h, w)
    if interlaced:
        # undo the four-pass row interleave: stream row k is image
        # row _interlace_order(h)[k]
        deinter = np.empty_like(idx)
        deinter[_interlace_order(h)] = idx
        idx = deinter
    pal = np.frombuffer(palette, np.uint8).reshape(-1, 3)
    if idx.max(initial=0) >= pal.shape[0]:
        raise ValueError("GIF index exceeds palette size")
    return pal[idx.reshape(-1)].reshape(h, w, 3)
