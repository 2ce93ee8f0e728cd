"""Pure stdlib+numpy baseline JPEG codec (ITU-T T.81) — grayscale
and YCbCr 4:4:4 color, sequential DCT, Huffman entropy coding.

This container ships no image libraries, but baseline JPEG needs none:
the format is marker-framed segments (DQT quantization table, SOF0
frame header, DHT Huffman tables, SOS scan) around a bit-packed
entropy-coded block stream (JPEG spec ITU-T T.81 / ISO 10918 —
public). Supported here: 8-bit grayscale and
3-component 4:4:4 color (interleaved MCUs, luma/chroma quantization
tables 0/1, Huffman class pairs routed per the SOS specs), custom
canonical Huffman tables CARRIED IN THE FILE's DHT segments
(the decoder builds its tables from DHT like any real decoder — no
reliance on the Annex K defaults), restart markers (DRI + RSTm
cadence validation, byte-aligned fill, per-segment reset of ALL
component DC predictors), no subsampling, no progressive.

Verification strategy differs from the PNG/WAV/AVI twins because JPEG
is LOSSY at the DCT layer but LOSSLESS at the entropy layer:

- the ENTROPY layer (Huffman decode → run-length → DPCM → zigzag →
  the quantized coefficients) reproduces the encoder's coefficient
  input bit-exactly, so the q97 oracle digests the quantized
  coefficient buffer reconstructed in pure SQL from the sha256
  fixture model;
- the DCT layer (dequantize → IDCT → level shift → clamp) is pinned
  in pytest against a literal four-loop cosine-sum reference — the
  spec's defining equation — rather than trusted.

No counterpart in the reference engine (3 scalar types only —
``/root/reference/src/qp/utils/Attribute.java:11-13``); this is
training-pipeline extension surface.
"""

from __future__ import annotations

import struct
from functools import lru_cache

import numpy as np

# zigzag scan order: ZIGZAG[k] = (row, col) of zigzag position k
_ZZ_INDEX: list[tuple[int, int]] = []
_r = _c = 0
for _k in range(64):
    _ZZ_INDEX.append((_r, _c))
    if (_r + _c) % 2 == 0:  # moving up-right
        if _c == 7:
            _r += 1
        elif _r == 0:
            _c += 1
        else:
            _r -= 1
            _c += 1
    else:  # moving down-left
        if _r == 7:
            _c += 1
        elif _c == 0:
            _r += 1
        else:
            _r += 1
            _c -= 1
del _r, _c, _k

# de-zigzag permutation: natural_flat[j] = zigzag[_ZZ_INV[j]]
_ZZ_INV = np.empty(64, dtype=np.int64)
_ZZ_INV[[rr * 8 + cc for rr, cc in _ZZ_INDEX]] = np.arange(64)

# canonical Huffman table shapes written into DHT: every DC category
# (0..11) gets a 4-bit code, every AC run/size symbol an 8-bit code.
# Canonical assignment leaves the all-ones code unused in both (12 of
# 16, 162 of 256), as T.81 requires.
_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = [0x00] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
] + [0xF0]
_AC_SYMBOLS = sorted(set(_AC_SYMBOLS))  # 0x00, 0x01..0x0A, ..., 0xF0..0xFA
_DC_BITS = [0] * 16
_DC_BITS[3] = len(_DC_SYMBOLS)  # all length 4 (index 3 = length 4)
_AC_BITS = [0] * 16
_AC_BITS[7] = len(_AC_SYMBOLS)  # all length 8


def _canonical_codes(bits: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81 canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    it = iter(symbols)
    for i, n in enumerate(bits):
        length = i + 1
        for _ in range(n):
            out[next(it)] = (code, length)
            code += 1
        code <<= 1
    return out


@lru_cache(maxsize=64)
def _huff_lut(bits: bytes, symbols: bytes, dc: bool = False) -> list[int]:
    """16-bit-lookahead decode LUT (the standard table-driven Huffman
    decode): entry ``lut[look]`` for any 16-bit window whose prefix is
    a valid code packs ``(code_length << 8) | symbol``; 0 where no
    code is a prefix. Cached across calls — a corpus of files sharing
    DHT tables (every fixture batch, and in practice every camera
    firmware) builds each table once per process.

    DC tables validate symbol magnitude here (a category is at most 11
    per T.81 table F.1): a hostile DHT carrying a larger DC symbol
    would otherwise surface later as an opaque negative-shift-count
    error inside the 48-bit decode window."""
    if dc:
        bad = [s for s in symbols if s > 11]
        if bad:
            raise ValueError(
                f"invalid JPEG Huffman DC category {bad[0]} (max 11)"
            )
    lut = np.zeros(1 << 16, np.int32)
    code = 0
    i = 0
    for li, n in enumerate(bits):
        length = li + 1
        for _ in range(n):
            lo = code << (16 - length)
            lut[lo : lo + (1 << (16 - length))] = (length << 8) | symbols[i]
            i += 1
            code += 1
        code <<= 1
    return lut.tolist()


def default_qtable() -> np.ndarray:
    """Deterministic non-uniform quantization table (zigzag order):
    1 + (k % 7) — small enough that fixture coefficients stay in
    range, non-constant so per-coefficient dequant is exercised."""
    return (1 + (np.arange(64) % 7)).astype(np.int64)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def put_big(self, value: int, length: int) -> None:
        """Append ``length`` bits already concatenated into one
        big-int ``value`` (MSB-first), draining whole bytes in ONE
        ``to_bytes`` + stuffing pass instead of per-``put`` byte
        loops. ``bytes.replace(b"\\xff", b"\\xff\\x00")`` IS T.81 byte
        stuffing — every emitted 0xFF is followed by a stuffed 0x00,
        exactly what the per-byte loop does, and the partial tail
        byte stays in ``acc`` so marker padding still flows through
        :meth:`put`. Byte-identical to an equivalent sequence of
        ``put`` calls by construction (pinned by the codec digest
        tests)."""
        if length == 0:
            return
        acc = (self.acc << length) | (value & ((1 << length) - 1))
        nb = self.nbits + length
        rem = nb & 7
        nby = nb >> 3
        if nby:
            chunk = (acc >> rem).to_bytes(nby, "big")
            self.out += chunk.replace(b"\xff", b"\xff\x00")
            acc &= (1 << rem) - 1
        self.acc = acc
        self.nbits = rem

    def pad_to_byte(self) -> None:
        """Pad with 1-bits to the next byte boundary (T.81 F.1.2.3 —
        the fill preceding every marker). A pad that completes an
        0xFF byte goes through :meth:`put`, so it is stuffed like any
        other entropy byte."""
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)

    def put_marker(self, marker: int) -> None:
        """Byte-align, then emit a bare two-byte marker (RSTm) —
        markers sit OUTSIDE the entropy stream, so no stuffing."""
        self.pad_to_byte()
        self.out += struct.pack(">H", marker)

    def flush(self) -> bytes:
        self.pad_to_byte()
        return bytes(self.out)


_ERR_EXHAUSTED = "JPEG entropy data exhausted mid-block"
_ERR_MARKER = "unexpected marker inside JPEG scan"
_PAD6 = b"\x00" * 6  # peek window slack past the last real byte


def _unstuff(seg: bytes) -> tuple[bytes, int, str]:
    """Strip byte stuffing from one entropy segment in one vectorized
    pass: every 0xFF inside a scan must be followed by a stuffed 0x00.
    Returns ``(payload, n_real_bits, end_error)`` where ``end_error``
    is the ValueError message to raise if decoding needs bits past
    ``n_real_bits`` — "exhausted" for a clean segment end, "unexpected
    marker" when the segment is cut short by a bare 0xFF (a foreign
    marker), matching what a bit-at-a-time reader would hit there."""
    if b"\xff" not in seg:
        return seg, len(seg) * 8, _ERR_EXHAUSTED
    arr = np.frombuffer(seg, np.uint8)
    ff = np.flatnonzero(arr == 0xFF)
    nxt = ff + 1
    ok = (nxt < len(arr)) & (arr[np.minimum(nxt, len(arr) - 1)] == 0)
    if ok.all():
        keep = np.ones(len(arr), bool)
        keep[nxt] = False
        out = arr[keep].tobytes()
        return out, len(out) * 8, _ERR_EXHAUSTED
    cut = int(ff[~ok][0])  # first bare 0xFF: payload ends here
    good = ff[ff < cut]
    keep = np.ones(cut, bool)
    keep[good + 1] = False
    out = arr[:cut][keep].tobytes()
    return out, len(out) * 8, _ERR_MARKER


def _split_on_rst(buf: bytes) -> tuple[list[bytes], list[int]]:
    """Split an entropy-coded scan on RSTm markers.

    Inside a scan, 0xFF is either stuffing (followed by 0x00) or a
    marker, so the split is unambiguous without decoding: RST bytes
    can never be produced by entropy data. Returns the entropy
    segments (stuffing left intact for the bit reader) and the marker
    indices m (0..7) in order of appearance."""
    # vectorized: an entropy-data 0xFF is ALWAYS followed by a stuffed
    # 0x00, so any "FF Dm" pair is unambiguously a marker — no
    # left-to-right state needed to classify
    arr = np.frombuffer(buf, np.uint8)
    if len(arr) < 2:
        return [buf], []
    ff = np.flatnonzero(arr[:-1] == 0xFF)
    if ff.size == 0:
        return [buf], []
    nxt = arr[ff + 1]
    rst = ff[(nxt >= 0xD0) & (nxt <= 0xD7)]
    segments: list[bytes] = []
    marks: list[int] = []
    start = 0
    for p in rst.tolist():
        segments.append(buf[start:p])
        marks.append(buf[p + 1] - 0xD0)
        start = p + 2
    segments.append(buf[start:])
    return segments, marks


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _dht_payload(tc_th: int, bits: list[int], symbols: list[int]) -> bytes:
    return bytes([tc_th] + bits) + bytes(symbols)


# the encoder always writes the canonical table shapes above — build
# its symbol->(code, length) maps once at import
_ENC_DC_CODES = _canonical_codes(_DC_BITS, _DC_SYMBOLS)
_ENC_AC_CODES = _canonical_codes(_AC_BITS, _AC_SYMBOLS)


def default_chroma_qtable() -> np.ndarray:
    """Deterministic chroma quantization table, distinct from the luma
    one so per-component dequant is observable (zigzag order)."""
    return (2 + (np.arange(64) % 5) * 2).astype(np.int64)


def _encode_block(
    w: "_BitWriter",
    blk: np.ndarray,
    prev_dc: int,
    dc_codes: dict,
    ac_codes: dict,
) -> int:
    """Huffman-encode one 64-coefficient block (DPCM DC + RLE AC);
    returns the new DC predictor. Walks only the nonzero AC positions
    (run lengths are index gaps) — the zero coefficients every sparse
    block is mostly made of cost nothing. The block's symbols are
    concatenated into ONE big-int and flushed with a single
    :meth:`_BitWriter.put_big` (one drain + one stuffing pass per
    block instead of two ``put`` byte-loops per nonzero coefficient —
    the encode profile's top entry)."""
    vals = blk.tolist()
    diff = vals[0] - prev_dc
    s = _category(diff)
    code, ln = dc_codes[s]
    acc = code
    nb = ln
    if s:
        acc = (acc << s) | (
            (diff if diff > 0 else diff + (1 << s) - 1) & ((1 << s) - 1)
        )
        nb += s
    last = 0
    for k in (np.flatnonzero(blk[1:]) + 1).tolist():
        run = k - last - 1
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            acc = (acc << ln) | code
            nb += ln
            run -= 16
        v = vals[k]
        s = _category(v)
        code, ln = ac_codes[(run << 4) | s]
        acc = (acc << (ln + s)) | (code << s) | (
            (v if v > 0 else v + (1 << s) - 1) & ((1 << s) - 1)
        )
        nb += ln + s
        last = k
    if last != 63:
        code, ln = ac_codes[0x00]  # EOB
        acc = (acc << ln) | code
        nb += ln
    w.put_big(acc, nb)
    return vals[0]


def encode_jpeg(
    coeffs: np.ndarray,
    height: int,
    width: int,
    qtable: np.ndarray | None = None,
    restart_interval: int = 0,
    chroma_qtable: np.ndarray | None = None,
    subsampling: str = "444",
) -> bytes:
    """Encode QUANTIZED coefficients to a baseline JPEG.

    ``coeffs`` is int in ZIGZAG order — the values the entropy layer
    stores losslessly (a pixel-domain encoder would produce them via
    DCT+quantize; the fixture model specifies them directly so the
    oracle can reconstruct them in SQL): shape (n_blocks, 64) for
    GRAYSCALE; (n_mcus, 3, 64) for 4:4:4 COLOR (one block per
    component per MCU, interleaved Y, Cb, Cr in scan order); or
    (n_mcus, 6, 64) for 4:2:0 COLOR (``subsampling="420"``: each MCU
    covers a 16×16 tile — four Y blocks in 2×2 raster order, then
    Cb, Cr at quarter resolution, T.81 A.2.3 interleave). Blocks/MCUs
    run in raster order over the ceil(h/8)×ceil(w/8) grid (4:4:4 /
    grayscale) or the ceil(h/16)×ceil(w/16) grid (4:2:0 — edge MCUs
    cover padding blocks, per spec).

    Color streams carry the spec's two-table layout: quant table 0
    (luma) + 1 (chroma, ``chroma_qtable``), and Huffman class pairs
    (DC0/AC0 for Y, DC1/AC1 for Cb/Cr) — four DHT segments the
    decoder must route per the SOS component specs.

    ``restart_interval`` > 0 writes a DRI segment and emits an RSTm
    marker (m cycling 0..7) after every ``restart_interval`` MCUs:
    the entropy stream byte-aligns before the marker and ALL
    component DC predictors reset after it (T.81 F.1.2.3 / B.2.4.4)
    — the feature that makes a 100 TB scan parallelizable WITHIN one
    image's scan, and the one every camera emits for error
    resilience.
    """
    q = default_qtable() if qtable is None else np.asarray(qtable, np.int64)
    if q.shape != (64,) or (q < 1).any() or (q > 255).any():
        raise ValueError("qtable must be 64 values in 1..255 (zigzag order)")
    blocks = np.asarray(coeffs, dtype=np.int64)
    color = blocks.ndim == 3
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    sub420 = color and subsampling == "420"
    if sub420:
        n_mcu = ((width + 15) // 16) * ((height + 15) // 16)
        want = (n_mcu, 6, 64)
    else:
        bx = (width + 7) // 8
        by = (height + 7) // 8
        n_mcu = bx * by
        want = (n_mcu, 3, 64) if color else (n_mcu, 64)
    if blocks.shape != want:
        raise ValueError(
            f"need {want} zigzag coefficients for {width}x{height}, "
            f"got {blocks.shape}"
        )
    if (np.abs(blocks) > 1023).any():
        raise ValueError("quantized coefficients must fit category <= 10")
    if restart_interval < 0 or restart_interval > 0xFFFF:
        raise ValueError("restart_interval must be in 0..65535")
    cq = (
        default_chroma_qtable()
        if chroma_qtable is None
        else np.asarray(chroma_qtable, np.int64)
    )
    if color and (cq.shape != (64,) or (cq < 1).any() or (cq > 255).any()):
        raise ValueError("chroma_qtable must be 64 values in 1..255")
    dc_codes = _ENC_DC_CODES
    ac_codes = _ENC_AC_CODES
    ncomp = 3 if color else 1
    # per-slot component index within one MCU (4:2:0: 4 Y, Cb, Cr)
    slot_comp = [0, 0, 0, 0, 1, 2] if sub420 else list(range(ncomp))
    w = _BitWriter()
    prev_dc = [0] * ncomp
    for mi in range(n_mcu):
        if restart_interval and mi and mi % restart_interval == 0:
            w.put_marker(0xFFD0 + (mi // restart_interval - 1) % 8)
            prev_dc = [0] * ncomp
        for si, ci in enumerate(slot_comp):
            blk = blocks[mi, si] if color else blocks[mi]
            prev_dc[ci] = _encode_block(
                w, blk, prev_dc[ci], dc_codes, ac_codes
            )
    scan = w.flush()
    out = bytearray(b"\xff\xd8")  # SOI
    # JFIF APP0 (1.02, no density, no thumbnail): what makes the file
    # a .jfif real tools accept; the decoder skips APPn/COM generically
    out += _seg(
        0xFFE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    )
    out += _seg(0xFFDB, bytes([0x00]) + bytes(int(v) for v in q))  # DQT 0
    if color:
        out += _seg(0xFFDB, bytes([0x01]) + bytes(int(v) for v in cq))
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))  # DRI
    if color:
        # SOF0: 8-bit YCbCr — ids 1/2/3, q 0/1/1; Y samples 2x2 in
        # the 4:2:0 layout, 1x1 otherwise
        y_samp = 0x22 if sub420 else 0x11
        out += _seg(
            0xFFC0,
            struct.pack(">BHHB", 8, height, width, 3)
            + bytes([1, y_samp, 0, 2, 0x11, 1, 3, 0x11, 1]),
        )
    else:
        out += _seg(  # SOF0: 8-bit, 1 component, 1x1 sampling, qtable 0
            0xFFC0,
            struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0]),
        )
    out += _seg(0xFFC4, _dht_payload(0x00, _DC_BITS, _DC_SYMBOLS))
    out += _seg(0xFFC4, _dht_payload(0x10, _AC_BITS, _AC_SYMBOLS))
    if color:
        # chroma table pair: same canonical shapes under ids (0,1)/(1,1)
        out += _seg(0xFFC4, _dht_payload(0x01, _DC_BITS, _DC_SYMBOLS))
        out += _seg(0xFFC4, _dht_payload(0x11, _AC_BITS, _AC_SYMBOLS))
        out += _seg(  # SOS: Y -> tables 0/0, Cb/Cr -> tables 1/1
            0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
        )
    else:
        out += _seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))  # SOS: Td=0 Ta=0
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _idct_matrix() -> np.ndarray:
    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    m = np.cos((2 * x + 1) * u * np.pi / 16)
    m[0] *= np.sqrt(0.5)
    return m * 0.5  # a(u) folded in: 0.5 for u>0, 0.5*sqrt(.5) for u=0


_IDCT_M = _idct_matrix()


def idct_block(freq: np.ndarray) -> np.ndarray:
    """2-D 8×8 inverse DCT (separable matrix form of the T.81 defining
    cosine sum — pinned against the literal four-loop sum in tests)."""
    return _IDCT_M.T @ np.asarray(freq, np.float64) @ _IDCT_M


def decode_jpeg(data: bytes) -> tuple[int, int, np.ndarray, np.ndarray]:
    """Decode baseline JPEG (grayscale, YCbCr 4:4:4, or YCbCr 4:2:0
    color) to ``(height, width, pixels, coeffs)``.

    ``pixels`` is the (H, W) uint8 image for grayscale, or the
    (H, W, 3) uint8 Y/Cb/Cr PLANES for color (dequantize → IDCT →
    +128 → clamp, round-half-away like libjpeg's descale; for 4:2:0
    the chroma planes are replicated ×2 to full resolution; no color
    transform — the planes ARE the coded signal, and RGB conversion
    is a lossy float map downstream of the codec). ``coeffs`` is the
    int32 QUANTIZED coefficient array in zigzag order — (n_blocks,
    64) for grayscale, (n_mcus, n_slots, 64) scan-interleaved for
    color, where n_slots is 3 for 4:4:4 (Y, Cb, Cr per MCU) and 6 for
    4:2:0 (Y0..Y3, Cb, Cr per 16×16 MCU) — the lossless entropy-layer
    payload, byte-exactly what the encoder was given (q97's oracle
    target). Huffman tables come from the file's DHT segments and are
    routed per the SOS component specs (luma 0/0, chroma 1/1 in our
    encoder's layout — but any legal routing decodes); other
    subsampling layouts and progressive scans raise.
    """
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    height = width = None
    comp_tq: list[int] = []
    scan_tabs: list[tuple[int, int]] = []
    scan_start = None
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = struct.unpack(">H", data[pos : pos + 2])[0]
        if marker == 0xFFD9:
            break
        (seg_len,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + seg_len]
        if len(body) != seg_len - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xFFDB:
            while body:
                pq_tq = body[0]
                if pq_tq >> 4 != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                qtables[pq_tq & 0xF] = np.frombuffer(
                    body[1:65], np.uint8
                ).astype(np.int64)
                body = body[65:]
        elif marker == 0xFFC0:
            prec, height, width, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8 or ncomp not in (1, 3):
                raise ValueError(
                    f"unsupported JPEG: precision={prec} components={ncomp} "
                    "(8-bit grayscale or 3-component baseline only)"
                )
            comp_tq = []
            comp_samp = []
            for ci in range(ncomp):
                _cid, sampling, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comp_samp.append((sampling >> 4, sampling & 0xF))
                comp_tq.append(tq)
            if comp_samp not in (
                [(1, 1)],
                [(1, 1)] * 3,
                [(2, 2), (1, 1), (1, 1)],
            ):
                raise ValueError(
                    f"unsupported JPEG sampling {comp_samp} "
                    "(grayscale, 4:4:4, or 4:2:0 only)"
                )
        elif marker in (0xFFC1, 0xFFC2, 0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7):
            raise ValueError("only baseline sequential JPEG (SOF0) supported")
        elif marker == 0xFFC4:
            while body:
                tc_th = body[0]
                n = sum(body[1:17])
                # store the raw DHT payload; the decode LUT is built
                # (or fetched from the cross-call cache) at scan time
                huff[(tc_th >> 4, tc_th & 0xF)] = (
                    bytes(body[1:17]),
                    bytes(body[17 : 17 + n]),
                )
                body = body[17 + n :]
        elif marker == 0xFFDD:
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xFFDA:
            scan_ncomp = body[0]
            if scan_ncomp != len(comp_tq):
                raise ValueError(
                    "SOS component count contradicts SOF (single "
                    "interleaved scan only)"
                )
            scan_tabs = [
                (body[2 + 2 * ci] >> 4, body[2 + 2 * ci] & 0xF)
                for ci in range(scan_ncomp)
            ]
            scan_start = pos + 2 + seg_len
            break
        pos += 2 + seg_len
    if height is None or scan_start is None:
        raise ValueError("JPEG missing SOF0 or SOS")
    for td, ta in scan_tabs:
        if (0, td) not in huff or (1, ta) not in huff:
            raise ValueError("SOS references undeclared Huffman tables")
    comp_q = []
    for tq in comp_tq:
        if tq not in qtables:
            raise ValueError(f"JPEG missing quantization table {tq}")
        comp_q.append(qtables[tq])
    ncomp = len(comp_tq)
    end = data.rfind(b"\xff\xd9")
    if end < 0:
        raise ValueError("JPEG missing EOI")
    hmax = max(h_ for h_, _ in comp_samp)
    vmax = max(v_ for _, v_ in comp_samp)
    mx = (width + 8 * hmax - 1) // (8 * hmax)
    my = (height + 8 * vmax - 1) // (8 * vmax)
    n_mcu = mx * my
    # MCU slot layout in T.81 A.2.3 interleave order: component ci
    # contributes hi*vi blocks per MCU, raster-ordered within the MCU
    slot_comp: list[int] = []
    slot_pos: list[tuple[int, int]] = []  # (block row, col) within MCU
    for ci, (h_, v_) in enumerate(comp_samp):
        for vy in range(v_):
            for vx in range(h_):
                slot_comp.append(ci)
                slot_pos.append((vy, vx))
    segments, marks = _split_on_rst(data[scan_start:end])
    if marks and not restart_interval:
        raise ValueError("RST marker in scan but no DRI declared")
    if restart_interval:
        expect = -(-n_mcu // restart_interval)  # ceil: segment count
        if len(segments) != expect:
            raise ValueError(
                f"JPEG restart cadence broken: {len(segments)} entropy "
                f"segments for {n_mcu} MCUs at interval {restart_interval}"
            )
        for i, m in enumerate(marks):
            if m != i % 8:
                raise ValueError(
                    f"RST marker out of sequence: RST{m} where RST{i % 8} "
                    "expected"
                )
    elif len(segments) != 1:
        raise ValueError("RST marker in scan but no DRI declared")
    # per-slot decode LUTs (16-bit lookahead, cached across calls)
    slot_dc = [
        _huff_lut(*huff[(0, scan_tabs[ci][0])], dc=True) for ci in slot_comp
    ]
    slot_ac = [_huff_lut(*huff[(1, scan_tabs[ci][1])]) for ci in slot_comp]
    seg_iter = iter(segments)
    buf, nbits, end_err = _unstuff(next(seg_iter))
    pad = buf + _PAD6
    pos = 0
    nslots = len(slot_comp)
    coeffs = np.zeros((n_mcu, nslots, 64), dtype=np.int32)
    prev_dc = [0] * ncomp
    from_bytes = int.from_bytes  # hot-loop local
    for b in range(n_mcu):
        if restart_interval and b and b % restart_interval == 0:
            # restart boundary: fresh entropy segment, ALL predictors
            # reset (T.81 F.2.1.3.1)
            buf, nbits, end_err = _unstuff(next(seg_iter))
            pad = buf + _PAD6
            pos = 0
            prev_dc = [0] * ncomp
        for si in range(nslots):
            ci = slot_comp[si]
            alut = slot_ac[si]
            # DC: one 48-bit window covers code (<=16) + value (<=11)
            sh = pos & 7
            w = from_bytes(pad[pos >> 3 : (pos >> 3) + 6], "big")
            e = slot_dc[si][(w >> (32 - sh)) & 0xFFFF]
            ln = e >> 8
            if not ln:
                # no code is a prefix of the lookahead: a 16-bit read
                # would have run off the segment first if short
                raise ValueError(
                    "invalid Huffman code in JPEG scan"
                    if nbits - pos >= 16
                    else end_err
                )
            s = e & 0xFF
            if s:
                v = (w >> (48 - sh - ln - s)) & ((1 << s) - 1)
                pos += ln + s
                if pos > nbits:
                    raise ValueError(end_err)
                prev_dc[ci] += v if v >= (1 << (s - 1)) else v - (1 << s) + 1
            else:
                pos += ln
                if pos > nbits:
                    raise ValueError(end_err)
            coeffs[b, si, 0] = prev_dc[ci]
            k = 1
            while k < 64:
                sh = pos & 7
                w = from_bytes(pad[pos >> 3 : (pos >> 3) + 6], "big")
                e = alut[(w >> (32 - sh)) & 0xFFFF]
                ln = e >> 8
                if not ln:
                    raise ValueError(
                        "invalid Huffman code in JPEG scan"
                        if nbits - pos >= 16
                        else end_err
                    )
                sym = e & 0xFF
                if sym == 0x00:  # EOB
                    pos += ln
                    if pos > nbits:
                        raise ValueError(end_err)
                    break
                if sym == 0xF0:  # ZRL
                    pos += ln
                    if pos > nbits:
                        raise ValueError(end_err)
                    k += 16
                    continue
                s = sym & 0xF
                v = (w >> (48 - sh - ln - s)) & ((1 << s) - 1)
                pos += ln + s
                if pos > nbits:
                    raise ValueError(end_err)
                k += sym >> 4
                if k > 63:
                    raise ValueError(
                        "JPEG coefficient index overran the block"
                    )
                coeffs[b, si, k] = (
                    v if v >= (1 << (s - 1)) else v - (1 << s) + 1
                )
                k += 1
    # DCT layer, batched over every block at once: dequantize (per
    # component's table), de-zigzag (one permutation take), one
    # broadcast matmul pair for the IDCT, level shift, clamp — each
    # component decodes on its OWN sampling grid, then subsampled
    # planes replicate up to full resolution
    q_slot = np.stack([comp_q[ci] for ci in slot_comp])  # (nslots, 64)
    deq = coeffs.astype(np.int64) * q_slot[None, :, :]
    natural = deq[:, :, _ZZ_INV].reshape(-1, 8, 8).astype(np.float64)
    spatial = (_IDCT_M.T @ natural @ _IDCT_M) + 128.0
    clamped = (
        np.clip(np.floor(spatial + 0.5), 0, 255)
        .astype(np.uint8)
        .reshape(n_mcu, nslots, 8, 8)
    )
    planes = []
    for ci, (h_, v_) in enumerate(comp_samp):
        grid = np.empty((my * v_, mx * h_, 8, 8), dtype=np.uint8)
        for si in range(nslots):
            if slot_comp[si] != ci:
                continue
            vy, vx = slot_pos[si]
            grid[vy::v_, vx::h_] = clamped[:, si].reshape(my, mx, 8, 8)
        planes.append(
            grid.transpose(0, 2, 1, 3).reshape(my * v_ * 8, mx * h_ * 8)
        )
    if ncomp == 1:
        return height, width, planes[0][:height, :width], coeffs[:, 0, :]
    full = []
    for ci, (h_, v_) in enumerate(comp_samp):
        p = planes[ci]
        if (h_, v_) != (hmax, vmax):  # box-replicate upsample
            p = np.repeat(
                np.repeat(p, vmax // v_, axis=0), hmax // h_, axis=1
            )
        full.append(p[: my * 8 * vmax, : mx * 8 * hmax])
    pixels = np.stack(full, axis=2)[:height, :width]
    return height, width, pixels, coeffs


# JFIF/BT.601 YCbCr -> RGB in 16.16 fixed point — libjpeg's constants
# (jdcolor.c: FIX(1.40200), FIX(0.34414), FIX(0.71414), FIX(1.77200)).
_FIX_CR_R = 91881
_FIX_CB_G = 22554
_FIX_CR_G = 46802
_FIX_CB_B = 116130
_RGB_BIAS = 1 << 30  # keeps the dividend positive: truncation == floor


def _fx(v: np.ndarray) -> np.ndarray:
    """floor((v + 1/2) / 2^16) via positive-biased TRUNCATING division
    — written this way so a SQL oracle using truncating integer
    division (DuckDB ``//`` truncates toward zero; Python ``//``
    floors) reproduces it bit-exactly."""
    return (v + 32768 + _RGB_BIAS) // 65536 - (_RGB_BIAS >> 16)


def ycbcr_to_rgb(planes: np.ndarray) -> np.ndarray:
    """Convert (H, W, 3) uint8 Y/Cb/Cr planes (what :func:`decode_jpeg`
    returns for color) to (H, W, 3) uint8 RGB with the JFIF fixed-point
    transform:

        R = clamp(Y + fx( 91881·(Cr−128)))
        G = clamp(Y + fx(−22554·(Cb−128) − 46802·(Cr−128)))
        B = clamp(Y + fx(116130·(Cb−128)))

    fx = floor((v + 32768) / 65536). Deterministic integer math —
    reproducible in SQL, so the q97 'dcrgb' oracle pins the colorspace
    transform externally (the float matrix differs by at most one code
    per channel and is NOT what this implements)."""
    p = np.asarray(planes, dtype=np.int64)
    if p.ndim != 3 or p.shape[2] != 3:
        raise ValueError("expected (H, W, 3) YCbCr planes")
    y = p[..., 0]
    cb = p[..., 1] - 128
    cr = p[..., 2] - 128
    r = y + _fx(_FIX_CR_R * cr)
    g = y + _fx(-_FIX_CB_G * cb - _FIX_CR_G * cr)
    b = y + _fx(_FIX_CB_B * cb)
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)
