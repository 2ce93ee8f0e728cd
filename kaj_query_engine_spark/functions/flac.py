"""Pure stdlib+numpy FLAC codec — compressed LOSSLESS audio
(16-bit mono + stereo, FIXED + LPC predictors, Rice-coded residuals,
all four stereo channel assignments).

This container ships no audio libraries, but the FLAC subset needed
here requires none: a ``fLaC`` magic + STREAMINFO metadata block,
then self-delimiting frames — 14-bit-sync headers with UTF-8-style
coded frame numbers and CRC-8, per-channel subframes (CONSTANT /
VERBATIM / FIXED order 0–4 / LPC order 1–32 with Levinson-Durbin
quantized coefficients, Rice-coded residuals, both partitioned-Rice
methods incl. the verbatim escape), byte-aligned
CRC-16 footers (xiph.org FLAC format spec — public; now also
RFC 9639). MSB-first bit packing throughout — the opposite of GIF's
LZW, so the two codecs pin both bit orders.

FLAC is lossless, so the q99 oracle is the strongest kind: the
decoded PCM buffer must digest-match the same pure-SQL sha256
reconstruction the uncompressed WAV path uses (q94) — a match pins
the Rice coder, the fixed-predictor arithmetic, CRC-8/CRC-16, the
UTF-8 frame numbering and the bit packing byte-exactly. The decoder
additionally verifies STREAMINFO's embedded MD5 of the unencoded
audio — an in-format integrity check the encoder must also get right.

Stereo carries the spec's full decorrelation matrix — independent,
left-side, right-side, and mid-side (side channels one bit wider,
mid's dropped sum bit recovered from the side's parity). >2 channels
raise loudly (mp3 — lossy, with no in-SQL verification story — stays
honestly guarded).

No counterpart in the reference engine (3 scalar types only —
``/root/reference/src/qp/utils/Attribute.java:11-13``); this is
training-pipeline extension surface.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = []
    for b in range(256):
        crc = b << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) & mask if crc & top else (crc << 1) & mask
        table.append(crc)
    return table


_CRC8_TABLE = _crc_table(0x07, 8)
_CRC16_TABLE = _crc_table(0x8005, 16)
_M80 = (1 << 80) - 1  # full 10-byte peek-window mask


def _crc8(data: bytes) -> int:
    crc = 0
    table = _CRC8_TABLE
    for b in data:
        crc = table[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    table = _CRC16_TABLE
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ table[(crc >> 8) ^ b]
    return crc


def _utf8_number(n: int) -> bytes:
    """FLAC's UTF-8-style coded number (frame index)."""
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (7 - nbytes + 6 * (nbytes - 1))):
        nbytes += 1
        if nbytes > 6:
            raise ValueError("frame number too large")
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (n >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, width: int) -> None:
        if width == 0:
            return
        self.acc = (self.acc << width) | (value & ((1 << width) - 1))
        self.nbits += width
        while self.nbits >= 8:
            self.out.append((self.acc >> (self.nbits - 8)) & 0xFF)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def put_unary(self, q: int) -> None:
        while q >= 32:
            self.put(0, 32)
            q -= 32
        self.put(1, q + 1)  # q zeros then a 1

    def put_rice_block(self, z: np.ndarray, k: int) -> None:
        """Append the Rice codes of the zigzagged values ``z`` — per
        value ``v``: ``v >> k`` zeros, a terminating 1, then the ``k``
        low bits of ``v``, MSB-first — as ONE big-int accumulation
        with a single byte-drain per ~1 KiB instead of two Python
        ``put`` calls per sample (the encode profile's top entry:
        ~66 % of encode CPU was ``put``; measured 1.4-1.5x on the
        whole encode; a numpy ``packbits`` variant was tried and is
        SLOWER — partitions are 16-64 samples, array setup overhead
        loses to the loop). Byte-identical to the per-sample path by
        construction: the accumulator concatenates exactly the same
        MSB-first bit string, and the drain emits whole bytes from
        its top just like ``put``'s while-loop (pinned by the
        round-trip and digest tests). The periodic drain keeps the
        shift cost linear in sample count and the accumulator small
        even for degenerate (k, z) with huge unary runs."""
        mask = (1 << k) - 1
        lead = 1 << k
        acc = self.acc
        nb = self.nbits
        for v in z.tolist():
            length = (v >> k) + 1 + k
            acc = (acc << length) | (lead | (v & mask))
            nb += length
            if nb >= 8192:
                rem = nb & 7
                self.out += (acc >> rem).to_bytes(nb >> 3, "big")
                acc &= (1 << rem) - 1
                nb = rem
        rem = nb & 7
        nby = nb >> 3
        if nby:
            self.out += (acc >> rem).to_bytes(nby, "big")
            acc &= (1 << rem) - 1
        self.acc = acc
        self.nbits = rem

    def align(self) -> None:
        if self.nbits:
            self.put(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.out)


class _BitReader:
    """MSB-first bit reader. ``read`` pulls one big-endian window per
    call instead of looping per bit; ``read_unary`` scans whole bytes
    for the terminating 1-bit via ``int.bit_length``."""

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, width: int) -> int:
        if width == 0:
            return 0
        pos = (self.byte << 3) + self.bit
        end = pos + width
        data = self.data
        if end > len(data) << 3:
            raise ValueError("FLAC bitstream exhausted")
        i = pos >> 3
        nb = ((end + 7) >> 3) - i
        w = int.from_bytes(data[i : i + nb], "big")
        self.byte = end >> 3
        self.bit = end & 7
        return (w >> ((nb << 3) - (pos & 7) - width)) & ((1 << width) - 1)

    def read_unary(self) -> int:
        data = self.data
        total = len(data) << 3
        pos = (self.byte << 3) + self.bit
        q = 0
        while True:
            if pos >= total:
                raise ValueError("FLAC bitstream exhausted")
            i = pos >> 3
            nb = min(8, len(data) - i)
            avail = (nb << 3) - (pos & 7)
            chunk = int.from_bytes(data[i : i + nb], "big") & (
                (1 << avail) - 1
            )
            if chunk:
                lead = avail - chunk.bit_length()
                q += lead
                pos += lead + 1
                if q > 1 << 20:
                    raise ValueError("runaway FLAC unary code")
                self.byte = pos >> 3
                self.bit = pos & 7
                return q
            q += avail
            pos += avail
            if q > 1 << 20:
                raise ValueError("runaway FLAC unary code")

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


def _zigzag(v: np.ndarray) -> np.ndarray:
    return np.where(v >= 0, 2 * v, -2 * v - 1)


def _best_rice_k(z: np.ndarray) -> int:
    total = int(z.sum())
    n = len(z)
    k = 0
    while k < 30 and (n << (k + 1)) < total:
        k += 1
    return k


_LPC_PRECISION = 12  # qlp coefficient precision in bits (1..15 legal)


def _quantized_lpc(
    blk: np.ndarray, order: int
) -> tuple[list[int], int] | None:
    """Levinson-Durbin LPC estimation + coefficient quantization for
    one block: returns ``(qlp_coeffs, shift)`` with each coefficient a
    signed ``_LPC_PRECISION``-bit integer and ``shift`` in [0, 15]
    (prediction = (Σ qlp[j]·s[i-1-j]) >> shift), or ``None`` when the
    block is degenerate (zero energy, non-positive prediction-error
    recursion) — the caller falls back to a FIXED subframe, which the
    spec always permits. ANY quantization is lossless here (residuals
    are computed with the same integer predictor the decoder runs);
    Levinson-Durbin just makes the residuals small."""
    import math

    n = len(blk)
    if order < 1 or n <= order:
        return None
    x = blk.astype(np.float64)
    # Welch window before autocorrelation (what production FLAC
    # encoders do): the rectangular estimate's edge bias can halve
    # the predictor gain on smooth signals (measured: order-8 sine
    # residuals 5 -> 62 across frames without it, flat ~5 with it).
    # Windowing only shapes the ESTIMATE — residuals are still
    # computed from the raw samples, so losslessness is untouched.
    t_ = np.arange(n, dtype=np.float64)
    x = x * (1.0 - ((t_ - (n - 1) / 2.0) / ((n + 1) / 2.0)) ** 2)
    r = [float(np.dot(x[: n - lag], x[lag:])) for lag in range(order + 1)]
    if r[0] <= 0.0:
        return None  # all-zero block: no signal to model
    a = [1.0]  # prediction-error filter, grows to order+1 taps
    err = r[0]
    for m in range(1, order + 1):
        acc = sum(a[j] * r[m - j] for j in range(m))
        k = -acc / err
        old = a + [0.0]
        a = [old[j] + k * old[m - j] for j in range(m + 1)]
        err *= 1.0 - k * k
        if err <= 0.0:
            return None  # numerically singular (e.g. pure periodic)
    coeffs = [-c for c in a[1:]]  # pred[i] = Σ coeffs[j]·s[i-1-j]
    cmax = max(abs(c) for c in coeffs)
    headroom = (1 << (_LPC_PRECISION - 1)) - 1
    if cmax <= 0.0:
        shift = 0
    else:
        shift = max(0, min(15, int(math.floor(math.log2(headroom / cmax)))))
    qlp = [
        max(-headroom - 1, min(headroom, int(round(c * (1 << shift)))))
        for c in coeffs
    ]
    return qlp, shift


def _put_rice_residual(
    fw: "_BitWriter",
    res: np.ndarray,
    order: int = 0,
    nb: int | None = None,
    porder: int = 0,
) -> None:
    """Residual coding: method 1 (Rice2, 5-bit params) — shared by the
    FIXED and LPC subframe writers. ``porder`` writes 2^porder Rice
    partitions, each with its OWN best k (partition 0 loses the
    ``order`` warmup samples, per spec §9.2.7); it auto-clamps down
    when the block is too short or indivisible — the spec's validity
    rule, applied per frame so the stream tail stays legal."""
    nb = len(res) + order if nb is None else nb
    while porder and (nb % (1 << porder) or (nb >> porder) <= order):
        porder -= 1
    z = _zigzag(res)
    fw.put(1, 2)
    fw.put(porder, 4)
    psize = nb >> porder
    idx = 0
    for part in range(1 << porder):
        cnt = psize - (order if part == 0 else 0)
        seg = z[idx : idx + cnt]
        idx += cnt
        k = _best_rice_k(seg) if len(seg) else 0
        fw.put(k, 5)
        fw.put_rice_block(seg, k)


def _write_subframe(
    fw: "_BitWriter",
    blk: np.ndarray,
    bps: int,
    force_order: int | None,
    lpc_order: int | None,
    rice_porder: int = 0,
) -> None:
    """One subframe (FIXED or LPC) at ``bps`` bits per sample — the
    bps parameter is what stereo decorrelation needs: a side channel
    (L−R) carries 17 significant bits, so its warmup samples are
    written one bit wider (spec §frame: the side subframe's bit depth
    is the frame's + 1)."""
    nb = len(blk)
    mask = (1 << bps) - 1
    # LPC subframe when requested and the block supports it
    qco = None
    lo = 0
    if lpc_order is not None:
        if not 1 <= lpc_order <= 32:
            raise ValueError("lpc_order must be in [1, 32]")
        lo = min(lpc_order, nb - 1)
        qco = _quantized_lpc(blk, lo) if lo >= 1 else None
    if qco is not None:
        qlp, shift = qco
        # vectorized prediction: numpy's >> on int64 is an arithmetic
        # (floor) shift, same as Python's — measured ~10x over the
        # per-sample comprehension on the stereo corpus
        pred = np.zeros(nb - lo, dtype=np.int64)
        for j in range(lo):
            pred += qlp[j] * blk[lo - 1 - j : nb - 1 - j]
        res = blk[lo:] - (pred >> shift)
        # subframe header: 0 pad, LPC type 0b100000 | (order-1),
        # no wasted bits
        fw.put(0, 1)
        fw.put(0b100000 | (lo - 1), 6)
        fw.put(0, 1)
        for w in blk[:lo]:
            fw.put(int(w) & mask, bps)  # warmup, two's complement
        fw.put(_LPC_PRECISION - 1, 4)
        fw.put(shift & 0x1F, 5)
        for c in qlp:
            fw.put(c & ((1 << _LPC_PRECISION) - 1), _LPC_PRECISION)
        _put_rice_residual(fw, res, lo, nb, rice_porder)
        return
    # choose FIXED order
    if force_order is not None:
        if not 0 <= force_order <= 4:
            raise ValueError("force_order must be in [0, 4]")
        # a forced order that doesn't fit a SHORT block (the tail
        # block of a stream whose length isn't a block_size
        # multiple can hold fewer samples than the order needs)
        # clamps per-block instead of raising: the knob selects a
        # per-file preference, not a per-block invariant — found
        # by the hypothesis round-trip fuzz at 17 samples / bs 16
        order = min(force_order, nb - 1)
    else:
        best = None
        for o in range(0, min(4, nb - 1) + 1):
            res = blk[o:].copy()
            for j, c in enumerate(_FIXED_COEFFS[o]):
                res = res - c * blk[o - 1 - j : nb - 1 - j]
            cost = int(_zigzag(res).sum())
            if best is None or cost < best[1]:
                best = (o, cost)
        order = best[0]
    res = blk[order:].copy()
    for j, c in enumerate(_FIXED_COEFFS[order]):
        res = res - c * blk[order - 1 - j : nb - 1 - j]
    # subframe header: 0 pad, FIXED type 0b001000 | order, no wasted bits
    fw.put(0, 1)
    fw.put(0b001000 | order, 6)
    fw.put(0, 1)
    for w in blk[:order]:
        fw.put(int(w) & mask, bps)  # warmup, two's complement
    _put_rice_residual(fw, res, order, nb, rice_porder)


# frame-header channel-assignment codes (spec §9.1.3)
_STEREO_MODES = {
    "independent": 0b0001,
    "left-side": 0b1000,
    "right-side": 0b1001,
    "mid-side": 0b1010,
}


def encode_flac(
    samples: np.ndarray,
    rate: int,
    block_size: int = 64,
    force_order: int | None = None,
    lpc_order: int | None = None,
    channel_mode: str = "mid-side",
    rice_porder: int = 0,
) -> bytes:
    """Encode int16 PCM to FLAC (FIXED or LPC predictors, Rice2
    residual method). ``samples`` is 1-D for mono or (n, 2) for
    stereo (columns = left, right).

    ``block_size`` controls frames-per-item (small values exercise the
    multi-frame path on tiny fixtures); ``force_order`` pins the FIXED
    predictor order (0–4), otherwise the cheapest by Σ|zigzag| wins.
    ``lpc_order`` (1–32) switches to LPC subframes: per-block
    Levinson-Durbin coefficients quantized to 12 bits (order clamped
    to the block's sample count; degenerate blocks — zero energy,
    singular recursion — fall back to the FIXED path, which the spec
    always permits). Either predictor family is lossless: residuals
    are computed with the same integer predictor the decoder runs.

    ``channel_mode`` picks the stereo decorrelation (ignored for
    mono): 'independent' (two plain subframes), 'left-side' (L and
    S=L−R), 'right-side' (S and R), or 'mid-side' (M=(L+R)>>1 and S —
    the dropped sum bit is recoverable because S carries the parity).
    Side subframes are 17-bit; all four modes are lossless.
    """
    s = np.asarray(samples)
    stereo = s.ndim == 2
    if stereo and (s.shape[1] != 2 or s.shape[0] == 0 or s.dtype != np.int16):
        raise ValueError("stereo samples must be a non-empty (n, 2) int16 array")
    if not stereo and (s.dtype != np.int16 or s.ndim != 1 or len(s) == 0):
        raise ValueError("samples must be a non-empty 1-D int16 array")
    if stereo and channel_mode not in _STEREO_MODES:
        raise ValueError(f"unknown channel_mode {channel_mode!r}")
    if not (1 <= rate < (1 << 20)):
        raise ValueError(f"bad sample rate {rate}")
    if not (16 <= block_size <= 65535):
        raise ValueError("block_size must be in 16..65535")
    n_total = s.shape[0]
    # MD5 of the unencoded audio, channel-interleaved LE (row-major
    # (n, 2) tobytes IS the interleaving)
    md5 = hashlib.md5(s.astype("<i2").tobytes()).digest()
    # STREAMINFO: min/max blocksize, min/max framesize (0 = unknown),
    # 20-bit rate, 3-bit channels-1, 5-bit bits-1, 36-bit total samples
    last_block = n_total % block_size or block_size
    bw = _BitWriter()
    bw.put(min(block_size, last_block), 16)
    bw.put(block_size, 16)
    bw.put(0, 24)
    bw.put(0, 24)
    bw.put(rate, 20)
    bw.put(1 if stereo else 0, 3)  # channels - 1
    bw.put(15, 5)  # 16 bits - 1
    bw.put(n_total, 36)
    info = bw.bytes() + md5
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(info).to_bytes(3, "big")  # last-block STREAMINFO
    out += info

    ch_code = _STEREO_MODES[channel_mode] if stereo else 0
    x = s.astype(np.int64)
    for fi, start in enumerate(range(0, n_total, block_size)):
        blk = x[start : start + block_size]
        nb = len(blk)
        header = bytearray(
            [0xFF, 0xF8]  # sync + fixed blocking
        )
        # blocksize code 0b0111 (16-bit-1 at end), rate code 0 (from
        # STREAMINFO), channel assignment, sample size 0b100 (16 bit)
        header.append((0b0111 << 4) | 0b0000)
        header.append((ch_code << 4) | (0b100 << 1) | 0)
        header += _utf8_number(fi)
        header += struct.pack(">H", nb - 1)
        header.append(_crc8(bytes(header)))
        fw = _BitWriter()
        for b in header:
            fw.put(b, 8)
        if not stereo:
            chans = [(blk, 16)]
        else:
            left, right = blk[:, 0], blk[:, 1]
            side = left - right
            chans = {
                "independent": [(left, 16), (right, 16)],
                "left-side": [(left, 16), (side, 17)],
                "right-side": [(side, 17), (right, 16)],
                "mid-side": [((left + right) >> 1, 16), (side, 17)],
            }[channel_mode]
        for chan, bps in chans:
            _write_subframe(fw, chan, bps, force_order, lpc_order, rice_porder)
        fw.align()
        body = fw.bytes()
        out += body + struct.pack(">H", _crc16(body))
    return bytes(out)


def _read_rice_residuals(
    br: "_BitReader", nb: int, order: int, blk: np.ndarray
) -> None:
    """Partitioned-Rice residual decode (both methods, incl. the
    verbatim escape) into ``blk[order:]`` — shared by the FIXED and
    LPC subframe readers."""
    method = br.read(2)
    if method > 1:
        raise ValueError("reserved FLAC residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if nb % nparts or (nb >> porder) <= order and porder:
        raise ValueError("bad FLAC rice partition order")
    idx = order
    data = br.data
    total = len(data) << 3
    from_bytes = int.from_bytes  # hot-loop local
    for part in range(nparts):
        cnt = (nb >> porder) - (order if part == 0 else 0)
        k = br.read(pbits)
        if k == escape:
            raw_bits = br.read(5)
            for _ in range(cnt):
                v = br.read(raw_bits) if raw_bits else 0
                if raw_bits and v >= 1 << (raw_bits - 1):
                    v -= 1 << raw_bits
                blk[idx] = v
                idx += 1
        else:
            # fused unary+k decode: one 10-byte window per sample
            # covers any q+1+k <= 80-7 bits; longer unary runs (and
            # the stream tail) fall back to the per-call reader
            kmask = (1 << k) - 1
            pos = (br.byte << 3) + br.bit
            dlen = len(data)
            vals = []
            append = vals.append
            for _ in range(cnt):
                i = pos >> 3
                sh = pos & 7
                if i + 10 <= dlen:
                    chunk = from_bytes(data[i : i + 10], "big") & (
                        _M80 >> sh
                    )
                    avail = 80 - sh
                else:
                    seg = data[i : i + 10]
                    avail = (len(seg) << 3) - sh
                    chunk = (
                        from_bytes(seg, "big") & ((1 << avail) - 1)
                        if avail > 0
                        else 0
                    )
                bl = chunk.bit_length()
                if bl > k:  # unary run + terminator + k bits all inside
                    z = ((avail - bl) << k) | (
                        (chunk >> (bl - 1 - k)) & kmask
                    )
                    pos += avail - bl + 1 + k
                else:
                    br.byte = pos >> 3
                    br.bit = pos & 7
                    q = br.read_unary()
                    z = (q << k) | (br.read(k) if k else 0)
                    pos = (br.byte << 3) + br.bit
                append((z >> 1) ^ -(z & 1))  # un-zigzag
            br.byte = pos >> 3
            br.bit = pos & 7
            blk[idx : idx + cnt] = vals
            idx += cnt


def _read_subframe(br: "_BitReader", nb: int, base_bps: int) -> np.ndarray:
    """Decode one subframe (CONSTANT / VERBATIM / FIXED / LPC) of
    ``nb`` samples at ``base_bps`` bits (17 for a stereo side
    channel) into an int64 block."""
    if br.read(1) != 0:
        raise ValueError("bad FLAC subframe padding bit")
    stype = br.read(6)
    wasted = 0
    if br.read(1):  # wasted-bits flag: unary count - 1
        wasted = 1 + br.read_unary()
    bps = base_bps - wasted
    blk = np.empty(nb, dtype=np.int64)
    if stype == 0:  # CONSTANT
        v = br.read(bps)
        if v >= 1 << (bps - 1):
            v -= 1 << bps
        blk[:] = v
    elif stype == 1:  # VERBATIM
        for i in range(nb):
            v = br.read(bps)
            if v >= 1 << (bps - 1):
                v -= 1 << bps
            blk[i] = v
    elif 8 <= stype <= 12:  # FIXED order 0..4
        order = stype - 8
        for i in range(order):
            v = br.read(bps)
            if v >= 1 << (bps - 1):
                v -= 1 << bps
            blk[i] = v
        _read_rice_residuals(br, nb, order, blk)
        if order:  # undo the fixed predictor (exact int list math)
            coefs = _FIXED_COEFFS[order]
            vals = blk.tolist()
            for i in range(order, nb):
                acc = vals[i]
                for j, c in enumerate(coefs):
                    acc += c * vals[i - 1 - j]
                vals[i] = acc
            try:  # runaway residuals in a corrupt stream can overflow
                blk[:] = vals  # int64 — keep the ValueError contract
            except OverflowError as e:
                raise ValueError(
                    "FLAC fixed-predictor output exceeds int64 "
                    "(corrupt stream)"
                ) from e
    elif stype >= 32:  # LPC, order = low 5 bits + 1
        order = (stype & 0x1F) + 1
        for i in range(order):
            v = br.read(bps)
            if v >= 1 << (bps - 1):
                v -= 1 << bps
            blk[i] = v
        precision = br.read(4) + 1
        if precision == 16:
            raise ValueError("invalid FLAC qlp precision code 1111")
        shift = br.read(5)
        if shift >= 16:
            shift -= 32
        if shift < 0:
            # negative shifts were never produced by any released
            # encoder and RFC 9639 forbids them
            raise ValueError("negative FLAC qlp shift")
        qlp = []
        for _ in range(order):
            c = br.read(precision)
            if c >= 1 << (precision - 1):
                c -= 1 << precision
            qlp.append(c)
        _read_rice_residuals(br, nb, order, blk)
        # undo the LPC predictor — exact int list math (Python's >>
        # floors like an arithmetic shift; ints never overflow)
        vals = blk.tolist()
        rng_o = range(order)
        for i in range(order, nb):
            pred = 0
            for j in rng_o:
                pred += qlp[j] * vals[i - 1 - j]
            vals[i] += pred >> shift
        try:  # same hostile-stream guard as the FIXED branch: runaway
            blk[:] = vals  # accumulation must stay a ValueError
        except OverflowError as e:
            raise ValueError(
                "FLAC LPC predictor output exceeds int64 (corrupt stream)"
            ) from e
    else:
        raise ValueError(f"reserved FLAC subframe type {stype}")
    if wasted:
        blk <<= wasted
    return blk


def decode_flac(data: bytes) -> tuple[int, np.ndarray]:
    """Decode FLAC bytes to ``(rate, samples)`` — int16, 1-D for mono
    or (n, 2) for stereo.

    Verifies frame-header CRC-8, frame CRC-16, and STREAMINFO's MD5 of
    the decoded (channel-interleaved) PCM. Supports CONSTANT /
    VERBATIM / FIXED / LPC subframes with both partitioned-Rice
    methods (incl. escapes) and all four stereo channel assignments
    (independent / left-side / right-side / mid-side); >2 channels
    raise loudly.
    """
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream: bad magic")
    pos = 4
    rate = None
    n_total = None
    md5_expect = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated FLAC metadata")
        hdr = data[pos]
        blen = int.from_bytes(data[pos + 1 : pos + 4], "big")
        body = data[pos + 4 : pos + 4 + blen]
        if len(body) != blen:
            raise ValueError("truncated FLAC metadata block")
        if hdr & 0x7F == 0:  # STREAMINFO
            br = _BitReader(body)
            br.read(16)
            br.read(16)
            br.read(24)
            br.read(24)
            rate = br.read(20)
            channels = br.read(3) + 1
            bits = br.read(5) + 1
            n_total = br.read(36)
            md5_expect = body[18:34]
            if channels not in (1, 2) or bits != 16:
                raise ValueError(
                    f"unsupported FLAC: {channels} channels {bits}-bit "
                    "(16-bit mono/stereo only)"
                )
        pos += 4 + blen
        if hdr & 0x80:
            break
    if rate is None:
        raise ValueError("FLAC missing STREAMINFO")

    out = np.empty(
        (n_total, channels) if channels == 2 else n_total, dtype=np.int64
    )
    filled = 0
    while filled < n_total:
        frame_start = pos
        if pos + 2 > len(data) or data[pos] != 0xFF or (data[pos + 1] & 0xFC) != 0xF8:
            raise ValueError("FLAC frame sync lost")
        bs_code = data[pos + 2] >> 4
        sr_code = data[pos + 2] & 0xF
        ch_code = data[pos + 3] >> 4
        ss_code = (data[pos + 3] >> 1) & 0x7
        # per-channel bit depths by assignment: a side channel is one
        # bit wider (spec §9.1.3); the code must agree with STREAMINFO
        if ch_code == 0:
            bps_list = [16]
        elif ch_code == 1:
            bps_list = [16, 16]  # independent stereo
        elif ch_code == 0b1000:
            bps_list = [16, 17]  # left-side
        elif ch_code == 0b1001:
            bps_list = [17, 16]  # right-side
        elif ch_code == 0b1010:
            bps_list = [16, 17]  # mid-side
        else:
            raise ValueError(
                f"unsupported FLAC channel assignment {ch_code} "
                "(mono/stereo only)"
            )
        if len(bps_list) != channels:
            raise ValueError(
                "FLAC frame channel assignment contradicts STREAMINFO"
            )
        if ss_code != 0b100:
            raise ValueError("unsupported FLAC sample size (16-bit only)")
        p = pos + 4
        first = data[p]
        if first < 0x80:
            p += 1
        else:
            nb_ = 0
            while (first << nb_) & 0x80:
                nb_ += 1
            p += nb_
        if bs_code == 0b0110:
            nb = data[p] + 1
            p += 1
        elif bs_code == 0b0111:
            nb = struct.unpack(">H", data[p : p + 2])[0] + 1
            p += 2
        elif 0b0010 <= bs_code <= 0b0101:
            nb = 576 << (bs_code - 2)
        elif bs_code >= 0b1000:
            nb = 256 << (bs_code - 8)
        else:
            raise ValueError(f"bad FLAC blocksize code {bs_code}")
        if sr_code in (0b1100, 0b1101, 0b1110):
            p += 1 if sr_code == 0b1100 else 2
        elif sr_code == 0b1111:
            raise ValueError("invalid FLAC sample rate code")
        crc8 = data[p]
        if _crc8(data[frame_start:p]) != crc8:
            raise ValueError("FLAC frame header CRC-8 mismatch")
        p += 1
        br = _BitReader(data, p)
        subs = [_read_subframe(br, nb, bps) for bps in bps_list]
        br.align()
        crc16 = struct.unpack(">H", data[br.byte : br.byte + 2])[0]
        if _crc16(data[frame_start : br.byte]) != crc16:
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = br.byte + 2
        if filled + nb > n_total:
            raise ValueError("FLAC frames exceed STREAMINFO total")
        if channels == 1:
            out[filled : filled + nb] = subs[0]
        else:
            # undo the stereo decorrelation (spec §4.2: mid drops the
            # sum's low bit, recoverable because side carries the
            # parity of L−R == parity of L+R)
            if ch_code == 1:
                left, right = subs
            elif ch_code == 0b1000:  # left-side
                left = subs[0]
                right = left - subs[1]
            elif ch_code == 0b1001:  # right-side
                right = subs[1]
                left = right + subs[0]
            else:  # mid-side
                mid2 = (subs[0] << 1) | (subs[1] & 1)
                left = (mid2 + subs[1]) >> 1
                right = (mid2 - subs[1]) >> 1
            out[filled : filled + nb, 0] = left
            out[filled : filled + nb, 1] = right
        filled += nb
    if (out > 32767).any() or (out < -32768).any():
        raise ValueError("FLAC decoded sample out of 16-bit range")
    pcm = out.astype(np.int16)
    if hashlib.md5(pcm.astype("<i2").tobytes()).digest() != md5_expect:
        raise ValueError("FLAC STREAMINFO MD5 mismatch (corrupt stream)")
    return rate, pcm
