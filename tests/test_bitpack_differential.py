"""Committed differential pins for the f9311d0 big-int bit-packing
drains (round-14 optimization): FLAC ``put_rice_block`` and JPEG
``put_big`` / ``_encode_block`` replaced per-sample/per-symbol
``put`` loops with one big-int accumulation drained in whole-byte
chunks. The optimization's law is BYTE-IDENTITY with the loop paths
it replaced — the commit proved it with ad-hoc 6000/8000-trial
differentials; this file makes the same differential a permanent
regression gate by re-deriving the loop-path reference INSIDE the
test (via the surviving primitive ``put``/``put_unary`` methods,
which the drains must agree with bit-for-bit) and sweeping randomized
inputs that cover the drain edges: non-byte-aligned writer state,
multi-KiB unary runs that force mid-block drains, T.81 0xFF stuffing
inside and at the end of a drain chunk, ZRL cascades, and empty
blocks. No Spark session — these run the writers directly."""

from __future__ import annotations

import numpy as np
import pytest

from kaj_query_engine_spark.functions.flac import _BitWriter as FlacWriter
from kaj_query_engine_spark.functions.jpeg import (
    _ENC_AC_CODES,
    _ENC_DC_CODES,
    _BitWriter as JpegWriter,
    _category,
    _encode_block,
)

# ---------------------------------------------------------------------
# FLAC: put_rice_block vs the per-sample put_unary+put loop
# ---------------------------------------------------------------------


def _rice_reference(w: FlacWriter, z: np.ndarray, k: int) -> None:
    """The pre-f9311d0 per-sample path, spelled with the surviving
    primitives: per zigzagged value v — (v >> k) zeros, a terminating
    1 (put_unary), then the k low bits MSB-first (put)."""
    for v in z.tolist():
        w.put_unary(v >> k)
        if k:
            w.put(v & ((1 << k) - 1), k)


def _writer_state(w) -> tuple[bytes, int, int]:
    return bytes(w.out), w.acc, w.nbits


def _seed_bits(w, seed_bits: int, seed_val: int) -> None:
    """Put the writer into a non-byte-aligned state first — the drain
    must honor inherited acc/nbits exactly."""
    if seed_bits:
        w.put(seed_val & ((1 << seed_bits) - 1), seed_bits)


@pytest.mark.parametrize("seed", range(20))
def test_flac_rice_block_matches_per_sample_path(seed):
    rng = np.random.default_rng(seed)
    for _ in range(40):
        k = int(rng.integers(0, 15)) if rng.random() < 0.9 else int(
            rng.integers(15, 31)
        )
        n = int(rng.integers(0, 80))
        # mostly small zigzag values (the real residual regime), with
        # occasional huge ones whose unary runs exceed the 8192-bit
        # drain threshold mid-block
        z = rng.integers(0, 1 << min(k + 6, 40), size=n, dtype=np.int64)
        if n and rng.random() < 0.3:
            z[rng.integers(0, n)] = (int(rng.integers(9000, 20000)) << k) | (
                int(rng.integers(0, 1 << k)) if k else 0
            )
        sb = int(rng.integers(0, 8))
        sv = int(rng.integers(0, 256))
        a, b = FlacWriter(), FlacWriter()
        _seed_bits(a, sb, sv)
        _seed_bits(b, sb, sv)
        a.put_rice_block(z, k)
        _rice_reference(b, z, k)
        assert _writer_state(a) == _writer_state(b), (
            f"rice drain diverged: k={k} n={n} seed_bits={sb}"
        )


def test_flac_rice_block_empty_and_degenerate():
    for k in (0, 1, 14, 30):
        a, b = FlacWriter(), FlacWriter()
        a.put_rice_block(np.asarray([], dtype=np.int64), k)
        _rice_reference(b, np.asarray([], dtype=np.int64), k)
        assert _writer_state(a) == _writer_state(b)
    # a single enormous unary run: multiple internal drains, k = 0
    z = np.asarray([65536], dtype=np.int64)
    a, b = FlacWriter(), FlacWriter()
    a.put_rice_block(z, 0)
    _rice_reference(b, z, 0)
    assert _writer_state(a) == _writer_state(b)


# ---------------------------------------------------------------------
# JPEG: put_big vs the per-put loop (stuffing inside the drain)
# ---------------------------------------------------------------------


@pytest.mark.parametrize("seed", range(20))
def test_jpeg_put_big_matches_put_sequence(seed):
    rng = np.random.default_rng(1000 + seed)
    for _ in range(60):
        # random symbol sequence, biased toward all-ones pieces so the
        # drain regularly emits 0xFF bytes (stuffing must interleave
        # identically, including an 0xFF as the drain's LAST byte)
        pieces = []
        for _ in range(int(rng.integers(1, 30))):
            ln = int(rng.integers(1, 17))
            v = (1 << ln) - 1 if rng.random() < 0.4 else int(
                rng.integers(0, 1 << ln)
            )
            pieces.append((v, ln))
        sb = int(rng.integers(0, 8))
        sv = 0xFF >> (8 - sb) if (sb and rng.random() < 0.5) else int(
            rng.integers(0, 256)
        )
        a, b = JpegWriter(), JpegWriter()
        _seed_bits(a, sb, sv)
        _seed_bits(b, sb, sv)
        acc = 0
        nb = 0
        for v, ln in pieces:
            acc = (acc << ln) | v
            nb += ln
            b.put(v, ln)
        a.put_big(acc, nb)
        assert _writer_state(a) == _writer_state(b), (
            f"put_big diverged: pieces={pieces} seed_bits={sb}"
        )


def test_jpeg_put_big_zero_length_is_noop():
    a = JpegWriter()
    a.put(0xAB, 8)
    before = _writer_state(a)
    a.put_big(0, 0)
    assert _writer_state(a) == before


# ---------------------------------------------------------------------
# JPEG: _encode_block vs the per-symbol reference (DPCM DC + RLE AC)
# ---------------------------------------------------------------------


def _encode_block_reference(
    w: JpegWriter, blk: np.ndarray, prev_dc: int, dc_codes, ac_codes
) -> int:
    """The pre-f9311d0 per-symbol path: every Huffman code and value
    field goes through ``put`` individually."""
    vals = blk.tolist()
    diff = vals[0] - prev_dc
    s = _category(diff)
    code, ln = dc_codes[s]
    w.put(code, ln)
    if s:
        w.put(diff if diff > 0 else diff + (1 << s) - 1, s)
    last = 0
    for k in (np.flatnonzero(blk[1:]) + 1).tolist():
        run = k - last - 1
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            w.put(code, ln)
            run -= 16
        v = vals[k]
        s = _category(v)
        code, ln = ac_codes[(run << 4) | s]
        w.put(code, ln)
        w.put(v if v > 0 else v + (1 << s) - 1, s)
        last = k
    if last != 63:
        code, ln = ac_codes[0x00]  # EOB
        w.put(code, ln)
    return vals[0]


@pytest.mark.parametrize("seed", range(20))
def test_jpeg_encode_block_matches_per_symbol_path(seed):
    rng = np.random.default_rng(2000 + seed)
    prev_a = prev_b = 0
    a, b = JpegWriter(), JpegWriter()
    for _ in range(50):
        blk = np.zeros(64, dtype=np.int64)
        style = rng.random()
        if style < 0.15:
            pass  # all-zero block: DC diff only + EOB
        elif style < 0.45:
            # sparse with long zero runs: exercises ZRL cascades
            for pos in rng.choice(
                np.arange(1, 64), size=int(rng.integers(1, 4)), replace=False
            ):
                blk[pos] = int(rng.integers(-255, 256)) or 1
        else:
            dense = rng.integers(-128, 129, size=64)
            mask = rng.random(64) < rng.uniform(0.1, 0.9)
            blk[mask] = dense[mask]
        blk[0] = int(rng.integers(-600, 601))
        if rng.random() < 0.3:
            blk[63] = int(rng.integers(1, 100))  # last-AC: no EOB
        prev_a = _encode_block(a, blk, prev_a, _ENC_DC_CODES, _ENC_AC_CODES)
        prev_b = _encode_block_reference(
            b, blk, prev_b, _ENC_DC_CODES, _ENC_AC_CODES
        )
        assert prev_a == prev_b
        assert _writer_state(a) == _writer_state(b)
    # the accumulated multi-block streams flush identically too
    assert a.flush() == b.flush()


# ---------------------------------------------------------------------
# Fixed-input GOLDEN bytes (round-15, ADVICE #3): the differentials
# above re-derive their reference through the surviving put/put_unary
# primitives, so a future semantic change to put() would shift both
# sides together and the differential would still pass while the
# output bytes change. These anchor the ABSOLUTE bit-level format
# with hand-derived expected bytes, independent of put().
# ---------------------------------------------------------------------


def test_flac_rice_block_golden_bytes():
    # k=2, z=[3,0,5]: v=3 -> q=0: "1"+"11"; v=0 -> "1"+"00";
    # v=5 -> q=1: "01"+"01". Concatenated MSB-first:
    # 111 100 0101 = 1111 0001 | 01 -> one byte 0xF1, acc=0b01, nbits=2
    w = FlacWriter()
    w.put_rice_block(np.array([3, 0, 5], dtype=np.int64), 2)
    assert (bytes(w.out), w.acc, w.nbits) == (b"\xf1", 0b01, 2)
    # non-byte-aligned inherited state: 3 seed bits 101, then k=0
    # z=[2] -> "001"; total 101001 = 6 bits, no whole byte drained
    w = FlacWriter()
    w.put(0b101, 3)
    w.put_rice_block(np.array([2], dtype=np.int64), 0)
    assert (bytes(w.out), w.acc, w.nbits) == (b"", 0b101001, 6)


def test_jpeg_put_big_golden_bytes_with_stuffing():
    # a full 0xFF byte MUST be followed by a stuffed 0x00 (T.81)
    j = JpegWriter()
    j.put_big(0xFF, 8)
    assert (bytes(j.out), j.acc, j.nbits) == (b"\xff\x00", 0, 0)
    # stuffed 0xFF at the END of a drain chunk, with a 2-bit tail:
    # 10 one-bits -> top 8 = 0xFF (stuffed), acc keeps 0b11
    j = JpegWriter()
    j.put_big(0b1111111111, 10)
    assert (bytes(j.out), j.acc, j.nbits) == (b"\xff\x00", 0b11, 2)
    # stuffing at both ends of a multi-byte drain, non-FF untouched
    j = JpegWriter()
    j.put_big(0xFFABFF, 24)
    assert (bytes(j.out), j.acc, j.nbits) == (
        b"\xff\x00\xab\xff\x00", 0, 0,
    )
