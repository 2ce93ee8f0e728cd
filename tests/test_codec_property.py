"""Property-based round-trip pinning for the five pure-stdlib codecs
(PNG, WAV, AVI, JPEG entropy layer, GIF LZW): hypothesis sweeps the
geometry/content space the hand-written cases sample. Every codec's
encoder and decoder are independent code paths, so round-trip identity
over randomized inputs pins both against each other — the same law
the q93/q94/q95/q97/q98 oracles pin against DuckDB on the fixture
models, here swept over arbitrary shapes and values (no Spark session:
these run the codecs directly, fast enough for wide sweeps)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from kaj_query_engine_spark.functions.avi import decode_avi, encode_avi
from kaj_query_engine_spark.functions.gif import decode_gif, encode_gif
from kaj_query_engine_spark.functions.jpeg import decode_jpeg, encode_jpeg
from kaj_query_engine_spark.functions.png import decode_png, encode_png
from kaj_query_engine_spark.functions.wav import decode_wav, encode_wav

_SETTINGS = dict(max_examples=30, deadline=None)


@settings(**_SETTINGS)
@given(
    px=arrays(
        np.uint8,
        st.tuples(st.integers(1, 40), st.integers(1, 40)),
        elements=st.integers(0, 255),
    ),
    mode=st.sampled_from(["cycle", "none"]),
)
def test_png_grey_roundtrip(px, mode):
    out = decode_png(encode_png(px, mode))
    assert out.shape == px.shape and (out == px).all()


@settings(**_SETTINGS)
@given(
    px=arrays(
        np.uint8,
        st.tuples(st.integers(1, 24), st.integers(1, 24), st.just(3)),
        elements=st.integers(0, 255),
    ),
    mode=st.sampled_from(["cycle", "none"]),
)
def test_png_rgb_roundtrip(px, mode):
    out = decode_png(encode_png(px, mode))
    assert out.shape == px.shape and (out == px).all()


@settings(**_SETTINGS)
@given(
    px=arrays(
        np.uint8,
        st.one_of(
            st.tuples(st.integers(1, 40), st.integers(1, 40)),
            st.tuples(st.integers(1, 20), st.integers(1, 20), st.just(3)),
        ),
        elements=st.integers(0, 255),
    ),
    mode=st.sampled_from(["cycle", "none"]),
)
def test_png_adam7_roundtrip(px, mode):
    """Adam7 deinterlace is lossless for every geometry — including
    images smaller than the pass grid, where early passes are empty
    (1x1 hits six empty passes)."""
    out = decode_png(encode_png(px, mode, interlace=True))
    assert out.shape == px.shape and (out == px).all()


@settings(**_SETTINGS)
@given(
    px=arrays(
        np.uint16,
        st.tuples(st.integers(1, 32), st.integers(1, 32)),
        elements=st.integers(0, 65535),
    ),
    mode=st.sampled_from(["cycle", "none"]),
    il=st.booleans(),
)
def test_png_grey16_roundtrip(px, mode, il):
    """Depth-16 grayscale: 2-byte filter offset, big-endian samples,
    full 16-bit range, plain and Adam7."""
    out = decode_png(encode_png(px, mode, interlace=il))
    assert out.dtype == np.uint16
    assert out.shape == px.shape and (out == px).all()


@settings(**_SETTINGS)
@given(
    px=arrays(
        np.uint16,
        st.tuples(st.integers(1, 16), st.integers(1, 16), st.just(3)),
        elements=st.integers(0, 65535),
    ),
    mode=st.sampled_from(["cycle", "none"]),
    il=st.booleans(),
)
def test_png_rgb48_roundtrip(px, mode, il):
    """Depth-16 RGB: 6-byte filter offset, sample byte pairs kept
    together through the Adam7 column slicer."""
    out = decode_png(encode_png(px, mode, interlace=il))
    assert out.dtype == np.uint16
    assert out.shape == px.shape and (out == px).all()


@settings(**_SETTINGS)
@given(
    s=arrays(
        np.int16, st.integers(1, 2000), elements=st.integers(-32768, 32767)
    ),
    rate=st.integers(1, 192000),
)
def test_wav_mono_roundtrip(s, rate):
    r, ch, out = decode_wav(encode_wav(s, rate))
    assert (r, ch) == (rate, 1) and np.array_equal(out, s)


@settings(**_SETTINGS)
@given(
    s=arrays(
        np.int16,
        st.tuples(st.integers(1, 500), st.integers(1, 2)),
        elements=st.integers(-32768, 32767),
    ),
    rate=st.integers(1, 96000),
)
def test_wav_multichannel_roundtrip(s, rate):
    r, ch, out = decode_wav(encode_wav(s, rate))
    assert (r, ch) == (rate, s.shape[1])
    assert np.array_equal(out.reshape(s.shape), s)


@settings(**_SETTINGS)
@given(
    f=arrays(
        np.uint8,
        st.tuples(
            st.integers(1, 5),
            st.integers(1, 16),
            st.integers(1, 16),
            st.just(3),
        ),
        elements=st.integers(0, 255),
    ),
    fps=st.integers(1, 120),
)
def test_avi_roundtrip(f, fps):
    got_fps, out = decode_avi(encode_avi(f, fps))
    assert got_fps == fps and np.array_equal(out, f)


@settings(**_SETTINGS)
@given(
    f=arrays(
        np.uint8,
        st.tuples(
            st.integers(1, 4), st.integers(1, 10), st.integers(1, 10),
            st.just(3),
        ),
        elements=st.integers(0, 255),
    ),
    ns=st.integers(1, 400),
    rate=st.integers(1, 192000),
    seed=st.integers(0, 2**31 - 1),
)
def test_avi_audio_mux_roundtrip(f, ns, rate, seed):
    """An interleaved PCM stream demuxes byte-exactly and is invisible
    to the video path — including sample counts that don't divide
    evenly across frames."""
    from kaj_query_engine_spark.functions.avi import decode_avi_av

    rng = np.random.default_rng(seed)
    au = rng.integers(-32768, 32768, ns).astype(np.int16)
    data = encode_avi(f, 10, audio=au, audio_rate=rate)
    fps, frames, got_rate, got_audio = decode_avi_av(data)
    assert fps == 10 and np.array_equal(frames, f)
    assert got_rate == rate and np.array_equal(got_audio, au)
    # video-only view ignores the audio stream cleanly
    fps2, frames2 = decode_avi(data)
    assert np.array_equal(frames2, f)


@settings(**_SETTINGS)
@given(
    dcs=st.lists(
        st.lists(st.integers(-1023, 1023), min_size=2, max_size=6),
        min_size=1,
        max_size=4,
    ),
    bx=st.integers(1, 3),
    fps=st.integers(1, 120),
)
def test_avi_mjpeg_roundtrip(dcs, bx, fps):
    """Motion-JPEG AVI: the entropy layer survives the container (the
    coefficient payload of every frame round-trips bit-exactly), and
    the demuxed pixels equal decoding each standalone JPEG — the
    compressed-video composition of the RIFF and JPEG codecs."""
    from kaj_query_engine_spark.functions.avi import encode_avi_mjpeg
    from kaj_query_engine_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    nb = len(dcs[0])
    by = -(-nb // bx)
    jpegs = []
    for frame_dcs in dcs:
        co = np.zeros((bx * by, 64), dtype=np.int64)
        take = min(len(frame_dcs), nb)
        co[:take, 0] = frame_dcs[:take]
        jpegs.append(encode_jpeg(co, by * 8, bx * 8))
    got_fps, frames = decode_avi(
        encode_avi_mjpeg(jpegs, bx * 8, by * 8, fps=fps)
    )
    assert got_fps == fps and frames.shape == (len(dcs), by * 8, bx * 8, 3)
    for i, j in enumerate(jpegs):
        _h, _w, px, _ = decode_jpeg(j)
        assert np.array_equal(frames[i], np.repeat(px[:, :, None], 3, 2))
    # geometry mismatch between header and frames fails loudly
    with pytest.raises(ValueError, match="geometry"):
        decode_avi(encode_avi_mjpeg(jpegs, bx * 8 + 8, by * 8, fps=fps))


@st.composite
def _jpeg_blocks(draw):
    bx = draw(st.integers(1, 3))
    by = draw(st.integers(1, 3))
    h = by * 8 - draw(st.integers(0, 7))
    w = bx * 8 - draw(st.integers(0, 7))
    co = np.zeros((bx * by, 64), dtype=np.int64)
    for b in range(bx * by):
        co[b, 0] = draw(st.integers(-1023, 1023))
        for k in draw(
            st.lists(st.integers(1, 63), max_size=14, unique=True)
        ):
            co[b, k] = draw(st.integers(-1023, 1023))
    return co, h, w


@settings(**_SETTINGS)
@given(blocks=_jpeg_blocks())
def test_jpeg_entropy_layer_roundtrip(blocks):
    co, h, w = blocks
    H, W, _px, cd = decode_jpeg(encode_jpeg(co, h, w))
    assert (H, W) == (h, w) and np.array_equal(cd, co)


@settings(**_SETTINGS)
@given(blocks=_jpeg_blocks(), ri=st.sampled_from([0, 1, 3]))
def test_jpeg_color_roundtrip(blocks, ri):
    """YCbCr 4:4:4: three interleaved component blocks per MCU, three
    DC predictor chains, chroma table routing — the coefficient layer
    stays lossless with and without restart framing."""
    co, h, w = blocks
    rng = np.random.default_rng(int(abs(co).sum()) % 2**31)
    c3 = np.stack([co, np.roll(co, 1, axis=1), rng.permutation(co)], axis=1)
    c3[:, :, 0] = np.clip(c3[:, :, 0], -1023, 1023)
    H, W, px, dec = decode_jpeg(
        encode_jpeg(c3, h, w, restart_interval=ri)
    )
    assert (H, W) == (h, w) and px.shape == (h, w, 3)
    assert np.array_equal(dec, c3)


@settings(**_SETTINGS)
@given(
    p=arrays(
        np.uint8,
        st.tuples(st.integers(1, 24), st.integers(1, 24), st.just(3)),
        elements=st.integers(0, 255),
    )
)
def test_ycbcr_to_rgb_fixed_point(p):
    """The JFIF fixed-point transform tracks the float matrix within
    one code per channel and keeps the neutral (grey) axis exact."""
    from kaj_query_engine_spark.functions.jpeg import ycbcr_to_rgb

    got = ycbcr_to_rgb(p).astype(np.float64)
    y = p[..., 0].astype(np.float64)
    cb = p[..., 1].astype(np.float64) - 128
    cr = p[..., 2].astype(np.float64) - 128
    ref = np.clip(
        np.stack(
            [
                y + 1.402 * cr,
                y - 0.344136 * cb - 0.714136 * cr,
                y + 1.772 * cb,
            ],
            axis=2,
        ),
        0,
        255,
    )
    assert np.abs(got - ref).max() <= 1.0
    grey = p.copy()
    grey[..., 1:] = 128
    assert (ycbcr_to_rgb(grey) == grey[..., 0:1]).all()


@settings(**_SETTINGS)
@given(
    mw=st.integers(1, 3),
    mh=st.integers(1, 3),
    trim_h=st.integers(0, 15),
    trim_w=st.integers(0, 15),
    ri=st.sampled_from([0, 1, 2]),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_420_roundtrip(mw, mh, trim_h, trim_w, ri, seed):
    """4:2:0 MCU interleave (4 Y + Cb + Cr per 16x16 tile) is lossless
    at the coefficient layer for any geometry, including images that
    end mid-MCU (padding blocks) and restart framing."""
    h = max(1, mh * 16 - trim_h)
    w = max(1, mw * 16 - trim_w)
    n_mcu = ((w + 15) // 16) * ((h + 15) // 16)
    rng = np.random.default_rng(seed)
    co = np.zeros((n_mcu, 6, 64), dtype=np.int64)
    co[..., 0] = rng.integers(-1023, 1024, (n_mcu, 6))
    m = rng.random((n_mcu, 6, 63)) < 0.15
    co[..., 1:][m] = rng.integers(-1023, 1024, m.sum())
    H, W, px, dec = decode_jpeg(
        encode_jpeg(co, h, w, restart_interval=ri, subsampling="420")
    )
    assert (H, W) == (h, w) and px.shape == (h, w, 3)
    assert np.array_equal(dec, co)


@settings(**_SETTINGS)
@given(blocks=_jpeg_blocks(), ri=st.integers(1, 10))
def test_jpeg_restart_marker_roundtrip(blocks, ri):
    """DRI/RSTm framing is transparent at the coefficient layer:
    byte-aligned fill, marker cadence, and per-segment DC predictor
    reset must reproduce the exact coefficients (and pixels) of the
    unframed encoding."""
    co, h, w = blocks
    plain = decode_jpeg(encode_jpeg(co, h, w))
    rst = decode_jpeg(encode_jpeg(co, h, w, restart_interval=ri))
    assert np.array_equal(rst[3], co)
    assert np.array_equal(rst[2], plain[2])


def test_jpeg_jfif_app0_and_foreign_segment_skip():
    """Encoded files carry a JFIF APP0; the decoder skips APPn/COM
    segments generically (length-framed, per T.81 B.1.1.4)."""
    import struct

    co = np.zeros((2, 64), dtype=np.int64)
    co[:, 0] = [5, -5]
    data = encode_jpeg(co, 8, 16)
    assert data[2:4] == b"\xff\xe0" and data[6:11] == b"JFIF\x00"
    com = struct.pack(">HH", 0xFFFE, 7) + b"hello"
    app9 = struct.pack(">HH", 0xFFE9, 5) + b"xyz"
    patched = data[:2] + com + app9 + data[2:]
    assert np.array_equal(decode_jpeg(patched)[3], co)


def test_jpeg_restart_marker_cycle_and_errors():
    """>8 restarts exercises the RSTm mod-8 cycle; a stripped DRI or
    an out-of-order marker id must raise, not mis-decode."""
    import pytest

    co = np.zeros((20, 64), dtype=np.int64)
    co[:, 0] = np.arange(20) - 10
    data = encode_jpeg(co, 8, 160, restart_interval=1)
    assert np.array_equal(decode_jpeg(data)[3], co)

    no_dri = bytearray(data)
    i = no_dri.find(b"\xff\xdd")
    del no_dri[i : i + 6]
    with pytest.raises(ValueError, match="no DRI"):
        decode_jpeg(bytes(no_dri))

    bad_seq = bytearray(data)
    j = bad_seq.find(b"\xff\xd0", bad_seq.find(b"\xff\xda"))
    bad_seq[j + 1] = 0xD5
    with pytest.raises(ValueError, match="out of sequence"):
        decode_jpeg(bytes(bad_seq))


@settings(**_SETTINGS)
@given(
    idx=arrays(
        np.uint8,
        st.tuples(st.integers(1, 48), st.integers(1, 48)),
        elements=st.integers(0, 255),
    )
)
def test_gif_roundtrip(idx):
    out = decode_gif(encode_gif(idx))
    assert out.shape == (*idx.shape, 3)
    assert (out == idx[:, :, None]).all()


@settings(**_SETTINGS)
@given(
    idx=arrays(
        np.uint8,
        st.tuples(st.integers(1, 48), st.integers(1, 48)),
        elements=st.integers(0, 255),
    )
)
def test_gif_interlaced_roundtrip(idx):
    """The four-pass row interleave deinterlaces losslessly at every
    height — including h < 8 where later passes carry most rows."""
    out = decode_gif(encode_gif(idx, interlace=True))
    assert (out == idx[:, :, None]).all()


@settings(max_examples=8, deadline=None)
@given(
    val=st.integers(0, 255),
    h=st.integers(30, 80),
    w=st.integers(30, 80),
)
def test_gif_dictionary_pressure_roundtrip(val, h, w):
    """Low-entropy images drive the LZW dictionary through growth and
    CLEAR resets — the regime where width-timing bugs live."""
    idx = np.full((h, w), val, dtype=np.uint8)
    idx[::3, :] = (val + 1) % 256
    out = decode_gif(encode_gif(idx))
    assert (out == idx[:, :, None]).all()


@settings(**_SETTINGS)
@given(
    s=arrays(
        np.int16, st.integers(1, 1500), elements=st.integers(-32768, 32767)
    ),
    rate=st.integers(1, 192000),
    bs=st.sampled_from([16, 64, 256, 4096]),
    order=st.sampled_from([None, 0, 1, 2]),
    lpc=st.sampled_from([None, 1, 2, 8, 32]),
)
def test_flac_roundtrip(s, rate, bs, order, lpc):
    from kaj_query_engine_spark.functions.flac import decode_flac, encode_flac

    kw = {"lpc_order": lpc} if lpc is not None else {"force_order": order}
    r, out = decode_flac(encode_flac(s, rate, block_size=bs, **kw))
    assert r == rate and np.array_equal(out, s)


@settings(**_SETTINGS)
@given(
    s=arrays(
        np.int16,
        st.tuples(st.integers(1, 800), st.just(2)),
        elements=st.integers(-32768, 32767),
    ),
    bs=st.sampled_from([16, 64, 256]),
    mode=st.sampled_from(
        ["independent", "left-side", "right-side", "mid-side"]
    ),
    order=st.sampled_from([None, 0, 2]),
    lpc=st.sampled_from([None, 2]),
)
def test_flac_stereo_roundtrip(s, bs, mode, order, lpc):
    """All four channel assignments are lossless at full int16 range —
    side channels hit 17 bits at the extremes, mid-side exercises the
    dropped-sum-bit parity recovery."""
    from kaj_query_engine_spark.functions.flac import decode_flac, encode_flac

    kw = {"lpc_order": lpc} if lpc is not None else {"force_order": order}
    if kw == {"force_order": None}:
        kw = {}
    r, out = decode_flac(
        encode_flac(s, 44100, block_size=bs, channel_mode=mode, **kw)
    )
    assert r == 44100 and out.shape == s.shape and np.array_equal(out, s)


@settings(**_SETTINGS)
@given(
    f=arrays(
        np.uint8,
        st.tuples(st.integers(1, 20), st.integers(1, 20), st.just(4)),
        elements=st.integers(0, 255),
    ),
    il=st.booleans(),
)
def test_png_rgba_roundtrip(f, il):
    assert np.array_equal(decode_png(encode_png(f, interlace=il)), f)


@settings(**_SETTINGS)
@given(
    idx=arrays(
        np.uint8,
        st.tuples(st.integers(1, 20), st.integers(1, 20)),
        elements=st.integers(0, 255),
    ),
    il=st.booleans(),
)
def test_png_palette_roundtrip(idx, il):
    pal = np.stack(
        [np.arange(256), 255 - np.arange(256), (np.arange(256) * 7) % 256],
        axis=1,
    ).astype(np.uint8)
    out = decode_png(encode_png(idx, interlace=il, palette=pal))
    assert np.array_equal(out, pal[idx])
    # narrow palettes validate index range at encode time
    with pytest.raises(ValueError, match="index out of range"):
        encode_png(np.full((2, 2), 5, np.uint8), palette=pal[:4])


@settings(**_SETTINGS)
@given(
    s=arrays(np.uint8, st.integers(1, 600), elements=st.integers(0, 255)),
    rate=st.integers(1, 96000),
)
def test_wav_pcm8_roundtrip(s, rate):
    """8-bit PCM is offset-binary UNSIGNED per spec — bytes round-trip
    as stored, dtype uint8."""
    r, ch, out = decode_wav(encode_wav(s, rate, bits=8))
    assert (r, ch) == (rate, 1) and out.dtype == np.uint8
    assert np.array_equal(out, s)


@settings(**_SETTINGS)
@given(
    s=arrays(
        np.int32,
        st.one_of(
            st.integers(1, 300),
            st.tuples(st.integers(1, 150), st.just(2)),
        ),
        elements=st.integers(-(1 << 23), (1 << 23) - 1),
    ),
    rate=st.integers(1, 192000),
)
def test_wav_pcm24_roundtrip(s, rate):
    """24-bit PCM: 3-byte little-endian packing and SIGN EXTENSION
    round-trip the full signed range, mono and stereo."""
    r, ch, out = decode_wav(encode_wav(s, rate, bits=24))
    assert out.dtype == np.int32
    assert np.array_equal(out.reshape(s.shape), s)
    with pytest.raises(ValueError, match="fit in"):
        encode_wav(np.array([1 << 23], np.int32), rate, bits=24)


@settings(**_SETTINGS)
@given(
    n=st.integers(17, 300),
    porder=st.integers(0, 4),
    bs=st.sampled_from([16, 64, 96]),
    lpc=st.one_of(st.none(), st.integers(1, 4)),
    seed=st.integers(0, 2**31 - 1),
)
def test_flac_partitioned_rice_roundtrip(n, porder, bs, lpc, seed):
    """Partitioned-Rice residuals (per-partition parameters, spec
    §9.2.7) round-trip at every legal partition order, with the
    auto-clamp keeping short/indivisible tail frames legal."""
    from kaj_query_engine_spark.functions.flac import decode_flac, encode_flac

    rng = np.random.default_rng(seed)
    s = rng.integers(-3000, 3000, n).astype(np.int16)
    e = encode_flac(s, 8000, block_size=bs, lpc_order=lpc, rice_porder=porder)
    rate, out = decode_flac(e)
    assert np.array_equal(out, s)


# ---- hostile-input guards (round-8 ADVICE items) -------------------


def test_jpeg_hostile_dc_category_rejected_clearly():
    """A DHT carrying a DC symbol > 11 (T.81 table F.1's max category)
    must raise a descriptive ValueError at LUT build, not Python's
    opaque 'negative shift count' from deep inside the decode loop."""
    from kaj_query_engine_spark.functions.jpeg import _huff_lut

    with pytest.raises(ValueError, match="DC category"):
        _huff_lut(bytes([1] + [0] * 15), bytes([26]), dc=True)
    # the same symbol is a VALID AC symbol (run=1, size=10): no dc flag,
    # no rejection
    assert _huff_lut(bytes([1] + [0] * 15), bytes([26]))[0] != 0


def test_avi_frame_chunk_tag_must_match_declared_codec():
    """A DIB-declared AVI carrying 00dc (compressed) frame chunks is a
    codec mismatch, not raw DIB data that happens to parse — and the
    reverse for MJPG carrying 00db."""
    f = np.zeros((2, 8, 8, 3), dtype=np.uint8)
    data = bytearray(encode_avi(f, 10))
    i = data.find(b"00db")
    assert i > 0
    data[i : i + 4] = b"00dc"
    with pytest.raises(ValueError, match="disagrees with the declared codec"):
        decode_avi(bytes(data))


def test_flac_runaway_predictor_raises_valueerror_not_overflow():
    """A corrupt stream whose fixed-predictor accumulation exceeds
    int64 must keep the documented ValueError contract (not escape as
    OverflowError). Craft an order-4 FIXED subframe with ±2³¹ warmup
    at 32 bps and all-zero residuals: zero residuals make the 4th
    difference zero, so samples follow the cubic −8A·C(n,3) through
    the alternating warmup — past int64 well before sample 4096."""
    from kaj_query_engine_spark.functions.flac import (
        _BitReader,
        _BitWriter,
        _read_subframe,
    )

    bw = _BitWriter()
    bw.put(0, 1)  # subframe pad bit
    bw.put(12, 6)  # FIXED, order 4
    bw.put(0, 1)  # no wasted bits
    A = (1 << 31) - 1
    for v in (A, -A, A, -A):  # warmup: huge alternating 3rd difference
        bw.put(v & 0xFFFFFFFF, 32)
    bw.put(0, 2)  # residual method: 4-bit Rice
    bw.put(0, 4)  # partition order 0
    bw.put(0, 4)  # Rice k = 0
    for _ in range(4096 - 4):
        bw.put(1, 1)  # unary-coded zero residual
    bw.align()
    with pytest.raises(ValueError, match="int64"):
        _read_subframe(_BitReader(bw.bytes()), 4096, 32)


def test_kmeans_int_rejects_zero_iterations(spark):
    from kaj_query_engine_spark.operators.clustering import kmeans_int

    vecs = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0, 4.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="iterations"):
        kmeans_int(vecs, "vec_id", "embedding", k=2, iterations=0)


def test_flac_lpc_runaway_predictor_also_valueerror():
    """Review follow-up to the FIXED-branch guard: the LPC branch's
    int64 store has the identical OverflowError exposure. Craft an LPC
    order-2 subframe (coefficients ~2 at shift 0 — an exponentially
    diverging recurrence no real encoder emits) with huge warmup and
    zero residuals."""
    from kaj_query_engine_spark.functions.flac import (
        _BitReader,
        _BitWriter,
        _read_subframe,
    )

    bw = _BitWriter()
    bw.put(0, 1)  # pad
    bw.put(32 | (2 - 1), 6)  # LPC, order 2
    bw.put(0, 1)  # no wasted bits
    A = (1 << 31) - 1
    for v in (A, A):  # warmup
        bw.put(v & 0xFFFFFFFF, 32)
    bw.put(3 - 1, 4)  # qlp precision code: 3 bits
    bw.put(0, 5)  # shift 0
    for c in (2, 2):  # coefficients +2, +2 -> v_n ~ 4^n * A
        bw.put(c, 3)
    bw.put(0, 2)  # Rice method 0
    bw.put(0, 4)  # partition order 0
    bw.put(0, 4)  # k = 0
    for _ in range(64 - 2):
        bw.put(1, 1)  # zero residuals
    bw.align()
    with pytest.raises(ValueError, match="int64"):
        _read_subframe(_BitReader(bw.bytes()), 64, 32)
