"""PNG / baseline-JPEG codecs (VERDICT r3 missing #3): pure numpy +
stdlib zlib, no PIL/av. PNG round-trips byte-exactly through every
scanline filter and color type; a hand-built PNG (constructed here with
struct/zlib, NOT via encode_png) guards against shared encoder/decoder
bugs; JPEG at quantizer-1 quality is near-lossless, and 4:2:0 / gray /
restartless bitstreams parse."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from ecc_spark.ops.codecs import (
    PNG_MAGIC,
    decode_jpeg,
    decode_png,
    encode_jpeg,
    encode_png,
)


def _rng(seed: int = 5) -> np.random.Generator:
    return np.random.default_rng(seed)


# ------------------------------ PNG ----------------------------------


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_rgb_every_filter(filter_type):
    px = _rng(filter_type).integers(0, 256, (13, 17, 3), dtype=np.uint8)
    got = decode_png(encode_png(px, filter_type=filter_type))
    assert got.tolist() == px.tolist()


@pytest.mark.parametrize("shape", [(9, 7), (9, 7, 2), (9, 7, 3), (9, 7, 4)])
def test_png_roundtrip_color_types(shape):
    px = _rng(len(shape)).integers(0, 256, shape, dtype=np.uint8)
    got = decode_png(encode_png(px, filter_type=4))
    assert got.shape == shape
    assert got.tolist() == px.tolist()


def test_png_handbuilt_gray_with_sub_filter():
    """A PNG built from raw chunks here — an independent producer, so a
    matching bug in encode_png cannot mask a decode_png defect. 2x3
    gray, row 0 filter None, row 1 filter Sub (stored deltas)."""
    w, h = 3, 2
    row0 = bytes([0, 10, 20, 30])  # filter 0: literal 10 20 30
    row1 = bytes([1, 5, 7, 256 - 3])  # filter 1: 5, 5+7=12, 12-3=9
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    payload = (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(row0 + row1))
        + chunk(b"IEND", b"")
    )
    assert decode_png(payload).tolist() == [[10, 20, 30], [5, 12, 9]]


def test_png_palette_decodes_through_plte():
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
    idx_rows = bytes([0, 0, 1, 2]) + bytes([0, 2, 1, 0])  # filter byte + 3 px
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0)

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    payload = (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(idx_rows))
        + chunk(b"IEND", b"")
    )
    got = decode_png(payload)
    assert got.tolist() == [
        [[255, 0, 0], [0, 255, 0], [0, 0, 255]],
        [[0, 0, 255], [0, 255, 0], [255, 0, 0]],
    ]


def test_png_rejects_corruption_and_unsupported():
    px = _rng(1).integers(0, 256, (4, 4), dtype=np.uint8)
    good = bytearray(encode_png(px))
    # flip a byte inside IDAT -> CRC must catch it
    good[len(good) // 2] ^= 0xFF
    with pytest.raises(ValueError):
        decode_png(bytes(good))
    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\x00" + b"rest")
    # unknown interlace method (2) refused loudly, not mis-decoded
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 2)
    payload = (
        PNG_MAGIC
        + struct.pack(">I", 13)
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
        + struct.pack(">I", 0)
        + b"IEND"
        + struct.pack(">I", zlib.crc32(b"IEND"))
    )
    with pytest.raises(ValueError, match="filtering"):
        decode_png(payload)


# ------------------------------ JPEG ---------------------------------


def test_jpeg_quality100_near_lossless_rgb():
    """quality=100 -> all-ones quant tables: the only loss is DCT + color
    rounding, so every channel lands within a few counts."""
    px = _rng(2).integers(0, 256, (24, 31, 3), dtype=np.uint8)
    got = decode_jpeg(encode_jpeg(px, quality=100))
    assert got.shape == px.shape
    err = np.abs(got.astype(int) - px.astype(int))
    assert err.max() <= 4
    assert err.mean() < 1.0


def test_jpeg_gray_roundtrip_tight():
    px = _rng(3).integers(0, 256, (16, 16), dtype=np.uint8)
    got = decode_jpeg(encode_jpeg(px, quality=100))
    assert got.shape == px.shape
    assert np.abs(got.astype(int) - px.astype(int)).max() <= 2


def test_jpeg_smooth_gradient_survives_default_quality():
    """A smooth gradient (what quantization preserves) reconstructs
    closely at quality 90 — distinguishes a working transform chain from
    one that merely rearranges bytes."""
    y, x = np.mgrid[0:32, 0:40]
    px = ((x * 4 + y * 2) % 256).astype(np.uint8)
    px = np.stack([px, 255 - px, np.full_like(px, 128)], axis=-1)
    got = decode_jpeg(encode_jpeg(px, quality=90))
    assert np.abs(got.astype(int) - px.astype(int)).mean() < 6


def test_jpeg_420_subsampling_roundtrip():
    """4:2:0 MCU interleave (2x2 Y + Cb + Cr). Flat chroma (gray image)
    must survive nearly exactly — subsampling only averages Cb=Cr=128 —
    so a tight bound here isolates MCU/DC-pred/interleave bugs from the
    inherent chroma-averaging loss (noisy chroma measures ~14 mean err
    by construction, not by defect)."""
    rng = _rng(4)
    gray = rng.integers(0, 256, (20, 28), dtype=np.uint8)
    px = np.repeat(gray[..., None], 3, axis=-1)
    got = decode_jpeg(encode_jpeg(px, quality=100, subsample=True))
    assert got.shape == px.shape
    assert np.abs(got.astype(int) - px.astype(int)).max() <= 2
    # smooth (low-frequency) chroma survives the box-average closely
    y, x = np.mgrid[0:20, 0:28]
    smooth = np.stack(
        [(x * 5) % 256, (y * 6) % 256, ((x + y) * 3) % 256], axis=-1
    ).astype(np.uint8)
    got_s = decode_jpeg(encode_jpeg(smooth, quality=100, subsample=True))
    assert np.abs(got_s.astype(int) - smooth.astype(int)).mean() < 8


def test_jpeg_odd_dimensions_pad_and_crop():
    px = _rng(6).integers(0, 256, (9, 11, 3), dtype=np.uint8)
    for sub in (False, True):
        got = decode_jpeg(encode_jpeg(px, quality=100, subsample=sub))
        assert got.shape == px.shape


def test_jpeg_rejects_progressive_and_garbage():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x00not a jpeg")
    # a minimal stream with SOF2 (progressive) must refuse, not mis-parse
    sof2 = b"\xff\xd8" + b"\xff\xc2" + struct.pack(">H", 8) + b"\x08\x00\x08\x00\x08\x01"
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(sof2)


def test_jpeg_byte_stuffing_exercised():
    """An image whose entropy stream contains 0xFF bytes must stuff/
    un-stuff transparently. High-frequency noise at quality 100 makes
    0xFF-bearing codes overwhelmingly likely; assert the stream really
    contains stuffed pairs so the test can't pass vacuously."""
    px = _rng(7).integers(0, 256, (32, 32), dtype=np.uint8)
    payload = encode_jpeg(px, quality=100)
    assert b"\xff\x00" in payload
    got = decode_jpeg(payload)
    assert np.abs(got.astype(int) - px.astype(int)).max() <= 2


# ------------------------------ MP4 ----------------------------------


def test_mp4_mux_probe_demux_roundtrip():
    from ecc_spark.ops.codecs import demux_mp4, encode_mp4, probe_mp4

    samples = [bytes([i]) * (10 + 7 * i) for i in range(5)]
    payload = encode_mp4(samples, width=64, height=48, sample_duration_ms=40)
    meta = probe_mp4(payload)
    assert (meta["width"], meta["height"]) == (64, 48)
    assert meta["duration_ms"] == 5 * 40
    assert meta["sample_sizes"] == [len(s) for s in samples]
    assert meta["sample_ts_ms"] == [0, 40, 80, 120, 160]
    assert demux_mp4(payload) == samples


def test_mp4_largesize_and_v1_mvhd():
    """The probe must honor 64-bit largesize boxes and version-1 mvhd —
    shapes real >4 GiB files use. Built by surgically rewriting the
    muxer's v0 output so the probe faces bytes the muxer never emits."""
    import struct

    from ecc_spark.ops.codecs import encode_mp4, probe_mp4

    payload = encode_mp4([b"xyz"], width=8, height=8, sample_duration_ms=100)
    # rewrite the ftyp box header to size=1 + 64-bit largesize
    (sz,) = struct.unpack(">I", payload[0:4])
    rewritten = (
        struct.pack(">I", 1)
        + payload[4:8]
        + struct.pack(">Q", sz + 8)
        + payload[8 : sz]
        + payload[sz:]
    )
    # stco offsets shift by the 8 inserted bytes: find and patch it
    i = rewritten.find(b"stco")
    (old_off,) = struct.unpack(">I", rewritten[i + 12 : i + 16])
    rewritten = (
        rewritten[: i + 12] + struct.pack(">I", old_off + 8) + rewritten[i + 16 :]
    )
    meta = probe_mp4(rewritten)
    assert meta["sample_sizes"] == [3]
    assert rewritten[meta["sample_offsets"][0] :][:3] == b"xyz"
    # version-1 mvhd: 64-bit duration at a different layout
    j = payload.find(b"mvhd")
    body = payload[j + 4 :]
    v1 = (
        b"\x01\x00\x00\x00"
        + struct.pack(">QQIQ", 0, 0, 1000, 4500)  # created, modified, timescale, duration
        + body[4 + 16 :]  # keep rate/volume/matrix tail (layout past duration)
    )
    v1box = struct.pack(">I", 8 + len(v1)) + b"mvhd" + v1
    k = j - 4  # start of the original mvhd box header
    (old_sz,) = struct.unpack(">I", payload[k : k + 4])
    patched = payload[:k] + v1box + payload[k + old_sz :]
    # moov size grew: patch its header too
    m = patched.find(b"moov") - 4
    (moov_sz,) = struct.unpack(">I", patched[m : m + 4])
    patched = (
        patched[:m]
        + struct.pack(">I", moov_sz + len(v1box) - old_sz)
        + patched[m + 4 :]
    )
    meta = probe_mp4(patched)
    assert meta["timescale"] == 1000
    assert meta["duration_ms"] == 4500


def test_mp4_rejects_garbage():
    from ecc_spark.ops.codecs import probe_mp4

    with pytest.raises(ValueError):
        probe_mp4(b"\x00\x01\x02\x03nope" * 10)
    with pytest.raises(ValueError):
        probe_mp4(struct.pack(">I", 16) + b"ftypisom\x00\x00\x00\x00")  # no moov


# ------------------- review-finding regressions ----------------------


@pytest.mark.parametrize("subsample", [False, True])
def test_jpeg_restart_markers_roundtrip(subsample):
    """DRI/RSTn (review finding #1): DC predictors reset and the stream
    re-aligns at every interval. The payload must really contain RST
    markers (non-vacuous), and a restartful stream must decode as
    tightly as a restartless one — the old decoder produced max-error
    ~229 garbage here. (Flat chroma under 4:2:0: subsampling loss must
    not mask a restart bug behind an inherently loose bound.)"""
    if subsample:
        px = np.repeat(_rng(11).integers(0, 256, (24, 40), dtype=np.uint8)[..., None], 3, -1)
    else:
        px = _rng(11).integers(0, 256, (24, 40, 3), dtype=np.uint8)
    payload = encode_jpeg(px, quality=100, subsample=subsample, restart_interval=2)
    assert any(
        bytes([0xFF, 0xD0 + k]) in payload for k in range(8)
    ), "no RST marker emitted"
    got = decode_jpeg(payload)
    assert np.abs(got.astype(int) - px.astype(int)).max() <= 4


def test_jpeg_restart_gray_and_counter_wrap():
    """Gray MCUs are single blocks, so a small interval crosses many
    boundaries and the RSTn counter must wrap mod 8 (>8 intervals)."""
    px = _rng(12).integers(0, 256, (24, 32), dtype=np.uint8)  # 12 MCUs
    payload = encode_jpeg(px, quality=100, restart_interval=1)  # 11 RSTs
    assert bytes([0xFF, 0xD0]) in payload and bytes([0xFF, 0xD8 - 1 + 1]) in payload
    got = decode_jpeg(payload)
    assert np.abs(got.astype(int) - px.astype(int)).max() <= 2


def test_jpeg_rejects_non_interleaved_multi_scan():
    """Review finding #4: a scan over a component subset must refuse
    loudly instead of silently discarding chroma."""
    px = _rng(13).integers(0, 256, (8, 8, 3), dtype=np.uint8)
    payload = bytearray(encode_jpeg(px, quality=100))
    i = payload.find(b"\xff\xda")
    # rewrite the SOS header from 3 components to 1 (Y only)
    new_sos = b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
    old_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
    patched = bytes(payload[:i]) + new_sos + bytes(payload[i + 2 + old_len :])
    with pytest.raises(ValueError, match="non-interleaved"):
        decode_jpeg(patched)


def test_mp4_multi_entry_stsc_chunk_map():
    """Review finding #2: full stsc semantics — an entry runs from its
    first_chunk until the next entry's. chunks=[1, 2, 2] produces two
    stsc entries ((1,1),(2,2)) and three stco offsets; every sample must
    demux to its exact bytes."""
    from ecc_spark.ops.codecs import demux_mp4, encode_mp4, probe_mp4

    samples = [bytes([i]) * (5 + i) for i in range(5)]
    payload = encode_mp4(samples, 8, 8, chunks=[1, 2, 2])
    meta = probe_mp4(payload)
    assert meta["sample_sizes"] == [len(s) for s in samples]
    assert len(meta["sample_offsets"]) == 5
    assert demux_mp4(payload) == samples
    # and a ragged split that exercises the run-length stsc encoding
    payload2 = encode_mp4(samples, 8, 8, chunks=[2, 1, 1, 1])
    assert demux_mp4(payload2) == samples
    # the multi-entry layout must actually be present, not normalized away
    i = payload.find(b"stsc")
    (n_ent,) = struct.unpack(">I", payload[i + 8 : i + 12])
    assert n_ent == 2


def test_mp4_multi_track_selects_video_trak():
    """Review finding #3: with an audio trak FIRST (the common muxed
    layout), the probe must still describe the video track. Built by
    cloning the video trak into a fake audio trak (hdlr 'soun', bogus
    stsz) and prepending it inside moov."""
    from ecc_spark.ops.codecs import encode_mp4, probe_mp4

    samples = [b"video-sample-one", b"video-two"]
    payload = encode_mp4(samples, 32, 24, sample_duration_ms=50)
    i_moov = payload.find(b"moov") - 4
    i_trak = payload.find(b"trak", i_moov) - 4
    (trak_sz,) = struct.unpack(">I", payload[i_trak : i_trak + 4])
    trak = bytearray(payload[i_trak : i_trak + trak_sz])
    # clone → audio: hdlr 'vide' → 'soun', stsz sizes → bogus
    j = trak.find(b"hdlr")
    assert trak[j + 12 : j + 16] == b"vide"
    trak[j + 12 : j + 16] = b"soun"
    k = trak.find(b"stsz")
    trak[k + 16 : k + 20] = struct.pack(">I", 2)  # fixed-size 2 "audio" samples
    audio = bytes(trak)
    (moov_sz,) = struct.unpack(">I", payload[i_moov : i_moov + 4])
    patched = (
        payload[:i_moov]
        + struct.pack(">I", moov_sz + len(audio))
        + payload[i_moov + 4 : i_trak]
        + audio
        + payload[i_trak:]
    )
    meta = probe_mp4(patched)
    assert (meta["width"], meta["height"]) == (32, 24)
    assert meta["sample_sizes"] == [len(s) for s in samples]


# ------------------------------ GIF ----------------------------------


def test_gif_roundtrip_gray_rgb_and_table_growth():
    from ecc_spark.ops.codecs import decode_gif, encode_gif

    rng = _rng(21)
    g = rng.integers(0, 256, (23, 31), dtype=np.uint8)
    assert (decode_gif(encode_gif(g)) == np.repeat(g[:, :, None], 3, 2)).all()
    pal = rng.integers(0, 256, (17, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 17, (40, 50))]
    assert (decode_gif(encode_gif(img)) == img).all()
    # large random image: LZW table must cross the 12-bit ceiling and
    # emit CLEAR mid-stream (60k pixels, fresh sequences throughout)
    big = pal[rng.integers(0, 17, (200, 300))]
    assert (decode_gif(encode_gif(big)) == big).all()


def test_gif_handbuilt_naive_lzw():
    """An independent producer: a 4x1 two-color GIF whose LZW stream is
    hand-packed literal codes (clear, 1, 0, 1, 1, end) — a shared
    encoder/decoder bug cannot mask a decode defect."""
    from ecc_spark.ops.codecs import decode_gif

    # mcs=2 -> clear=4, end=5, width starts at 3. The decoder's table
    # (4 roots + clear/end) grows by one per data code after the first;
    # it reaches 8 entries right after the THIRD data code, so the
    # fourth code and END must be written at width 4 (LZW "early
    # change" bookkeeping the producer must mirror).
    codes = [(4, 3), (1, 3), (0, 3), (1, 3), (1, 4), (5, 4)]
    acc = nbits = 0
    data = bytearray()
    for c, width in codes:
        acc |= c << nbits
        nbits += width
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        data.append(acc & 0xFF)
    gct = bytes([10, 20, 30, 200, 210, 220]) + bytes(6)  # 4-entry table
    payload = (
        b"GIF87a"
        + struct.pack("<HH", 4, 1)
        + bytes([0x81, 0, 0])  # GCT, 2 bits -> 4 entries
        + gct
        + b"\x2c"
        + struct.pack("<HHHH", 0, 0, 4, 1)
        + b"\x00"
        + bytes([2])  # min code size
        + bytes([len(data)])
        + bytes(data)
        + b"\x00\x3b"
    )
    got = decode_gif(payload)
    assert got.tolist() == [
        [[200, 210, 220], [10, 20, 30], [200, 210, 220], [200, 210, 220]]
    ]


def test_gif_interlaced_rows_reordered():
    """Interlace: store rows in 4-pass order, set the flag, decode must
    put them back. Built by permuting the image before encoding and
    flipping the interlace bit in the image descriptor."""
    from ecc_spark.ops.codecs import decode_gif, encode_gif

    rng = _rng(22)
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 8, (8, 5))]
    pass_order = [0, 4, 2, 6, 1, 3, 5, 7]  # h=8: pass starts 0/4/2/1
    payload = bytearray(encode_gif(img[pass_order]))
    i = payload.index(b"\x2c")  # image descriptor: flags at +9
    payload[i + 9] |= 0x40
    got = decode_gif(bytes(payload))
    assert (got == img).all()


def test_gif_rejects_too_many_colors_and_garbage():
    from ecc_spark.ops.codecs import decode_gif, encode_gif

    rng = _rng(23)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)  # ~1024 colors
    with pytest.raises(ValueError, match="256"):
        encode_gif(img)
    with pytest.raises(ValueError):
        decode_gif(b"GIF90a" + bytes(20))


# ---------------------- property-based (hypothesis) -------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    nch=st.sampled_from([1, 2, 3, 4]),
    filter_type=st.integers(0, 4),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(h, w, nch, filter_type, seed):
    """PNG is lossless for EVERY shape/color-type/filter combination —
    including 1-pixel rows/columns where the left/up neighbors of the
    filter algebra degenerate."""
    px = np.random.default_rng(seed).integers(
        0, 256, (h, w) if nch == 1 else (h, w, nch), dtype=np.uint8
    )
    assert decode_png(encode_png(px, filter_type=filter_type)).tolist() == px.tolist()


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(1, 64),
    alphabet=st.integers(2, 256),
    seed=st.integers(0, 2**31 - 1),
)
def test_gif_lzw_roundtrip_property(n, alphabet, seed):
    """LZW encode/decode are inverses for arbitrary index streams over
    arbitrary alphabet sizes (mcs edge cases incl. the 2-symbol
    minimum, where code widths start at 3 regardless)."""
    from ecc_spark.ops.codecs import _lzw_decode, _lzw_encode

    idx = np.random.default_rng(seed).integers(0, alphabet, n, dtype=np.uint8)
    mcs = max(2, int(alphabet - 1).bit_length())
    got = _lzw_decode(_lzw_encode(idx.tobytes(), mcs), mcs, n)
    assert got.tolist() == idx.tolist()


@settings(max_examples=25, deadline=None)
@given(
    sizes=st.lists(st.integers(0, 300), min_size=1, max_size=8),
    seed=st.integers(0, 2**31 - 1),
)
def test_mp4_demux_roundtrip_property(sizes, seed):
    """Mux → probe/demux is the identity for arbitrary sample-size
    sequences, including zero-length samples (legal per spec)."""
    from ecc_spark.ops.codecs import demux_mp4, encode_mp4, probe_mp4

    rng = np.random.default_rng(seed)
    samples = [bytes(rng.integers(0, 256, sz, dtype=np.uint8)) for sz in sizes]
    payload = encode_mp4(samples, 8, 8)
    assert demux_mp4(payload) == samples
    assert probe_mp4(payload)["sample_sizes"] == [len(x) for x in samples]


@settings(max_examples=25, deadline=None)
@given(
    bodies=st.lists(st.binary(min_size=0, max_size=400), min_size=1, max_size=6),
    compress=st.booleans(),
)
def test_warc_framing_roundtrip_property(bodies, compress):
    """WARC framing survives ARBITRARY bodies — including ones embedding
    record delimiters, CRLF runs, and gzip magic — in both layouts."""
    from ecc_spark.warc import encode_warc, iter_warc_records

    recs = [
        ({"WARC-Type": "resource", "WARC-Record-ID": f"<urn:{i}>"}, b)
        for i, b in enumerate(bodies)
    ]
    got = list(iter_warc_records(encode_warc(recs, compress=compress)))
    assert [b for _, b in got] == bodies


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(1, 20),
    w=st.integers(1, 20),
    nch=st.sampled_from([1, 3, 4]),
    filter_type=st.integers(0, 4),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_adam7_roundtrip_property(h, w, nch, filter_type, seed):
    """Adam7 interlacing is lossless for every shape — including shapes
    where whole passes are EMPTY (w or h below a pass's start offset),
    the classic interlace off-by-one."""
    px = np.random.default_rng(seed).integers(
        0, 256, (h, w) if nch == 1 else (h, w, nch), dtype=np.uint8
    )
    got = decode_png(encode_png(px, filter_type=filter_type, interlace=True))
    assert got.tolist() == px.tolist()


def test_gif_animation_frames_composite():
    """A hand-muxed 2-frame animation: frame 2 patches a sub-region with
    a local color table and a GCE transparent index — the composited
    second frame keeps frame 1's pixels under the transparent holes and
    outside the region."""
    from ecc_spark.ops.codecs import _lzw_encode, decode_gif, decode_gif_frames

    def img_block(x0, y0, iw, ih, indices, lct=None, mcs=2):
        out = bytearray(b"\x2c" + struct.pack("<HHHH", x0, y0, iw, ih))
        out.append(0x80 | 1 if lct else 0)  # LCT flag, 4-entry table
        if lct:
            out += lct
        out.append(mcs)
        lzw = _lzw_encode(bytes(indices), mcs)
        for j in range(0, len(lzw), 255):
            out.append(len(lzw[j : j + 255]))
            out += lzw[j : j + 255]
        out.append(0)
        return bytes(out)

    gct = bytes([10, 0, 0, 0, 20, 0, 0, 0, 30, 0, 0, 0])  # 4 entries
    lct = bytes([0, 0, 99, 0, 0, 88, 0, 0, 0, 0, 0, 0])
    gce_transparent_idx3 = b"\x21\xf9\x04\x01\x00\x00\x03\x00"
    payload = (
        b"GIF89a"
        + struct.pack("<HH", 4, 3)
        + bytes([0x81, 0, 0])  # GCT present, 4 entries, bg index 0
        + gct
        # frame 1: full screen, indices 0..2 pattern
        + img_block(0, 0, 4, 3, [0, 1, 2, 0] * 3)
        # frame 2: 2x2 patch at (1,1), LCT colors, index 3 transparent
        + gce_transparent_idx3
        + img_block(1, 1, 2, 2, [0, 3, 3, 1], lct=lct)
        + b"\x3b"
    )
    frames = decode_gif_frames(payload)
    assert len(frames) == 2
    f1, f2 = frames
    assert f1.shape == (3, 4, 3) == f2.shape
    assert f1[0].tolist() == [[10, 0, 0], [0, 20, 0], [0, 0, 30], [10, 0, 0]]
    # patch: (1,1) -> lct[0]; (1,2) transparent -> f1 value stays;
    # (2,1) transparent -> stays; (2,2) -> lct[1]
    assert f2[1, 1].tolist() == [0, 0, 99]
    assert f2[1, 2].tolist() == f1[1, 2].tolist()
    assert f2[2, 1].tolist() == f1[2, 1].tolist()
    assert f2[2, 2].tolist() == [0, 0, 88]
    # untouched rows identical; decode_gif = first frame
    assert f2[0].tolist() == f1[0].tolist()
    assert decode_gif(payload).tolist() == f1.tolist()


def test_gif_disposal_background_and_previous():
    """GCE disposal methods: method 2 clears the frame's region to the
    background color before the next frame composites; method 3 restores
    the pre-frame canvas. A 3-frame animation where frame 2 uses each
    method in turn pins what frame 3 sees underneath."""
    from ecc_spark.ops.codecs import _lzw_encode, decode_gif_frames

    def img_block(x0, y0, iw, ih, indices, mcs=2):
        out = bytearray(b"\x2c" + struct.pack("<HHHH", x0, y0, iw, ih))
        out.append(0)
        out.append(mcs)
        lzw = _lzw_encode(bytes(indices), mcs)
        for j in range(0, len(lzw), 255):
            out.append(len(lzw[j : j + 255]))
            out += lzw[j : j + 255]
        out.append(0)
        return bytes(out)

    def gce(disposal, transparent=None):
        gflags = (disposal << 2) | (1 if transparent is not None else 0)
        return b"\x21\xf9\x04" + bytes(
            [gflags, 0, 0, transparent if transparent is not None else 0, 0]
        )

    gct = bytes([5, 5, 5, 0, 0, 0, 200, 0, 0, 0, 200, 0])  # bg=idx0 gray-ish
    head = b"GIF89a" + struct.pack("<HH", 2, 2) + bytes([0x81, 0, 0]) + gct

    # frame1 paints the whole 2x2 screen with idx1 (black);
    # frame2 paints (0,0) with idx2 (red) under disposal D;
    # frame3 paints (1,1) with idx3 (green), transparent elsewhere? no —
    # frame3 is a 1x1 patch at (1,1), so position (0,0) in frame 3 shows
    # whatever D left behind.
    def build(disposal):
        return (
            head
            + img_block(0, 0, 2, 2, [1, 1, 1, 1])
            + gce(disposal)
            + img_block(0, 0, 1, 1, [2])
            + img_block(1, 1, 1, 1, [3])
            + b"\x3b"
        )

    # disposal 0 (no-op): frame 3 keeps the red pixel
    f = decode_gif_frames(build(0))
    assert f[2][0, 0].tolist() == [200, 0, 0]
    # disposal 2: region restored to BACKGROUND color (gct[0]) after frame 2
    f = decode_gif_frames(build(2))
    assert f[1][0, 0].tolist() == [200, 0, 0]  # displayed frame unaffected
    assert f[2][0, 0].tolist() == [5, 5, 5]
    # disposal 3: canvas restored to the PRE-frame-2 state (black)
    f = decode_gif_frames(build(3))
    assert f[1][0, 0].tolist() == [200, 0, 0]
    assert f[2][0, 0].tolist() == [0, 0, 0]
    # pixels outside the disposed region never change
    for d in (0, 2, 3):
        ff = decode_gif_frames(build(d))
        assert ff[2][1, 1].tolist() == [0, 200, 0]
        assert ff[2][0, 1].tolist() == [0, 0, 0]
