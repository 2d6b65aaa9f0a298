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
    # interlaced flag refused loudly, not mis-decoded
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 1)
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
    with pytest.raises(ValueError, match="interlaced"):
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
