"""Pure-stdlib uncompressed-BMP decode (amp.multimodal.bmp_decode_gray).
No Spark. Files are built by hand from the public DIB layout so every
branch (bottom-up, top-down, row padding, palette, unsupported
compression, truncation) is exercised against known bytes.
"""

from __future__ import annotations

import struct

import numpy as np

from amp.multimodal import _decode_image_status, bmp_decode_gray


def _bmp24(rgb: np.ndarray, top_down: bool = False) -> bytes:
    h, w, _ = rgb.shape
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    row_order = range(h) if top_down else range(h - 1, -1, -1)
    for y in row_order:
        row = bytearray()
        for x in range(w):
            r, g, b = rgb[y, x]
            row += bytes((b, g, r))
        row += b"\x00" * (stride - len(row))
        body += row
    px_off = 14 + 40
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, -h if top_down else h, 1, 24, 0,
        len(body), 2835, 2835, 0, 0,
    )
    head = b"BM" + struct.pack("<IHHI", px_off + len(body), 0, 0, px_off)
    return head + dib + bytes(body)


def _bmp8_gray(img: np.ndarray) -> bytes:
    h, w = img.shape
    stride = (w + 3) & ~3
    pal = b"".join(bytes((v, v, v, 0)) for v in range(256))
    body = bytearray()
    for y in range(h - 1, -1, -1):
        row = bytes(img[y]) + b"\x00" * (stride - w)
        body += row
    px_off = 14 + 40 + len(pal)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(body), 2835, 2835, 256, 0
    )
    head = b"BM" + struct.pack("<IHHI", px_off + len(body), 0, 0, px_off)
    return head + dib + pal + bytes(body)


def _luma(rgb: np.ndarray) -> np.ndarray:
    f = rgb.astype(np.float64)
    return (0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]) / 255.0


def test_bmp24_bottom_up_with_padding():
    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)  # stride pads
    dec = bmp_decode_gray(_bmp24(rgb))
    assert dec.shape == (6, 5) and dec.dtype == np.float32
    assert float(np.abs(dec - _luma(rgb)).max()) < 1e-6


def test_bmp24_top_down_matches_bottom_up():
    rng = np.random.default_rng(4)
    rgb = rng.integers(0, 256, size=(4, 7, 3), dtype=np.uint8)
    assert np.array_equal(
        bmp_decode_gray(_bmp24(rgb, top_down=True)),
        bmp_decode_gray(_bmp24(rgb)),
    )


def test_bmp8_palette_grayscale_identity():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(5, 6), dtype=np.uint8)
    dec = bmp_decode_gray(_bmp8_gray(img))
    assert float(np.abs(dec - img.astype(np.float64) / 255.0).max()) < 1e-6


def test_unsupported_and_corrupt():
    import pytest

    rgb = np.zeros((4, 4, 3), dtype=np.uint8)
    data = _bmp24(rgb)
    # BI_BITFIELDS stays outside the decoder's subset
    bf = data[:30] + struct.pack("<I", 3) + data[34:]
    with pytest.raises(ValueError, match="unsupported"):
        bmp_decode_gray(bf)
    # BI_RLE8 on a 24-bpp DIB is self-contradictory
    rle_mismatch = data[:30] + struct.pack("<I", 1) + data[34:]
    with pytest.raises(ValueError, match="corrupt"):
        bmp_decode_gray(rle_mismatch)
    with pytest.raises(ValueError, match="corrupt|not a BMP"):
        bmp_decode_gray(data[:40])
    with pytest.raises(ValueError, match="not a BMP"):
        bmp_decode_gray(b"nope")


def _bmp_indexed(idx_rows: bytes, w: int, h: int, bpp: int, comp: int,
                 n_pal: int = 16) -> bytes:
    """Assemble an indexed BMP with a grayscale-ramp palette: entry i
    -> (i*17, i*17, i*17) for 4-bit, (i, i, i) for 8-bit."""
    pal = bytearray()
    for i in range(n_pal):
        v = i * 17 if bpp == 4 else i
        pal += bytes([v, v, v, 0])
    px_off = 14 + 40 + len(pal)
    header = (b"BM" + struct.pack("<IHHI", px_off + len(idx_rows), 0, 0,
                                  px_off)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, comp,
                            len(idx_rows), 0, 0, n_pal, 0))
    return bytes(header) + bytes(pal) + idx_rows


def test_rle8_runs_deltas_absolute_and_eol():
    """BI_RLE8: encoded runs, absolute mode (word-padded), delta skip
    (skipped pixels read as palette index 0), end-of-line, EOB."""
    w, h = 7, 3
    stream = bytes([
        3, 5,               # row 0 (bottom): 5 5 5
        0, 3, 1, 2, 3, 0,   # absolute: 1 2 3 + pad to a word boundary
        0, 0,               # end of line
        2, 9,               # row 1: 9 9
        0, 2, 3, 0,         # delta: skip 3 right
        2, 4,               # 4 4
        0, 0,               # end of line
        7, 1,               # row 2 (top): full row of 1
        0, 1,               # end of bitmap
    ])
    data = _bmp_indexed(stream, w, h, bpp=8, comp=1, n_pal=16)
    dec = np.rint(bmp_decode_gray(data) * 255.0).astype(int)
    expect = np.array([
        [1, 1, 1, 1, 1, 1, 1],        # top row (file row 2)
        [9, 9, 0, 0, 0, 4, 4],        # delta-skipped -> index 0
        [5, 5, 5, 1, 2, 3, 0],        # early EOL -> index 0
    ])
    assert np.array_equal(dec, expect)


def test_rle4_nibble_runs_and_absolute():
    """BI_RLE4: runs alternate the two nibbles; absolute mode packs
    nibbles high-first with word padding."""
    w, h = 6, 2
    stream = bytes([
        5, 0x12,          # row 0 (bottom): 1 2 1 2 1
        0, 0,             # end of line
        0, 4, 0x34, 0x56, # absolute: 3 4 5 6 (2 bytes, already even)
        2, 0x70,          # 7 0
        0, 1,             # end of bitmap
    ])
    data = _bmp_indexed(stream, w, h, bpp=4, comp=2, n_pal=16)
    dec = np.rint(bmp_decode_gray(data) * 255.0 / 17.0).astype(int)
    expect = np.array([
        [3, 4, 5, 6, 7, 0],   # top row (file row 1)
        [1, 2, 1, 2, 1, 0],   # bottom row, early EOL -> 0
    ])
    assert np.array_equal(dec, expect)


def test_plain_4bpp_uncompressed():
    w, h = 5, 2
    # bottom-up rows, nibbles high-first, stride padded to 4 bytes
    row_bottom = bytes([0x12, 0x34, 0x50, 0x00])   # 1 2 3 4 5
    row_top = bytes([0xAB, 0xCD, 0xE0, 0x00])      # 10 11 12 13 14
    data = _bmp_indexed(row_bottom + row_top, w, h, bpp=4, comp=0)
    dec = np.rint(bmp_decode_gray(data) * 255.0 / 17.0).astype(int)
    assert np.array_equal(dec, [[10, 11, 12, 13, 14], [1, 2, 3, 4, 5]])


def test_rle_corrupt_streams():
    import pytest

    # overflow past the row
    bad = bytes([200, 1] * 8)
    with pytest.raises(ValueError, match="corrupt"):
        bmp_decode_gray(_bmp_indexed(bad, 4, 2, bpp=8, comp=1))
    # missing end-of-bitmap
    with pytest.raises(ValueError, match="corrupt"):
        bmp_decode_gray(_bmp_indexed(bytes([2, 1]), 4, 2, bpp=8, comp=1))
    # top-down RLE is illegal
    stream = bytes([2, 1, 0, 1])
    data = bytearray(_bmp_indexed(stream, 4, 2, bpp=8, comp=1))
    struct.pack_into("<i", data, 22, -2)
    with pytest.raises(ValueError, match="corrupt"):
        bmp_decode_gray(bytes(data))


def test_ladder_status_for_bmp():
    rgb = np.full((4, 4, 3), 128, dtype=np.uint8)
    data = _bmp24(rgb)
    grid, status, fmt = _decode_image_status(data, allow_fake=False)
    assert (status, fmt) == ("real", "bmp")
    assert grid.shape == (8, 8)

    # a real RLE8 file now decodes
    stream = bytes([4, 7, 0, 0, 4, 9, 0, 1])
    rle = _bmp_indexed(stream, 4, 2, bpp=8, comp=1)
    grid, status, fmt = _decode_image_status(rle, allow_fake=False)
    from amp.multimodal import HAVE_PIL

    if not HAVE_PIL:
        assert (status, fmt) == ("real", "bmp")

    bf = data[:30] + struct.pack("<I", 3) + data[34:]
    _, status, fmt = _decode_image_status(bf, allow_fake=False)
    if HAVE_PIL:
        assert fmt == "bmp" and status in ("real", "corrupt")
    else:
        assert (status, fmt) == ("unsupported", "bmp")
