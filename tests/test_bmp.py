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
    # flip compression to BI_RLE8
    rle = data[:30] + struct.pack("<I", 1) + data[34:]
    with pytest.raises(ValueError, match="unsupported"):
        bmp_decode_gray(rle)
    with pytest.raises(ValueError, match="corrupt|not a BMP"):
        bmp_decode_gray(data[:40])
    with pytest.raises(ValueError, match="not a BMP"):
        bmp_decode_gray(b"nope")


def test_ladder_status_for_bmp():
    rgb = np.full((4, 4, 3), 128, dtype=np.uint8)
    data = _bmp24(rgb)
    grid, status, fmt = _decode_image_status(data, allow_fake=False)
    assert (status, fmt) == ("real", "bmp")
    assert grid.shape == (8, 8)

    rle = data[:30] + struct.pack("<I", 1) + data[34:]
    _, status, fmt = _decode_image_status(rle, allow_fake=False)
    from amp.multimodal import HAVE_PIL

    if HAVE_PIL:
        assert fmt == "bmp" and status in ("real", "corrupt")
    else:
        assert (status, fmt) == ("unsupported", "bmp")
