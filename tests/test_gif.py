"""Pure-stdlib GIF decode (amp.multimodal.gif_decode_gray). No Spark.

Two test encoders drive the decoder: a trivially-spec-correct one that
emits a clear code before every pixel (the table never grows), and a
real LZW compressor (canonical algorithm with width bumps and 12-bit
table resets) that exercises dictionary growth including the
code==len(table) KwKwK case.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from amp.multimodal import _decode_image_status, _gif_lzw_decode, gif_decode_gray


def _pack_codes(codes: list[tuple[int, int]]) -> bytes:
    acc = 0
    nbits = 0
    out = bytearray()
    for code, width in codes:
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_trivial(min_code_size: int, data: bytes) -> bytes:
    """Clear code before every literal — valid per spec, zero growth."""
    clear = 1 << min_code_size
    end = clear + 1
    w = min_code_size + 1
    codes = [(clear, w)]
    for b in data:
        codes.append((b, w))
        codes.append((clear, w))
    codes.append((end, w))
    return _pack_codes(codes)


def _lzw_real(min_code_size: int, data: bytes) -> bytes:
    """Canonical GIF-LZW compressor (appendix-F algorithm)."""
    clear = 1 << min_code_size
    end = clear + 1
    codes: list[tuple[int, int]] = []
    width = min_code_size + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    codes.append((clear, width))
    prev = b""
    for byte in data:
        cur = prev + bytes([byte])
        if cur in table:
            prev = cur
            continue
        codes.append((table[prev], width))
        table[cur] = next_code
        next_code += 1
        if next_code == (1 << width) and width < 12:
            width += 1
        elif next_code == 4096:
            codes.append((clear, width))
            width = min_code_size + 1
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
        prev = bytes([byte])
    if prev:
        codes.append((table[prev], width))
    codes.append((end, width))
    return _pack_codes(codes)


def _subblocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        part = data[i:i + 255]
        out.append(len(part))
        out += part
    out.append(0)
    return bytes(out)


def _gif(img: np.ndarray, encoder, interlace: bool = False,
         local_palette: bool = False, with_extension: bool = False) -> bytes:
    """Grayscale (H, W) uint8 -> GIF89a with an identity gray palette."""
    h, w = img.shape
    pal = b"".join(bytes((v, v, v)) for v in range(256))
    head = b"GIF89a" + struct.pack("<HH", w, h)
    if local_palette:
        head += bytes((0x00, 0, 0))  # no GCT
    else:
        head += bytes((0xF7, 0, 0)) + pal  # GCT, 256 entries
    body = bytearray()
    if with_extension:
        body += b"\x21\xf9" + _subblocks(b"\x00\x00\x00\x00")
    ipacked = (0x40 if interlace else 0) | (0x87 if local_palette else 0)
    body += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + bytes((ipacked,))
    if local_palette:
        body += pal
    rows = img
    if interlace:
        order = (
            list(range(0, h, 8)) + list(range(4, h, 8))
            + list(range(2, h, 4)) + list(range(1, h, 2))
        )
        rows = img[order]
    body += bytes((8,)) + _subblocks(encoder(8, rows.tobytes())) + b"\x3b"
    return head + bytes(body)


@pytest.mark.parametrize("encoder", [_lzw_trivial, _lzw_real])
def test_lzw_roundtrip_streams(encoder):
    rng = np.random.default_rng(9)
    for data in (
        b"\x00" * 300,                       # runs: KwKwK case
        bytes(rng.integers(0, 256, 2000)),   # random: growth + width bumps
        bytes([1, 2] * 500),                 # alternating
        bytes(rng.integers(0, 4, 9000)),     # long low-entropy: table reset
    ):
        assert _gif_lzw_decode(8, encoder(8, data), len(data)) == data


@pytest.mark.parametrize("encoder", [_lzw_trivial, _lzw_real])
def test_gif_roundtrip(encoder):
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(11, 13), dtype=np.uint8)
    dec = gif_decode_gray(_gif(img, encoder))
    assert dec.shape == (11, 13) and dec.dtype == np.float32
    assert float(np.abs(dec - img / 255.0).max()) < 1e-6


def test_gif_interlaced_and_local_palette_and_extension():
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, size=(17, 9), dtype=np.uint8)
    base = gif_decode_gray(_gif(img, _lzw_real))
    for kw in ({"interlace": True}, {"local_palette": True},
               {"with_extension": True}):
        assert np.array_equal(gif_decode_gray(_gif(img, _lzw_real, **kw)), base)


def test_gif_corrupt_raises():
    img = np.zeros((4, 4), dtype=np.uint8)
    data = _gif(img, _lzw_real)
    with pytest.raises(ValueError, match="not a GIF"):
        gif_decode_gray(b"JIF89a" + data[6:])
    with pytest.raises(ValueError, match="corrupt"):
        gif_decode_gray(data[:20])  # no frame / truncated
    with pytest.raises(ValueError, match="corrupt"):
        # truncate inside the LZW sub-blocks
        gif_decode_gray(data[:-6])


def test_ladder_status_for_gif():
    from amp.multimodal import HAVE_PIL

    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, size=(9, 9), dtype=np.uint8)
    grid, status, fmt = _decode_image_status(_gif(img, _lzw_real),
                                             allow_fake=False)
    assert (status, fmt) == ("real", "gif")
    assert grid.shape == (8, 8)

    _, status, fmt = _decode_image_status(_gif(img, _lzw_real)[:20],
                                          allow_fake=False)
    assert fmt == "gif" and status == "corrupt" or (HAVE_PIL and status)
