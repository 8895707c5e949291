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


# ---------------------------------------------------------------------------
# animated GIF: gif_decode_frames (compositing, disposal, transparency)
# ---------------------------------------------------------------------------


def _agif(frame_specs, screen, bg_index=0) -> bytes:
    """Animated GIF89a builder with an identity gray palette.
    frame_specs: list of dicts with keys img (uint8 2d), left, top,
    delay_cs, disposal, transparent (index or None)."""
    sw, sh = screen
    pal = b"".join(bytes((v, v, v)) for v in range(256))
    out = bytearray(b"GIF89a" + struct.pack("<HH", sw, sh))
    out += bytes((0xF7, bg_index, 0)) + pal
    for spec in frame_specs:
        img = spec["img"]
        fh, fw = img.shape
        transparent = spec.get("transparent")
        packed = (spec.get("disposal", 0) & 0x7) << 2
        tidx = 0
        if transparent is not None:
            packed |= 1
            tidx = transparent
        delay = spec.get("delay_cs", 0)
        out += bytes((0x21, 0xF9, 4, packed, delay & 0xFF,
                      (delay >> 8) & 0xFF, tidx, 0))
        out += b"\x2c" + struct.pack(
            "<HHHH", spec.get("left", 0), spec.get("top", 0), fw, fh
        ) + b"\x00"
        out += bytes((8,)) + _subblocks(_lzw_real(8, img.tobytes()))
    out += b"\x3b"
    return bytes(out)


def _luma_eq(frame: np.ndarray, expect: np.ndarray) -> bool:
    return np.abs(frame * 255.0 - expect.astype(np.float64)).max() < 0.5


def test_animated_frames_and_delays():
    from amp.multimodal import gif_decode_frames

    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, size=(6, 8), dtype=np.uint8)
    b = rng.integers(0, 256, size=(6, 8), dtype=np.uint8)
    data = _agif(
        [{"img": a, "delay_cs": 5}, {"img": b, "delay_cs": 0}],
        screen=(8, 6),
    )
    frames, delays = gif_decode_frames(data)
    assert len(frames) == 2
    assert delays == [50, 100]  # 0-delay convention -> 100 ms
    assert _luma_eq(frames[0], a) and _luma_eq(frames[1], b)
    # max_frames early stop
    frames1, _ = gif_decode_frames(data, max_frames=1)
    assert len(frames1) == 1 and _luma_eq(frames1[0], a)


def test_animated_offsets_transparency_and_disposal():
    from amp.multimodal import gif_decode_frames

    base = np.full((6, 6), 200, np.uint8)
    patch = np.full((2, 3), 30, np.uint8)
    patch[0, 1] = 7  # this index is declared transparent
    data = _agif(
        [
            {"img": base, "disposal": 1},
            # frame 2: offset patch with transparency, then restore-to-bg
            {"img": patch, "left": 2, "top": 1, "transparent": 7,
             "disposal": 2},
            # frame 3: tiny corner patch on the post-disposal canvas
            {"img": np.full((1, 1), 90, np.uint8)},
        ],
        screen=(6, 6),
        bg_index=0,
    )
    frames, _ = gif_decode_frames(data)
    assert len(frames) == 3
    # frame 2: patch composited at (2,1); transparent pixel keeps 200
    exp2 = base.copy().astype(np.float64)
    exp2[1:3, 2:5] = patch
    exp2[1, 3] = 200.0
    assert _luma_eq(frames[1], exp2)
    # frame 3: the patch region was restored to background (index 0)
    exp3 = exp2.copy()
    exp3[1:3, 2:5] = 0.0
    exp3[0, 0] = 90.0
    assert _luma_eq(frames[2], exp3)


def test_animated_disposal_restore_previous():
    from amp.multimodal import gif_decode_frames

    base = np.full((4, 4), 100, np.uint8)
    overlay = np.full((2, 2), 250, np.uint8)
    data = _agif(
        [
            {"img": base, "disposal": 1},
            {"img": overlay, "left": 1, "top": 1, "disposal": 3},
            {"img": np.full((1, 1), 10, np.uint8), "left": 3, "top": 3},
        ],
        screen=(4, 4),
    )
    frames, _ = gif_decode_frames(data)
    exp2 = base.astype(np.float64).copy()
    exp2[1:3, 1:3] = 250.0
    assert _luma_eq(frames[1], exp2)
    # frame 3: the overlay vanished (restore-previous), corner painted
    exp3 = base.astype(np.float64).copy()
    exp3[3, 3] = 10.0
    assert _luma_eq(frames[2], exp3)


def test_animated_corrupt_cases():
    from amp.multimodal import gif_decode_frames

    img = np.zeros((3, 3), np.uint8)
    good = _agif([{"img": img}], screen=(3, 3))
    with pytest.raises(ValueError, match="corrupt|not a GIF"):
        gif_decode_frames(good[:25])
    # frame outside the logical screen
    bad = _agif([{"img": img, "left": 2, "top": 0}], screen=(3, 3))
    with pytest.raises(ValueError, match="outside logical screen"):
        gif_decode_frames(bad)
    # first frame still decodes via the still-image path
    assert gif_decode_gray(good).shape == (3, 3)
