"""Pure-Python WebP-lossless codec (amp.vp8l). No Spark.

The fixture encoder is spec-derived and independent of the decoder's
table-walk machinery; every round-trip asserts LOSSLESS bit-identical
RGBA. No external WebP decoder exists in this container, so
conformance rests on the spec constants (distance map generation
rule, cache hash multiplier, code-length order) plus these
branch-complete round-trips — documented in the module docstring.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from amp import vp8l


def _rt(rgba: np.ndarray, **kw) -> bytes:
    data = vp8l.encode_lossless(rgba, **kw)
    out = vp8l.decode_rgba(data)
    assert out.shape == rgba.shape
    assert np.array_equal(out, rgba)
    return data


def test_distance_map_matches_spec_listing():
    """The generated 120-entry plane-code table must reproduce the
    spec's explicit listing (spot anchors across the whole range)."""
    m = vp8l._DIST_MAP
    assert len(m) == 120
    assert m[0] == (0, 1) and m[1] == (1, 0)      # codes 1, 2
    assert m[2] == (1, 1) and m[3] == (-1, 1)
    assert m[4] == (0, 2) and m[5] == (2, 0)
    assert m[12] == (0, 3) and m[13] == (3, 0)    # codes 13, 14
    assert m[34] == (0, 5)                        # code 35
    assert m[96] == (8, 0)                        # code 97
    assert m[119] == (8, 7)                       # code 120
    assert len(set(m)) == 120


def test_literals_and_prefix_coding():
    rng = np.random.default_rng(5)
    for h, w in ((1, 1), (9, 13), (16, 16), (7, 31)):
        img = rng.integers(0, 256, size=(h, w, 4), dtype=np.uint8)
        _rt(img, lz77=False)
    # prefix encode/decode inverse over the full small range
    for v in list(range(1, 300)) + [1000, 4096]:
        code, extra, n = vp8l._prefix_encode(v)

        class _FakeBR:
            def get(self, k):
                assert k == n
                return extra

        assert vp8l._prefix_value(code, _FakeBR()) == v


def test_lz77_runs_and_color_cache():
    img = np.zeros((16, 20, 4), np.uint8)
    img[:, :, 3] = 255
    img[::2] = [10, 20, 30, 255]
    img[4:8] = [50, 60, 70, 255]
    plain = _rt(img, lz77=False)
    packed = _rt(img, cache_bits=4, lz77=True)
    assert len(packed) < len(plain) // 2  # the backrefs actually fire


def test_far_raw_distance_copy():
    """A 16-rows-above copy at width 24 needs a raw distance (384)
    past the 120 plane codes."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(40, 24, 4), dtype=np.uint8)
    img[20:24] = img[4:8]
    _rt(img, lz77=True)


def test_all_predictor_modes():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(13, 19, 4), dtype=np.uint8)
    for mode in range(14):
        _rt(img, predictor_mode=mode, lz77=False)
    # gradients make residuals small — the realistic predictor case
    yy, xx = np.mgrid[0:24, 0:31]
    grad = np.stack([(yy * 7) % 256, (xx * 5) % 256, (yy + xx) % 256,
                     np.full_like(yy, 255)], axis=-1).astype(np.uint8)
    _rt(grad, predictor_mode=12, size_bits=3)


def test_subtract_green_and_color_transform():
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, size=(10, 14, 4), dtype=np.uint8)
    _rt(img, subtract_green=True, lz77=False)
    for element in (0x000000, 0x102030, 0xFF8040, 0x7F7F7F):
        _rt(img, color_element=element, lz77=False)


def test_palette_all_bundle_widths():
    rng = np.random.default_rng(17)
    for n_colors, shape in ((2, (11, 23)), (4, (9, 18)), (12, (10, 17)),
                            (100, (12, 12))):
        vals = rng.integers(0, n_colors, size=shape)
        rgba = np.stack([
            (vals * 37 % 256).astype(np.uint8),
            (vals * 11 % 256).astype(np.uint8),
            (vals * 5 % 256).astype(np.uint8),
            np.full(shape, 255, np.uint8),
        ], axis=-1)
        _rt(rgba, palette=True, lz77=False)


def test_meta_huffman_groups():
    rng = np.random.default_rng(19)
    img = rng.integers(0, 256, size=(18, 33, 4), dtype=np.uint8)
    _rt(img, meta_bits=2, lz77=False)
    _rt(img, meta_bits=4, cache_bits=3, lz77=True)


def test_combined_transform_stack():
    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, size=(33, 41, 4), dtype=np.uint8)
    img[10:14] = img[6:10]
    _rt(img, subtract_green=True, predictor_mode=11, cache_bits=6,
        lz77=True, meta_bits=3)
    _rt(img, subtract_green=True, color_element=0x201510,
        predictor_mode=7, lz77=True)


def test_alpha_channel_roundtrip():
    rng = np.random.default_rng(29)
    img = rng.integers(0, 256, size=(8, 8, 4), dtype=np.uint8)  # random A
    data = _rt(img)
    # alpha hint bit is set when any alpha != 255
    assert vp8l.decode_rgba(data).shape == (8, 8, 4)


def test_corrupt_and_unsupported():
    img = np.full((8, 8, 4), 200, np.uint8)
    good = vp8l.encode_lossless(img)
    with pytest.raises(ValueError, match="corrupt"):
        vp8l.decode_rgba(b"RIFF1234WEB")
    with pytest.raises(ValueError, match="corrupt"):
        vp8l.decode_rgba(good[:30])  # truncated mid-stream
    # lossy VP8 chunk -> unsupported
    lossy = (b"RIFF" + struct.pack("<I", 16) + b"WEBP"
             + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4)
    with pytest.raises(ValueError, match="unsupported"):
        vp8l.decode_rgba(lossy)
    # animation -> unsupported
    anim = (b"RIFF" + struct.pack("<I", 16) + b"WEBP"
            + b"ANIM" + struct.pack("<I", 4) + b"\x00" * 4)
    with pytest.raises(ValueError, match="unsupported"):
        vp8l.decode_rgba(anim)
    # version != 0 -> unsupported
    ver = bytearray(good)
    sig = ver.index(b"VP8L") + 8
    ver[sig + 4] ^= 0x80  # top bit of the 5th header byte = version LSB
    # flipping a version bit must raise either unsupported (version)
    # or corrupt (stream desync) — never decode silently
    with pytest.raises(ValueError):
        vp8l.decode_rgba(bytes(ver))


def test_vp8x_container_with_vp8l_inside():
    """Extended container: VP8X metadata chunk precedes the VP8L
    image chunk — the chunk walk must skip it."""
    img = np.full((5, 7, 4), 99, np.uint8)
    good = vp8l.encode_lossless(img)
    i = good.index(b"VP8L")
    inner = good[i:]  # VP8L chunk + payload
    vp8x = b"VP8X" + struct.pack("<I", 10) + b"\x00" * 10
    riff = (b"RIFF" + struct.pack("<I", 4 + len(vp8x) + len(inner))
            + b"WEBP" + vp8x + inner)
    assert np.array_equal(vp8l.decode_rgba(riff), img)


def test_decode_gray_contract():
    img = np.zeros((8, 8, 4), np.uint8)
    img[:, :, 0] = 255  # pure red
    img[:, :, 3] = 255
    g = vp8l.decode_gray(vp8l.encode_lossless(img))
    assert g.shape == (8, 8) and g.dtype == np.float32
    assert abs(float(g[0, 0]) - 0.299) < 1e-3


def test_ladder_integration_no_spark():
    from amp.multimodal import _decode_image_status

    img = np.arange(256, dtype=np.uint8).reshape(8, 8, 4)
    data = vp8l.encode_lossless(img, cache_bits=4)
    grid, status, fmt = _decode_image_status(data, allow_fake=False)
    assert (status, fmt) == ("real", "webp")
    assert grid.shape == (8, 8)

    _, status, fmt = _decode_image_status(data[:25], allow_fake=False)
    assert (status, fmt) == ("corrupt", "webp")

    lossy = (b"RIFF" + struct.pack("<I", 16) + b"WEBP"
             + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4)
    from amp.multimodal import HAVE_PIL
    _, status, fmt = _decode_image_status(lossy, allow_fake=False)
    if not HAVE_PIL:
        assert (status, fmt) == ("unsupported", "webp")


def test_randomized_roundtrip_sweep():
    rng = np.random.default_rng(31)
    for trial in range(10):
        h = int(rng.integers(1, 40))
        w = int(rng.integers(1, 40))
        img = rng.integers(0, 256, size=(h, w, 4), dtype=np.uint8)
        kw = {}
        if rng.random() < 0.5:
            kw["subtract_green"] = True
        if rng.random() < 0.4:
            kw["predictor_mode"] = int(rng.integers(0, 14))
        if rng.random() < 0.3:
            kw["color_element"] = int(rng.integers(0, 1 << 24))
        if rng.random() < 0.5:
            kw["cache_bits"] = int(rng.integers(1, 9))
        if rng.random() < 0.3 and w > 4 and h > 4:
            kw["meta_bits"] = int(rng.integers(2, 6))
        _rt(img, lz77=bool(rng.random() < 0.7), **kw)


def test_size_gate_counts_as_unsupported(monkeypatch):
    """The pure-python rung refuses to grind through huge images
    (per-pixel entropy loop): above AMP_PURE_DECODE_MAX_PIXELS the
    status is unsupported-as-data, never a multi-minute stall."""
    img = np.full((8, 8, 4), 50, np.uint8)
    data = vp8l.encode_lossless(img)
    monkeypatch.setenv("AMP_PURE_DECODE_MAX_PIXELS", "16")
    with pytest.raises(ValueError, match="unsupported webp.*size gate"):
        vp8l.decode_rgba(data)
    from amp.multimodal import _decode_image_status
    _, status, fmt = _decode_image_status(data, allow_fake=False)
    from amp.multimodal import HAVE_PIL
    if not HAVE_PIL:
        assert (status, fmt) == ("unsupported", "webp")
    monkeypatch.setenv("AMP_PURE_DECODE_MAX_PIXELS", "2000000")
    assert np.array_equal(vp8l.decode_rgba(data), img)
