"""Pure-Python baseline JPEG codec (amp.jpeg, ITU T.81). No Spark.

The encoder uses unit luma quantization, so decode error is bounded by
DCT float rounding alone (measured < 1.1/255 on noise) — tolerances
here are tight on purpose.
"""

from __future__ import annotations

import numpy as np
import pytest

from amp import jpeg


def _mae(dec: np.ndarray, img: np.ndarray) -> float:
    return float(np.abs(dec * 255.0 - img.astype(np.float64)).max())


def test_gray_roundtrip_gradient_and_noise():
    yy, xx = np.mgrid[0:37, 0:53]
    grad = ((yy * 4 + xx * 3) % 256).astype(np.uint8)
    dec = jpeg.decode_gray(jpeg.encode_gray(grad))
    assert dec.shape == (37, 53) and dec.dtype == np.float32
    assert _mae(dec, grad) < 1.5

    rng = np.random.default_rng(7)
    noise = rng.integers(0, 256, size=(16, 24), dtype=np.uint8)
    assert _mae(jpeg.decode_gray(jpeg.encode_gray(noise)), noise) < 1.5


def test_restart_interval_roundtrip():
    """DRI + RSTn markers: byte-align, reset DC predictors."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(24, 40), dtype=np.uint8)
    for dri in (1, 2, 3):
        data = jpeg.encode_gray(img, restart_interval=dri)
        assert any(
            data[i] == 0xFF and 0xD0 <= data[i + 1] <= 0xD7
            for i in range(2, len(data) - 2)
        ), "encoder must emit RSTn markers"
        assert _mae(jpeg.decode_gray(data), img) < 1.5


def test_color_420_luma_extraction():
    """3-component 4:2:0: chroma is entropy-consumed, luma reconstructed
    at full resolution."""
    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, size=(19, 22, 3), dtype=np.uint8)
    dec = jpeg.decode_gray(jpeg.encode_rgb420(rgb))
    assert dec.shape == (19, 22)
    luma = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    # luma path error: RGB->YCbCr float + DCT rounding
    assert float(np.abs(dec * 255.0 - luma).max()) < 2.0


def test_odd_sizes_and_tiny_images():
    for h, w in ((1, 1), (7, 9), (8, 8), (9, 17)):
        img = (np.arange(h * w, dtype=np.uint32).reshape(h, w) * 37 % 256
               ).astype(np.uint8)
        dec = jpeg.decode_gray(jpeg.encode_gray(img))
        assert dec.shape == (h, w)
        assert _mae(dec, img) < 1.5


def test_corrupt_and_unsupported_raise_value_error():
    good = jpeg.encode_gray(np.zeros((8, 8), np.uint8))
    with pytest.raises(ValueError, match="corrupt"):
        jpeg.decode_gray(b"\xff\xd8\xff\xe0" + b"\x00" * 32)
    with pytest.raises(ValueError, match="corrupt"):
        jpeg.decode_gray(good[:20])
    with pytest.raises(ValueError, match="unsupported"):
        # flip SOF0 -> SOF2 (progressive)
        idx = good.find(b"\xff\xc0")
        jpeg.decode_gray(good[:idx] + b"\xff\xc2" + good[idx + 2:])
    with pytest.raises(ValueError, match="corrupt"):
        jpeg.decode_gray(b"not a jpeg")


def test_fill_bytes_before_marker():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
    marker; encoders/exporters emit them for alignment."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(16, 24), dtype=np.uint8)
    data = jpeg.encode_gray(img)
    base = jpeg.decode_gray(data)
    i = data.index(b"\xff\xdb")
    padded = data[:i] + b"\xff\xff" + data[i:]
    assert np.array_equal(jpeg.decode_gray(padded), base)


def test_single_component_scan_is_non_interleaved():
    """T.81 A.2.2: a one-component scan decodes one 8x8 block per MCU
    in the component's raster order regardless of its declared sampling
    factors (e.g. grayscale output that keeps 2x2 luma sampling)."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(16, 24), dtype=np.uint8)
    data = jpeg.encode_gray(img)
    base = jpeg.decode_gray(data)
    j = data.index(b"\xff\xc0")
    hv_off = j + 11  # marker(2)+len(2)+prec(1)+h(2)+w(2)+nc(1)+cid(1)
    assert data[hv_off] == 0x11
    patched = data[:hv_off] + b"\x22" + data[hv_off + 1:]
    out = jpeg.decode_gray(patched)
    # for ns==1 the entropy order is the component's raster block order
    # either way, so pixels must match exactly
    assert out.shape == base.shape and np.array_equal(out, base)


def test_ladder_integration_no_spark():
    """_decode_image_status: real baseline JPEG -> real; torn -> corrupt;
    progressive -> unsupported (fakes disallowed). PIL-independent: the
    jpeg branch of the ladder prefers the stdlib codec for baseline
    files, but guard the progressive expectation (PIL would decode it)."""
    from amp.multimodal import _decode_image_status

    img = (np.arange(192, dtype=np.uint16).reshape(12, 16) % 256).astype(np.uint8)
    data = jpeg.encode_gray(img)
    grid, status, fmt = _decode_image_status(data, allow_fake=False)
    assert (status, fmt) == ("real", "jpeg")
    assert grid.shape == (8, 8) and 0.0 <= grid.min() and grid.max() <= 1.0

    _, status, fmt = _decode_image_status(data[:30], allow_fake=False)
    assert (status, fmt) == ("corrupt", "jpeg")

    idx = data.find(b"\xff\xc0")
    prog = data[:idx] + b"\xff\xc2" + data[idx + 2:]
    _, status, fmt = _decode_image_status(prog, allow_fake=False)
    from amp.multimodal import HAVE_PIL

    if HAVE_PIL:
        # PIL sits above the stdlib codec in the ladder and decodes
        # (or rejects) progressive files itself
        assert fmt == "jpeg" and status in ("real", "corrupt")
    else:
        assert (status, fmt) == ("unsupported", "jpeg")

    # fakes allowed: never None (real under PIL, which handles
    # progressive itself; deterministic fake from the stdlib ladder)
    grid, status, fmt = _decode_image_status(prog, allow_fake=True)
    assert grid is not None
    assert status in (("real", "fake") if HAVE_PIL else ("fake",))
