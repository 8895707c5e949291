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
    with pytest.raises(ValueError, match="corrupt"):
        # flip SOF0 -> SOF2: the baseline full-band scan (Ss=0, Se=63)
        # is illegal in a progressive frame (T.81 G.1: a DC scan must
        # have Se=0), so the mislabeled file is corrupt, not decodable
        idx = good.find(b"\xff\xc0")
        jpeg.decode_gray(good[:idx] + b"\xff\xc2" + good[idx + 2:])
    with pytest.raises(ValueError, match="unsupported"):
        # SOF9 (extended sequential, arithmetic coding)
        idx = good.find(b"\xff\xc0")
        jpeg.decode_gray(good[:idx] + b"\xff\xc9" + good[idx + 2:])
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
    """_decode_image_status: real baseline AND progressive JPEG ->
    real; torn -> corrupt; arithmetic-coded -> unsupported (fakes
    disallowed). PIL-independent apart from the arithmetic case (PIL
    would reject it as corrupt rather than unsupported)."""
    from amp.multimodal import _decode_image_status

    img = (np.arange(192, dtype=np.uint16).reshape(12, 16) % 256).astype(np.uint8)
    data = jpeg.encode_gray(img)
    grid, status, fmt = _decode_image_status(data, allow_fake=False)
    assert (status, fmt) == ("real", "jpeg")
    assert grid.shape == (8, 8) and 0.0 <= grid.min() and grid.max() <= 1.0

    _, status, fmt = _decode_image_status(data[:30], allow_fake=False)
    assert (status, fmt) == ("corrupt", "jpeg")

    prog = jpeg.encode_gray_progressive(img)
    grid, status, fmt = _decode_image_status(prog, allow_fake=False)
    assert (status, fmt) == ("real", "jpeg")
    assert grid.shape == (8, 8)

    _, status, fmt = _decode_image_status(prog[:40], allow_fake=False)
    assert (status, fmt) == ("corrupt", "jpeg")

    idx = data.find(b"\xff\xc0")
    arith = data[:idx] + b"\xff\xc9" + data[idx + 2:]
    _, status, fmt = _decode_image_status(arith, allow_fake=False)
    from amp.multimodal import HAVE_PIL

    if HAVE_PIL:
        assert fmt == "jpeg" and status in ("corrupt", "unsupported")
    else:
        assert (status, fmt) == ("unsupported", "jpeg")

    # fakes allowed: never None
    grid, status, fmt = _decode_image_status(arith, allow_fake=True)
    assert grid is not None
    assert status == "fake" or (HAVE_PIL and status == "real")


def test_progressive_bit_identical_to_sequential():
    """Successive approximation + spectral selection reassemble exactly
    the sequential coefficients (unit quant), so the progressive decode
    is BIT-IDENTICAL to the sequential decode — gradients and flats
    stress EOB runs, noise stresses dense bands, odd sizes stress the
    partial-MCU edges."""
    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:64, 0:72]
    cases = [
        rng.integers(0, 256, size=(16, 24), dtype=np.uint8),
        rng.integers(0, 256, size=(37, 53), dtype=np.uint8),
        rng.integers(0, 256, size=(1, 1), dtype=np.uint8),
        rng.integers(0, 256, size=(9, 17), dtype=np.uint8),
        ((yy * 4 + xx * 3) % 256).astype(np.uint8),
        np.full((40, 48), 130, np.uint8),
        ((xx > 36) * 255).astype(np.uint8)[:40, :48],
        (((yy // 4 + xx // 4) % 2) * 255).astype(np.uint8),
    ]
    for img in cases:
        base = jpeg.decode_gray(jpeg.encode_gray(img))
        prog = jpeg.decode_gray(jpeg.encode_gray_progressive(img))
        assert np.array_equal(base, prog)


def test_progressive_color_and_chroma_scan_skip():
    """3-component progressive: interleaved DC scans decode all
    components; chroma AC scans are skipped at the byte level; the luma
    plane still comes out bit-identical to the sequential decode."""
    rng = np.random.default_rng(3)
    for h, w in ((19, 22), (16, 16), (33, 47)):
        rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        base = jpeg.decode_gray(jpeg.encode_rgb420(rgb))
        prog = jpeg.decode_gray(jpeg.encode_rgb420_progressive(rgb))
        assert prog.shape == (h, w)
        assert np.array_equal(base, prog)


def test_progressive_restart_intervals():
    """RSTn inside progressive scans: DC predictors and EOB runs reset,
    bit reader re-aligns — still bit-identical to sequential."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(24, 40), dtype=np.uint8)
    base = jpeg.decode_gray(jpeg.encode_gray(img))
    for dri in (1, 2, 3, 7):
        data = jpeg.encode_gray_progressive(img, restart_interval=dri)
        assert any(
            data[i] == 0xFF and 0xD0 <= data[i + 1] <= 0xD7
            for i in range(2, len(data) - 2)
        ), "progressive encoder must emit RSTn markers"
        assert np.array_equal(jpeg.decode_gray(data), base)
    rgb = rng.integers(0, 256, size=(18, 20, 3), dtype=np.uint8)
    base = jpeg.decode_gray(jpeg.encode_rgb420(rgb))
    data = jpeg.encode_rgb420_progressive(rgb, restart_interval=2)
    assert np.array_equal(jpeg.decode_gray(data), base)


def test_progressive_truncation_is_corrupt():
    img = (np.arange(256, dtype=np.uint16).reshape(16, 16) % 256).astype(np.uint8)
    data = jpeg.encode_gray_progressive(img)
    # cut inside the scans (after the first SOS) and before EOI
    first_sos = data.find(b"\xff\xda")
    for cut in (first_sos + 20, len(data) - 3):
        with pytest.raises(ValueError, match="corrupt"):
            jpeg.decode_gray(data[:cut])


def _roundtrip_coef_grid(grid, scans):
    """White-box harness: run the progressive AC scan encoders and the
    scan decoder directly over a fabricated single-component coefficient
    grid (bypassing the DCT, which cannot express adversarial
    coefficient patterns exactly). Returns the decoded grid."""
    from amp.jpeg import (
        _ENC_AC_COUNTS, _ENC_AC_VALUES, _Huff, _ScanWriter,
        _decode_scan_prog, _enc_ac_first, _enc_ac_refine, _enc_codes,
    )

    by_n, bx_n = grid.shape[:2]
    comp = {"id": 1, "h": 1, "v": 1, "tq": 0}
    frame = {"h": by_n * 8, "w": bx_n * 8, "comps": [comp], "prog": True}
    ac_codes = _enc_codes(_ENC_AC_COUNTS, _ENC_AC_VALUES)
    huff_ac = {0: _Huff(_ENC_AC_COUNTS, _ENC_AC_VALUES)}
    decoded = {1: np.zeros((by_n, bx_n, 64), dtype=np.int32)}
    for ss, se, ah, al in scans:
        out = bytearray()
        sw = _ScanWriter(out)
        if ah == 0:
            _enc_ac_first(sw, grid, by_n, bx_n, ss, se, al, ac_codes, 0)
        else:
            _enc_ac_refine(sw, grid, by_n, bx_n, ss, se, al, ac_codes, 0)
        sw.done()
        out.extend(b"\xff\xd9")  # terminate the bit reader's segment
        _decode_scan_prog(bytes(out), 0, frame, [(comp, 0, 0)], ss, se,
                          ah, al, {}, {}, huff_ac, 0, decoded)
    return decoded[1]


def test_progressive_ac_refinement_whitebox_adversarial():
    """Coefficient-level round-trip of the AC first+refine scan pair on
    patterns chosen to hit the narrow branches: ZRL splits at
    already-nonzero positions, correction bits landing after the 16th
    zero of a ZRL span, EOB runs spanning blocks with pending
    correction bits, and full-band zero blocks."""
    # block A: >16 zeros, then an already-nonzero (|v|>=2 at Al=1),
    # then a newly-nonzero (|v| in {2,3} -> 1 at Al=1... use Al 1->0)
    blocks = []
    a = np.zeros(64, np.int32)
    a[20], a[40] = 5, 3  # corr bit after 16th zero + new coef later
    blocks.append(a)
    b = np.zeros(64, np.int32)
    b[1], b[35] = -4, -2  # nonzero early, 33 zeros, then new negative
    blocks.append(b)
    blocks.append(np.zeros(64, np.int32))  # all-zero: pure EOB run
    c = np.zeros(64, np.int32)
    c[2], c[3] = 7, -6  # dense head, long zero tail (pending bits)
    blocks.append(c)
    blocks.append(np.zeros(64, np.int32))  # extends the EOB run
    d = np.zeros(64, np.int32)
    d[63] = 2  # new coefficient at the very last band position
    blocks.append(d)
    grid = np.stack(blocks).reshape(2, 3, 64)
    out = _roundtrip_coef_grid(grid, [(1, 63, 0, 1), (1, 63, 1, 0)])
    got = grid.copy()
    got[:, :, 1:] = out[:, :, 1:]  # DC untouched by AC scans
    assert np.array_equal(got[:, :, 1:], grid[:, :, 1:])

    # randomized sweep, three precision levels 2 -> 1 -> 0
    rng = np.random.default_rng(17)
    for trial in range(25):
        g = np.zeros((3, 4, 64), np.int32)
        mask = rng.random((3, 4, 64)) < rng.uniform(0.02, 0.4)
        g[mask] = rng.integers(-9, 10, size=int(mask.sum()))
        g[:, :, 0] = 0
        out = _roundtrip_coef_grid(
            g, [(1, 63, 0, 2), (1, 63, 2, 1), (1, 63, 1, 0)])
        assert np.array_equal(out[:, :, 1:], g[:, :, 1:]), f"trial {trial}"
