"""Pure-Python FLAC codec (amp.flac). No Spark.

Every round-trip here runs with the STREAMINFO MD5 populated, so the
decoder's in-format integrity check (MD5 over the reconstructed
interleaved samples) independently proves bit-exact reconstruction —
a corrupted stream or a decoder bug fails the format's own checksum,
not just this harness's comparison. CRC-8 (header) and CRC-16 (frame)
are verified on every frame.
"""

from __future__ import annotations

import numpy as np
import pytest

from amp import flac


def _expect(ch: np.ndarray, bps: int = 16) -> np.ndarray:
    arr = np.asarray(ch, dtype=np.float64)
    if arr.ndim == 2:
        arr = arr.mean(axis=0)
    return np.clip(arr / float(1 << (bps - 1)), -1, 1)


def _rt(ch, **kw):
    data = flac.encode(ch, **kw)
    mono, rate = flac.decode(data)
    bps = kw.get("bps", 16)
    assert rate == kw.get("rate", 8000)
    assert np.allclose(mono, _expect(ch, bps), atol=1e-9)
    return data


def test_all_subframe_kinds():
    rng = np.random.default_rng(7)
    x = rng.integers(-2000, 2000, size=600).astype(np.int64)
    for order in range(5):
        _rt(x, subframe_kind="fixed", order=order)
    _rt(np.full(600, -123, np.int64), subframe_kind="constant")
    _rt(x, subframe_kind="verbatim")
    # LPC with several coefficient/shift shapes (residuals computed by
    # the real forward predictor, so any set round-trips)
    for coefs, shift in (([3, -2, 1], 1), ([1], 0), ([7, -11, 9, -3], 2),
                         ([-5, 4], 3)):
        _rt(x, subframe_kind="lpc", lpc_coefs=coefs, lpc_shift=shift)


def test_stereo_decorrelation_modes():
    rng = np.random.default_rng(11)
    left = rng.integers(-3000, 3000, size=500).astype(np.int64)
    right = (left + rng.integers(-100, 100, size=500)).astype(np.int64)
    st = np.stack([left, right])
    for mode in ("independent", "left_side", "right_side", "mid_side"):
        _rt(st, stereo_mode=mode)
    # odd left+right sums exercise the mid/side parity reconstruction
    odd = np.stack([left, left + 1])
    _rt(odd, stereo_mode="mid_side")


def test_rice_partitions_escapes_and_wasted_bits():
    rng = np.random.default_rng(13)
    x = rng.integers(-2000, 2000, size=512).astype(np.int64)
    _rt(x, porder=2)
    _rt(x, porder=3)
    _rt(x, porder=0, escape_raw=15)
    _rt(x, porder=2, escape_raw=15)
    w = (rng.integers(-500, 500, size=400) << 3).astype(np.int64)
    _rt(w, wasted=3)
    # an escape width too narrow for the residuals is a FIXTURE error
    with pytest.raises(ValueError, match="escape width"):
        flac.encode(x, escape_raw=4)


def test_multi_frame_and_short_final_block():
    rng = np.random.default_rng(17)
    y = rng.integers(-1000, 1000, size=700).astype(np.int64)
    data = _rt(y, block_size=256)  # 256 + 256 + 188 (8-bit size form)
    assert data.count(b"\xff\xf8") >= 3  # three frame syncs
    _rt(y, block_size=300)  # short final block > 256 (16-bit form)


def test_bit_depths():
    rng = np.random.default_rng(19)
    _rt(rng.integers(-100, 100, size=300).astype(np.int64), bps=8)
    _rt(rng.integers(-30000, 30000, size=300).astype(np.int64), bps=16)
    _rt(rng.integers(-(1 << 22), 1 << 22, size=300).astype(np.int64),
        bps=24)


def test_corruption_caught_by_frame_crc_or_md5():
    """Flipping any byte of the encoded stream must surface as a
    ValueError (header CRC-8, frame CRC-16, MD5, or a structural
    parse error) — never a silent wrong decode."""
    rng = np.random.default_rng(23)
    x = rng.integers(-2000, 2000, size=400).astype(np.int64)
    good = flac.encode(x)
    base, _ = flac.decode(good)
    for pos in range(40, len(good), 37):
        bad = bytearray(good)
        bad[pos] ^= 0x10
        try:
            out, _ = flac.decode(bytes(bad))
        except ValueError:
            continue
        # extraordinarily unlikely, but a decode that somehow survives
        # must at least be byte-identical (the flip hit dead space)
        assert np.array_equal(out, base)


def test_corrupt_and_unsupported_statuses():
    x = np.arange(-50, 50, dtype=np.int64)
    good = flac.encode(x)
    with pytest.raises(ValueError, match="corrupt"):
        flac.decode(b"not flac at all")
    with pytest.raises(ValueError, match="corrupt"):
        flac.decode(good[:30])
    with pytest.raises(ValueError, match="corrupt"):
        flac.decode(good[:60])  # torn mid-frame


def test_md5_is_the_end_to_end_proof():
    """The decoder verifies STREAMINFO MD5 over its own reconstruction:
    encode with a deliberately wrong MD5 and the decode must fail even
    though every CRC is intact."""
    x = np.arange(-200, 200, dtype=np.int64)
    good = flac.encode(x, with_md5=True)
    # STREAMINFO md5 lives at bytes [8+4+18, 8+4+34) of the stream:
    # fLaC(4) + block header(4) + 18 fixed bytes
    bad = bytearray(good)
    bad[26] ^= 0xFF
    with pytest.raises(ValueError, match="MD5"):
        flac.decode(bytes(bad))
    # md5 omitted (zeroed): decoder skips the check, stream decodes
    nomd5 = flac.encode(x, with_md5=False)
    out, _ = flac.decode(nomd5)
    assert np.allclose(out, _expect(x), atol=1e-9)


def test_ladder_and_sniffing():
    from amp.multimodal import _decode_image_status, sniff_format

    x = (np.sin(np.arange(2048) * 0.07) * 9000).astype(np.int64)
    data = flac.encode(x)
    assert sniff_format(data) == "flac"
    grid, status, fmt = _decode_image_status(data, allow_fake=False)
    assert (status, fmt) == ("real", "flac")
    assert grid.shape == (8, 8) and 0.0 <= grid.min() and grid.max() <= 1.0

    _, status, fmt = _decode_image_status(data[:40], allow_fake=False)
    assert (status, fmt) == ("corrupt", "flac")

    # the spectrogram grid matches the WAV path's for the same signal
    from amp.multimodal import _audio_grid, wav_encode, wav_feature_grid

    g_flac = _audio_grid(flac.decode(data)[0])
    g_wav = wav_feature_grid(wav_encode(x / 32768.0, bits=16))
    assert np.abs(g_flac - g_wav).max() < 1e-3


def test_randomized_sweep():
    rng = np.random.default_rng(29)
    for trial in range(12):
        n = int(rng.integers(1, 900))
        n_ch = int(rng.integers(1, 3))
        x = rng.integers(-4000, 4000, size=(n_ch, n)).astype(np.int64)
        kind = ["fixed", "verbatim", "lpc"][trial % 3]
        kw = {}
        if kind == "fixed":
            kw["order"] = int(rng.integers(0, 5))
            if n <= kw["order"]:
                kw["order"] = 0
        if kind == "lpc":
            m = int(rng.integers(1, min(5, n + 1) if n < 5 else 5))
            kw["lpc_coefs"] = [int(c) for c in rng.integers(-8, 9, size=m)]
            kw["lpc_shift"] = int(rng.integers(0, 4))
            if n <= m:
                kind = "verbatim"
                kw = {}
        mode = "independent"
        if n_ch == 2:
            mode = ["independent", "left_side", "right_side",
                    "mid_side"][trial % 4]
        _rt(x, subframe_kind=kind, stereo_mode=mode,
            block_size=int(rng.integers(max(8, n // 3 + 1), 2049)), **kw)
