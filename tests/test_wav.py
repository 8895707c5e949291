"""Pure-stdlib WAV decode + audio feature grid (amp.multimodal).
No Spark. Sample formats round-trip against the module's own encoder
and against the stdlib `wave` writer (an INDEPENDENT producer, so the
PCM16 layout is cross-checked outside this codebase)."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from amp.multimodal import (
    _decode_image_status,
    sniff_format,
    wav_decode,
    wav_encode,
    wav_feature_grid,
)


def _sine(n=800, hz=440.0, rate=8000):
    return 0.5 * np.sin(2 * np.pi * hz * np.arange(n) / rate)


def test_pcm16_cross_checked_against_stdlib_wave():
    x = _sine()
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(np.rint(x * 32767).astype("<i2").tobytes())
    samples, rate = wav_decode(buf.getvalue())
    assert rate == 8000 and len(samples) == len(x)
    assert float(np.abs(samples - x).max()) < 1e-3
    # the module's own encoder produces byte-compatible samples
    samples2, _ = wav_decode(wav_encode(x, rate=8000, bits=16))
    assert np.array_equal(samples, samples2)


@pytest.mark.parametrize("bits,ieee", [(8, False), (16, False),
                                       (24, False), (32, False),
                                       (32, True), (64, True)])
def test_sample_format_roundtrips(bits, ieee):
    x = _sine(400)
    samples, rate = wav_decode(wav_encode(x, bits=bits, ieee_float=ieee))
    tol = {8: 2e-2, 16: 1e-3, 24: 1e-6, 32: 1e-6, 64: 1e-6}[bits]
    assert rate == 8000
    assert float(np.abs(samples - x).max()) < tol


def test_stereo_downmix():
    left = _sine(300, 220.0)
    right = _sine(300, 880.0)
    inter = np.empty(600)
    inter[0::2], inter[1::2] = left, right
    samples, _ = wav_decode(wav_encode(inter, channels=2))
    assert len(samples) == 300
    assert float(np.abs(samples - (left + right) / 2).max()) < 1e-3


def test_feature_grid_shape_and_energy_location():
    """A low tone then a high tone: energy moves from a low band in
    early windows to a higher band in late windows."""
    rate = 8000
    lo = _sine(2048, 250.0, rate)
    hi = _sine(2048, 3000.0, rate)
    grid = wav_feature_grid(wav_encode(np.concatenate([lo, hi]), rate=rate))
    assert grid.shape == (8, 8) and grid.dtype == np.float32
    assert 0.0 <= grid.min() and grid.max() <= 1.0
    # first half of the windows: low band dominates; second half: high
    assert grid[0, :2].sum() > grid[0, 4:].sum()
    assert grid[7, 4:].sum() > grid[7, :2].sum()
    # deterministic
    grid2 = wav_feature_grid(wav_encode(np.concatenate([lo, hi]), rate=rate))
    assert np.array_equal(grid, grid2)


def test_corrupt_and_unsupported():
    good = wav_encode(_sine(100))
    with pytest.raises(ValueError, match="corrupt"):
        wav_decode(b"RIFF\x00\x00\x00\x00WAVE")  # no chunks
    with pytest.raises(ValueError, match="corrupt"):
        wav_decode(good[:30])  # torn data chunk
    # ADPCM format tag -> unsupported
    i = good.index(b"fmt ") + 8
    adpcm = good[:i] + struct.pack("<H", 2) + good[i + 2:]
    with pytest.raises(ValueError, match="unsupported"):
        wav_decode(adpcm)
    with pytest.raises(ValueError, match="corrupt"):
        wav_decode(b"not audio")


def test_sniff_and_ladder_status():
    good = wav_encode(_sine(200))
    assert sniff_format(good) == "wav"
    grid, status, fmt = _decode_image_status(good, allow_fake=False)
    assert (status, fmt) == ("real", "wav")
    assert grid.shape == (8, 8)

    _, status, fmt = _decode_image_status(good[:25], allow_fake=False)
    assert (status, fmt) == ("corrupt", "wav")

    i = good.index(b"fmt ") + 8
    adpcm = good[:i] + struct.pack("<H", 2) + good[i + 2:]
    _, status, fmt = _decode_image_status(adpcm, allow_fake=False)
    assert (status, fmt) == ("unsupported", "wav")

    grid, status, fmt = _decode_image_status(good[:25], allow_fake=True)
    assert status == "fake" and grid is not None
