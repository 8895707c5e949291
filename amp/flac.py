"""Pure-Python FLAC decoder + test-fixture encoder.

Decoder: the public FLAC format (xiph.org spec / RFC 9639): fLaC
magic + metadata blocks (STREAMINFO parsed, others skipped), frames
with CRC-8-checked headers (block-size/sample-rate/channel/sample-size
codes incl. the get-from-header escapes), UTF-8-coded frame numbers,
subframe types CONSTANT / VERBATIM / FIXED (orders 0-4) / LPC (any
order, quantized coefficients + shift), wasted-bits unary prefix,
Rice/Rice2 partitioned residuals with raw-bits escape partitions,
stereo decorrelation (left/side, right/side, mid/side) and CRC-16
frame footers. When STREAMINFO carries a non-zero MD5, the decoder
recomputes it over the reconstructed samples and fails loudly on
mismatch — an end-to-end integrity check INSIDE the format itself,
so a round-trip that passes MD5 proves bit-exact reconstruction
independently of the test harness's own comparison.

Unsupported -> ValueError("unsupported ..."): sample rates above the
20-bit field, reserved subframe types. Torn/garbled payloads ->
ValueError("corrupt ...") — the multimodal ladder maps both to
decode_status as data.

Encoder: the minimum needed to TEST the decoder without libFLAC —
every subframe type (LPC with arbitrary chosen coefficients: residuals
computed by running the real predictor forward, so ANY coefficient
set round-trips), Rice parameters chosen per partition by exhaustive
cost, escape partitions, wasted-bits, all three stereo decorrelations,
multi-frame streams, and the STREAMINFO MD5. Deliberately not a
compressor; a fixture generator.

Reference parity note: TFMV/AddressMatchPro has no audio path; this
serves the LLM-training-data brief (multimodal columns), extending
the real-decode ladder to lossless compressed audio.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_CRC8_POLY = 0x07
_CRC16_POLY = 0x8005

_CRC8_TABLE = []
for _b in range(256):
    _c = _b
    for _ in range(8):
        _c = ((_c << 1) ^ _CRC8_POLY) & 0xFF if _c & 0x80 else (_c << 1) & 0xFF
    _CRC8_TABLE.append(_c)

_CRC16_TABLE = []
for _b in range(256):
    _c = _b << 8
    for _ in range(8):
        _c = ((_c << 1) ^ _CRC16_POLY) & 0xFFFF if _c & 0x8000 \
            else (_c << 1) & 0xFFFF
    _CRC16_TABLE.append(_c)


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC8_TABLE[c ^ b]
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC16_TABLE[((c >> 8) ^ b) & 0xFF] ^ ((c << 8) & 0xFFFF)
    return c


# fixed-predictor coefficients by order (FLAC spec §fixed subframe)
_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}

# block-size code table (codes 2-5 and 8-15 are fixed sizes)
_BLOCK_SIZES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                13: 8192, 14: 16384, 15: 32768}

_SAMPLE_RATES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
                 6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
                 11: 96000}

_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


class _Bits:
    """MSB-first bit reader (FLAC convention)."""

    def __init__(self, buf: bytes, bytepos: int = 0):
        self.buf = buf
        self.pos = bytepos * 8

    def get(self, n: int) -> int:
        if self.pos + n > len(self.buf) * 8:
            raise ValueError("corrupt flac: truncated stream")
        v = 0
        p = self.pos
        for i in range(n):
            v = (v << 1) | ((self.buf[(p + i) >> 3] >> (7 - ((p + i) & 7))) & 1)
        self.pos += n
        return v

    def sget(self, n: int) -> int:
        v = self.get(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        n = 0
        limit = len(self.buf) * 8
        while True:
            if self.pos >= limit:
                raise ValueError("corrupt flac: truncated unary code")
            bit = (self.buf[self.pos >> 3] >> (7 - (self.pos & 7))) & 1
            self.pos += 1
            if bit:
                return n
            n += 1

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _read_utf8_number(br: _Bits) -> int:
    """FLAC's UTF-8-style variable-length frame/sample number (extended
    to 36 bits / 7 bytes)."""
    b0 = br.get(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 1 or n > 6:
        raise ValueError("corrupt flac: bad frame number coding")
    v = b0 & (mask - 1)
    for _ in range(n):
        c = br.get(8)
        if (c & 0xC0) != 0x80:
            raise ValueError("corrupt flac: bad frame number continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _read_residual(br: _Bits, blocksize: int, order: int) -> list[int]:
    method = br.get(2)
    if method > 1:
        raise ValueError("unsupported flac: reserved residual method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.get(4)
    n_part = 1 << porder
    res: list[int] = []
    for p in range(n_part):
        n = (blocksize >> porder) - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("corrupt flac: bad partition order")
        param = br.get(pbits)
        if param == escape:
            raw = br.get(5)
            if raw == 0:
                res.extend([0] * n)
            else:
                res.extend(br.sget(raw) for _ in range(n))
        else:
            for _ in range(n):
                q = br.unary()
                v = (q << param) | br.get(param)
                res.append((v >> 1) ^ -(v & 1))
    return res


def _read_subframe(br: _Bits, blocksize: int, bps: int) -> list[int]:
    if br.get(1):
        raise ValueError("corrupt flac: subframe padding bit set")
    ftype = br.get(6)
    wasted = 0
    if br.get(1):
        wasted = br.unary() + 1
        bps -= wasted
    if ftype == 0:  # CONSTANT
        out = [br.sget(bps)] * blocksize
    elif ftype == 1:  # VERBATIM
        out = [br.sget(bps) for _ in range(blocksize)]
    elif 8 <= ftype <= 12:  # FIXED, order = ftype - 8
        order = ftype - 8
        out = [br.sget(bps) for _ in range(order)]
        res = _read_residual(br, blocksize, order)
        coefs = _FIXED_COEFS[order]
        for i, r in enumerate(res):
            pred = sum(c * out[order + i - 1 - j]
                       for j, c in enumerate(coefs))
            out.append(pred + r)
    elif ftype >= 32:  # LPC, order = (ftype & 31) + 1
        order = (ftype & 31) + 1
        out = [br.sget(bps) for _ in range(order)]
        prec = br.get(4) + 1
        if prec == 16:
            raise ValueError("corrupt flac: invalid qlp precision")
        shift = br.sget(5)
        if shift < 0:
            raise ValueError("corrupt flac: negative qlp shift")
        coefs = [br.sget(prec) for _ in range(order)]
        res = _read_residual(br, blocksize, order)
        for i, r in enumerate(res):
            acc = sum(c * out[order + i - 1 - j]
                      for j, c in enumerate(coefs))
            out.append((acc >> shift) + r)
    else:
        raise ValueError(f"unsupported flac: reserved subframe type {ftype}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def decode(payload: bytes) -> tuple[np.ndarray, int]:
    """FLAC -> (mono float32 samples in [-1, 1], sample_rate), the
    wav_decode contract. Multi-channel audio is downmixed by mean
    AFTER full per-channel reconstruction (and after the MD5 check,
    which runs over the interleaved original channels)."""
    if len(payload) < 42 or payload[:4] != b"fLaC":
        raise ValueError("corrupt flac: bad magic")
    pos = 4
    streaminfo = None
    while pos + 4 <= len(payload):
        hdr = payload[pos]
        last = hdr & 0x80
        btype = hdr & 0x7F
        (ln,) = struct.unpack(">I", b"\x00" + payload[pos + 1:pos + 4])
        body = payload[pos + 4:pos + 4 + ln]
        if len(body) != ln:
            raise ValueError("corrupt flac: truncated metadata block")
        if btype == 0:
            if ln < 34:
                raise ValueError("corrupt flac: short STREAMINFO")
            streaminfo = body
        pos += 4 + ln
        if last:
            break
    if streaminfo is None:
        raise ValueError("corrupt flac: missing STREAMINFO")
    si = _Bits(streaminfo)
    si.get(16)  # min block size
    si.get(16)  # max block size
    si.get(24)
    si.get(24)  # min/max frame size
    rate = si.get(20)
    n_ch = si.get(3) + 1
    bps_si = si.get(5) + 1
    total = si.get(36)
    md5 = streaminfo[18:34]
    if rate == 0:
        raise ValueError("corrupt flac: zero sample rate")

    channels: list[list[int]] = [[] for _ in range(n_ch)]
    while pos < len(payload):
        frame_start = pos
        br = _Bits(payload, pos)
        sync = br.get(14)
        if sync != 0x3FFE:
            raise ValueError("corrupt flac: lost frame sync")
        br.get(1)  # reserved
        br.get(1)  # blocking strategy
        bs_code = br.get(4)
        sr_code = br.get(4)
        ch_code = br.get(4)
        ss_code = br.get(3)
        br.get(1)  # reserved
        _read_utf8_number(br)
        if bs_code == 0:
            raise ValueError("corrupt flac: reserved block size code")
        elif bs_code == 6:
            blocksize = br.get(8) + 1
        elif bs_code == 7:
            blocksize = br.get(16) + 1
        else:
            blocksize = _BLOCK_SIZES[bs_code]
        if sr_code == 0:
            pass  # from STREAMINFO
        elif sr_code in _SAMPLE_RATES:
            if _SAMPLE_RATES[sr_code] != rate:
                raise ValueError("corrupt flac: frame rate != STREAMINFO")
        elif sr_code == 12:
            br.get(8)
        elif sr_code == 13 or sr_code == 14:
            br.get(16)
        else:
            raise ValueError("corrupt flac: invalid sample rate code")
        if ss_code == 0:
            bps = bps_si
        elif ss_code in _SAMPLE_SIZES:
            bps = _SAMPLE_SIZES[ss_code]
        else:
            raise ValueError("unsupported flac: reserved sample size")
        # CRC-8 covers the header bytes up to (not incl.) the CRC byte
        hdr_end = (br.pos + 7) >> 3
        if _crc8(payload[frame_start:hdr_end]) != br.get(8):
            raise ValueError("corrupt flac: frame header CRC-8 mismatch")

        if ch_code < 8:
            if ch_code + 1 != n_ch:
                raise ValueError("corrupt flac: channel count mismatch")
            subs = [_read_subframe(br, blocksize, bps)
                    for _ in range(n_ch)]
        elif ch_code in (8, 9, 10):
            if n_ch != 2:
                raise ValueError("corrupt flac: stereo code on non-stereo")
            if ch_code == 8:  # left/side
                left = _read_subframe(br, blocksize, bps)
                side = _read_subframe(br, blocksize, bps + 1)
                subs = [left, [l - s for l, s in zip(left, side)]]
            elif ch_code == 9:  # right/side
                side = _read_subframe(br, blocksize, bps + 1)
                right = _read_subframe(br, blocksize, bps)
                subs = [[r + s for r, s in zip(right, side)], right]
            else:  # mid/side
                mid = _read_subframe(br, blocksize, bps)
                side = _read_subframe(br, blocksize, bps + 1)
                subs = [[], []]
                for m, s in zip(mid, side):
                    m2 = (m << 1) | (s & 1)
                    subs[0].append((m2 + s) >> 1)
                    subs[1].append((m2 - s) >> 1)
        else:
            raise ValueError("corrupt flac: reserved channel assignment")
        br.align()
        crc_end = br.pos >> 3
        if _crc16(payload[frame_start:crc_end]) != br.get(16):
            raise ValueError("corrupt flac: frame CRC-16 mismatch")
        for c in range(n_ch):
            channels[c].extend(subs[c])
        pos = br.pos >> 3

    n = len(channels[0])
    if n == 0:
        raise ValueError("corrupt flac: no frames")
    if total and n != total:
        raise ValueError("corrupt flac: sample count != STREAMINFO")
    arr = np.array(channels, dtype=np.int64)  # (n_ch, n)
    if md5 != b"\x00" * 16:
        nbytes = (bps_si + 7) // 8
        inter = arr.T.reshape(-1)  # interleaved
        buf = np.zeros((len(inter), nbytes), dtype=np.uint8)
        u = inter.astype(np.uint64) & ((1 << (8 * nbytes)) - 1)
        for k in range(nbytes):  # little-endian per sample
            buf[:, k] = (u >> (8 * k)) & 0xFF
        if hashlib.md5(buf.tobytes()).digest() != md5:
            raise ValueError("corrupt flac: MD5 mismatch (decode error "
                             "or corrupted stream)")
    mono = arr.mean(axis=0)
    scale = float(1 << (bps_si - 1))
    return np.clip(mono / scale, -1.0, 1.0).astype(np.float32), int(rate)


# ---------------------------------------------------------------------------
# test-fixture encoder
# ---------------------------------------------------------------------------


class _BitW:
    """MSB-first bit writer."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def unary(self, n: int) -> None:
        while n >= 32:
            self.put(0, 32)
            n -= 32
        self.put(1, n + 1)  # n zeros then a one

    def align(self) -> None:
        if self.nbits:
            self.put(0, 8 - self.nbits)


def _zigzag(v: int) -> int:
    return (v << 1) if v >= 0 else ((-v << 1) - 1)


def _write_residual(bw: _BitW, res: list[int], blocksize: int, order: int,
                    porder: int = 0, escape_raw: int = 0) -> None:
    """Rice method 0, partition order ``porder``; ``escape_raw`` > 0
    forces every partition to the raw-bits escape at that width."""
    bw.put(0, 2)
    bw.put(porder, 4)
    n_part = 1 << porder
    idx = 0
    for p in range(n_part):
        n = (blocksize >> porder) - (order if p == 0 else 0)
        part = res[idx:idx + n]
        idx += n
        if escape_raw:
            lo, hi = -(1 << (escape_raw - 1)), (1 << (escape_raw - 1)) - 1
            if any(v < lo or v > hi for v in part):
                raise ValueError(
                    f"fixture encoder: residual exceeds {escape_raw}-bit "
                    "escape width")
            bw.put(15, 4)
            bw.put(escape_raw, 5)
            for v in part:
                bw.put(v & ((1 << escape_raw) - 1), escape_raw)
        else:
            zz = [_zigzag(v) for v in part]
            best, best_cost = 0, None
            for param in range(15):
                cost = sum((z >> param) + 1 + param for z in zz)
                if best_cost is None or cost < best_cost:
                    best, best_cost = param, cost
            bw.put(best, 4)
            for z in zz:
                bw.unary(z >> best)
                bw.put(z, best)


def _write_subframe(bw: _BitW, samples: list[int], bps: int, *,
                    kind: str = "fixed", order: int = 2,
                    lpc_coefs=None, lpc_shift: int = 0,
                    wasted: int = 0, porder: int = 0,
                    escape_raw: int = 0) -> None:
    bw.put(0, 1)
    if wasted:
        vals = [v >> wasted for v in samples]
        eff_bps = bps - wasted
    else:
        vals = samples
        eff_bps = bps
    blocksize = len(vals)
    if kind == "constant":
        bw.put(0, 6)
        bw.put(1 if wasted else 0, 1)
        if wasted:
            bw.unary(wasted - 1)
        bw.put(vals[0] & ((1 << eff_bps) - 1), eff_bps)
        return
    if kind == "verbatim":
        bw.put(1, 6)
        bw.put(1 if wasted else 0, 1)
        if wasted:
            bw.unary(wasted - 1)
        for v in vals:
            bw.put(v & ((1 << eff_bps) - 1), eff_bps)
        return
    if kind == "fixed":
        bw.put(8 + order, 6)
        bw.put(1 if wasted else 0, 1)
        if wasted:
            bw.unary(wasted - 1)
        coefs = _FIXED_COEFS[order]
        for v in vals[:order]:
            bw.put(v & ((1 << eff_bps) - 1), eff_bps)
        res = [
            vals[i] - sum(c * vals[i - 1 - j] for j, c in enumerate(coefs))
            for i in range(order, blocksize)
        ]
        _write_residual(bw, res, blocksize, order, porder, escape_raw)
        return
    if kind == "lpc":
        coefs = list(lpc_coefs)
        order = len(coefs)
        prec = max(2, max(int(abs(c)).bit_length() + 1 for c in coefs))
        bw.put(32 + order - 1, 6)
        bw.put(1 if wasted else 0, 1)
        if wasted:
            bw.unary(wasted - 1)
        for v in vals[:order]:
            bw.put(v & ((1 << eff_bps) - 1), eff_bps)
        bw.put(prec - 1, 4)
        bw.put(lpc_shift, 5)
        for c in coefs:
            bw.put(c & ((1 << prec) - 1), prec)
        res = [
            vals[i]
            - (sum(c * vals[i - 1 - j] for j, c in enumerate(coefs))
               >> lpc_shift)
            for i in range(order, blocksize)
        ]
        _write_residual(bw, res, blocksize, order, porder, escape_raw)
        return
    raise ValueError(f"unknown subframe kind {kind!r}")


def encode(channels: np.ndarray, rate: int = 8000, bps: int = 16,
           block_size: int = 256, stereo_mode: str = "independent",
           subframe_kind: str = "fixed", order: int = 2,
           lpc_coefs=None, lpc_shift: int = 0, wasted: int = 0,
           porder: int = 0, escape_raw: int = 0,
           with_md5: bool = True) -> bytes:
    """(n_ch, n) int samples -> FLAC bytes. Fixture encoder: every
    decoder branch reachable via the options."""
    ch = np.asarray(channels, dtype=np.int64)
    if ch.ndim == 1:
        ch = ch[None, :]
    n_ch, n = ch.shape
    if stereo_mode != "independent" and n_ch != 2:
        raise ValueError("stereo modes need exactly 2 channels")

    out = bytearray(b"fLaC")
    si = _BitW()
    si.put(block_size, 16)
    si.put(block_size, 16)
    si.put(0, 24)
    si.put(0, 24)
    si.put(rate, 20)
    si.put(n_ch - 1, 3)
    si.put(bps - 1, 5)
    si.put(n, 36)
    si.align()
    body = bytes(si.out)
    if with_md5:
        nbytes = (bps + 7) // 8
        inter = ch.T.reshape(-1)
        buf = np.zeros((len(inter), nbytes), dtype=np.uint8)
        u = inter.astype(np.uint64) & ((1 << (8 * nbytes)) - 1)
        for k in range(nbytes):
            buf[:, k] = (u >> (8 * k)) & 0xFF
        body += hashlib.md5(buf.tobytes()).digest()
    else:
        body += b"\x00" * 16
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    frame_no = 0
    for start in range(0, n, block_size):
        blk = ch[:, start:start + block_size]
        bs = blk.shape[1]
        bw = _BitW()
        bw.put(0x3FFE, 14)
        bw.put(0, 1)
        bw.put(0, 1)  # fixed blocking
        use8 = bs != block_size and bs <= 256
        bw.put(6 if use8 else 7, 4)  # 8-bit / 16-bit size-1 forms
        bw.put(0, 4)  # rate from STREAMINFO
        ch_code = {"independent": n_ch - 1, "left_side": 8,
                   "right_side": 9, "mid_side": 10}[stereo_mode]
        bw.put(ch_code, 4)
        bw.put(0, 3)  # bps from STREAMINFO
        bw.put(0, 1)
        # UTF-8 frame number (fits 7 bits for fixtures up to 127 frames)
        if frame_no >= 0x80:
            raise ValueError("fixture encoder: too many frames")
        bw.put(frame_no, 8)
        if use8:
            bw.put(bs - 1, 8)
        else:
            bw.put(bs - 1, 16)
        hdr = bytes(bw.out)
        assert bw.nbits == 0
        bw.put(_crc8(hdr), 8)

        kw = dict(kind=subframe_kind, order=order, lpc_coefs=lpc_coefs,
                  lpc_shift=lpc_shift, wasted=wasted, porder=porder,
                  escape_raw=escape_raw)
        # a block shorter than the predictor order can't carry warmup
        # samples — downgrade it (typically the short final block)
        pred_order = (order if subframe_kind == "fixed"
                      else len(lpc_coefs or []) if subframe_kind == "lpc"
                      else 0)
        if bs <= pred_order:
            kw = dict(kind="verbatim", order=0, lpc_coefs=None,
                      lpc_shift=0, wasted=wasted, porder=0, escape_raw=0)
        if stereo_mode == "independent":
            for c in range(n_ch):
                _write_subframe(bw, [int(v) for v in blk[c]], bps, **kw)
        else:
            left = [int(v) for v in blk[0]]
            right = [int(v) for v in blk[1]]
            side = [l - r for l, r in zip(left, right)]
            if stereo_mode == "left_side":
                _write_subframe(bw, left, bps, **kw)
                _write_subframe(bw, side, bps + 1, **kw)
            elif stereo_mode == "right_side":
                _write_subframe(bw, side, bps + 1, **kw)
                _write_subframe(bw, right, bps, **kw)
            else:
                mid = [(l + r) >> 1 for l, r in zip(left, right)]
                _write_subframe(bw, mid, bps, **kw)
                _write_subframe(bw, side, bps + 1, **kw)
        bw.align()
        frame = bytes(bw.out)
        bw.put(_crc16(frame), 16)
        out += bytes(bw.out)
        frame_no += 1
    return bytes(out)
