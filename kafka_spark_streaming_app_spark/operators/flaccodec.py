"""Pure-stdlib FLAC codec (fixed-predictor subset): real compressed
audio for the multimodal pipeline — STREAMINFO with the spec MD5 of
the raw PCM, framed bitstream with CRC-8 frame headers and CRC-16
frame footers, UTF-8-style coded frame numbers, subframe types
CONSTANT / VERBATIM / FIXED(0-4) with wasted-bits support, Rice-coded
residuals (4-bit parameters, escape partitions, partition orders),
and all four 2-channel decorrelation modes (independent, left/side,
right/side, mid/side).

Speech/audio training corpora ship overwhelmingly as FLAC; the
reference pipeline has no media path at all (additive LLM-pipeline
scope). LPC subframes (type 1xxxxx) are out of the implemented
subset and raise loudly. The wire format is pinned by hand-derived
bitstreams in tests/test_flaccodec.py (unary/Rice words worked out on
paper from the format spec), the container is self-checking (the
decoder verifies both CRCs and the STREAMINFO MD5 of its own output
against the encoder-independent hash of the planted samples), and the
per-sample values are hash-checked by closed-form DuckDB oracles.

Format facts encoded below (all public, per the FLAC format spec):
  * frame sync is 14 bits 0b11111111111110, then reserved 0 and the
    blocking-strategy bit (0 = fixed blocksize, frame NUMBER coded);
  * Rice words are quotient-many 0 bits, a 1, then the k-bit
    remainder of the zigzag-folded residual; parameter 0b1111
    escapes to 5-bit-width raw two's-complement values;
  * partition order p splits a frame into 2**p partitions; the first
    carries blocksize/2**p - predictor_order samples;
  * side channels carry bits-per-sample + 1;
  * CRC-8 poly x^8+x^2+x+1 (0x07), CRC-16 poly x^16+x^15+x^2+1
    (0x8005), both initialized to 0.
"""

from __future__ import annotations

import hashlib
import struct

FIXED_COEFFS = {
    0: (),
    1: (1,),
    2: (2, -1),
    3: (3, -3, 1),
    4: (4, -6, 4, -1),
}

_SYNC = 0b11111111111110


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


class _MsbBitWriter:
    def __init__(self):
        self._out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._n += nbits
        while self._n >= 8:
            self._n -= 8
            self._out.append((self._acc >> self._n) & 0xFF)
        self._acc &= (1 << self._n) - 1

    def write_signed(self, value: int, nbits: int) -> None:
        self.write(value & ((1 << nbits) - 1), nbits)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a 1

    def byte_align(self) -> None:
        if self._n:
            self.write(0, 8 - self._n)

    def getvalue(self) -> bytes:
        assert self._n == 0, "writer not byte-aligned"
        return bytes(self._out)


class _MsbBitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self._data = data
        self._byte = pos
        self._acc = 0
        self._n = 0

    def read(self, nbits: int) -> int:
        while self._n < nbits:
            if self._byte >= len(self._data):
                raise ValueError("FLAC bitstream truncated")
            self._acc = (self._acc << 8) | self._data[self._byte]
            self._byte += 1
            self._n += 8
        self._n -= nbits
        val = (self._acc >> self._n) & ((1 << nbits) - 1)
        self._acc &= (1 << self._n) - 1
        return val

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v >= (1 << (nbits - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def byte_align(self) -> None:
        self._n = 0
        self._acc = 0

    def tell_byte(self) -> int:
        """Current byte offset (only valid when byte-aligned)."""
        return self._byte


def _zigzag(v: int) -> int:
    return (v << 1) if v >= 0 else (-(v << 1) - 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


def _utf8_coded_number(n: int) -> bytes:
    """FLAC's UTF-8-style variable-length number (frame number)."""
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (nbytes * 5 + 1)) and nbytes < 7:
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (n >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _read_utf8_coded_number(r: _MsbBitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    n = b0 & (mask - 1)
    for _ in range(nbytes - 1):
        b = r.read(8)
        if (b & 0xC0) != 0x80:
            raise ValueError("bad UTF-8 coded number continuation")
        n = (n << 6) | (b & 0x3F)
    return n


# --------------------------------------------------------------------------
# Encode
# --------------------------------------------------------------------------

_RATE_CODES = {88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5,
               22050: 6, 24000: 7, 32000: 8, 44100: 9, 48000: 10,
               96000: 11}
_BPS_CODES = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6}


def _best_rice_k(residuals) -> int:
    if not residuals:
        return 0
    mean_u = sum(_zigzag(v) for v in residuals) / len(residuals)
    k = 0
    while (1 << (k + 1)) < mean_u + 1 and k < 14:
        k += 1
    return k


def _write_residuals(
    w: _MsbBitWriter, residuals, order: int, blocksize: int,
    partition_order: int, escape_first: bool,
) -> None:
    w.write(0, 2)  # residual method 00: 4-bit Rice
    w.write(partition_order, 3)
    nparts = 1 << partition_order
    assert blocksize % nparts == 0
    idx = 0
    for p in range(nparts):
        n = blocksize // nparts - (order if p == 0 else 0)
        part = residuals[idx : idx + n]
        idx += n
        if escape_first and p == 0:
            width = max(1, max(
                (v.bit_length() + 1 for v in part), default=1
            ))
            w.write(0b1111, 4)
            w.write(width, 5)
            for v in part:
                w.write_signed(v, width)
        else:
            k = _best_rice_k(part)
            w.write(k, 4)
            for v in part:
                u = _zigzag(v)
                w.write_unary(u >> k)
                w.write(u & ((1 << k) - 1), k)
    assert idx == len(residuals)


def _common_trailing_zeros(samples) -> int:
    mask = 0
    for s in samples:
        mask |= s
        if mask & 1:
            return 0
    if mask == 0:
        return 0
    tz = 0
    while (mask & 1) == 0:
        mask >>= 1
        tz += 1
    return tz


def _write_subframe(
    w: _MsbBitWriter, samples, bps: int, order: int | None,
    partition_order: int, escape_first: bool,
) -> None:
    n = len(samples)
    if all(s == samples[0] for s in samples):
        w.write(0, 1)
        w.write(0b000000, 6)  # CONSTANT
        w.write(0, 1)
        w.write_signed(samples[0], bps)
        return
    if order is not None and order >= n:
        # a FIXED subframe needs `order` warmup samples strictly inside
        # the block; short final frames fall back to VERBATIM
        order = None
    wasted = _common_trailing_zeros(samples)
    if wasted:
        samples = [s >> wasted for s in samples]
    eff_bps = bps - wasted
    w.write(0, 1)
    if order is None:
        w.write(0b000001, 6)  # VERBATIM
    else:
        w.write(0b001000 | order, 6)  # FIXED
    if wasted:
        w.write(1, 1)
        w.write_unary(wasted - 1)
    else:
        w.write(0, 1)
    if order is None:
        for s in samples:
            w.write_signed(s, eff_bps)
        return
    coeffs = FIXED_COEFFS[order]
    for s in samples[:order]:
        w.write_signed(s, eff_bps)
    residuals = [
        samples[i] - sum(c * samples[i - 1 - j] for j, c in enumerate(coeffs))
        for i in range(order, n)
    ]
    po = partition_order if (n % (1 << partition_order) == 0 and
                             n // (1 << partition_order) > order) else 0
    _write_residuals(w, residuals, order, n, po, escape_first)


def _pcm_md5(channels, n: int, nch: int, bps: int):
    """STREAMINFO MD5 per spec: interleaved raw PCM, little-endian
    signed, (bps+7)//8 bytes per sample at the stream's bit depth —
    NOT hardcoded 16-bit (an 8- or 24-bit stream hashes differently)."""
    nbytes = (bps + 7) // 8
    md5 = hashlib.md5()
    buf = bytearray()
    for i in range(n):
        for ch in range(nch):
            buf += int(channels[ch][i]).to_bytes(
                nbytes, "little", signed=True
            )
        if len(buf) >= 1 << 16:
            md5.update(bytes(buf))
            buf.clear()
    md5.update(bytes(buf))
    return md5


def encode_flac(
    channels_samples, sample_rate: int = 8000, bps: int = 16,
    blocksize: int = 256, channel_mode: str = "independent",
    subframe_plan=None, partition_order: int = 2,
    escape_first: bool = False,
) -> bytes:
    """Encode per-channel int sample lists as a FLAC file.

    ``channel_mode`` for 2-channel input: independent | left_side |
    right_side | mid_side. ``subframe_plan(frame_no, ch) -> order``
    returns a fixed-predictor order 0..4 or None for VERBATIM;
    constant subframes are auto-detected.
    """
    nch = len(channels_samples)
    n = len(channels_samples[0])
    if any(len(c) != n for c in channels_samples):
        raise ValueError("channels must have equal length")
    if nch == 1:
        channel_mode = "independent"
    if nch > 2 and channel_mode != "independent":
        raise ValueError("decorrelation modes are 2-channel only")
    if subframe_plan is None:
        subframe_plan = lambda f, c: 2  # noqa: E731
    # STREAMINFO MD5: interleaved little-endian raw PCM at the
    # stream's actual bit depth ((bps+7)//8 bytes/sample per spec)
    md5 = _pcm_md5(channels_samples, n, nch, bps)
    frames = []
    frame_no = 0
    pos = 0
    while pos < n:
        bs = min(blocksize, n - pos)
        frames.append((frame_no, pos, bs))
        frame_no += 1
        pos += bs
    out = bytearray(b"fLaC")
    streaminfo = _MsbBitWriter()
    streaminfo.write(blocksize, 16)
    streaminfo.write(blocksize, 16)
    streaminfo.write(0, 24)
    streaminfo.write(0, 24)
    streaminfo.write(sample_rate, 20)
    streaminfo.write(nch - 1, 3)
    streaminfo.write(bps - 1, 5)
    streaminfo.write(n, 36)
    si = streaminfo.getvalue() + md5.digest()
    out += bytes([0x80]) + len(si).to_bytes(3, "big") + si
    assign = {
        "independent": nch - 1,
        "left_side": 0b1000,
        "right_side": 0b1001,
        "mid_side": 0b1010,
    }[channel_mode]
    for frame_no, pos, bs in frames:
        w = _MsbBitWriter()
        w.write(_SYNC, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed-blocksize strategy
        if bs == blocksize and blocksize in (256, 512, 1024, 2048, 4096):
            bs_code = 8 + (blocksize // 256).bit_length() - 1
            bs_extra = None
        else:
            bs_code = 0b0111
            bs_extra = bs - 1
        w.write(bs_code, 4)
        w.write(_RATE_CODES[sample_rate], 4)
        w.write(assign, 4)
        w.write(_BPS_CODES[bps], 3)
        w.write(0, 1)
        for b in _utf8_coded_number(frame_no):
            w.write(b, 8)
        if bs_extra is not None:
            w.write(bs_extra, 16)
        hdr = w._out[:]  # header bytes so far (byte-aligned here)
        assert w._n == 0
        w.write(_crc8(bytes(hdr)), 8)
        seg = [c[pos : pos + bs] for c in channels_samples]
        if channel_mode == "independent":
            subs = [(seg[ch], bps) for ch in range(nch)]
        elif channel_mode == "left_side":
            subs = [
                (seg[0], bps),
                ([l - r for l, r in zip(seg[0], seg[1])], bps + 1),
            ]
        elif channel_mode == "right_side":
            subs = [
                ([l - r for l, r in zip(seg[0], seg[1])], bps + 1),
                (seg[1], bps),
            ]
        else:  # mid_side
            subs = [
                ([(l + r) >> 1 for l, r in zip(seg[0], seg[1])], bps),
                ([l - r for l, r in zip(seg[0], seg[1])], bps + 1),
            ]
        for ch, (samples, ch_bps) in enumerate(subs):
            _write_subframe(
                w, list(samples), ch_bps, subframe_plan(frame_no, ch),
                partition_order, escape_first,
            )
        w.byte_align()
        body = w.getvalue()
        out += body + struct.pack(">H", _crc16(body))
    return bytes(out)


# --------------------------------------------------------------------------
# Decode
# --------------------------------------------------------------------------


def _read_subframe(r: _MsbBitReader, bs: int, bps: int) -> list:
    if r.read(1) != 0:
        raise ValueError("subframe padding bit set")
    stype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
    eff = bps - wasted
    if stype == 0b000000:  # CONSTANT
        v = r.read_signed(eff)
        samples = [v] * bs
    elif stype == 0b000001:  # VERBATIM
        samples = [r.read_signed(eff) for _ in range(bs)]
    elif 0b001000 <= stype <= 0b001100:  # FIXED order 0..4
        order = stype & 0x07
        samples = [r.read_signed(eff) for _ in range(order)]
        method = r.read(2)
        if method != 0:
            raise ValueError("only 4-bit Rice residuals supported")
        po = r.read(3)
        nparts = 1 << po
        residuals = []
        for p in range(nparts):
            count = bs // nparts - (order if p == 0 else 0)
            k = r.read(4)
            if k == 0b1111:
                width = r.read(5)
                residuals.extend(
                    r.read_signed(width) for _ in range(count)
                )
            else:
                for _ in range(count):
                    q = r.read_unary()
                    residuals.append(_unzigzag((q << k) | r.read(k)))
        coeffs = FIXED_COEFFS[order]
        for res in residuals:
            samples.append(
                res
                + sum(c * samples[-1 - j] for j, c in enumerate(coeffs))
            )
    elif stype & 0b100000:
        raise NotImplementedError(
            "LPC subframes are outside the fixed-predictor subset"
        )
    else:
        raise ValueError(f"reserved subframe type {stype:06b}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


_BS_TABLE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
             8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
             13: 8192, 14: 16384, 15: 32768}
_RATE_TABLE = {v: k for k, v in _RATE_CODES.items()}
_BPS_TABLE = {v: k for k, v in _BPS_CODES.items()}


def decode_flac(data: bytes) -> dict:
    """Decode to ``{"sample_rate", "channels", "bps", "n_samples",
    "samples": [per-channel lists], "n_frames", "md5_ok": bool,
    "assignments": [per-frame channel-assignment codes]}``.

    Verifies every frame-header CRC-8, every frame CRC-16, and the
    STREAMINFO MD5 against the decoded output; any mismatch raises."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC file")
    pos = 4
    info = None
    md5_expected = None
    while True:
        hdr = data[pos]
        btype = hdr & 0x7F
        last = bool(hdr & 0x80)
        length = int.from_bytes(data[pos + 1 : pos + 4], "big")
        body = data[pos + 4 : pos + 4 + length]
        if btype == 0:
            r = _MsbBitReader(body)
            r.read(16)
            r.read(16)
            r.read(24)
            r.read(24)
            rate = r.read(20)
            nch = r.read(3) + 1
            bps = r.read(5) + 1
            total = r.read(36)
            info = (rate, nch, bps, total)
            md5_expected = body[18:34]
        pos += 4 + length
        if last:
            break
    if info is None:
        raise ValueError("FLAC missing STREAMINFO")
    rate, nch, bps, total = info
    channels = [[] for _ in range(nch)]
    n_frames = 0
    assignments = []
    while pos < len(data):
        frame_start = pos
        r = _MsbBitReader(data, pos)
        if r.read(14) != _SYNC:
            raise ValueError("lost frame sync")
        if r.read(1) != 0:
            raise ValueError("reserved bit set")
        strategy = r.read(1)
        bs_code = r.read(4)
        rate_code = r.read(4)
        assign = r.read(4)
        bps_code = r.read(3)
        if r.read(1) != 0:
            raise ValueError("reserved bit set")
        _read_utf8_coded_number(r)
        if bs_code == 0b0110:
            bs = r.read(8) + 1
        elif bs_code == 0b0111:
            bs = r.read(16) + 1
        else:
            bs = _BS_TABLE[bs_code]
        if rate_code == 0b1100:
            r.read(8)
        elif rate_code in (0b1101, 0b1110):
            r.read(16)
        elif rate_code != 0:
            pass  # table code, nothing inline
        header_len = r.tell_byte() - frame_start
        crc8 = r.read(8)
        if crc8 != _crc8(data[frame_start : frame_start + header_len]):
            raise ValueError("frame header CRC-8 mismatch")
        frame_bps = _BPS_TABLE[bps_code] if bps_code else bps
        if assign <= 0b0111:
            fch = assign + 1
            subs = [
                _read_subframe(r, bs, frame_bps) for _ in range(fch)
            ]
            decoded = subs
        else:
            if assign == 0b1000:  # left/side
                left = _read_subframe(r, bs, frame_bps)
                side = _read_subframe(r, bs, frame_bps + 1)
                decoded = [left, [l - s for l, s in zip(left, side)]]
            elif assign == 0b1001:  # right/side
                side = _read_subframe(r, bs, frame_bps + 1)
                right = _read_subframe(r, bs, frame_bps)
                decoded = [[s + x for s, x in zip(side, right)], right]
            elif assign == 0b1010:  # mid/side
                mid = _read_subframe(r, bs, frame_bps)
                side = _read_subframe(r, bs, frame_bps + 1)
                left = []
                right = []
                for m, s in zip(mid, side):
                    mm = (m << 1) | (s & 1)
                    left.append((mm + s) >> 1)
                    right.append((mm - s) >> 1)
                decoded = [left, right]
            else:
                raise ValueError(f"reserved channel assignment {assign:04b}")
        if len(decoded) != nch:
            raise ValueError("frame channel count != STREAMINFO")
        r.byte_align()
        body_end = r.tell_byte()
        crc16 = r.read(16)
        if crc16 != _crc16(data[frame_start:body_end]):
            raise ValueError("frame CRC-16 mismatch")
        for ch in range(nch):
            channels[ch].extend(decoded[ch])
        assignments.append(assign)
        n_frames += 1
        pos = body_end + 2
    if total and any(len(c) != total for c in channels):
        raise ValueError("decoded sample count != STREAMINFO total")
    md5 = _pcm_md5(channels, len(channels[0]), nch, bps)
    md5_ok = md5.digest() == md5_expected
    if not md5_ok:
        raise ValueError("STREAMINFO MD5 mismatch — decode is not lossless")
    return {
        "sample_rate": rate,
        "channels": nch,
        "bps": bps,
        "n_samples": len(channels[0]),
        "samples": channels,
        "n_frames": n_frames,
        "md5_ok": md5_ok,
        "assignments": assignments,
    }
