"""Pure-stdlib audio/video codecs: a REAL RIFF/WAV PCM encoder/decoder
and a REAL YUV4MPEG2 (.y4m) uncompressed-video encoder/decoder.

This closes the audio/video half of the multimodal story the same way
``operators/imagecodec.py`` closed images: compressed codecs (MP3/AAC,
H.264) genuinely need ffmpeg — absent here — but the two canonical
UNCOMPRESSED containers need nothing beyond ``struct``:

- ``encode_wav`` / ``decode_wav``: RIFF chunk walk, ``fmt `` (PCM,
  16-bit little-endian) + ``data`` chunks. The decoder round-trips
  output from any conformant writer — the test suite cross-checks it
  against Python's stdlib ``wave`` module as a foreign encoder.
- ``encode_y4m`` / ``decode_y4m``: the YUV4MPEG2 stream format used by
  ffmpeg/mjpegtools for raw video — ASCII parameter header, then
  ``FRAME\\n`` + raw planes per frame.  ``Cmono`` (luma-only) frames
  keep the plane math exact and fully SQL-expressible.
- ``parse_wav_header`` / ``parse_y4m_header``: planning-relevant
  metadata (rate / channels / sample count; dims / fps / frame count)
  straight from the container without touching sample data — the
  prune-before-decode stage of a 100 TB media pipeline.

Scale posture: all of this runs inside Arrow-batched ``mapInPandas``
stages (see ``operators/multimodal.py``); nothing here touches Spark.
"""

from __future__ import annotations

import struct

_RIFF_MAGIC = b"RIFF"
_WAVE_TAG = b"WAVE"
_Y4M_MAGIC = b"YUV4MPEG2 "


# --------------------------------------------------------------------------
# WAV (RIFF PCM)
# --------------------------------------------------------------------------


def encode_wav(samples, sample_rate: int, channels: int = 1) -> bytes:
    """Encode an int16 sample array as a PCM WAV file.

    ``samples`` is a 1-D int16 array of interleaved frames (length must
    be a multiple of ``channels``).  Emits the canonical 44-byte
    RIFF/fmt/data layout any audio tool reads.
    """
    import numpy as np

    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim != 1:
        raise ValueError("encode_wav expects a 1-D int16 array")
    if arr.size % channels:
        raise ValueError("sample count not a multiple of channels")
    data = arr.tobytes()
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate,
        sample_rate * block_align, block_align, 16,
    )
    body = (
        _WAVE_TAG
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return _RIFF_MAGIC + struct.pack("<I", len(body)) + body


def _riff_chunks(data: bytes):
    pos = 12  # RIFF + size + WAVE
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack_from("<I", data, pos + 4)
        yield tag, data[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned


def parse_wav_header(data: bytes) -> dict:
    """Sample rate / channels / bit depth / frame count from the
    ``fmt `` and ``data`` chunk headers only — no sample reads."""
    if not (data.startswith(_RIFF_MAGIC) and data[8:12] == _WAVE_TAG):
        raise ValueError("not a RIFF/WAVE file")
    fmt = None
    data_len = None
    for tag, body in _riff_chunks(data):
        if tag == b"fmt " and fmt is None:
            audio_fmt, channels, rate, _, block_align, bits = (
                struct.unpack_from("<HHIIHH", body, 0)
            )
            fmt = (audio_fmt, channels, rate, block_align, bits)
        elif tag == b"data" and data_len is None:
            data_len = len(body)
    if fmt is None or data_len is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, channels, rate, block_align, bits = fmt
    return {
        "format": "wav",
        "audio_format": audio_fmt,  # 1 = PCM
        "channels": channels,
        "sample_rate": rate,
        "bit_depth": bits,
        "n_frames": data_len // block_align if block_align else 0,
    }


def decode_wav(data: bytes):
    """Decode a 16-bit PCM WAV to ``(samples, header)`` where samples
    is a 1-D int16 array of interleaved frames.  Walks RIFF chunks, so
    it reads files with extra chunks (LIST/fact) from foreign writers,
    not just ``encode_wav`` output."""
    import numpy as np

    hdr = parse_wav_header(data)
    if hdr["audio_format"] in (6, 7) and hdr["bit_depth"] == 8:
        # G.711 A-law / mu-law: expand to 16-bit linear. The data
        # chunk may carry one padding byte (RIFF word alignment) —
        # trust the declared frame count, not the chunk length.
        law = "alaw" if hdr["audio_format"] == 6 else "ulaw"
        n = hdr["n_frames"] * hdr["channels"]
        for tag, body in _riff_chunks(data):
            if tag == b"data":
                return g711_decode(body[:n], law), hdr
        raise ValueError("WAV missing data chunk")
    if hdr["audio_format"] != 1 or hdr["bit_depth"] != 16:
        raise NotImplementedError(
            "decode_wav supports 16-bit PCM and 8-bit G.711 only "
            f"(got format={hdr['audio_format']}, bits={hdr['bit_depth']})"
        )
    for tag, body in _riff_chunks(data):
        if tag == b"data":
            samples = np.frombuffer(
                body[: len(body) - (len(body) % 2)], dtype="<i2"
            )
            return samples, hdr
    raise ValueError("WAV missing data chunk")


# --------------------------------------------------------------------------
# Y4M (YUV4MPEG2 raw video)
# --------------------------------------------------------------------------


def encode_y4m(frames, fps_num: int = 25, fps_den: int = 1) -> bytes:
    """Encode an (F, H, W) uint8 luma array as a YUV4MPEG2 stream with
    ``Cmono`` colorspace (luma plane only — a real, spec'd colorspace;
    chroma subsampling would add planes but no new parsing ideas)."""
    import numpy as np

    arr = np.asarray(frames, dtype=np.uint8)
    if arr.ndim != 3:
        raise ValueError("encode_y4m expects a 3-D (F, H, W) uint8 array")
    f, h, w = arr.shape
    header = (
        f"YUV4MPEG2 W{w} H{h} F{fps_num}:{fps_den} Ip A1:1 Cmono\n"
    ).encode("ascii")
    return header + b"".join(
        b"FRAME\n" + arr[i].tobytes() for i in range(f)
    )


def parse_y4m_header(data: bytes) -> dict:
    """Width / height / fps / colorspace from the ASCII parameter line;
    frame count by stepping over the fixed-size planes, reading only
    each frame's one-line header (frames may carry per-frame
    parameters, so the stride is not constant) — plane bytes are never
    touched."""
    if not data.startswith(_Y4M_MAGIC):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = data.index(b"\n")
    params = data[len(_Y4M_MAGIC) : nl].decode("ascii").split()
    w = h = None
    fps_num, fps_den = 25, 1
    colorspace = "C420"
    for p in params:
        if p.startswith("W"):
            w = int(p[1:])
        elif p.startswith("H"):
            h = int(p[1:])
        elif p.startswith("F"):
            fps_num, fps_den = (int(x) for x in p[1:].split(":"))
        elif p.startswith("C"):
            colorspace = p
    if w is None or h is None:
        raise ValueError("Y4M missing W/H parameters")
    if colorspace == "Cmono":
        frame_bytes = w * h
    elif colorspace in ("C420", "C420jpeg", "C420paldv", "C420mpeg2"):
        frame_bytes = w * h * 3 // 2
    elif colorspace == "C422":
        frame_bytes = w * h * 2
    elif colorspace == "C444":
        frame_bytes = w * h * 3
    else:
        raise NotImplementedError(f"unsupported Y4M colorspace {colorspace}")
    n_frames = 0
    pos = nl + 1
    while pos < len(data) and data[pos : pos + 5] == b"FRAME":
        plane_start = data.index(b"\n", pos) + 1
        if plane_start + frame_bytes > len(data):
            break  # truncated trailing frame — not a frame
        pos = plane_start + frame_bytes
        n_frames += 1
    return {
        "format": "y4m",
        "width": w,
        "height": h,
        "fps_num": fps_num,
        "fps_den": fps_den,
        "colorspace": colorspace,
        "n_frames": n_frames,
    }


def decode_y4m(data: bytes):
    """Decode a ``Cmono`` Y4M stream to ``(frames, header)`` where
    frames is an (F, H, W) uint8 luma array.  Validates every FRAME
    marker (frame headers may carry parameters up to their newline)."""
    import numpy as np

    hdr = parse_y4m_header(data)
    if hdr["colorspace"] != "Cmono":
        raise NotImplementedError(
            "decode_y4m supports Cmono (luma-only) streams; "
            f"got {hdr['colorspace']} — chroma planes need a real player"
        )
    w, h = hdr["width"], hdr["height"]
    frame_bytes = w * h
    pos = data.index(b"\n") + 1
    frames = []
    while pos < len(data):
        if data[pos : pos + 5] != b"FRAME":
            raise ValueError(f"bad Y4M FRAME marker at offset {pos}")
        pos = data.index(b"\n", pos) + 1
        plane = data[pos : pos + frame_bytes]
        if len(plane) != frame_bytes:
            raise ValueError("truncated Y4M frame")
        frames.append(
            np.frombuffer(plane, dtype=np.uint8).reshape(h, w)
        )
        pos += frame_bytes
    return (
        np.stack(frames)
        if frames
        else np.zeros((0, h, w), dtype=np.uint8)
    ), hdr


# --------------------------------------------------------------------------
# G.711 companded audio (WAV format codes 6 = A-law, 7 = mu-law)
# --------------------------------------------------------------------------
# Telephony / call-center corpora ship as 8-bit G.711 WAV. Both laws
# are stateless per-sample companders, so the decode is a pure
# function of each byte — which keeps the full decode SQL-expressible
# for the DuckDB oracle. The implementations below are bit-exact
# against CPython's audioop module (a foreign implementation derived
# from Sun's g711.c) across the entire domain: all 65536 encode
# inputs and all 256 decode bytes (tests/test_avcodec_g711.py).

_G711_BIAS = 0x84


def ulaw_encode_sample(x: int) -> int:
    """16-bit linear -> mu-law byte (the 14-bit variant with
    shift-then-clip ordering that audioop/sox use)."""
    x >>= 2
    if x < 0:
        x = -x
        mask = 0x7F
    else:
        mask = 0xFF
    if x > 8159:
        x = 8159
    x += _G711_BIAS >> 2
    seg = max(0, x.bit_length() - 6)
    if seg >= 8:
        return 0x7F ^ mask
    return ((seg << 4) | ((x >> (seg + 1)) & 0xF)) ^ mask


def ulaw_decode_sample(u: int) -> int:
    """mu-law byte -> 16-bit linear."""
    u2 = ~u & 0xFF
    t = (((u2 & 0x0F) << 3) + _G711_BIAS) << ((u2 & 0x70) >> 4)
    return (_G711_BIAS - t) if u2 & 0x80 else (t - _G711_BIAS)


def alaw_encode_sample(x: int) -> int:
    """16-bit linear -> A-law byte (13-bit variant, even-bit
    inversion mask 0x55/0xD5)."""
    x >>= 3
    if x >= 0:
        mask = 0xD5
    else:
        mask = 0x55
        x = -x - 1
    if x >= 0x1000:
        return 0x7F ^ mask
    seg = max(0, x.bit_length() - 5)
    if seg < 2:
        aval = (seg << 4) | ((x >> 1) & 0xF)
    else:
        aval = (seg << 4) | ((x >> seg) & 0xF)
    return aval ^ mask


def alaw_decode_sample(a: int) -> int:
    """A-law byte -> 16-bit linear."""
    a ^= 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if a & 0x80 else -t


def _g711_tables(law: str):
    import numpy as np

    if law == "ulaw":
        dec = np.array([ulaw_decode_sample(u) for u in range(256)], np.int16)
    elif law == "alaw":
        dec = np.array([alaw_decode_sample(u) for u in range(256)], np.int16)
    else:
        raise ValueError("law must be 'ulaw' or 'alaw'")
    return dec


def g711_encode(samples, law: str) -> bytes:
    """Vector encode int16 linear samples to G.711 bytes."""
    import numpy as np

    enc = ulaw_encode_sample if law == "ulaw" else alaw_encode_sample
    if law not in ("ulaw", "alaw"):
        raise ValueError("law must be 'ulaw' or 'alaw'")
    lut = np.array([enc(x) for x in range(-32768, 32768)], np.uint8)
    arr = np.asarray(samples, dtype=np.int16).astype(np.int32) + 32768
    return lut[arr].tobytes()


def g711_decode(data: bytes, law: str):
    """Vector decode G.711 bytes to int16 linear samples."""
    import numpy as np

    return _g711_tables(law)[np.frombuffer(data, dtype=np.uint8)]


def encode_wav_g711(
    g711_bytes: bytes, sample_rate: int, channels: int = 1,
    law: str = "ulaw",
) -> bytes:
    """Wrap already-companded G.711 bytes in a WAV container: format
    code 7 (mu-law) or 6 (A-law), 8 bits/sample, plus the ``fact``
    chunk the WAV spec requires for non-PCM streams."""
    fmt_code = 7 if law == "ulaw" else 6
    if law not in ("ulaw", "alaw"):
        raise ValueError("law must be 'ulaw' or 'alaw'")
    block_align = channels
    fmt = struct.pack(
        "<HHIIHH", fmt_code, channels, sample_rate,
        sample_rate * block_align, block_align, 8,
    )
    n_frames = len(g711_bytes) // channels
    pad = b"\x00" if len(g711_bytes) & 1 else b""
    body = (
        _WAVE_TAG
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, n_frames)
        + b"data" + struct.pack("<I", len(g711_bytes)) + g711_bytes + pad
    )
    return _RIFF_MAGIC + struct.pack("<I", len(body)) + body


# --------------------------------------------------------------------------
# IMA ADPCM (WAV format code 0x11)
# --------------------------------------------------------------------------
# The classic 4-bit stateful compander: each nibble updates a
# (predictor, step-index) state machine, blocks restart from a 4-byte
# header whose predictor IS the block's first emitted sample (so
# blocks decode independently). Unlike G.711 the decode is stateful,
# so the DuckDB oracle replays the whole state machine with a
# recursive CTE rather than a per-byte formula (queries/multimodal).
# Mono only; stereo's interleaved 4-byte channel groups are outside
# the subset and raise loudly.

IMA_STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)
IMA_INDEX_TABLE = (-1, -1, -1, -1, 2, 4, 6, 8)


def ima_step(pred: int, idx: int, nib: int):
    """One IMA ADPCM state transition: returns (new_pred, new_idx)."""
    step = IMA_STEP_TABLE[idx]
    diff = step >> 3
    if nib & 1:
        diff += step >> 2
    if nib & 2:
        diff += step >> 1
    if nib & 4:
        diff += step
    pred = pred - diff if nib & 8 else pred + diff
    pred = -32768 if pred < -32768 else 32767 if pred > 32767 else pred
    idx += IMA_INDEX_TABLE[nib & 7]
    idx = 0 if idx < 0 else 88 if idx > 88 else idx
    return pred, idx


def ima_encode_sample(pred: int, idx: int, x: int) -> int:
    """Standard IMA quantizer: pick the nibble whose decode lands
    closest below the target difference."""
    step = IMA_STEP_TABLE[idx]
    diff = x - pred
    nib = 0
    if diff < 0:
        nib = 8
        diff = -diff
    if diff >= step:
        nib |= 4
        diff -= step
    if diff >= step >> 1:
        nib |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        nib |= 1
    return nib


def encode_wav_ima(
    nibbles, pred0: int, idx0: int, n_samples: int,
    sample_rate: int = 8000, block_align: int = 36,
) -> bytes:
    """Write a mono IMA-ADPCM WAV from an explicit nibble stream and
    initial state: block headers are produced by running the real
    state machine (each block's header carries the decoder state at
    its first sample), final block zero-padded to block_align with
    the fact chunk capping the emitted count."""
    spb = (block_align - 4) * 2 + 1
    pred, idx = pred0, idx0
    nit = iter(nibbles)
    blocks = []
    emitted = 0
    while emitted < n_samples:
        hdr = struct.pack("<hBB", pred, idx, 0)
        emitted += 1  # the header predictor is a sample
        payload = bytearray()
        cur = 0
        half = False
        in_block = 0
        while in_block < spb - 1 and emitted < n_samples:
            nib = next(nit) & 0xF
            pred, idx = ima_step(pred, idx, nib)
            if half:
                payload[-1] |= nib << 4
            else:
                payload.append(nib)
            half = not half
            in_block += 1
            emitted += 1
        payload += bytes(block_align - 4 - len(payload))
        blocks.append(hdr + bytes(payload))
    data = b"".join(blocks)
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, sample_rate,
        sample_rate * block_align // spb, block_align, 4, 2, spb,
    )
    body = (
        _WAVE_TAG
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, n_samples)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return _RIFF_MAGIC + struct.pack("<I", len(body)) + body


def decode_wav_ima(data: bytes):
    """Decode a mono IMA-ADPCM WAV to (samples list, header dict)."""
    hdr = parse_wav_header(data)
    if hdr["audio_format"] != 0x11 or hdr["bit_depth"] != 4:
        raise NotImplementedError(
            "decode_wav_ima handles WAV format 0x11 at 4 bits only "
            f"(got format={hdr['audio_format']}, bits={hdr['bit_depth']})"
        )
    if hdr["channels"] != 1:
        raise NotImplementedError(
            "stereo IMA ADPCM (interleaved 4-byte channel groups) is "
            "outside the subset"
        )
    ba = hdr["block_align"] if "block_align" in hdr else None
    n_total = None
    raw = None
    for tag, body in _riff_chunks(data):
        if tag == b"fmt ":
            _, _, _, _, ba, _ = struct.unpack_from("<HHIIHH", body, 0)
        elif tag == b"fact":
            (n_total,) = struct.unpack_from("<I", body, 0)
        elif tag == b"data":
            raw = body
    if raw is None or ba is None:
        raise ValueError("WAV missing fmt/data chunk")
    if n_total is None:
        raise ValueError("IMA ADPCM WAV requires a fact chunk")
    out = []
    pos = 0
    while pos + 4 <= len(raw) and len(out) < n_total:
        pred, idx, _ = struct.unpack_from("<hBB", raw, pos)
        if idx > 88:
            raise ValueError("step index out of range")
        out.append(pred)
        for b in raw[pos + 4 : pos + ba]:
            for nib in (b & 0xF, b >> 4):
                if len(out) >= n_total:
                    break
                pred, idx = ima_step(pred, idx, nib)
                out.append(pred)
        pos += ba
    if len(out) != n_total:
        raise ValueError("IMA ADPCM data ran out before fact count")
    return out, hdr
