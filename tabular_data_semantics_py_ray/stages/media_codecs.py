"""Vendored dependency-free media codecs: non-interlaced 8-bit PNG and
16-bit PCM WAV, implemented from the public format specifications (PNG:
RFC 2083; WAV: RIFF/WAVE PCM) with only stdlib zlib/struct + numpy.

Purpose: the container ships no image/audio libraries (PIL/pyav), so the
multimodal stages' ``real_decode=True`` paths were only provable where
those libraries happen to exist. ``codec="builtin"`` routes the SAME
real-decode seams through these decoders, making one genuinely-real decode
CI-provable in any environment. The per-scanline unfilter loop is Python —
acceptable for the small payloads this codec targets; large-scale image
work should use ``codec="pil"`` on a cluster that ships real codecs.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> channel count (palette images unsupported)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def sniff(data: bytes) -> str:
    """Return 'png' or 'wav' from magic bytes; raise on anything else."""
    if data[:8] == _PNG_SIG:
        return "png"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    raise ValueError("unsupported media payload (builtin codec knows PNG/WAV)")


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

def decode_png(data: bytes) -> np.ndarray:
    """Decode a non-interlaced 8-bit-depth PNG (gray / gray+alpha / RGB /
    RGBA) to a (h, w, channels) uint8 array. All five scanline filters are
    supported so externally-encoded files decode too."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat = 8, []
    w = h = depth = ct = interlace = None
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        typ = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln  # length + type + body + crc
        if typ == b"IHDR":
            w, h, depth, ct, _, _, interlace = struct.unpack(">IIBBBBB", body)
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8 or ct not in _PNG_CHANNELS or interlace != 0:
        raise ValueError(
            f"builtin PNG codec supports non-interlaced 8-bit gray/RGB/alpha "
            f"only (got depth={depth}, color_type={ct}, interlace={interlace})"
        )
    ch = _PNG_CHANNELS[ct]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload has the wrong size")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        off = y * (stride + 1)
        f = raw[off]
        line = np.frombuffer(raw, np.uint8, count=stride, offset=off + 1).copy()
        if f == 1:  # Sub
            for x in range(ch, stride):
                line[x] = (int(line[x]) + int(line[x - ch])) & 0xFF
        elif f == 2:  # Up
            line += prev  # uint8 wraps mod 256, exactly the spec
        elif f == 3:  # Average
            for x in range(stride):
                a = int(line[x - ch]) if x >= ch else 0
                line[x] = (int(line[x]) + ((a + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = int(line[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else c)
                line[x] = (int(line[x]) + pred) & 0xFF
        elif f != 0:
            raise ValueError(f"unknown PNG filter type {f}")
        out[y] = line
        prev = line
    return out.reshape(h, w, ch)


def encode_png(arr: np.ndarray) -> bytes:
    """Encode a (h, w) or (h, w, channels) uint8 array as a filter-0 PNG —
    the test-fixture generator paired with decode_png."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    ct = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + typ + body
                + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF))

    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    return (_PNG_SIG
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def png_size(data: bytes) -> tuple[int, int]:
    """(width, height) from the IHDR without decoding pixel data."""
    if data[:8] != _PNG_SIG or data[12:16] != b"IHDR":
        raise ValueError("not a PNG payload")
    w, h = struct.unpack(">II", data[16:24])
    return w, h


# ---------------------------------------------------------------------------
# WAV (RIFF/WAVE, PCM 16-bit)
# ---------------------------------------------------------------------------

def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM-16 WAV to ((n_samples, n_channels) int16, sample_rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, n_ch, pcm = 12, None, None, None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + ln]
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt_code, n_ch, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if fmt_code != 1 or bits != 16:
                raise ValueError(
                    f"builtin WAV codec supports PCM-16 only "
                    f"(got format={fmt_code}, bits={bits})")
            if n_ch < 1:
                raise ValueError("WAV fmt chunk declares 0 channels")
        elif cid == b"data":
            pcm = body
    if rate is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    samples = np.frombuffer(pcm[:len(pcm) - len(pcm) % (2 * n_ch)], dtype="<i2")
    return samples.reshape(-1, n_ch), rate


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Encode int16 samples ((n,) mono or (n, channels)) as a PCM-16 WAV —
    the test-fixture generator paired with decode_wav."""
    s = np.asarray(samples, dtype="<i2")
    n_ch = 1 if s.ndim == 1 else s.shape[1]
    body = s.tobytes()
    return (b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, n_ch, rate,
                                    rate * 2 * n_ch, 2 * n_ch, 16)
            + b"data" + struct.pack("<I", len(body)) + body)
