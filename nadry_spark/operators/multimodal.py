"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns next to typed metadata
structs; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages.

Decode support is honest about the environment:

* **REAL stdlib kernels** for container formats that need no external
  libraries: PNG in FULL (every legal depth/color-type combo —
  1/2/4/8/16-bit grey, palette, RGB(A), grey+alpha — interlaced
  (Adam7) or progressive; stdlib zlib inflate + per-scanline
  unfilter, the dominant web image format), PPM (P6) images via a
  header scan + numpy reshape, WAV PCM audio with the stdlib ``wave``
  module. Resize is nearest-neighbour numpy index slicing. These run
  end-to-end in tests.
* **REAL JPEG** (ITU-T T.81) in pure numpy/stdlib — baseline
  sequential AND progressive (SOF2 spectral selection + successive
  approximation), see ``decode_jpeg``.
* **REAL container-metadata probes** for MP4 (ISO 14496-12 box walk:
  mvhd duration/timescale, tkhd width/height) and MP3 (MPEG-1 audio
  frame-header walk with ID3v2 skip) — ``probe_media`` extracts
  duration/dimensions/rate without decoding any samples/frames, the
  first pass a 100 TB media pipeline runs.
* **Stub** for sample/frame decode of codecs that genuinely require
  soundfile/ffmpeg (MP3/MP4 payloads):
  ``real_decode`` raises ``NotImplementedError`` for them;
  ``featurize(mode="auto")`` falls back to the deterministic
  byte-histogram fake so the distributed plumbing always runs.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA_DDL = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, duration_ms:int, codec:string>"
)

FEATURES_DDL = (
    "media_id long, kind string, n_bytes int, sha256 string, "
    "decoded boolean, features array<float>"
)

FEATURE_DIM = 16


# ---------------------------------------------------------------------------
# real stdlib decode kernels
# ---------------------------------------------------------------------------


def decode_ppm(payload: bytes) -> np.ndarray:
    """Decode a binary PPM (P6, maxval <= 255) into a (H, W, 3) uint8
    array. Pure stdlib + numpy."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header: magic, width, height, maxval — whitespace/comment separated
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment to end of line
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        start = i
        while i < len(payload) and not payload[i : i + 1].isspace():
            i += 1
        tokens.append(payload[start:i])
    i += 1  # single whitespace after maxval
    width, height, maxval = (int(t) for t in tokens)
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    n = width * height * 3
    # hostile headers declare absurd dimensions: validate against the
    # actual payload BEFORE frombuffer (a count of ~1e21 raises
    # OverflowError, which must surface as a normal corrupt-payload
    # ValueError, not escape the featurize fallback)
    if width <= 0 or height <= 0 or n > len(payload) - i:
        raise ValueError(
            f"PPM header declares {width}x{height} but payload holds "
            f"{len(payload) - i} pixel bytes"
        )
    pixels = np.frombuffer(payload, dtype=np.uint8, count=n, offset=i)
    return pixels.reshape(height, width, 3)


def encode_ppm(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 -> binary PPM (P6) bytes (test-fixture writer)."""
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type -> samples/px


def _png_unfilter_row(f: int, line: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """Reconstruct one scanline from its filtered bytes (PNG §9:
    None/Sub/Up/Average/Paeth). ``prev`` is the reconstructed prior
    row (zeros for the first). Sub is a per-lane modular cumsum and
    None/Up are pure vector ops; Average/Paeth carry a left-neighbour
    dependency and run as per-byte loops (scanline-bounded)."""
    if f == 0:
        return line.astype(np.uint8)
    if f == 2:  # Up
        return ((line.astype(np.int32) + prev) & 0xFF).astype(np.uint8)
    if f == 1:  # Sub: recon[x] = line[x] + recon[x-bpp], per byte lane
        lanes = line.astype(np.int64).reshape(-1, bpp)
        return (np.cumsum(lanes, axis=0) & 0xFF).astype(np.uint8).reshape(-1)
    out = np.empty(len(line), np.uint8)
    if f == 3:  # Average
        for x in range(len(line)):
            a = int(out[x - bpp]) if x >= bpp else 0
            out[x] = (int(line[x]) + ((a + int(prev[x])) >> 1)) & 0xFF
        return out
    if f == 4:  # Paeth
        for x in range(len(line)):
            a = int(out[x - bpp]) if x >= bpp else 0
            b = int(prev[x])
            c = int(prev[x - bpp]) if x >= bpp else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[x] = (int(line[x]) + pred) & 0xFF
        return out
    raise ValueError(f"bad PNG filter type {f}")


# valid (color -> allowed bit depths) per PNG §11.2.2
_PNG_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8), 4: (8, 16), 6: (8, 16)}

# Adam7 pass layout (PNG §8.2): (x0, y0, dx, dy) per pass
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_stride(w: int, channels: int, depth: int) -> int:
    """Filtered-scanline payload bytes for a w-pixel row (ceil of the
    bit width — sub-byte depths pack, bit-padded at row end)."""
    return (w * channels * depth + 7) // 8


def _png_decode_subimage(
    raw: np.ndarray, w: int, h: int, channels: int, depth: int
) -> np.ndarray:
    """Unfilter + sample-expand one (sub)image from its raw filtered
    bytes. Returns (h, w, channels) uint8 samples: 16-bit scales to
    its high byte, sub-byte grey expands via the standard
    255/(2^d-1) replication, palette indices pass through unscaled.
    Filtering always operates on BYTES (PNG §9), so bpp is the
    byte-width of one pixel, floored at 1 for packed depths."""
    stride = _png_stride(w, channels, depth)
    bpp = max(1, channels * depth // 8)
    rows = raw.reshape(h, stride + 1)
    recon = np.empty((h, stride), np.uint8)
    zero = np.zeros(stride, np.uint8)
    for y in range(h):
        recon[y] = _png_unfilter_row(
            int(rows[y, 0]), rows[y, 1:], recon[y - 1] if y else zero, bpp
        )
    if depth == 8:
        return recon.reshape(h, w, channels)
    if depth == 16:
        # big-endian sample pairs -> high byte (the standard 16->8 map)
        return (
            recon.reshape(h, stride)
            .view(">u2")
            .astype(np.uint16)
            .__rshift__(8)
            .astype(np.uint8)
            .reshape(h, w, channels)
        )
    # packed 1/2/4-bit samples (grey or palette indices): unpack each
    # row's bits, regroup depth bits per sample, drop row padding
    bits = np.unpackbits(recon, axis=1)[:, : w * depth]  # channels == 1 here
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    samples = (bits.reshape(h, w, depth) * weights).sum(axis=2).astype(np.uint8)
    return samples.reshape(h, w, 1)


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a PNG into (H, W, 3) uint8 RGB. Pure stdlib zlib +
    numpy: chunk walk, bounded inflate, per-scanline unfilter,
    palette/greyscale/alpha conversion to RGB.

    Full coverage of the spec's pixel layouts: color types 0 (grey),
    2 (RGB), 3 (palette), 4 (grey+a), 6 (RGBA) at every legal bit
    depth (1/2/4/8/16 as PNG §11.2.2 allows per type), interlaced
    (Adam7) or not. 16-bit scales to the high byte; sub-byte grey
    expands by 255/(2^d-1). Malformed chunks raise ValueError. The
    inflate is bomb-safe: output is capped at the size the IHDR
    implies, so a hostile 1KB payload can never allocate gigabytes."""
    import zlib

    if not payload.startswith(_PNG_MAGIC):
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr: tuple | None = None
    idat: list[bytes] = []
    plte: np.ndarray | None = None
    while pos + 8 <= len(payload):
        length = int.from_bytes(payload[pos : pos + 4], "big")
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) < length:
            raise ValueError("truncated PNG chunk")
        pos += 12 + length  # data + CRC (CRC not verified — tolerant read)
        if ctype == b"IHDR":
            if length != 13:
                raise ValueError("bad IHDR length")
            w, h = int.from_bytes(data[0:4], "big"), int.from_bytes(data[4:8], "big")
            depth, color, comp, filt, interlace = data[8:13]
            ihdr = (w, h, depth, color, comp, filt, interlace)
        elif ctype == b"PLTE":
            if length % 3:
                raise ValueError("bad PLTE length")
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0 or color not in _PNG_CHANNELS:
        raise ValueError(f"bad PNG header fields (comp={comp} filt={filt} color={color})")
    if depth not in _PNG_DEPTHS[color]:
        raise ValueError(f"illegal depth {depth} for PNG color type {color}")
    if interlace not in (0, 1):
        raise ValueError(f"bad PNG interlace method {interlace}")
    channels = _PNG_CHANNELS[color]
    if interlace == 0:
        passes = [(0, 0, w, h)]
    else:
        passes = []
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            passes.append((x0, y0, max(pw, 0), max(ph, 0)))
    expected = sum(
        ph * (_png_stride(pw, channels, depth) + 1)
        for _, _, pw, ph in passes
        if pw and ph
    )
    if w <= 0 or h <= 0 or expected > (1 << 31):
        raise ValueError(f"PNG header declares hostile dimensions {w}x{h}")
    d = zlib.decompressobj()
    raw = d.decompress(b"".join(idat), expected + 1)  # bounded inflate
    if len(raw) != expected or d.decompress(b"", 1):
        raise ValueError(
            f"PNG pixel data is {len(raw)}+ bytes, header implies {expected}"
        )
    buf = np.frombuffer(raw, np.uint8)
    px = np.zeros((h, w, channels), np.uint8)
    off = 0
    for x0, y0, dx, dy in (
        [(0, 0, 1, 1)] if interlace == 0 else _ADAM7
    ):
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        n = ph * (_png_stride(pw, channels, depth) + 1)
        sub = _png_decode_subimage(buf[off : off + n], pw, ph, channels, depth)
        px[y0::dy, x0::dx] = sub
        off += n
    if color == 3:  # palette lookup (indices never scale)
        if plte is None:
            raise ValueError("palette PNG without PLTE chunk")
        idx = px[:, :, 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("PNG palette index out of range")
        return plte[idx]
    if depth < 8:  # sub-byte GREY: expand to full range
        px = (px.astype(np.uint16) * 255 // ((1 << depth) - 1)).astype(np.uint8)
    if color == 2:
        return px
    if color == 0:  # grey -> replicate
        return np.repeat(px, 3, axis=2)
    if color == 4:  # grey + alpha -> replicate grey, drop alpha
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3]  # RGBA -> drop alpha


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """(H, W, 3) uint8 -> truecolor 8-bit PNG bytes (fixture writer;
    deterministic — fixed zlib level). ``filter_type`` applies that PNG
    filter to every scanline, exercising each unfilter path in
    round-trip tests."""
    import zlib

    arr = arr.astype(np.uint8)
    h, w, _ = arr.shape
    bpp = 3
    flat = arr.reshape(h, w * bpp).astype(np.int32)
    lines = []
    for y in range(h):
        line = flat[y]
        prev = flat[y - 1] if y else np.zeros(w * bpp, np.int32)
        left = np.concatenate([np.zeros(bpp, np.int32), line[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
        if filter_type == 0:
            out = line
        elif filter_type == 1:
            out = line - left
        elif filter_type == 2:
            out = line - prev
        elif filter_type == 3:
            out = line - ((left + prev) >> 1)
        elif filter_type == 4:
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            out = line - pred
        else:
            raise ValueError(f"bad filter type {filter_type}")
        lines.append(bytes([filter_type]) + (out & 0xFF).astype(np.uint8).tobytes())

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big") + ctype + data
            + (zlib.crc32(ctype + data) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
    )
    idat = zlib.compress(b"".join(lines), 6)
    return _PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


def encode_png_adam7(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 -> Adam7-INTERLACED truecolor 8-bit PNG bytes
    (fixture writer; deterministic — fixed zlib level, filter 0 per
    pass scanline). Pass layout per PNG §8.2."""
    import zlib

    arr = arr.astype(np.uint8)
    h, w, _ = arr.shape
    raw = b""
    for x0, y0, dx, dy in _ADAM7:
        sub = arr[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for row in sub:
            raw += b"\x00" + row.tobytes()

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big") + ctype + data
            + (zlib.crc32(ctype + data) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 2, 0, 0, 1])
    idat = zlib.compress(raw, 6)
    return _PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


# ---------------------------------------------------------------------------
# JPEG (ITU-T T.81 baseline sequential DCT) — pure numpy/stdlib
# ---------------------------------------------------------------------------

# zigzag scan order (T.81 Figure 5), generated: diagonal d=r+c walks
# bottom-left->top-right on even d, top-right->bottom-left on odd
_JPEG_ZZ: list[tuple[int, int]] = []
for _d in range(15):
    _cells = [(_r, _d - _r) for _r in range(8) if 0 <= _d - _r < 8]
    _JPEG_ZZ.extend(_cells[::-1] if _d % 2 == 0 else _cells)
_JPEG_ZZ_ROWS = np.array([r for r, _ in _JPEG_ZZ])
_JPEG_ZZ_COLS = np.array([c for _, c in _JPEG_ZZ])

# orthonormal 8x8 DCT-II basis: T[k,n] = s(k) cos(pi (2n+1) k / 16)
# with s(0)=sqrt(1/8), s(k)=sqrt(2/8) — identical to T.81's FDCT
# normalization (1/4 c(u)c(v) double sum), so spatial = T' B T and
# B = T f T' ARE the spec transforms
_JPEG_T = np.array(
    [
        [
            (np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8))
            * np.cos(np.pi * (2 * n + 1) * k / 16)
            for n in range(8)
        ]
        for k in range(8)
    ]
)


def _jpeg_huff_decode_table(counts: list[int], symbols: bytes) -> dict:
    """(length, code) -> symbol map from a DHT segment's canonical
    (counts per length 1..16, symbol list)."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            if k >= len(symbols):
                raise ValueError("JPEG DHT counts exceed symbol list")
            table[(length, code)] = symbols[k]
            k += 1
            code += 1
        code <<= 1
    return table


class _JpegBits:
    """MSB-first bit reader over an entropy-coded JPEG segment with
    0xFF00 byte unstuffing; restart markers resynchronize via
    ``restart``; any other marker mid-scan is corrupt input."""

    def __init__(self, data: bytes, pos: int):
        self.data, self.pos, self.buf, self.n = data, pos, 0, 0

    def _next_byte(self) -> int:
        d, p = self.data, self.pos
        if p >= len(d):
            raise ValueError("truncated JPEG scan")
        b = d[p]
        if b == 0xFF:
            if p + 1 >= len(d):
                raise ValueError("truncated JPEG scan")
            if d[p + 1] != 0x00:
                raise ValueError("unexpected marker inside JPEG scan")
            self.pos = p + 2
            return 0xFF
        self.pos = p + 1
        return b

    def read_bit(self) -> int:
        if self.n == 0:
            self.buf, self.n = self._next_byte(), 8
        self.n -= 1
        return (self.buf >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def huff(self, table: dict) -> int:
        length, code = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def restart(self) -> None:
        self.n = 0
        d, p = self.data, self.pos
        if p + 1 >= len(d) or d[p] != 0xFF or not (0xD0 <= d[p + 1] <= 0xD7):
            raise ValueError("missing JPEG restart marker")
        self.pos = p + 2


def _jpeg_extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map a t-bit magnitude to its signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline-sequential (SOF0/1) or progressive (SOF2)
    DCT JPEG (ITU-T T.81, the formats of essentially every web photo)
    into (H, W, 3) uint8 RGB. Pure numpy/stdlib: marker walk,
    canonical Huffman decode, dequantize, orthonormal-matrix IDCT,
    chroma upsample, JFIF YCbCr->RGB. Supports grey and 3-component
    scans, arbitrary 1-2 sampling factors (4:4:4 / 4:2:2 / 4:2:0),
    restart intervals, and the full progressive scan machinery
    (spectral selection, successive approximation, EOB-run coding —
    Annex G). Arithmetic/hierarchical/lossless variants raise
    NotImplementedError; corrupt structure raises ValueError."""
    d = payload
    if len(d) < 4 or d[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> table
    sof = None
    progressive = False
    restart_interval = 0
    while pos + 4 <= len(d):
        if d[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = d[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker == 0xD9:  # EOI before SOS
            break
        seglen = int.from_bytes(d[pos + 2 : pos + 4], "big")
        seg = d[pos + 4 : pos + 2 + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        body_at = pos + 2 + seglen
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                n = 64 * (2 if pq else 1)
                raw = seg[i : i + n]
                if len(raw) < n:
                    raise ValueError("truncated DQT")
                qts[tq] = (
                    np.frombuffer(raw, ">u2") if pq else np.frombuffer(raw, np.uint8)
                ).astype(np.int32)
                i += n
        elif marker == 0xC4:  # DHT
            i = 0
            while i + 17 <= len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                counts = list(seg[i + 1 : i + 17])
                nsym = sum(counts)
                symbols = seg[i + 17 : i + 17 + nsym]
                if len(symbols) < nsym:
                    raise ValueError("truncated DHT")
                huff[(tc, th)] = _jpeg_huff_decode_table(counts, symbols)
                i += 17 + nsym
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
            sof = (h, w, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "arithmetic/hierarchical/lossless JPEG SOF not supported"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS — entropy data follows
            if sof is None:
                raise ValueError("JPEG SOS before SOF")
            if progressive:
                # progressive images carry MANY scans (with DHT/DRI
                # segments allowed between them): hand the walk over
                return _jpeg_decode_progressive(
                    d, pos, sof, qts, huff, restart_interval
                )
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                scan.append((cs, tables >> 4, tables & 15))
            return _jpeg_decode_scan(
                d, body_at, sof, scan, qts, huff, restart_interval
            )
        # APPn / COM / others: skip
        pos = body_at
    raise ValueError("JPEG has no SOS scan")


def _jpeg_decode_scan(d, pos, sof, scan, qts, huff, restart_interval):
    h, w, comps = sof
    if h <= 0 or w <= 0 or h * w > (1 << 26):
        raise ValueError(f"JPEG header declares hostile dimensions {w}x{h}")
    if len(comps) not in (1, 3) or len(scan) != len(comps):
        raise NotImplementedError(
            f"{len(comps)}-component JPEG not supported (grey/YCbCr only)"
        )
    hmax = max(ch for _, ch, _, _ in comps)
    vmax = max(cv for _, _, cv, _ in comps)
    if not (1 <= hmax <= 2 and 1 <= vmax <= 2):
        raise NotImplementedError("JPEG sampling factors beyond 2 not supported")
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    scan_tables = {cs: (dc, ac) for cs, dc, ac in scan}
    planes, preds = [], []
    for cid, ch, cv, tq in comps:
        planes.append(np.zeros((mcuy * cv * 8, mcux * ch * 8), np.int32))
        preds.append(0)
        if tq not in qts:
            raise ValueError(f"JPEG component references missing DQT {tq}")
        dc_id, ac_id = scan_tables[cid]
        if (0, dc_id) not in huff or (1, ac_id) not in huff:
            raise ValueError("JPEG scan references missing DHT")
    bits = _JpegBits(d, pos)
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                bits.restart()
                preds = [0] * len(preds)
            for ci, (cid, ch, cv, tq) in enumerate(comps):
                dc_t = huff[(0, scan_tables[cid][0])]
                ac_t = huff[(1, scan_tables[cid][1])]
                qt = qts[tq]
                for by in range(cv):
                    for bx in range(ch):
                        zz = np.zeros(64, np.int32)
                        t = bits.huff(dc_t)
                        if t > 11:
                            raise ValueError("bad JPEG DC category")
                        preds[ci] += _jpeg_extend(bits.read_bits(t), t)
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = bits.huff(ac_t)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:  # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC run past block end")
                            zz[k] = _jpeg_extend(bits.read_bits(s), s)
                            k += 1
                        block = np.zeros((8, 8), np.float64)
                        block[_JPEG_ZZ_ROWS, _JPEG_ZZ_COLS] = zz * qt
                        px = _JPEG_T.T @ block @ _JPEG_T + 128.0
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = np.clip(
                            np.round(px), 0, 255
                        ).astype(np.int32)
            n_mcu += 1
    return _jpeg_planes_to_rgb(planes, comps, hmax, vmax, h, w)


def _jpeg_planes_to_rgb(planes, comps, hmax, vmax, h, w) -> np.ndarray:
    """Upsample component planes to full resolution, crop the MCU
    padding, and convert (JFIF YCbCr->RGB, or replicate grey)."""
    full = []
    for (cid, ch, cv, tq), plane in zip(comps, planes):
        up = np.repeat(np.repeat(plane, vmax // cv, axis=0), hmax // ch, axis=1)
        full.append(up[:h, :w].astype(np.float64))
    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb], axis=2
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _jpeg_decode_progressive(d, pos, sof, qts, huff, restart_interval):
    """Progressive (SOF2) decode per ITU-T T.81 Annex G: multiple SOS
    scans refine one coefficient array per component via spectral
    selection (Ss..Se bands) and successive approximation (point
    transform Al, refinement scans Ah>0, AC EOB-run coding). All
    scans accumulate into int32 coefficient planes; dequantize + IDCT
    run ONCE at EOI, vectorized over every block. ``pos`` is the byte
    offset of the first SOS marker; DHT/DQT/DRI segments between
    scans are honored."""
    h, w, comps = sof
    if h <= 0 or w <= 0 or h * w > (1 << 26):
        raise ValueError(f"JPEG header declares hostile dimensions {w}x{h}")
    if len(comps) not in (1, 3):
        raise NotImplementedError(
            f"{len(comps)}-component JPEG not supported (grey/YCbCr only)"
        )
    hmax = max(ch for _, ch, _, _ in comps)
    vmax = max(cv for _, _, cv, _ in comps)
    if not (1 <= hmax <= 2 and 1 <= vmax <= 2):
        raise NotImplementedError("JPEG sampling factors beyond 2 not supported")
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    by_cid = {cid: i for i, (cid, _, _, _) in enumerate(comps)}
    # coefficient planes over the full (MCU-padded) block grid;
    # non-interleaved scans cover only the true block dims
    coefs, true_bw, true_bh = [], [], []
    for cid, ch, cv, tq in comps:
        if tq not in qts:
            raise ValueError(f"JPEG component references missing DQT {tq}")
        coefs.append(np.zeros((mcuy * cv, mcux * ch, 64), np.int32))
        true_bw.append((-(-(w * ch) // hmax) + 7) // 8)
        true_bh.append((-(-(h * cv) // vmax) + 7) // 8)

    n_scans = 0
    while True:
        # find the next marker (pos may sit on it already, or we just
        # finished an entropy segment and must skip to the next 0xFF)
        while pos + 1 < len(d) and not (d[pos] == 0xFF and d[pos + 1] != 0x00):
            pos += 1
        if pos + 1 >= len(d):
            raise ValueError("truncated progressive JPEG (no EOI)")
        marker = d[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker == 0xD9:  # EOI
            break
        seglen = int.from_bytes(d[pos + 2 : pos + 4], "big")
        seg = d[pos + 4 : pos + 2 + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        body_at = pos + 2 + seglen
        if marker == 0xC4:  # DHT between scans
            i = 0
            while i + 17 <= len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                counts = list(seg[i + 1 : i + 17])
                nsym = sum(counts)
                huff[(tc, th)] = _jpeg_huff_decode_table(
                    counts, seg[i + 17 : i + 17 + nsym]
                )
                i += 17 + nsym
        elif marker == 0xDD:
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:
            n_scans += 1
            if n_scans > 256:
                raise ValueError("hostile progressive JPEG: too many scans")
            ns = seg[0]
            scomps = []
            for c in range(ns):
                cs, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                if cs not in by_cid:
                    raise ValueError("SOS references unknown component")
                scomps.append((by_cid[cs], tables >> 4, tables & 15))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 15
            if ss > se or se > 63 or al > 13:
                raise ValueError("bad progressive scan parameters")
            bits = _JpegBits(d, body_at)
            _prog_scan(
                bits, d, coefs, comps, scomps, ss, se, ah, al,
                huff, restart_interval, mcux, mcuy, true_bw, true_bh,
            )
            pos = bits.pos
            continue
        # other segments (APPn/COM/DQT redefinition) skipped
        pos = body_at
    if n_scans == 0:
        raise ValueError("progressive JPEG has no scans")

    planes = []
    for (cid, ch, cv, tq), cf in zip(comps, coefs):
        bh, bw = cf.shape[:2]
        blocks = np.zeros((bh, bw, 8, 8), np.float64)
        blocks[:, :, _JPEG_ZZ_ROWS, _JPEG_ZZ_COLS] = cf * qts[tq]
        # same association order as the baseline per-block path
        # ((T' @ B) @ T) so sequential and progressive encodings of
        # identical coefficients decode bit-identically
        px = np.matmul(np.matmul(_JPEG_T.T, blocks), _JPEG_T) + 128.0
        px = np.clip(np.round(px), 0, 255).astype(np.int32)
        planes.append(
            px.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        )
    return _jpeg_planes_to_rgb(planes, comps, hmax, vmax, h, w)


def _prog_scan(bits, d, coefs, comps, scomps, ss, se, ah, al, huff,
               restart_interval, mcux, mcuy, true_bw, true_bh):
    """One progressive scan (T.81 G.2): DC or AC band, first pass
    (Ah=0) or refinement (Ah>0), interleaved (multi-component DC) or
    non-interleaved block raster."""
    if ss == 0:
        if se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        preds = [0] * len(coefs)
        dc_tabs = {}
        for ci, dc_id, _ in scomps:
            if ah == 0:
                if (0, dc_id) not in huff:
                    raise ValueError("scan references missing DC DHT")
                dc_tabs[ci] = huff[(0, dc_id)]

        def dc_unit(ci, byy, bxx):
            cf = coefs[ci][byy, bxx]
            if ah == 0:
                t = bits.huff(dc_tabs[ci])
                if t > 15:
                    raise ValueError("bad JPEG DC category")
                preds[ci] += _jpeg_extend(bits.read_bits(t), t)
                cf[0] = preds[ci] << al
            else:  # refinement: one raw bit per block
                if bits.read_bit():
                    cf[0] = int(cf[0]) | (1 << al)

        if len(scomps) > 1:  # interleaved over the full MCU grid
            n_mcu = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                        bits.restart()
                        preds = [0] * len(coefs)
                    for ci, _, _ in scomps:
                        _, ch, cv, _ = comps[ci]
                        for by in range(cv):
                            for bx in range(ch):
                                dc_unit(ci, my * cv + by, mx * ch + bx)
                    n_mcu += 1
        else:  # single component: raster over its true block dims
            ci = scomps[0][0]
            n_unit = 0
            for byy in range(true_bh[ci]):
                for bxx in range(true_bw[ci]):
                    if restart_interval and n_unit and n_unit % restart_interval == 0:
                        bits.restart()
                        preds = [0] * len(coefs)
                    dc_unit(ci, byy, bxx)
                    n_unit += 1
        return

    # AC scan: exactly one component, non-interleaved (T.81 G.1.1.1)
    if len(scomps) != 1:
        raise ValueError("progressive AC scan must be single-component")
    ci, _, ac_id = scomps[0]
    if (1, ac_id) not in huff:
        raise ValueError("scan references missing AC DHT")
    ac_t = huff[(1, ac_id)]
    eobrun = 0
    p1, m1 = 1 << al, -1 << al
    n_unit = 0
    for byy in range(true_bh[ci]):
        for bxx in range(true_bw[ci]):
            if restart_interval and n_unit and n_unit % restart_interval == 0:
                bits.restart()
                eobrun = 0
            n_unit += 1
            cf = coefs[ci][byy, bxx]
            if ah == 0:  # first pass for this band
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = bits.huff(ac_t)
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r < 15:
                            eobrun = (1 << r) - 1 + (bits.read_bits(r) if r else 0)
                            break
                        k += 16  # ZRL
                        continue
                    k += r
                    if k > se:
                        raise ValueError("JPEG AC run past band end")
                    cf[k] = _jpeg_extend(bits.read_bits(s), s) << al
                    k += 1
            else:  # refinement (T.81 G.2 / libjpeg decode_mcu_AC_refine)
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = bits.huff(ac_t)
                        r, s = rs >> 4, rs & 15
                        val = 0
                        if s == 0:
                            if r < 15:
                                eobrun = (1 << r) + (bits.read_bits(r) if r else 0)
                                break  # this block finishes in EOB processing
                        else:
                            if s != 1:
                                raise ValueError("bad refinement magnitude")
                            val = p1 if bits.read_bit() else m1
                        # advance past r zero-history coefficients,
                        # emitting correction bits for nonzero ones;
                        # the break position is then consumed too (the
                        # placement slot for s=1, the 16th zero of a
                        # ZRL for s=0)
                        while k <= se:
                            if cf[k] != 0:
                                if bits.read_bit() and (cf[k] & p1) == 0:
                                    cf[k] += p1 if cf[k] > 0 else m1
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if k <= se:
                            if val:
                                cf[k] = val
                            k += 1
                if eobrun > 0:
                    # EOB region: correction bits only, to band end
                    while k <= se:
                        if cf[k] != 0:
                            if bits.read_bit() and (cf[k] & p1) == 0:
                                cf[k] += p1 if cf[k] > 0 else m1
                        k += 1
                    eobrun -= 1


class _JpegBitWriter:
    """MSB-first bit writer with 0xFF byte stuffing; final byte padded
    with 1-bits (T.81 F.1.2.3)."""

    def __init__(self):
        self.out = bytearray()
        self.buf, self.n = 0, 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.buf = (self.buf << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.buf)
                if self.buf == 0xFF:
                    self.out.append(0x00)
                self.buf, self.n = 0, 0

    def flush(self) -> bytes:
        if self.n:
            self.buf = (self.buf << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.buf)
            if self.buf == 0xFF:
                self.out.append(0x00)
            self.buf, self.n = 0, 0
        return bytes(self.out)


def _jpeg_fixture_tables():
    """Deterministic VALID canonical Huffman tables for the fixture
    encoder (not the Annex K defaults — compression is irrelevant for
    fixtures): all 12 DC categories at 5 bits; AC symbols 0x00-0xFE at
    9 bits and 0xFF at 10 (Kraft 255/512 + 1/1024 < 1). Returns
    (dc_counts, dc_symbols, dc_codes, ac_counts, ac_symbols,
    ac_codes) with codes as {symbol: (code, length)}."""
    dc_counts = [0] * 16
    dc_counts[4] = 12
    dc_symbols = bytes(range(12))
    dc_codes = {s: (s, 5) for s in range(12)}
    ac_counts = [0] * 16
    ac_counts[8], ac_counts[9] = 255, 1
    ac_symbols = bytes(range(256))
    ac_codes = {s: (s, 9) for s in range(255)}
    ac_codes[255] = (510, 10)  # canonical: (255 << 1) after the 9-bit run
    return dc_counts, dc_symbols, dc_codes, ac_counts, ac_symbols, ac_codes


_JPEG_FIXTURE_Q = 4  # flat quant step for both tables: error <= ~2/px


def _jpeg_prep_planes(arr: np.ndarray, subsample: bool):
    """RGB -> padded (Y, Cb, Cr) planes for the fixture encoders.
    Returns (ypad, cbs, crs, ysub, mcu)."""
    arr = arr.astype(np.float64)
    r, g, b = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    def pad(plane, mult):
        ph = -plane.shape[0] % mult
        pw = -plane.shape[1] % mult
        return np.pad(plane, ((0, ph), (0, pw)), mode="edge")

    if subsample:
        ysub, mcu = 2, 16
        ypad = pad(y, 16)
        # 2x2 mean subsample on the padded-to-even plane
        ce = pad(cb, 2)
        re_ = pad(cr, 2)
        cbs = pad(ce.reshape(ce.shape[0] // 2, 2, ce.shape[1] // 2, 2).mean((1, 3)), 8)
        crs = pad(re_.reshape(re_.shape[0] // 2, 2, re_.shape[1] // 2, 2).mean((1, 3)), 8)
    else:
        ysub, mcu = 1, 8
        ypad, cbs, crs = pad(y, 8), pad(cb, 8), pad(cr, 8)
    return ypad, cbs, crs, ysub, mcu


def encode_jpeg(
    arr: np.ndarray,
    subsample: bool = True,
    restart_interval: int = 0,
    grey: bool = False,
) -> bytes:
    """(H, W, 3) uint8 -> baseline JPEG bytes (fixture writer;
    deterministic). Flat quant tables (step 4), simple valid canonical
    Huffman tables, 4:2:0 chroma subsampling (2x2 mean) by default or
    4:4:4 with ``subsample=False``, optional restart markers;
    ``grey=True`` emits a 1-component luma-only scan (BT.601 Y of the
    RGB input). Exists to exercise decode_jpeg's real paths — not for
    compression."""
    if grey:
        subsample = False
    h, w, _ = arr.shape
    ypad, cbs, crs, ysub, mcu = _jpeg_prep_planes(arr, subsample)

    qt = np.full(64, _JPEG_FIXTURE_Q, np.int32)
    dc_counts, dc_symbols, dc_codes, ac_counts, ac_symbols, ac_codes = (
        _jpeg_fixture_tables()
    )

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes(qt.tolist()))  # qt 0 (luma)
    out += seg(0xDB, bytes([0x01]) + bytes(qt.tolist()))  # qt 1 (chroma)
    if grey:
        sof = (
            bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
            + bytes([1]) + bytes([1, 0x11, 0])
        )
    else:
        sof = (
            bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([3])
            + bytes([1, (ysub << 4) | ysub, 0])
            + bytes([2, 0x11, 1])
            + bytes([3, 0x11, 1])
        )
    out += seg(0xC0, sof)
    for tc_th in (0x00, 0x10, 0x01, 0x11):  # same tables under ids 0 and 1
        counts, symbols = (
            (dc_counts, dc_symbols) if tc_th >> 4 == 0 else (ac_counts, ac_symbols)
        )
        out += seg(0xC4, bytes([tc_th]) + bytes(counts) + symbols)
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    if grey:
        out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    else:
        out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))

    wtr = _JpegBitWriter()
    preds = [0, 0, 0]

    def put_block(block, ci):
        shifted = block - 128.0
        coef = _JPEG_T @ shifted @ _JPEG_T.T
        q = np.round(coef / _JPEG_FIXTURE_Q).astype(np.int32)
        zz = q[_JPEG_ZZ_ROWS, _JPEG_ZZ_COLS]
        diff = int(zz[0]) - preds[ci]
        preds[ci] = int(zz[0])
        t = int(diff).bit_length() if diff != 0 else 0
        code, ln = dc_codes[t]
        wtr.write(code, ln)
        if t:
            wtr.write(diff if diff > 0 else diff + (1 << t) - 1, t)
        run = 0
        last_nz = int(np.nonzero(zz)[0].max()) if np.any(zz[1:]) else 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, ln2 = ac_codes[0xF0]
                wtr.write(c, ln2)
                run -= 16
            s = abs(v).bit_length()
            c, ln2 = ac_codes[(run << 4) | s]
            wtr.write(c, ln2)
            wtr.write(v if v > 0 else v + (1 << s) - 1, s)
            run = 0
            if k == last_nz:
                break
        if last_nz < 63:
            c, ln2 = ac_codes[0x00]
            wtr.write(c, ln2)

    mcux = ypad.shape[1] // mcu
    mcuy = ypad.shape[0] // mcu
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                out += wtr.flush()
                out += bytes([0xFF, 0xD0 + ((n_mcu // restart_interval - 1) % 8)])
                wtr.__init__()
                preds[:] = [0, 0, 0]
            for by in range(ysub):
                for bx in range(ysub):
                    y0, x0 = my * mcu + by * 8, mx * mcu + bx * 8
                    put_block(ypad[y0 : y0 + 8, x0 : x0 + 8], 0)
            if not grey:
                put_block(cbs[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8], 1)
                put_block(crs[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8], 2)
            n_mcu += 1
    out += wtr.flush()
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_progressive(
    arr: np.ndarray, subsample: bool = True, grey: bool = False
) -> bytes:
    """(H, W, 3) uint8 -> progressive (SOF2) JPEG bytes encoding the
    SAME quantized coefficients as ``encode_jpeg`` — so progressive
    and sequential streams of one image must decode bit-identically
    (the round-trip test's invariant). Scan script exercises every
    progressive decode path: interleaved DC first pass at Al=1, DC
    refinement, per-component spectral-selection AC bands (1-20,
    21-63) at Al=1 with EOB-run coding, then AC refinement scans
    (Ah=1, Al=0) with correction bits. Fixture writer — deterministic,
    not compression-tuned."""
    if grey:
        subsample = False
    h, w, _ = arr.shape
    ypad, cbs, crs, ysub, mcu = _jpeg_prep_planes(arr, subsample)

    def quantize(plane):
        bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
        blocks = plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
        # same association order as encode_jpeg's per-block path
        coef = np.matmul(np.matmul(_JPEG_T, blocks - 128.0), _JPEG_T.T)
        q = np.round(coef / _JPEG_FIXTURE_Q).astype(np.int64)
        return q[:, :, _JPEG_ZZ_ROWS, _JPEG_ZZ_COLS]

    if grey:
        planes = [quantize(ypad)]
        samps = [(1, 1)]
    else:
        planes = [quantize(ypad), quantize(cbs), quantize(crs)]
        samps = [(ysub, ysub), (1, 1), (1, 1)]
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    true_dims = [
        ((-(-(h * cv) // vmax) + 7) // 8, (-(-(w * ch) // hmax) + 7) // 8)
        for ch, cv in samps
    ]
    mcux = planes[0].shape[1] // samps[0][0]
    mcuy = planes[0].shape[0] // samps[0][1]

    qt = np.full(64, _JPEG_FIXTURE_Q, np.int32)
    dc_counts, dc_symbols, dc_codes, ac_counts, ac_symbols, ac_codes = (
        _jpeg_fixture_tables()
    )

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes(qt.tolist()))
    out += seg(0xDB, bytes([0x01]) + bytes(qt.tolist()))
    ncomp = len(planes)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for i, (ch, cv) in enumerate(samps):
        sof += bytes([i + 1, (ch << 4) | cv, 0 if i == 0 else 1])
    out += seg(0xC2, sof)
    for tc_th in (0x00, 0x10, 0x01, 0x11):
        counts, symbols = (
            (dc_counts, dc_symbols) if tc_th >> 4 == 0 else (ac_counts, ac_symbols)
        )
        out += seg(0xC4, bytes([tc_th]) + bytes(counts) + symbols)

    def sos_header(comp_ids, ss, se, ah, al):
        body = bytes([len(comp_ids)])
        for i in comp_ids:
            tid = 0 if i == 0 else 1
            body += bytes([i + 1, (tid << 4) | tid])
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, body)

    def dc_blocks_in_order():
        """Interleaved MCU order (matches the decoder's multi-comp DC
        path); grey degenerates to the same raster."""
        if ncomp == 1:
            bh, bw = true_dims[0]
            for byy in range(bh):
                for bxx in range(bw):
                    yield 0, byy, bxx
        else:
            for my in range(mcuy):
                for mx in range(mcux):
                    for ci, (ch, cv) in enumerate(samps):
                        for by in range(cv):
                            for bx in range(ch):
                                yield ci, my * cv + by, mx * ch + bx

    # ---- scan 1: DC first pass, Al=1, interleaved ----
    wtr = _JpegBitWriter()
    preds = [0] * ncomp
    for ci, byy, bxx in dc_blocks_in_order():
        v = int(planes[ci][byy, bxx, 0]) >> 1  # arithmetic point transform
        diff = v - preds[ci]
        preds[ci] = v
        t = int(diff).bit_length() if diff != 0 else 0
        code, ln = dc_codes[t]
        wtr.write(code, ln)
        if t:
            wtr.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    out += sos_header(list(range(ncomp)), 0, 0, 0, 1)
    out += wtr.flush()

    # ---- AC first passes: per component, two spectral bands, Al=1 ----
    def ac_first(ci, ss, se):
        wtr = _JpegBitWriter()
        eobrun = 0

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                nb = eobrun.bit_length() - 1
                code, ln = ac_codes[nb << 4]
                wtr.write(code, ln)
                if nb:
                    wtr.write(eobrun - (1 << nb), nb)
                eobrun = 0

        bh, bw = true_dims[ci]
        for byy in range(bh):
            for bxx in range(bw):
                zz = planes[ci][byy, bxx]
                r = 0
                for k in range(ss, se + 1):
                    c = int(zz[k])
                    mag = (abs(c)) >> 1
                    if mag == 0:
                        r += 1
                        continue
                    v = mag if c > 0 else -mag
                    flush_eob()
                    while r > 15:
                        code, ln = ac_codes[0xF0]
                        wtr.write(code, ln)
                        r -= 16
                    s = mag.bit_length()
                    code, ln = ac_codes[(r << 4) | s]
                    wtr.write(code, ln)
                    wtr.write(v if v > 0 else v + (1 << s) - 1, s)
                    r = 0
                if r > 0:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
        flush_eob()
        return wtr.flush()

    for ci in range(ncomp):
        for ss, se in ((1, 20), (21, 63)):
            out += sos_header([ci], ss, se, 0, 1)
            out += ac_first(ci, ss, se)

    # ---- DC refinement: Ah=1, Al=0, one raw bit per block ----
    wtr = _JpegBitWriter()
    for ci, byy, bxx in dc_blocks_in_order():
        wtr.write(int(planes[ci][byy, bxx, 0]) & 1, 1)
    out += sos_header(list(range(ncomp)), 0, 0, 1, 0)
    out += wtr.flush()

    # ---- AC refinement: Ah=1, Al=0 (T.81 G.1.2.3 / libjpeg
    # encode_mcu_AC_refine: newly-significant symbols interleaved with
    # buffered correction bits, EOB runs carry pending bits) ----
    def ac_refine(ci, ss, se):
        wtr = _JpegBitWriter()
        eobrun = 0
        pend: list[int] = []

        def flush_eob():
            nonlocal eobrun, pend
            if eobrun:
                nb = eobrun.bit_length() - 1
                code, ln = ac_codes[nb << 4]
                wtr.write(code, ln)
                if nb:
                    wtr.write(eobrun - (1 << nb), nb)
            for bit in pend:
                wtr.write(bit, 1)
            eobrun = 0
            pend = []

        bh, bw = true_dims[ci]
        for byy in range(bh):
            for bxx in range(bw):
                zz = planes[ci][byy, bxx]
                band = [int(zz[k]) for k in range(ss, se + 1)]
                absv = [abs(c) for c in band]
                eobpos = -1  # index within band of last newly-significant
                for i, t in enumerate(absv):
                    if t == 1:
                        eobpos = i
                r = 0
                br: list[int] = []
                for i, c in enumerate(band):
                    t = absv[i]
                    if t == 0:
                        r += 1
                        continue
                    while r > 15 and i <= eobpos:
                        flush_eob()
                        code, ln = ac_codes[0xF0]
                        wtr.write(code, ln)
                        r -= 16
                        for bit in br:
                            wtr.write(bit, 1)
                        br = []
                    if t > 1:
                        br.append(t & 1)
                        continue
                    flush_eob()
                    code, ln = ac_codes[(r << 4) | 1]
                    wtr.write(code, ln)
                    wtr.write(1 if c > 0 else 0, 1)
                    for bit in br:
                        wtr.write(bit, 1)
                    br = []
                    r = 0
                if r > 0 or br:
                    eobrun += 1
                    pend.extend(br)
                    if eobrun == 0x7FFF:
                        flush_eob()
        flush_eob()
        return wtr.flush()

    for ci in range(ncomp):
        for ss, se in ((1, 20), (21, 63)):
            out += sos_header([ci], ss, se, 1, 0)
            out += ac_refine(ci, ss, se)

    out += b"\xff\xd9"
    return bytes(out)


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode PCM WAV bytes -> (float64 mono samples in [-1, 1], rate).
    Stdlib ``wave``; 8/16/32-bit PCM."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        n_ch = wf.getnchannels()
        width = wf.getsampwidth()
        rate = wf.getframerate()
        raw = wf.readframes(wf.getnframes())
    if width == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:
        samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif width == 4:
        samples = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise NotImplementedError(f"{width * 8}-bit WAV not supported")
    if n_ch > 1:
        samples = samples.reshape(-1, n_ch).mean(axis=1)
    return samples, rate


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """float samples in [-1, 1] -> 16-bit PCM WAV bytes (fixture writer)."""
    pcm = np.clip(samples, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


# ---------------------------------------------------------------------------
# container-metadata probes (no sample/frame decode) — MP4 + MP3
# ---------------------------------------------------------------------------


def parse_mp4_meta(payload: bytes) -> dict:
    """Walk an ISO 14496-12 (MP4/QuickTime) box tree and return
    ``{"container": "mp4", "duration_ms", "width", "height",
    "n_tracks"}`` from mvhd (duration/timescale) and the first video
    trak's tkhd (16.16 fixed-point width/height). Metadata only — no
    codec work; the probe a media pipeline runs on every object before
    deciding what to decode. Raises ValueError on corrupt structure.
    """
    d = payload

    def walk(lo: int, hi: int):
        """Yield (type, body_lo, body_hi) for the boxes in [lo, hi)."""
        pos = lo
        while pos + 8 <= hi:
            size = int.from_bytes(d[pos : pos + 4], "big")
            btype = d[pos + 4 : pos + 8]
            body = pos + 8
            if size == 1:  # 64-bit largesize
                if pos + 16 > hi:
                    raise ValueError("truncated MP4 largesize box")
                size = int.from_bytes(d[pos + 8 : pos + 16], "big")
                body = pos + 16
            elif size == 0:  # box extends to end of enclosing scope
                size = hi - pos
            if size < body - pos or pos + size > hi:
                raise ValueError("corrupt MP4 box size")
            yield btype, body, pos + size
            pos += size

    tops = {t: (a, b) for t, a, b in walk(0, len(d))}
    if b"moov" not in tops:
        raise ValueError("MP4 has no moov box")
    duration_ms = 0
    width = height = 0
    n_tracks = 0
    moov_lo, moov_hi = tops[b"moov"]
    for t, a, b in walk(moov_lo, moov_hi):
        if t == b"mvhd":
            ver = d[a]
            if ver == 1:
                timescale = int.from_bytes(d[a + 20 : a + 24], "big")
                duration = int.from_bytes(d[a + 24 : a + 32], "big")
            else:
                timescale = int.from_bytes(d[a + 12 : a + 16], "big")
                duration = int.from_bytes(d[a + 16 : a + 20], "big")
            if timescale == 0:
                raise ValueError("MP4 mvhd timescale 0")
            duration_ms = duration * 1000 // timescale
        elif t == b"trak":
            n_tracks += 1
            for tt, ta, tb in walk(a, b):
                if tt == b"tkhd":
                    ver = d[ta]
                    # tkhd body: after version-dependent times the box
                    # ends with matrix(36) + width(4) + height(4)
                    w16 = int.from_bytes(d[tb - 8 : tb - 4], "big")
                    h16 = int.from_bytes(d[tb - 4 : tb], "big")
                    if w16 and h16 and not width:
                        width, height = w16 >> 16, h16 >> 16
    return {
        "container": "mp4",
        "duration_ms": int(duration_ms),
        "width": int(width),
        "height": int(height),
        "n_tracks": n_tracks,
    }


def encode_mp4_stub(
    duration_ms: int, width: int, height: int, n_tracks: int = 1
) -> bytes:
    """Minimal valid MP4 box tree (ftyp + moov(mvhd, trak(tkhd)*n) +
    mdat filler) with timescale 1000 so mvhd duration == duration_ms
    exactly. Fixture writer for the probe — carries no samples."""

    def box(btype: bytes, body: bytes) -> bytes:
        return (8 + len(body)).to_bytes(4, "big") + btype + body

    ftyp = box(b"ftyp", b"isom" + (512).to_bytes(4, "big") + b"isomiso2")
    mvhd = box(
        b"mvhd",
        bytes(4)  # version 0 + flags
        + bytes(8)  # ctime, mtime
        + (1000).to_bytes(4, "big")  # timescale: 1ms units
        + int(duration_ms).to_bytes(4, "big")
        + (0x00010000).to_bytes(4, "big")  # rate 1.0
        + (0x0100).to_bytes(2, "big")  # volume 1.0
        + bytes(10)  # reserved
        + _MP4_UNITY_MATRIX
        + bytes(24)  # pre_defined
        + (n_tracks + 1).to_bytes(4, "big"),  # next_track_ID
    )
    traks = b""
    for tid in range(1, n_tracks + 1):
        tkhd = box(
            b"tkhd",
            bytes([0, 0, 0, 7])  # version 0, flags: enabled|in-movie
            + bytes(8)  # ctime, mtime
            + tid.to_bytes(4, "big")
            + bytes(4)  # reserved
            + int(duration_ms).to_bytes(4, "big")
            + bytes(8)  # reserved
            + bytes(4)  # layer + alternate_group
            + bytes(4)  # volume + reserved
            + _MP4_UNITY_MATRIX
            + (width << 16).to_bytes(4, "big")
            + (height << 16).to_bytes(4, "big"),
        )
        traks += box(b"trak", tkhd)
    moov = box(b"moov", mvhd + traks)
    mdat = box(b"mdat", bytes((duration_ms * 7 + i) % 251 for i in range(48)))
    return ftyp + moov + mdat


_MP4_UNITY_MATRIX = (
    (0x00010000).to_bytes(4, "big") + bytes(12)
    + (0x00010000).to_bytes(4, "big") + bytes(12)
    + (0x40000000).to_bytes(4, "big")
)

# MPEG-1 Layer III tables (ISO 11172-3): bitrate kbps by header index,
# sample rate by index
_MP3_BITRATES = (
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0
)
_MP3_RATES = (44100, 48000, 32000, 0)


def parse_mp3_meta(payload: bytes) -> dict:
    """Walk MPEG-1 Layer III frame headers (ID3v2 tag skipped via its
    synchsafe size) and return ``{"container": "mp3", "duration_ms",
    "sample_rate", "bitrate_kbps", "n_frames"}``. Duration is
    n_frames * 1152 samples / rate — exact, no decode. Raises
    ValueError if no valid frame sequence is found."""
    d = payload
    pos = 0
    if d[:3] == b"ID3":
        if len(d) < 10:
            raise ValueError("truncated ID3v2 header")
        size = 0
        for byte in d[6:10]:  # synchsafe 7-bit bytes
            if byte & 0x80:
                raise ValueError("corrupt ID3v2 synchsafe size")
            size = (size << 7) | byte
        pos = 10 + size
    n_frames = 0
    rate = bitrate = 0
    while pos + 4 <= len(d):
        h = d[pos : pos + 4]
        if not (h[0] == 0xFF and (h[1] & 0xE0) == 0xE0):
            break
        if (h[1] & 0x18) != 0x18 or (h[1] & 0x06) != 0x02:
            raise ValueError("not MPEG-1 Layer III")
        br = _MP3_BITRATES[h[2] >> 4]
        sr = _MP3_RATES[(h[2] >> 2) & 3]
        if not br or not sr:
            raise ValueError("bad MP3 bitrate/samplerate index")
        if n_frames == 0:
            rate, bitrate = sr, br
        elif (sr, br) != (rate, bitrate):
            raise ValueError("VBR/mixed-header MP3 not supported by probe")
        padding = (h[2] >> 1) & 1
        frame_len = 144 * br * 1000 // sr + padding
        pos += frame_len
        n_frames += 1
    if n_frames == 0:
        raise ValueError("no MPEG audio frames found")
    return {
        "container": "mp3",
        "duration_ms": n_frames * 1152 * 1000 // rate,
        "sample_rate": rate,
        "bitrate_kbps": bitrate,
        "n_frames": n_frames,
    }


def encode_mp3_stub(
    n_frames: int, bitrate_kbps: int = 128, rate: int = 32000, id3: bool = True
) -> bytes:
    """Valid MPEG-1 Layer III frame-header sequence with deterministic
    junk frame bodies (no real audio). rate=32000 makes each frame
    exactly 36 ms and 144*br/sr an integer, so the probe's duration is
    exact. Optional ID3v2 tag exercises the skip path."""
    br_idx = _MP3_BITRATES.index(bitrate_kbps)
    sr_idx = _MP3_RATES.index(rate)
    header = bytes(
        [0xFF, 0xFB, (br_idx << 4) | (sr_idx << 2), 0x00]
    )  # MPEG-1 L3, no padding, stereo
    frame_len = 144 * bitrate_kbps * 1000 // rate
    out = bytearray()
    if id3:
        tag_body = b"TALBfixture-album\x00" + bytes(10)
        out += b"ID3\x04\x00\x00" + bytes(
            [(len(tag_body) >> 21) & 0x7F, (len(tag_body) >> 14) & 0x7F,
             (len(tag_body) >> 7) & 0x7F, len(tag_body) & 0x7F]
        ) + tag_body
    for f in range(n_frames):
        body = bytes((f * 31 + i * 7) % 251 for i in range(frame_len - 4))
        out += header + body
    return bytes(out)


def probe_media(payload: bytes) -> dict:
    """Container sniff + header/metadata parse, no sample decode.

    Returns ``{"container", "duration_ms", "width", "height"}``:
    images (ppm/png/jpeg) parse true dimensions with duration 0, WAV
    parses exact duration from frame count/rate, MP4/MP3 parse
    duration (and dimensions for MP4) from container metadata alone.
    Unknown or corrupt payloads return container "unknown" and
    duration -1 — the probe NEVER raises; it is the triage pass that
    decides what a pipeline tries to decode.
    """
    out = {"container": "unknown", "duration_ms": -1, "width": 0, "height": 0}
    try:
        if payload.startswith(b"P6"):
            arr = decode_ppm(payload)
            return {"container": "ppm", "duration_ms": 0,
                    "width": arr.shape[1], "height": arr.shape[0]}
        if payload.startswith(_PNG_MAGIC):
            w = int.from_bytes(payload[16:20], "big")
            h = int.from_bytes(payload[20:24], "big")
            if payload[12:16] != b"IHDR" or not w or not h:
                raise ValueError("corrupt PNG IHDR")
            return {"container": "png", "duration_ms": 0, "width": w, "height": h}
        if payload.startswith(b"\xff\xd8"):
            return {"container": "jpeg", "duration_ms": 0, **_jpeg_dims(payload)}
        if payload.startswith(b"RIFF") and payload[8:12] == b"WAVE":
            with wave.open(io.BytesIO(payload), "rb") as wf:
                rate = wf.getframerate()
                if rate <= 0:
                    raise ValueError("WAV rate 0")
                return {"container": "wav",
                        "duration_ms": wf.getnframes() * 1000 // rate,
                        "width": 0, "height": 0}
        if len(payload) >= 12 and payload[4:8] == b"ftyp":
            m = parse_mp4_meta(payload)
            return {"container": "mp4", "duration_ms": m["duration_ms"],
                    "width": m["width"], "height": m["height"]}
        if payload[:3] == b"ID3" or (
            len(payload) >= 2 and payload[0] == 0xFF and (payload[1] & 0xE0) == 0xE0
        ):
            m = parse_mp3_meta(payload)
            return {"container": "mp3", "duration_ms": m["duration_ms"],
                    "width": 0, "height": 0}
    except (ValueError, NotImplementedError, wave.Error, EOFError,
            struct.error, IndexError, OverflowError, zlib.error):
        pass
    return out


def _jpeg_dims(payload: bytes) -> dict:
    """Width/height from the first SOF marker — the marker walk of
    decode_jpeg without entropy decode (works for progressive too:
    dimensions live in SOF regardless of coding mode)."""
    d = payload
    pos = 2
    while pos + 4 <= len(d):
        if d[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = d[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker in (0xD9, 0xDA):
            break
        seglen = int.from_bytes(d[pos + 2 : pos + 4], "big")
        if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                      0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            h = int.from_bytes(d[pos + 5 : pos + 7], "big")
            w = int.from_bytes(d[pos + 7 : pos + 9], "big")
            return {"width": w, "height": h}
        pos += 2 + seglen
    raise ValueError("JPEG has no SOF marker")


PROBE_DDL = (
    "media_id long, kind string, container string, duration_ms long, "
    "width long, height long"
)


def probe_media_df(media: DataFrame) -> DataFrame:
    """mapInPandas metadata-probe stage: (media rows) -> PROBE_DDL
    rows. Header-only parsing — bytes per row touched are O(header),
    not O(payload), so this is the cheap first pass over a 100 TB
    corpus that routes rows to decoders."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            probes = [
                probe_media(bytes(p) if p is not None else b"")
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "container": [p["container"] for p in probes],
                    "duration_ms": [p["duration_ms"] for p in probes],
                    "width": [p["width"] for p in probes],
                    "height": [p["height"] for p in probes],
                }
            )

    return media.mapInPandas(run, PROBE_DDL)


def resize_nearest(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbour resize of a (H, W, C) array via index slicing."""
    h, w = arr.shape[:2]
    rows = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    cols = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return arr[rows][:, cols]


def real_decode(payload: bytes, kind: str):
    """Decode a payload by container sniffing.

    Returns ("image", (H, W, 3) array) for PPM/PNG/baseline-JPEG,
    ("audio", (samples, rate)) for WAV. Raises NotImplementedError for
    codecs that need external libraries (MP3/MP4/progressive JPEG/...)
    — this is the single swap point where PIL/soundfile/ffmpeg would
    be wired in.
    """
    if payload.startswith(b"P6"):
        return "image", decode_ppm(payload)
    if payload.startswith(_PNG_MAGIC):
        return "image", decode_png(payload)
    if payload.startswith(b"\xff\xd8"):
        return "image", decode_jpeg(payload)
    if payload.startswith(b"RIFF") and payload[8:12] == b"WAVE":
        return "audio", decode_wav(payload)
    raise NotImplementedError(
        f"no stdlib decoder for this {kind} payload; MP3/MP4 "
        "require audio/video libraries not present in this container"
    )


def real_features(payload: bytes, kind: str, dim: int = FEATURE_DIM) -> np.ndarray:
    """Fixed-width features from a REAL decode: per-channel mean/std +
    shape for images; duration/RMS/zero-crossing-rate/peak for audio."""
    tag, decoded = real_decode(payload, kind)
    out = np.zeros(dim, dtype=np.float32)
    if tag == "image":
        arr = decoded.astype(np.float64)
        h, w, _ = arr.shape
        out[0] = 1.0  # modality tag
        out[1], out[2] = float(w), float(h)
        out[3:6] = arr.mean(axis=(0, 1)) / 255.0
        out[6:9] = arr.std(axis=(0, 1)) / 255.0
        thumb = resize_nearest(decoded, 2, 2).astype(np.float64).mean(axis=2)
        out[9:13] = thumb.reshape(-1) / 255.0
    else:
        samples, rate = decoded
        n = max(1, len(samples))
        out[0] = 2.0
        out[1] = float(rate)
        out[2] = n / float(max(rate, 1))  # duration sec (rate=0 headers exist)
        out[3] = float(np.sqrt((samples**2).mean())) if len(samples) else 0.0
        out[4] = float(np.abs(samples).max()) if len(samples) else 0.0
        out[5] = float((np.diff(np.signbit(samples)) != 0).sum()) / n  # ZCR
    return out


def fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in features: byte-histogram projections.

    Fully reproducible from the payload alone — the fallback for
    payloads no stdlib decoder understands.
    """
    if not payload:
        return np.zeros(dim, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr, minlength=256).astype(np.float64)
    hist /= max(1.0, hist.sum())
    # fold 256 bins into `dim` buckets
    folded = hist.reshape(dim, 256 // dim).sum(axis=1)
    return folded.astype(np.float32)


def featurize(media: DataFrame, dim: int = FEATURE_DIM, mode: str = "auto") -> DataFrame:
    """mapInPandas featurize stage: (media rows) -> FEATURES_DDL rows.

    mode: "auto" (real decode where a stdlib kernel matches, fake
    fallback otherwise — `decoded` column records which), "real"
    (raise on undecodable payloads), "fake" (histogram features only).
    """
    if mode not in ("auto", "real", "fake"):
        raise ValueError(f"featurize mode must be auto|real|fake, got {mode!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, shas, sizes, dec = [], [], [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                raw = bytes(payload) if payload is not None else b""
                decoded = False
                if mode in ("auto", "real"):
                    try:
                        f = real_features(raw, kind, dim)
                        decoded = True
                    except (ValueError, NotImplementedError, wave.Error,
                            EOFError, struct.error, IndexError, OverflowError,
                            zlib.error):
                        # the expected corrupt/unsupported-payload errors:
                        # truncated RIFF chunks raise wave.Error/EOFError,
                        # bad headers ValueError/struct.error/IndexError,
                        # corrupt PNG deflate streams zlib.error,
                        # library-needing codecs NotImplementedError. Auto
                        # mode falls back to the deterministic histogram
                        # features for these; anything else is a genuine
                        # kernel bug and must propagate, not silently
                        # downgrade the corpus to decoded=False
                        if mode == "real":
                            raise
                        f = fake_features(raw, dim)
                else:
                    f = fake_features(raw, dim)
                feats.append(f.tolist())
                shas.append(hashlib.sha256(raw).hexdigest())
                sizes.append(len(raw))
                dec.append(decoded)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": sizes,
                    "sha256": shas,
                    "decoded": dec,
                    "features": feats,
                }
            )

    return media.mapInPandas(run, FEATURES_DDL)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per frame to decode.

    Pure column math over metadata (no decode): the explode pattern a
    real frame extractor would parallelize over.
    """
    return media.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )


AUDIO_RATE = 8000


def synthetic_media_rows(n: int = 64, seed: int = 7) -> list[tuple]:
    """Deterministic media rows: REAL image payloads (rotating PPM,
    PNG and baseline JPEG — all stdlib-decodable), REAL WAV payloads
    for audio, opaque bytes for video (exercises the fake-fallback
    path). Pure Python/numpy — usable with or without a SparkSession
    (the oracle parquet writer needs it Spark-free; PNG bytes are
    deterministic at a fixed zlib level, JPEG at fixed fixture
    tables)."""
    import random

    rng = random.Random(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            w, h = rng.randint(4, 24), rng.randint(4, 24)
            arr = np.array(
                [rng.randrange(256) for _ in range(w * h * 3)], dtype=np.uint8
            ).reshape(h, w, 3)
            container = (i // 3) % 3  # rotate containers; pixels stay random
            if container == 1:
                if (i // 9) % 5 == 4:  # every 5th PNG row: Adam7
                    payload = encode_png_adam7(arr)
                else:
                    payload = encode_png(arr, filter_type=(i // 9) % 5)
                meta = (w, h, 0, "png")
            elif container == 2:
                if (i // 9) % 3 == 1:  # every 3rd JPEG row: progressive
                    payload = encode_jpeg_progressive(
                        arr, subsample=(i // 9) % 2 == 0
                    )
                else:
                    payload = encode_jpeg(
                        arr,
                        subsample=(i // 9) % 2 == 0,  # alternate 4:2:0 / 4:4:4
                        restart_interval=2 if (i // 9) % 3 == 2 else 0,
                    )
                meta = (w, h, 0, "jpeg")
            else:
                payload = encode_ppm(arr)
                meta = (w, h, 0, "ppm")
        elif kind == "audio":
            if (i // 3) % 3 == 2:  # every 3rd audio row: MP3 frame walk
                n_frames = rng.randint(3, 12)
                payload = encode_mp3_stub(n_frames, id3=(i // 9) % 2 == 0)
                meta = (0, 0, 36 * n_frames, "mp3")  # 1152/32000 = 36ms
            else:
                rate = AUDIO_RATE
                dur = rng.randint(100, 400)  # ms
                t = np.arange(int(rate * dur / 1000.0))
                freq = rng.uniform(100.0, 1000.0)
                payload = encode_wav(
                    0.5 * np.sin(2 * np.pi * freq * t / rate), rate
                )
                meta = (0, 0, dur, "pcm16")
        else:
            if (i // 3) % 2 == 1:  # every other video row: real MP4 boxes
                w, h = rng.randint(16, 640), rng.randint(16, 480)
                dur = rng.randint(1000, 10000)
                payload = encode_mp4_stub(dur, w, h, n_tracks=1 + (i // 6) % 2)
                meta = (w, h, dur, "mp4")
            else:
                payload = bytes(
                    rng.getrandbits(8) for _ in range(rng.randint(64, 512))
                )
                meta = (0, 0, rng.randint(1000, 10000), "fake")
        rows.append((i, kind, payload, meta))
    return rows


def synthetic_media(spark, n: int = 64, seed: int = 7) -> DataFrame:
    """Deterministic media table as a DataFrame (see synthetic_media_rows)."""
    return spark.createDataFrame(synthetic_media_rows(n, seed), MEDIA_SCHEMA_DDL)


def write_synthetic_media_parquet(path: str, n: int = 64, seed: int = 7) -> str:
    """Write the deterministic media table to a single parquet file
    (pyarrow, no Spark) so a DuckDB oracle and the Spark query can read
    the IDENTICAL bytes. Atomic replace; safe to call from both sides
    regardless of execution order (same seed -> same values)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = synthetic_media_rows(n, seed)
    meta_type = pa.struct(
        [("width", pa.int32()), ("height", pa.int32()),
         ("duration_ms", pa.int32()), ("codec", pa.string())]
    )
    table = pa.table(
        {
            "media_id": pa.array([r[0] for r in rows], pa.int64()),
            "kind": pa.array([r[1] for r in rows], pa.string()),
            "payload": pa.array([r[2] for r in rows], pa.binary()),
            "meta": pa.array(
                [dict(zip(("width", "height", "duration_ms", "codec"), r[3])) for r in rows],
                meta_type,
            ),
        }
    )
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


# ---------------------------------------------------------------------------
# MP4 sample tables (stbl walk) + frame sampling
# ---------------------------------------------------------------------------
#
# The metadata probe above answers "what is this file"; the sample-table
# walk answers "where are its frames".  parse_mp4_samples expands the
# ISO 14496-12 stbl boxes (stsd codec, stts timing, stsc sample->chunk
# runs, stsz sizes, stco/co64 chunk offsets, stss sync samples) into
# per-sample (offset, size, pts, is_sync) arrays — everything needed to
# slice raw frame payloads out of mdat WITHOUT any codec work, which is
# exactly the "frame-sample" primitive a 100 TB video pipeline runs
# before handing k keyframes per asset to a (GPU) decoder.  The codec
# payload decode itself stays env-stubbed behind real_decode.


def _mp4_walk(d: bytes, lo: int, hi: int):
    """Yield (type, body_lo, body_hi) for ISO-BMFF boxes in [lo, hi).

    Same size conventions as parse_mp4_meta: size==1 -> 64-bit
    largesize follows, size==0 -> box extends to the enclosing scope.
    """
    pos = lo
    while pos + 8 <= hi:
        size = int.from_bytes(d[pos : pos + 4], "big")
        btype = d[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > hi:
                raise ValueError("truncated MP4 largesize box")
            size = int.from_bytes(d[pos + 8 : pos + 16], "big")
            body = pos + 16
        elif size == 0:
            size = hi - pos
        if size < body - pos or pos + size > hi:
            raise ValueError("corrupt MP4 box size")
        yield btype, body, pos + size
        pos += size


def _be32(d: bytes, off: int, n: int) -> np.ndarray:
    if off + 4 * n > len(d):
        raise ValueError("truncated MP4 table box")
    return np.frombuffer(d, ">u4", count=n, offset=off).astype(np.int64)


def parse_mp4_samples(payload: bytes, max_samples: int = 4_000_000) -> list:
    """Expand every track's sample table into per-sample arrays.

    Returns one dict per trak:
    ``{"track_id", "handler", "codec", "timescale", "n_samples",
    "offset", "size", "pts", "pts_ms", "is_sync"}`` where the last six
    are numpy int64/bool arrays indexed by sample (sample_no = index+1).
    Offsets are absolute file offsets derived by expanding stsc runs
    over the stco/co64 chunk list and cumulatively summing stsz sizes
    within each chunk; pts comes from cumulative stts deltas; is_sync
    from stss (absent => every sample is sync, per the spec).

    Structural corruption (table lengths that don't tile the sample
    count, offsets past EOF are caught at slice time, sample counts
    above ``max_samples``) raises ValueError — bomb-safe like the
    image decoders.
    """
    d = payload
    moov = None
    for t, a, b in _mp4_walk(d, 0, len(d)):
        if t == b"moov":
            moov = (a, b)
    if moov is None:
        raise ValueError("MP4 has no moov box")
    tracks = []
    for t, a, b in _mp4_walk(d, *moov):
        if t != b"trak":
            continue
        track_id = 0
        handler = ""
        timescale = 0
        stbl = None
        for tt, ta, tb in _mp4_walk(d, a, b):
            if tt == b"tkhd":
                off = ta + 4 + (16 if d[ta] == 1 else 8)
                track_id = int.from_bytes(d[off : off + 4], "big")
            elif tt == b"mdia":
                for mt, ma, mb in _mp4_walk(d, ta, tb):
                    if mt == b"mdhd":
                        off = ma + 4 + (16 if d[ma] == 1 else 8)
                        timescale = int.from_bytes(d[off : off + 4], "big")
                    elif mt == b"hdlr":
                        handler = d[ma + 8 : ma + 12].decode("latin-1")
                    elif mt == b"minf":
                        for nt, na, nb in _mp4_walk(d, ma, mb):
                            if nt == b"stbl":
                                stbl = (na, nb)
        if stbl is None:
            continue
        codec = ""
        stts = stsc = sizes = offsets = sync = None
        fixed_size = 0
        n = -1
        for st, sa, sb in _mp4_walk(d, *stbl):
            if st == b"stsd":
                cnt = int.from_bytes(d[sa + 4 : sa + 8], "big")
                if cnt >= 1 and sa + 16 <= sb:
                    codec = d[sa + 12 : sa + 16].decode("latin-1")
            elif st == b"stts":
                cnt = int.from_bytes(d[sa + 4 : sa + 8], "big")
                flat = _be32(d, sa + 8, 2 * cnt)
                stts = (flat[0::2], flat[1::2])  # (counts, deltas)
            elif st == b"stsc":
                cnt = int.from_bytes(d[sa + 4 : sa + 8], "big")
                flat = _be32(d, sa + 8, 3 * cnt)
                stsc = (flat[0::3], flat[1::3])  # (first_chunk, spc)
            elif st == b"stsz":
                fixed_size = int.from_bytes(d[sa + 4 : sa + 8], "big")
                n = int.from_bytes(d[sa + 8 : sa + 12], "big")
                if n > max_samples:
                    raise ValueError("MP4 sample count above cap")
                if fixed_size == 0:
                    sizes = _be32(d, sa + 12, n)
            elif st == b"stco":
                cnt = int.from_bytes(d[sa + 4 : sa + 8], "big")
                offsets = _be32(d, sa + 8, cnt)
            elif st == b"co64":
                cnt = int.from_bytes(d[sa + 4 : sa + 8], "big")
                if sa + 8 + 8 * cnt > sb:
                    raise ValueError("truncated co64 box")
                offsets = np.frombuffer(
                    d, ">u8", count=cnt, offset=sa + 8
                ).astype(np.int64)
            elif st == b"stss":
                cnt = int.from_bytes(d[sa + 4 : sa + 8], "big")
                sync = _be32(d, sa + 8, cnt)
        if n < 0 or stts is None or stsc is None or offsets is None:
            raise ValueError("MP4 stbl missing stsz/stts/stsc/stco")
        if timescale <= 0:
            raise ValueError("MP4 mdhd timescale 0")
        if sizes is None:
            sizes = np.full(n, fixed_size, np.int64)
        counts, deltas = stts
        if int(counts.sum()) != n:
            raise ValueError("MP4 stts does not tile the sample count")
        deltas_per_sample = np.repeat(deltas, counts)
        pts = np.concatenate(([0], np.cumsum(deltas_per_sample)[:-1]))
        # expand stsc runs over the chunk list
        first_chunk, spc_runs = stsc
        n_chunks = len(offsets)
        if len(first_chunk) == 0 or first_chunk[0] != 1 or np.any(
            np.diff(first_chunk) <= 0
        ):
            raise ValueError("corrupt MP4 stsc run list")
        run_idx = (
            np.searchsorted(first_chunk, np.arange(1, n_chunks + 1), "right") - 1
        )
        spc = spc_runs[run_idx]
        if int(spc.sum()) != n:
            raise ValueError("MP4 stsc/stsz sample count mismatch")
        chunk_of_sample = np.repeat(np.arange(n_chunks), spc)
        size_cum = np.concatenate(([0], np.cumsum(sizes)[:-1]))
        chunk_first = np.concatenate(([0], np.cumsum(spc)[:-1]))
        off = (
            offsets[chunk_of_sample]
            + size_cum
            - np.repeat(size_cum[chunk_first], spc)
        )
        if sync is None:
            is_sync = np.ones(n, bool)
        else:
            if len(sync) and (sync.min() < 1 or sync.max() > n):
                raise ValueError("MP4 stss sample number out of range")
            is_sync = np.zeros(n, bool)
            is_sync[sync - 1] = True
        tracks.append(
            {
                "track_id": track_id,
                "handler": handler,
                "codec": codec,
                "timescale": timescale,
                "n_samples": n,
                "offset": off,
                "size": sizes,
                "pts": pts,
                "pts_ms": pts * 1000 // timescale,
                "is_sync": is_sync,
            }
        )
    return tracks


def sample_mp4_frames(payload: bytes, k: int = 4, handler: str | None = None) -> list:
    """Pick k evenly-spaced SYNC samples per track and slice their raw
    payload bytes out of mdat (no codec decode — the k-keyframes-per-
    asset primitive).

    Selection is deterministic and SQL-mirrorable: with n_sync sync
    samples (0-based rank rn), keep all of them when n_sync <= k, else
    rn = (i * (n_sync - 1)) // (k - 1) for i in 0..k-1 (k == 1 keeps
    the first).  ``handler`` filters tracks ("vide"/"soun"); None
    keeps every track.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    out = []
    for tr in parse_mp4_samples(payload):
        if handler is not None and tr["handler"] != handler:
            continue
        sync_idx = np.flatnonzero(tr["is_sync"])
        n_sync = len(sync_idx)
        if n_sync == 0:
            continue
        if n_sync <= k:
            pick = sync_idx
        elif k == 1:
            pick = sync_idx[:1]
        else:
            pick = sync_idx[(np.arange(k) * (n_sync - 1)) // (k - 1)]
        for i in pick:
            off, sz = int(tr["offset"][i]), int(tr["size"][i])
            if off < 0 or off + sz > len(payload):
                raise ValueError("MP4 sample extends past payload")
            out.append(
                {
                    "track_id": tr["track_id"],
                    "codec": tr["codec"],
                    "sample_no": int(i) + 1,
                    "pts_ms": int(tr["pts_ms"][i]),
                    "data": payload[off : off + sz],
                }
            )
    return out


def _chunk_partition(n: int, head: int, head_count: int, rest: int) -> list:
    """Chunk sizes [head]*head_count then [rest]..., last = remainder."""
    out, left = [], n
    for _ in range(head_count):
        if left <= 0:
            break
        c = min(head, left)
        out.append(c)
        left -= c
    while left > 0:
        c = min(rest, left)
        out.append(c)
        left -= c
    return out


def mp4_sample_rule(media_id: int, track_id: int, s: int) -> tuple:
    """The generative rule for fixture sample content: (size, pts_ms,
    bytes).  Pure ASCII and arithmetic so a DuckDB oracle can
    reconstruct every frame independently (repeat/substr + sha256 over
    the varchar == sha256 over the raw bytes)."""
    if track_id == 1:  # video, timescale 1000, deltas 5x100 then 50
        size = 24 + ((s * 7 + media_id) % 40)
        pts_ms = min(s - 1, 5) * 100 + max(s - 6, 0) * 50
    else:  # audio, timescale 8000, constant delta 256 -> 32 ms
        size = 16 + ((s * 5 + media_id * 2) % 24)
        pts_ms = (s - 1) * 32
    base = f"m{media_id}t{track_id}s{s}|".encode()
    content = (base * (size // len(base) + 1))[:size]
    return size, pts_ms, content


def mp4_fixture_track_counts(media_id: int) -> tuple:
    """(n_video_samples, n_audio_samples) for the fixture rule."""
    return 8 + (media_id % 5) * 3, 12 + (media_id % 3) * 5


def encode_mp4_media(media_id: int) -> bytes:
    """Deterministic two-track MP4 with REAL sample tables: a video
    trak (avc1 stub entries, stss sync every 4th sample, two-run stts)
    and an audio trak (mp4a, constant stts, no stss => all sync),
    chunks interleaved video/audio in mdat, moov written AFTER mdat
    (streaming-unfriendly but common layout), chunk offsets in stco
    for even media_id and co64 for odd.  Sample bytes follow
    mp4_sample_rule so tests and the DuckDB oracle can reconstruct
    them without parsing."""

    def box(btype: bytes, body: bytes) -> bytes:
        return (8 + len(body)).to_bytes(4, "big") + btype + body

    def full(btype: bytes, body: bytes) -> bytes:
        return box(btype, bytes(4) + body)  # version 0, flags 0

    n_v, n_a = mp4_fixture_track_counts(media_id)
    specs = [
        dict(tid=1, handler=b"vide", codec=b"avc1", timescale=1000,
             n=n_v, chunks=_chunk_partition(n_v, 3, 2, 2),
             stts=[(min(5, n_v), 100)] + ([(n_v - 5, 50)] if n_v > 5 else []),
             sync=[s for s in range(1, n_v + 1) if (s - 1) % 4 == 0]),
        dict(tid=2, handler=b"soun", codec=b"mp4a", timescale=8000,
             n=n_a, chunks=_chunk_partition(n_a, 4, 1, 3),
             stts=[(n_a, 256)], sync=None),
    ]
    ftyp = box(b"ftyp", b"isom" + (512).to_bytes(4, "big") + b"isomiso2")
    # lay out mdat: interleave per-chunk byte strings across tracks
    for sp in specs:
        sizes = [mp4_sample_rule(media_id, sp["tid"], s)[0] for s in range(1, sp["n"] + 1)]
        blobs = [mp4_sample_rule(media_id, sp["tid"], s)[2] for s in range(1, sp["n"] + 1)]
        chunk_blobs, i = [], 0
        for c in sp["chunks"]:
            chunk_blobs.append(b"".join(blobs[i : i + c]))
            i += c
        sp["sizes"], sp["chunk_blobs"] = sizes, chunk_blobs
        sp["chunk_offsets"] = []
    mdat_body = b""
    base_off = len(ftyp) + 8  # mdat header is always the 8-byte form
    for ci in range(max(len(sp["chunk_blobs"]) for sp in specs)):
        for sp in specs:
            if ci < len(sp["chunk_blobs"]):
                sp["chunk_offsets"].append(base_off + len(mdat_body))
                mdat_body += sp["chunk_blobs"][ci]
    mdat = box(b"mdat", mdat_body)

    dur_ms = sum(c * d for c, d in specs[0]["stts"])  # video, ts=1000
    mvhd = full(
        b"mvhd",
        bytes(8) + (1000).to_bytes(4, "big") + int(dur_ms).to_bytes(4, "big")
        + (0x00010000).to_bytes(4, "big") + (0x0100).to_bytes(2, "big")
        + bytes(10) + _MP4_UNITY_MATRIX + bytes(24)
        + (len(specs) + 1).to_bytes(4, "big"),
    )
    traks = b""
    for sp in specs:
        w, h = (64, 48) if sp["handler"] == b"vide" else (0, 0)
        tkhd = box(
            b"tkhd",
            bytes([0, 0, 0, 7]) + bytes(8) + sp["tid"].to_bytes(4, "big")
            + bytes(4) + int(dur_ms).to_bytes(4, "big") + bytes(8)
            + bytes(4) + bytes(4) + _MP4_UNITY_MATRIX
            + (w << 16).to_bytes(4, "big") + (h << 16).to_bytes(4, "big"),
        )
        mdhd = full(
            b"mdhd",
            bytes(8) + sp["timescale"].to_bytes(4, "big")
            + (dur_ms * sp["timescale"] // 1000).to_bytes(4, "big")
            + (0x55C4).to_bytes(2, "big") + bytes(2),
        )
        hdlr = full(b"hdlr", bytes(4) + sp["handler"] + bytes(12) + b"\x00")
        stsd = full(
            b"stsd",
            (1).to_bytes(4, "big")
            + box(sp["codec"], bytes(6) + (1).to_bytes(2, "big")),
        )
        stts = full(
            b"stts",
            len(sp["stts"]).to_bytes(4, "big")
            + b"".join(c.to_bytes(4, "big") + d.to_bytes(4, "big")
                       for c, d in sp["stts"]),
        )
        # compress the actual chunk partition into stsc runs
        runs = []
        for ci, c in enumerate(sp["chunks"], start=1):
            if not runs or runs[-1][1] != c:
                runs.append((ci, c))
        stsc = full(
            b"stsc",
            len(runs).to_bytes(4, "big")
            + b"".join(fc.to_bytes(4, "big") + c.to_bytes(4, "big")
                       + (1).to_bytes(4, "big") for fc, c in runs),
        )
        stsz = full(
            b"stsz",
            bytes(4) + sp["n"].to_bytes(4, "big")
            + b"".join(sz.to_bytes(4, "big") for sz in sp["sizes"]),
        )
        if media_id % 2 == 0:
            stco = full(
                b"stco",
                len(sp["chunk_offsets"]).to_bytes(4, "big")
                + b"".join(o.to_bytes(4, "big") for o in sp["chunk_offsets"]),
            )
        else:
            stco = full(
                b"co64",
                len(sp["chunk_offsets"]).to_bytes(4, "big")
                + b"".join(o.to_bytes(8, "big") for o in sp["chunk_offsets"]),
            )
        stss_box = b""
        if sp["sync"] is not None:
            stss_box = full(
                b"stss",
                len(sp["sync"]).to_bytes(4, "big")
                + b"".join(s.to_bytes(4, "big") for s in sp["sync"]),
            )
        stbl = box(b"stbl", stsd + stts + stsc + stsz + stco + stss_box)
        minf = box(b"minf", stbl)
        mdia = box(b"mdia", mdhd + hdlr + minf)
        traks += box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + traks)
    return ftyp + mdat + moov


def write_synthetic_mp4_parquet(path: str, n: int = 12) -> str:
    """Spark-free (pyarrow) writer for the MP4 fixture table so the
    DuckDB oracle and the Spark query read IDENTICAL bytes regardless
    of driver execution order.  meta carries the generator's ground-
    truth sample counts (the per-sample size/pts/content rules live in
    mp4_sample_rule and are mirrored arithmetically in the oracle
    SQL).  Atomic replace, deterministic values."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    metas = [mp4_fixture_track_counts(i) for i in range(n)]
    meta_type = pa.struct([("n_samples_v", pa.int32()), ("n_samples_a", pa.int32())])
    table = pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "payload": pa.array([encode_mp4_media(i) for i in range(n)], pa.binary()),
            "meta": pa.array(
                [{"n_samples_v": v, "n_samples_a": a} for v, a in metas], meta_type
            ),
        }
    )
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


MP4_FRAMES_DDL = (
    "media_id long, track_id long, codec string, sample_no long, "
    "pts_ms long, n_bytes long, frame_sha string"
)


def mp4_frames_df(media: DataFrame, k: int = 4) -> DataFrame:
    """mapInPandas frame-sampling stage: (media_id, payload) rows ->
    MP4_FRAMES_DDL rows, k evenly-spaced sync samples per track.  The
    sha256 is over the raw sliced sample bytes, so one wrong stsc run,
    chunk offset, or size cumsum anywhere in the walk mismatches the
    oracle.  O(moov + k frames) bytes touched per row."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {c: [] for c in ("media_id", "track_id", "codec",
                                   "sample_no", "pts_ms", "n_bytes", "frame_sha")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for fr in sample_mp4_frames(bytes(payload), k):
                    out["media_id"].append(int(mid))
                    out["track_id"].append(fr["track_id"])
                    out["codec"].append(fr["codec"])
                    out["sample_no"].append(fr["sample_no"])
                    out["pts_ms"].append(fr["pts_ms"])
                    out["n_bytes"].append(len(fr["data"]))
                    out["frame_sha"].append(hashlib.sha256(fr["data"]).hexdigest())
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(run, MP4_FRAMES_DDL)
