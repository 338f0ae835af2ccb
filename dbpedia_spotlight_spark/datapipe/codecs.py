"""Real compressed-image decoders with zero external libraries.

Round 2's multimodal stub covered every *compressed* codec; this module
removes all three image codecs from that list using only the Python
stdlib (`zlib`, `struct`) plus numpy:

- PNG: chunk walk -> zlib inflate -> per-scanline unfiltering (the five
  filter types of the PNG spec, RFC 2083 §6) -> (h, w, c) uint8 pixels.
  Supports bit-depth 8 for color types 0 (gray), 2 (RGB), 3 (palette),
  4 (gray+alpha), 6 (RGBA), non-interlaced (Adam7 rejected explicitly).
- GIF: LZW decompression (GIF89a Appendix F) of the first image block,
  global/local color tables, optional interlace reordering.
- Baseline JPEG (ITU-T T.81 sequential DCT): marker walk, canonical
  Huffman entropy decode with DC prediction and restart markers,
  dequantize + zigzag, 8x8 IDCT as one orthonormal matrix sandwich,
  chroma upsampling, YCbCr->RGB. Progressive/arithmetic rejected
  explicitly. A matching baseline encoder (Annex K tables) provides
  fixtures and a real sink.

Only compressed audio/video (MP3/AAC/H.264) remains the declared stub in
`multimodal.default_decode` (inject decode_fn with a real codec in
production).

These run inside the same mapInPandas Arrow batches as the raw-format
decoders (`multimodal.extract_media_features`); pixels never touch the
driver. Reference parity note: the reference pipeline has no media path
at all — this family exists for the 100 TB training-data axis.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (bit depth 8 only)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunks(payload: bytes):
    """Yield (type, body) for each PNG chunk; stops at IEND."""
    i = 8
    while i + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[i : i + 4])
        ctype = payload[i + 4 : i + 8]
        body = payload[i + 8 : i + 8 + length]
        yield ctype, body
        if ctype == b"IEND":
            return
        i += 12 + length  # length + type + body + crc


def _unfilter_scanlines(raw: bytes, w: int, h: int, bpp: int) -> np.ndarray:
    """PNG per-scanline unfilter -> (h, w*bpp) uint8. Each scanline is
    prefixed by one filter-type byte. Filters 0/2 are pure numpy row ops;
    1 (Sub) is a mod-256 cumulative sum per byte lane; 3 (Average) and
    4 (Paeth) depend nonlinearly on the left-reconstructed pixel, so they
    run a per-pixel inner loop (rare in encoder output for fixtures, and
    this is a per-row cost bounded by image width, not corpus size)."""
    stride = w * bpp
    mat = np.frombuffer(raw, dtype=np.uint8)
    if mat.size != h * (stride + 1):
        raise ValueError("PNG data size mismatch")
    mat = mat.reshape(h, stride + 1)
    filters = mat[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = int(filters[y])
        line = mat[y, 1:].copy()
        if f == 0:
            rec = line
        elif f == 2:  # Up
            rec = line + prev  # uint8 wraps mod 256 — exactly the spec
        elif f == 1:  # Sub: prefix sum per bpp lane, mod 256
            rec = line.reshape(-1, bpp)
            np.cumsum(rec, axis=0, dtype=np.uint8, out=rec)
            rec = rec.reshape(-1)
        else:  # Average (3) / Paeth (4): sequential in x
            rec = np.zeros(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                if f == 3:
                    pred = (a + b) >> 1
                elif f == 4:
                    c = int(prev[x - bpp]) if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                else:
                    raise ValueError(f"bad PNG filter type {f}")
                rec[x] = (int(line[x]) + pred) & 0xFF
        out[y] = rec
        prev = rec
    return out


_ADAM7 = (  # (x_start, y_start, x_step, y_step) per pass, PNG spec §8.5.1
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _deinterlace_adam7(raw: bytes, w: int, h: int, bpp: int) -> np.ndarray:
    """Adam7: seven independently-filtered sub-images concatenated in the
    IDAT stream; each unfilters like a normal image, then scatters into the
    full-resolution grid at its pass offsets."""
    out = np.zeros((h, w * bpp), dtype=np.uint8)
    full = out.reshape(h, w, bpp)
    off = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw == 0 or ph == 0:
            continue
        n = ph * (pw * bpp + 1)
        sub = _unfilter_scanlines(raw[off : off + n], pw, ph, bpp)
        full[y0::dy, x0::dx] = sub.reshape(ph, pw, bpp)
        off += n
    return out


def decode_png_pixels(payload: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, channels) uint8 array. Palette images expand to
    RGB; Adam7 interlacing deinterlaced. Bit depth 8 only (explicit
    errors otherwise)."""
    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG")
    w = h = None
    idat = []
    palette = None
    color_type = bit_depth = interlace = 0
    for ctype, body in _png_chunks(payload):
        if ctype == b"IHDR":
            w, h, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(body)
    if w is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8:
        raise ValueError(f"unsupported PNG bit depth {bit_depth}")
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG color type {color_type}")
    bpp = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(b"".join(idat))
    if interlace:
        px = _deinterlace_adam7(raw, w, h, bpp)
    else:
        px = _unfilter_scanlines(raw, w, h, bpp)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        return palette[px.reshape(h, w)]
    return px.reshape(h, w, bpp)


def encode_png(arr: np.ndarray) -> bytes:
    """(h, w, c) uint8 -> PNG bytes (filter 0 scanlines, one IDAT).
    Fixture/round-trip helper and a real sink for resized outputs."""
    h, w, c = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    body = arr.astype(np.uint8).reshape(h, w * c)
    raw = b"".join(b"\x00" + body[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes):
    """default_decode hook: (width, height, n_frames=1, 8-band feature) —
    same feature contract as decode_pnm (mean intensity of 8 horizontal
    bands, normalized to [0, 1])."""
    arr = decode_png_pixels(payload)
    h, w, channels = arr.shape
    px = arr.reshape(-1, channels).astype(np.float32)
    # alpha channels (types 4/6) are not intensity — drop from the mean
    if channels in (2, 4):
        px = px[:, : channels - 1]
    px = px.mean(axis=1)
    bands = np.array_split(px, 8)
    feature = [float(b.mean() / 255.0) if b.size else 0.0 for b in bands]
    return w, h, 1, feature


# ---------------------------------------------------------------------------
# GIF (87a/89a): LZW decode of image data blocks


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> bytearray:
    """GIF-variant LZW (GIF89a spec Appendix F): variable code width
    starting at min_code_size+1, CLEAR and EOI codes, dictionary grows to
    12 bits then waits for CLEAR. Little-endian bit packing."""
    clear = 1 << min_code_size
    eoi = clear + 1

    def reset():
        return (
            {i: bytes([i]) for i in range(clear)},
            min_code_size + 1,
            eoi + 1,
        )

    table, width, next_code = reset()
    out = bytearray()
    prev: bytes | None = None
    acc = nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width and len(out) < n_pixels:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table, width, next_code = reset()
                prev = None
                continue
            if code == eoi:
                return out
            if code in table:
                entry = table[code]
            elif code == next_code and prev is not None:
                entry = prev + prev[:1]
            else:
                raise ValueError(f"bad LZW code {code}")
            out += entry
            if prev is not None and next_code < 4096:
                table[next_code] = prev + entry[:1]
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = entry
    return out


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif_pixels(payload: bytes) -> np.ndarray:
    """GIF bytes -> (h, w, 3) uint8 RGB of the FIRST image (frame) plus the
    total frame count, returned as (pixels, n_frames)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    i = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload[i : i + 3 * n], dtype=np.uint8).reshape(-1, 3)
        i += 3 * n
    first: np.ndarray | None = None
    n_frames = 0
    while i < len(payload):
        b = payload[i]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: skip sub-blocks
            i += 2
            while payload[i]:
                i += 1 + payload[i]
            i += 1
        elif b == 0x2C:  # image descriptor
            _left, _top, w, h, ipacked = struct.unpack("<HHHHB", payload[i + 1 : i + 10])
            i += 10
            lct = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                lct = np.frombuffer(
                    payload[i : i + 3 * n], dtype=np.uint8
                ).reshape(-1, 3)
                i += 3 * n
            min_code = payload[i]
            i += 1
            data = bytearray()
            while payload[i]:
                size = payload[i]
                data += payload[i + 1 : i + 1 + size]
                i += 1 + size
            i += 1
            n_frames += 1
            if first is None:
                if lct is None:
                    raise ValueError("GIF image without color table")
                idx = np.frombuffer(
                    bytes(_lzw_decode(min_code, bytes(data), w * h)), dtype=np.uint8
                )[: w * h].reshape(h, w)
                if ipacked & 0x40:  # interlaced: rows arrive in 4 passes
                    order = np.concatenate(
                        [np.arange(start, h, step) for start, step in _GIF_INTERLACE_PASSES]
                    )
                    deinter = np.empty_like(idx)
                    deinter[order] = idx
                    idx = deinter
                first = lct[np.minimum(idx, len(lct) - 1)]
        else:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
    if first is None:
        raise ValueError("GIF contains no image")
    return first, n_frames


def encode_gif(arr: np.ndarray, palette: np.ndarray) -> bytes:
    """(h, w) palette-index array + (n, 3) palette -> single-frame GIF89a.
    Emits only CLEAR-prefixed literal codes (valid, unoptimized LZW) —
    fixture helper for round-trip tests."""
    h, w = arr.shape
    n = len(palette)
    bits = max(2, int(np.ceil(np.log2(max(n, 2)))))
    table_size = 1 << bits
    pal = np.zeros((table_size, 3), dtype=np.uint8)
    pal[:n] = palette
    header = b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    descriptor = b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    clear = 1 << bits
    eoi = clear + 1
    width = bits + 1
    acc = nbits = 0
    data = bytearray()

    def emit(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    # CLEAR before every literal keeps the code width fixed at bits+1
    for px in arr.reshape(-1):
        emit(clear)
        emit(int(px))
    emit(eoi)
    if nbits:
        data.append(acc & 0xFF)
    blocks = bytearray()
    for j in range(0, len(data), 255):
        chunk = data[j : j + 255]
        blocks += bytes([len(chunk)]) + chunk
    return (
        header
        + pal.tobytes()
        + descriptor
        + bytes([bits])
        + bytes(blocks)
        + b"\x00\x3b"
    )


def decode_gif(payload: bytes):
    """default_decode hook: (width, height, n_frames, 8-band feature) from
    the first frame's RGB mean intensity."""
    arr, n_frames = decode_gif_pixels(payload)
    h, w, _ = arr.shape
    px = arr.reshape(-1, 3).astype(np.float32).mean(axis=1)
    bands = np.array_split(px, 8)
    feature = [float(b.mean() / 255.0) if b.size else 0.0 for b in bands]
    return w, h, n_frames, feature


# ---------------------------------------------------------------------------
# Baseline JPEG (ITU-T T.81 / JFIF): sequential DCT, Huffman entropy coding.
# Pure stdlib + numpy — the full decode chain (marker walk, canonical
# Huffman, DC prediction, restart markers, dequantize, zigzag, 8x8 IDCT as
# one matrix sandwich, chroma upsampling, YCbCr->RGB). Progressive (SOF2)
# and arithmetic coding are rejected explicitly.

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)


def _dct_matrix() -> np.ndarray:
    """T[x, u] = C(u)/2 * cos((2x+1) u pi / 16); spatial = T @ F @ T.T."""
    x = np.arange(8).reshape(8, 1)
    u = np.arange(8).reshape(1, 8)
    t = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    t[:, 0] *= 1 / np.sqrt(2)
    return t


_DCT_T = _dct_matrix()

# Annex K (T.81) example quantization tables — the de-facto standard
_Q_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
)
_Q_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
)

# Annex K example Huffman tables: (bits[1..16], values)
_HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _canonical_codes(bits, values):
    """(bits[1..16], values) -> {(length, code): symbol} per T.81 C.2."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over entropy-coded JPEG data: un-stuffs 0xFF00,
    surfaces restart markers (FFD0-D7) as boundary events."""

    def __init__(self, data: bytes, start: int):
        self.data = data
        self.pos = start
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        while self.nbits < 25:
            if self.pos >= len(d):
                self.acc = (self.acc << 8) | 0  # pad past EOI
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    return  # restart marker pending; sync_restart consumes it
                else:
                    b = 0  # EOI or next segment: pad
                    self.pos = len(d)
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
            if self.nbits == 0:
                raise ValueError("JPEG bitstream underrun at a restart marker")
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self):
        """Drop padding bits, consume the FFD0-D7 marker, reset state."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected JPEG restart marker")


def _huff_decode(reader: _BitReader, table) -> int:
    length = 0
    code = 0
    while length < 16:
        code = (code << 1) | reader.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t-bit magnitude to signed coefficient."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg_pixels(payload: bytes) -> np.ndarray:
    """Baseline JFIF JPEG -> (h, w, channels) uint8 (channels 1 or 3)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    i = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    comps = []  # (id, h, v, tq)
    w = h = 0
    restart_interval = 0
    scan_start = None
    scan_comps = []
    while i + 4 <= len(payload) and scan_start is None:
        if payload[i] != 0xFF:
            raise ValueError(f"bad JPEG marker alignment at {i}")
        marker = payload[i + 1]
        if marker == 0xD8:
            i += 2
            continue
        (seglen,) = struct.unpack(">H", payload[i + 2 : i + 4])
        body = payload[i + 4 : i + 2 + seglen]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qtables[tq] = np.frombuffer(
                    body[j + 1 : j + 65], dtype=np.uint8
                ).astype(np.int32)
                j += 65
        elif marker == 0xC0:  # SOF0 baseline
            _prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            comps = [
                (body[6 + 3 * k], body[7 + 3 * k] >> 4, body[7 + 3 * k] & 0x0F,
                 body[8 + 3 * k])
                for k in range(nc)
            ]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC9, 0xCA, 0xCB):
            raise ValueError("only baseline sequential JPEG (SOF0) supported")
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 0x0F
                bits = list(body[j + 1 : j + 17])
                n = sum(bits)
                values = list(body[j + 17 : j + 17 + n])
                htables[(tc, th)] = _canonical_codes(bits, values)
                j += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = [
                (body[1 + 2 * k], body[2 + 2 * k] >> 4, body[2 + 2 * k] & 0x0F)
                for k in range(ns)
            ]
            scan_start = i + 2 + seglen
        i += 2 + seglen
    if scan_start is None or not comps:
        raise ValueError("JPEG missing SOF/SOS")

    max_h = max(c[1] for c in comps)
    max_v = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * max_h))
    mcus_y = -(-h // (8 * max_v))
    planes = {
        cid: np.zeros((mcus_y * 8 * cv, mcus_x * 8 * ch), dtype=np.float64)
        for cid, ch, cv, _tq in comps
    }
    comp_info = {cid: (ch, cv, tq) for cid, ch, cv, tq in comps}
    reader = _BitReader(payload, scan_start)
    pred = {cid: 0 for cid, _, _ in scan_comps}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.sync_restart()
                pred = {cid: 0 for cid in pred}
            for cid, td, ta in scan_comps:
                ch, cv, tq = comp_info[cid]
                q = qtables[tq]
                dc_tab, ac_tab = htables[(0, td)], htables[(1, ta)]
                for by in range(cv):
                    for bx in range(ch):
                        zz = np.zeros(64, dtype=np.int32)
                        t = _huff_decode(reader, dc_tab)
                        diff = _extend(reader.read_bits(t), t) if t else 0
                        pred[cid] += diff
                        zz[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(reader, ac_tab)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            zz[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[_ZIGZAG] = zz * q
                        spatial = _DCT_T @ block.reshape(8, 8) @ _DCT_T.T
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = spatial
            mcu_count += 1

    out = []
    for cid, ch, cv, _tq in comps:
        p = planes[cid] + 128.0
        # nearest upsample to full resolution, then crop padding
        p = np.repeat(np.repeat(p, max_v // cv, axis=0), max_h // ch, axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        return np.clip(out[0], 0, 255).astype(np.uint8)[..., None]
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _huff_encode_tables(pairs):
    """[(bits, values)] -> {symbol: (length, code)} list, same canonical walk."""
    out = []
    for bits, values in pairs:
        enc = {}
        for (length, code), sym in _canonical_codes(bits, values).items():
            enc[sym] = (length, code)
        out.append(enc)
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-padding per spec


def _mag_bits(v: int):
    """signed coefficient -> (size, magnitude bits) per F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    return t, (v if v > 0 else v + (1 << t) - 1)


def encode_jpeg(
    arr: np.ndarray, quality_scale: int = 1, restart_interval: int = 0
) -> bytes:
    """(h, w, c) uint8 (c=1 gray or c=3 RGB) -> baseline JFIF JPEG bytes,
    4:4:4 (no subsampling), Annex K quant (optionally scaled) + Huffman
    tables; restart_interval > 0 emits DRI + RSTn markers every N MCUs.
    Fixture/sink helper for the decoder — lossy like any JPEG."""
    h, w, c = arr.shape
    if c == 3:
        r, g, b = (arr[..., k].astype(np.float64) for k in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    else:
        planes = [arr[..., 0].astype(np.float64)]
    ql = np.maximum(_Q_LUMA * quality_scale, 1)
    qc = np.maximum(_Q_CHROMA * quality_scale, 1)
    qts = [ql] + ([qc] if c == 3 else [])
    dc_enc, ac_enc, dcc_enc, acc_enc = _huff_encode_tables(
        [_HUFF_DC_LUMA, _HUFF_AC_LUMA, _HUFF_DC_CHROMA, _HUFF_AC_CHROMA]
    )

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    head = bytearray(b"\xff\xd8")
    for tq, q in enumerate(qts):
        head += seg(0xDB, bytes([tq]) + bytes(q.astype(np.uint8).tolist()))
    sof = struct.pack(">BHHB", 8, h, w, c)
    for k in range(c):
        sof += bytes([k + 1, 0x11, 0 if k == 0 else 1])
    head += seg(0xC0, sof)
    for tc_th, (bits, values) in zip(
        [0x00, 0x10, 0x01, 0x11],
        [_HUFF_DC_LUMA, _HUFF_AC_LUMA, _HUFF_DC_CHROMA, _HUFF_AC_CHROMA],
    ):
        head += seg(0xC4, bytes([tc_th]) + bytes(bits) + bytes(values))
    if restart_interval:
        head += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([c])
    for k in range(c):
        sos += bytes([k + 1, 0x00 if k == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    head += seg(0xDA, sos)

    bw = _BitWriter()
    pad_h, pad_w = -(-h // 8) * 8, -(-w // 8) * 8
    padded = []
    for p in planes:
        pp = np.empty((pad_h, pad_w), dtype=np.float64)
        pp[:h, :w] = p
        pp[h:, :w] = p[h - 1 : h, :]
        pp[:, w:] = pp[:, w - 1 : w]
        padded.append(pp - 128.0)
    pred = [0] * c
    mcu_count = 0
    for by in range(pad_h // 8):
        for bx in range(pad_w // 8):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                bw.out += bytes(
                    [0xFF, 0xD0 + (mcu_count // restart_interval - 1) % 8]
                )
                pred = [0] * c
            mcu_count += 1
            for k in range(c):
                q = qts[0] if k == 0 else qts[1]
                denc = dc_enc if k == 0 else dcc_enc
                aenc = ac_enc if k == 0 else acc_enc
                blk = padded[k][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                coef = _DCT_T.T @ blk @ _DCT_T  # forward DCT (T orthonormal)
                zz = np.round(coef.reshape(-1)[_ZIGZAG] / q).astype(np.int64)
                diff = int(zz[0]) - pred[k]
                pred[k] = int(zz[0])
                t, mag = _mag_bits(diff)
                length, code = denc[t]
                bw.write(code, length)
                if t:
                    bw.write(mag, t)
                run = 0
                last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
                for j in range(1, 64):
                    if j > last_nz:
                        length, code = aenc[0x00]  # EOB
                        bw.write(code, length)
                        break
                    v = int(zz[j])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        length, code = aenc[0xF0]  # ZRL
                        bw.write(code, length)
                        run -= 16
                    t, mag = _mag_bits(v)
                    length, code = aenc[(run << 4) | t]
                    bw.write(code, length)
                    bw.write(mag, t)
                    run = 0
    bw.flush()
    return bytes(head) + bytes(bw.out) + b"\xff\xd9"


def decode_jpeg(payload: bytes):
    """default_decode hook: (width, height, n_frames=1, 8-band feature)."""
    arr = decode_jpeg_pixels(payload)
    h, w, channels = arr.shape
    px = arr.reshape(-1, channels).astype(np.float32).mean(axis=1)
    bands = np.array_split(px, 8)
    feature = [float(b.mean() / 255.0) if b.size else 0.0 for b in bands]
    return w, h, 1, feature
