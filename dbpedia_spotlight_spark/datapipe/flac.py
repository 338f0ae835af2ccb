"""Pure bytes+numpy FLAC codec for the multimodal column plumbing — zero
external libraries, following the public FLAC format spec (RFC 9639).

Decoder coverage — every subframe type the format defines:

- CONSTANT and VERBATIM subframes,
- FIXED predictors (orders 0-4, the spec's hardwired polynomial
  predictors),
- LPC subframes (arbitrary order, quantized coefficients + shift),
- Rice-coded residuals (both the 4-bit RICE and 5-bit RICE2 methods,
  partitioned, including the escape-to-raw encoding),
- wasted-bits shifting,
- all four stereo channel assignments (independent, left/side,
  right/side, mid/side decorrelation),
- frame-header CRC-8 and whole-frame CRC-16 verification.

FLAC is lossless and fully specified, so — unlike the perceptual codecs
(MP3/AAC) that remain stubbed in `datapipe/multimodal.py` — it is
decodable bit-exactly without a codec library. Decoded PCM round-trips
exactly against the encoder fixture below, and the CRC polynomials are
pinned by public check vectors (CRC-8/SMBUS and CRC-16/UMTS of
b"123456789") in tests/test_datapipe.py.

Scale note: one FLAC file decodes sequentially (Rice unary codes have no
random access), exactly like every FLAC implementation; the unit of
parallelism is the media row — `extract_media_features` fans files out
across executors via mapInPandas, so corpus-level decode throughput
scales with partitions, not with this loop.

The encoder (`encode_flac`) is a fixture helper so tests can round-trip
real compressed payloads deterministically; it can emit every decoder
path (constant/verbatim/fixed/LPC subframes, wasted bits, mid/side and
left/right-side stereo).

Reference parity note: DBpedia Spotlight has no audio path — this module
extends the training-data-pipeline multimodal columns (SURVEY.md §2.7,
`datapipe/multimodal.py`).
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"fLaC"

# --- CRCs (FLAC uses CRC-8 poly 0x07 and CRC-16 poly 0x8005, both
# init 0, not reflected) ------------------------------------------------------


def _crc_table(poly: int, width: int) -> np.ndarray:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = np.zeros(256, dtype=np.uint32)
    for byte in range(256):
        crc = byte << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) if crc & top else (crc << 1)
        table[byte] = crc & mask
    return table


_CRC8_TABLE = _crc_table(0x07, 8)
_CRC16_TABLE = _crc_table(0x8005, 16)


def crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = int(_CRC8_TABLE[crc ^ b])
    return crc


def crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = int(_CRC16_TABLE[((crc >> 8) ^ b) & 0xFF]) ^ ((crc << 8) & 0xFFFF)
    return crc


# --- bit I/O -----------------------------------------------------------------


class BitReader:
    """MSB-first bit reader over a bytes buffer. Unary reads are O(log n)
    via a precomputed set-bit index (searchsorted), so Rice-heavy streams
    stay linear overall."""

    def __init__(self, data: bytes):
        self._bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self._ones = np.flatnonzero(self._bits)
        self.pos = 0

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        chunk = self._bits[self.pos : self.pos + n]
        if chunk.size < n:
            raise EOFError("FLAC bitstream truncated")
        self.pos += n
        v = 0
        for b in chunk:
            v = (v << 1) | int(b)
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        """Count of 0 bits before the next 1 bit (consumes the 1)."""
        i = int(np.searchsorted(self._ones, self.pos))
        if i >= self._ones.size:
            raise EOFError("FLAC bitstream truncated in unary code")
        stop = int(self._ones[i])
        q = stop - self.pos
        self.pos = stop + 1
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        assert self.pos % 8 == 0
        return self.pos // 8


class BitWriter:
    def __init__(self):
        self._bits: list[int] = []

    def write(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self._bits.append((v >> i) & 1)

    def write_unary(self, q: int) -> None:
        self._bits.extend([0] * q)
        self._bits.append(1)

    def align(self) -> None:
        while len(self._bits) % 8:
            self._bits.append(0)

    def getvalue(self) -> bytes:
        self.align()
        return np.packbits(np.asarray(self._bits, dtype=np.uint8)).tobytes()


# --- number codings ----------------------------------------------------------


def _read_coded_number(br: BitReader) -> int:
    """The frame header's UTF-8-style variable-length number (RFC 9639
    §9.1.5 — UTF-8 encoding extended to 36 bits / 7 bytes)."""
    first = br.read(8)
    if first < 0x80:
        return first
    n_extra = 0
    mask = 0x40
    while first & mask:
        n_extra += 1
        mask >>= 1
    v = first & (mask - 1)
    for _ in range(n_extra):
        cont = br.read(8)
        if cont & 0xC0 != 0x80:
            raise ValueError("bad coded-number continuation byte")
        v = (v << 6) | (cont & 0x3F)
    return v


def _write_coded_number(bw: BitWriter, v: int) -> None:
    if v < 0x80:
        bw.write(v, 8)
        return
    payload_bits = v.bit_length()
    n_extra = 1
    while payload_bits > 6 * n_extra + (6 - n_extra):
        n_extra += 1
    lead_prefix = (0xFF << (7 - n_extra)) & 0xFF
    bw.write(lead_prefix | (v >> (6 * n_extra)), 8)
    for i in range(n_extra - 1, -1, -1):
        bw.write(0x80 | ((v >> (6 * i)) & 0x3F), 8)


def _zigzag_decode(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _zigzag_encode(s: int) -> int:
    return (s << 1) ^ (s >> 63) if s < 0 else (s << 1)


# --- residual (Rice) coding --------------------------------------------------


def _read_residual(br: BitReader, blocksize: int, order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError("reserved residual coding method")
    pbits, escape = (4, 15) if method == 0 else (5, 31)
    porder = br.read(4)
    nparts = 1 << porder
    if blocksize % nparts or (blocksize >> porder) <= order:
        raise ValueError("invalid rice partition order")
    out: list[int] = []
    for p in range(nparts):
        count = (blocksize >> porder) - (order if p == 0 else 0)
        param = br.read(pbits)
        if param == escape:
            rawbits = br.read(5)
            if rawbits == 0:
                out.extend([0] * count)
            else:
                out.extend(br.read_signed(rawbits) for _ in range(count))
        else:
            for _ in range(count):
                q = br.read_unary()
                u = (q << param) | br.read(param)
                out.append(_zigzag_decode(u))
    return out


def _write_residual(bw: BitWriter, residual: list[int], param: int) -> None:
    """Partition order 0, single Rice parameter (RICE method)."""
    bw.write(0, 2)
    bw.write(0, 4)
    bw.write(param, 4)
    for r in residual:
        u = _zigzag_encode(r)
        bw.write_unary(u >> param)
        bw.write(u & ((1 << param) - 1), param)


# --- predictors --------------------------------------------------------------

_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _restore_lpc(
    warmup: list[int], residual: list[int], coeffs: list[int], shift: int
) -> list[int]:
    out = list(warmup)
    for r in residual:
        pred = sum(c * out[-1 - j] for j, c in enumerate(coeffs)) >> shift
        out.append(pred + r)
    return out


def _compute_residual(samples: list[int], coeffs: list[int], shift: int) -> list[int]:
    order = len(coeffs)
    return [
        samples[i]
        - (sum(c * samples[i - 1 - j] for j, c in enumerate(coeffs)) >> shift)
        for i in range(order, len(samples))
    ]


# --- decoder -----------------------------------------------------------------

_BLOCKSIZE_FIXED = {1: 192, **{n: 576 << (n - 2) for n in range(2, 6)},
                    **{n: 256 << (n - 8) for n in range(8, 16)}}
_SAMPLE_SIZE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _read_subframe(br: BitReader, blocksize: int, bps: int) -> list[int]:
    if br.read(1):
        raise ValueError("subframe padding bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
        bps -= wasted
    if stype == 0:  # CONSTANT
        v = br.read_signed(bps)
        out = [v] * blocksize
    elif stype == 1:  # VERBATIM
        out = [br.read_signed(bps) for _ in range(blocksize)]
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        warmup = [br.read_signed(bps) for _ in range(order)]
        residual = _read_residual(br, blocksize, order)
        out = _restore_lpc(warmup, residual, _FIXED_COEFFS[order], 0)
    elif stype >= 32:  # LPC, order 1-32
        order = stype - 31
        warmup = [br.read_signed(bps) for _ in range(order)]
        precision = br.read(4) + 1
        if precision == 16:
            raise ValueError("invalid lpc precision escape")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative lpc shift")
        coeffs = [br.read_signed(precision) for _ in range(order)]
        residual = _read_residual(br, blocksize, order)
        out = _restore_lpc(warmup, residual, coeffs, shift)
    else:
        raise ValueError(f"reserved subframe type {stype}")
    if wasted:
        out = [s << wasted for s in out]
    return out


def decode_flac_samples(payload: bytes):
    """FLAC bytes -> (sample_rate, n_channels, bits_per_sample,
    interleaved int32 PCM ndarray). Verifies frame CRC-8/CRC-16."""
    if payload[:4] != MAGIC:
        raise ValueError("not a FLAC stream")
    i = 4
    rate = channels = bps = 0
    # metadata blocks: 1-byte (last<<7|type), 3-byte BE length
    while True:
        hdr = payload[i : i + 4]
        last, btype = hdr[0] >> 7, hdr[0] & 0x7F
        (length,) = struct.unpack(">I", b"\0" + hdr[1:4])
        body = payload[i + 4 : i + 4 + length]
        if btype == 0:  # STREAMINFO
            bits = int.from_bytes(body[10:18], "big")
            rate = (bits >> 44) & 0xFFFFF
            channels = ((bits >> 41) & 0x7) + 1
            bps = ((bits >> 36) & 0x1F) + 1
        i += 4 + length
        if last:
            break
    br = BitReader(payload[i:])
    total_bits = len(payload[i:]) * 8
    chans: list[list[int]] = [[] for _ in range(channels)]
    while total_bits - br.pos >= 32:
        frame_start = br.byte_pos()
        if br.read(14) != 0x3FFE:
            raise ValueError("lost frame sync")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        chan_code = br.read(4)
        ss_code = br.read(3)
        br.read(1)  # reserved
        _read_coded_number(br)
        if bs_code == 6:
            blocksize = br.read(8) + 1
        elif bs_code == 7:
            blocksize = br.read(16) + 1
        else:
            blocksize = _BLOCKSIZE_FIXED[bs_code]
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        crc_pos = br.byte_pos()
        if br.read(8) != crc8(payload[i + frame_start : i + crc_pos]):
            raise ValueError("frame header CRC-8 mismatch")
        frame_bps = _SAMPLE_SIZE.get(ss_code, bps)
        if chan_code < 8:
            subs = [
                _read_subframe(br, blocksize, frame_bps)
                for _ in range(chan_code + 1)
            ]
        elif chan_code == 8:  # left/side
            left = _read_subframe(br, blocksize, frame_bps)
            side = _read_subframe(br, blocksize, frame_bps + 1)
            subs = [left, [l - s for l, s in zip(left, side)]]
        elif chan_code == 9:  # right/side
            side = _read_subframe(br, blocksize, frame_bps + 1)
            right = _read_subframe(br, blocksize, frame_bps)
            subs = [[s + r for s, r in zip(side, right)], right]
        elif chan_code == 10:  # mid/side
            mid = _read_subframe(br, blocksize, frame_bps)
            side = _read_subframe(br, blocksize, frame_bps + 1)
            subs = [[], []]
            for m, s in zip(mid, side):
                m = (m << 1) | (s & 1)
                subs[0].append((m + s) >> 1)
                subs[1].append((m - s) >> 1)
        else:
            raise ValueError("reserved channel assignment")
        br.align()
        crc16_pos = br.byte_pos()
        if br.read(16) != crc16(payload[i + frame_start : i + crc16_pos]):
            raise ValueError("frame CRC-16 mismatch")
        for c, sub in enumerate(subs):
            chans[c].extend(sub)
    pcm = np.empty(len(chans[0]) * channels, dtype=np.int32)
    for c in range(channels):
        pcm[c::channels] = np.asarray(chans[c], dtype=np.int32)
    return rate, channels, bps, pcm


# --- encoder fixture ---------------------------------------------------------


def _write_subframe(bw: BitWriter, samples: list[int], bps: int, mode: str) -> None:
    if mode == "constant":
        bw.write(0, 1)
        bw.write(0, 6)
        bw.write(0, 1)
        bw.write(samples[0] & ((1 << bps) - 1), bps)
        return
    wasted = 0
    if mode == "verbatim_wasted":
        nz = [s for s in samples if s]
        if nz:
            wasted = min(
                (s & -s).bit_length() - 1 for s in nz
            )
        if wasted:
            samples = [s >> wasted for s in samples]
            bps -= wasted
        mode = "verbatim"
    bw.write(0, 1)
    if mode == "verbatim":
        bw.write(1, 6)
    elif mode == "fixed2":
        bw.write(8 + 2, 6)
    elif mode == "lpc2":
        bw.write(31 + 2, 6)
    else:
        raise ValueError(mode)
    if wasted:
        bw.write(1, 1)
        bw.write_unary(wasted - 1)
    else:
        bw.write(0, 1)
    if mode == "verbatim":
        for s in samples:
            bw.write(s & ((1 << bps) - 1), bps)
        return
    coeffs, shift = _FIXED_COEFFS[2], 0
    for s in samples[:2]:
        bw.write(s & ((1 << bps) - 1), bps)
    if mode == "lpc2":
        bw.write(4 - 1, 4)  # precision 4: coeffs 2,-1 fit signed 4-bit
        bw.write(0, 5)  # shift 0
        bw.write(2 & 0xF, 4)
        bw.write(-1 & 0xF, 4)
    residual = _compute_residual(samples, coeffs, shift)
    mean_abs = sum(abs(r) for r in residual) / max(len(residual), 1)
    param = min(max(int(mean_abs).bit_length(), 0), 14)
    _write_residual(bw, residual, param)


def encode_flac(
    pcm: np.ndarray,
    rate: int = 8000,
    bps: int = 16,
    blocksize: int = 1024,
    mode: str = "fixed2",
    stereo_mode: str = "independent",
) -> bytes:
    """int PCM -> FLAC bytes (fixture helper). pcm is (n,) mono or
    (n, channels); mode picks the subframe coding (constant auto-detected
    per block): verbatim | verbatim_wasted | fixed2 | lpc2; stereo_mode:
    independent | left_side | right_side | mid_side."""
    pcm = np.asarray(pcm, dtype=np.int64)
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    n, channels = pcm.shape
    out = bytearray(MAGIC)
    info = bytearray()
    info += struct.pack(">HH", blocksize, blocksize)
    info += b"\0\0\0" * 2  # min/max frame size unknown
    bits = (rate << 44) | ((channels - 1) << 41) | ((bps - 1) << 36) | n
    info += bits.to_bytes(8, "big")
    info += b"\0" * 16  # md5 unset
    out += bytes([0x80]) + len(info).to_bytes(3, "big") + info
    for frame_idx, start in enumerate(range(0, n, blocksize)):
        block = pcm[start : start + blocksize]
        bsz = block.shape[0]
        bw = BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed blocksize strategy
        bw.write(7, 4)  # blocksize: 16-bit at end of header
        bw.write(0, 4)  # sample rate: from streaminfo
        if channels == 2 and stereo_mode != "independent":
            bw.write({"left_side": 8, "right_side": 9, "mid_side": 10}[stereo_mode], 4)
        else:
            bw.write(channels - 1, 4)
        bw.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps], 3)
        bw.write(0, 1)
        _write_coded_number(bw, frame_idx)
        bw.write(bsz - 1, 16)
        header = bw.getvalue()
        bw = BitWriter()
        chan_samples: list[tuple[list[int], int]] = []
        if channels == 2 and stereo_mode != "independent":
            left, right = block[:, 0], block[:, 1]
            side = (left - right).tolist()
            if stereo_mode == "left_side":
                chan_samples = [(left.tolist(), bps), (side, bps + 1)]
            elif stereo_mode == "right_side":
                chan_samples = [(side, bps + 1), (right.tolist(), bps)]
            else:
                mid = ((left + right) >> 1).tolist()
                chan_samples = [(mid, bps), (side, bps + 1)]
        else:
            chan_samples = [(block[:, c].tolist(), bps) for c in range(channels)]
        for samples, sub_bps in chan_samples:
            sub_mode = mode
            if len(set(samples)) == 1:
                sub_mode = "constant"
            elif len(samples) < 3 and mode in ("fixed2", "lpc2"):
                sub_mode = "verbatim"
            _write_subframe(bw, samples, sub_bps, sub_mode)
        body = bw.getvalue()
        frame = header + crc8(header).to_bytes(1, "big") + body
        # the header CRC-8 byte is itself covered by the frame CRC-16
        frame += crc16(frame).to_bytes(2, "big")
        out += frame
    return bytes(out)
