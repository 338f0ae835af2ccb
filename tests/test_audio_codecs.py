"""Compressed-audio codec tests (G.711 mu-law/A-law, IMA ADPCM) — the
vectorized decoders in datapipe/audio.py are pinned against ITU anchor
values and an INDEPENDENT scalar reference implementation written here
from the spec (not shared code), plus encode->decode round trips through
the real RIFF/WAVE path in multimodal.decode_wav."""

import struct

import numpy as np
import pytest

from dbpedia_spotlight_spark.datapipe import audio
from dbpedia_spotlight_spark.datapipe.multimodal import (
    decode_wav,
    default_decode,
)


# --- G.711 ------------------------------------------------------------------


def test_ulaw_table_anchors():
    t = audio.ulaw_decode_table()
    # Both zero codes decode to 0; extreme codes to +/-32124 (ITU G.711).
    assert t[0xFF] == 0 and t[0x7F] == 0
    assert t[0x80] == 32124 and t[0x00] == -32124
    # Companding is monotone within each sign half: 0x80 (max) .. 0xFF (0).
    pos = t[0x80:0x100].astype(np.int32)
    assert np.all(np.diff(pos) <= 0)


def test_alaw_table_anchors():
    t = audio.alaw_decode_table()
    assert t[0xD5] == 8 and t[0x55] == -8  # smallest magnitudes
    assert t[0xAA] == 32256 and t[0x2A] == -32256  # largest magnitudes


@pytest.mark.parametrize("law", ["ulaw", "alaw"])
def test_g711_round_trip_exact_on_decoded_levels(law):
    table = (
        audio.ulaw_decode_table() if law == "ulaw" else audio.alaw_decode_table()
    )
    codes = audio.g711_encode(table.astype(np.int32), law)
    assert np.array_equal(audio.g711_decode(codes, law), table)


@pytest.mark.parametrize("law,tag", [("ulaw", 7), ("alaw", 6)])
def test_g711_wav_end_to_end(law, tag):
    rate = 8000
    t = np.arange(rate, dtype=np.float64) / rate
    pcm = (np.sin(2 * np.pi * 440 * t) * 20000).astype(np.int16)
    codes = audio.g711_encode(pcm, law)
    wav = audio.build_wav(tag, rate, 1, 8, codes.tobytes(),
                          block_align=1, fact_samples=pcm.size)
    w, h, n_frames, feature = decode_wav(wav)
    assert (w, h, n_frames) == (rate, 1, pcm.size)
    decoded = audio.g711_decode(codes, law).astype(np.float64)
    err = decoded - pcm
    snr = 10 * np.log10((pcm.astype(np.float64) ** 2).mean() / (err**2).mean())
    assert snr > 30  # G.711 on a loud sine is ~38 dB SNR
    # feature = per-band RMS of the decoded signal
    expect_rms = float(np.sqrt(((decoded[: rate // 8] / 32768.0) ** 2).mean()))
    assert feature[0] == pytest.approx(expect_rms, rel=1e-5)


# --- IMA ADPCM ---------------------------------------------------------------


def _ref_ima_decode(data: bytes, channels: int, block_align: int):
    """Independent scalar IMA ADPCM reference (spec-forward, per-sample
    loop) used only to check the vectorized decoder."""
    step_t = audio.IMA_STEP_TABLE.tolist()
    idx_t = audio.IMA_INDEX_TABLE.tolist()
    out_per_ch: list = [[] for _ in range(channels)]
    for b0 in range(0, len(data) - block_align + 1, block_align):
        block = data[b0 : b0 + block_align]
        preds, idxs = [], []
        for c in range(channels):
            pred, idx, _r = struct.unpack_from("<hBB", block, 4 * c)
            preds.append(pred)
            idxs.append(min(max(idx, 0), 88))
            out_per_ch[c].append(pred)
        body = block[4 * channels :]
        n_words = len(body) // 4  # total 4-byte words, round-robin per channel
        for wi in range(n_words):
            c = wi % channels
            word = body[wi * 4 : wi * 4 + 4]
            for byte in word:
                for nib in (byte & 0x0F, byte >> 4):
                    step = step_t[idxs[c]]
                    diff = step >> 3
                    if nib & 4:
                        diff += step
                    if nib & 2:
                        diff += step >> 1
                    if nib & 1:
                        diff += step >> 2
                    pred = preds[c] - diff if nib & 8 else preds[c] + diff
                    preds[c] = max(-32768, min(32767, pred))
                    idxs[c] = max(0, min(88, idxs[c] + idx_t[nib]))
                    out_per_ch[c].append(preds[c])
    # interleave
    n = len(out_per_ch[0])
    out = np.empty(n * channels, dtype=np.int16)
    for c in range(channels):
        out[c::channels] = np.asarray(out_per_ch[c], dtype=np.int16)
    return out


@pytest.mark.parametrize("channels", [1, 2])
def test_ima_vectorized_matches_scalar_reference(channels):
    rng = np.random.RandomState(7)
    words_per_ch = 6  # 48 samples after header, per channel
    block_align = 4 * channels + words_per_ch * 4 * channels
    n_blocks = 5
    blocks = bytearray()
    for _b in range(n_blocks):
        for c in range(channels):
            blocks += struct.pack(
                "<hBB", int(rng.randint(-30000, 30000)), int(rng.randint(0, 89)), 0
            )
        blocks += bytes(rng.randint(0, 256, words_per_ch * 4 * channels,
                                    dtype=np.uint8).tobytes())
    got = audio.ima_adpcm_decode(bytes(blocks), channels, block_align)
    ref = _ref_ima_decode(bytes(blocks), channels, block_align)
    assert np.array_equal(got, ref)


def test_ima_round_trip_snr_and_wav_path():
    rate = 8000
    t = np.arange(2 * rate, dtype=np.float64) / rate
    pcm = (np.sin(2 * np.pi * 300 * t) * 16000).astype(np.int16)
    block_samples = 505
    data, block_align = audio.ima_adpcm_encode(pcm, block_samples)
    wav = audio.build_wav(
        0x11, rate, 1, 4, data, block_align=block_align,
        fact_samples=pcm.size, extra=struct.pack("<H", block_samples),
    )
    w, h, n_frames, feature = decode_wav(wav)
    assert (w, h) == (rate, 1)
    # padded to whole blocks: n_frames is pcm.size rounded up to block
    assert n_frames >= pcm.size
    decoded = audio.ima_adpcm_decode(data, 1, block_align)[: pcm.size]
    err = decoded.astype(np.float64) - pcm
    snr = 10 * np.log10((pcm.astype(np.float64) ** 2).mean() / (err**2).mean())
    assert snr > 25  # 4-bit ADPCM on a sine is typically ~30 dB
    assert len(feature) == 8 and all(f > 0 for f in feature)


def test_default_decode_dispatches_compressed_wav():
    pcm = (np.sin(np.linspace(0, 40, 4000)) * 12000).astype(np.int16)
    codes = audio.g711_encode(pcm, "ulaw")
    wav = audio.build_wav(7, 8000, 1, 8, codes.tobytes(), block_align=1)
    w, h, n_frames, feature = default_decode("audio", wav)
    assert (w, h, n_frames) == (8000, 1, 4000)
    assert len(feature) == 8
