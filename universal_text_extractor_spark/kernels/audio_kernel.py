"""WAV (RIFF) audio decode — promotes ``audio_features`` from digest
stub to REAL windowed energy features for the audio formats that are
spec-implementable from scratch: uncompressed PCM (8/16-bit) and IMA
ADPCM (format tag 0x11 — a REAL 4:1 compression codec, the standard
published in the IMA Digital Audio Focus Group recommendation and
Microsoft's WAVE format registry). Transform codecs (MP3/AAC/OGG) stay
honestly undecodable here (no codec libraries in the sandbox) and keep
the digest fallback.

The synthetic corpus is produced by an INDEPENDENT writer
(``sources.pages_gen.make_wav`` — integer-only synthesis and its own
encoder loop, writer ≠ parser). Failures return None — never raise (D2
containment).

Cost model: PCM decode is one vectorized ``frombuffer``; ADPCM is a
sequential per-nibble loop (each sample's predictor/step depend on the
previous — inherent to the codec, same class as the JPEG Huffman loop).
Payload-level parallelism comes from the operator layer.
"""

from __future__ import annotations

import struct

import numpy as np

# IMA ADPCM quantizer step table (89 entries) and index-adjust table —
# fixed constants from the published IMA recommendation.
_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ima_step(nibble: int, pred: int, index: int) -> tuple[int, int]:
    """One IMA ADPCM decode step: (nibble, state) → new (pred, index)."""
    step = _IMA_STEPS[index]
    diff = step >> 3
    if nibble & 4:
        diff += step
    if nibble & 2:
        diff += step >> 1
    if nibble & 1:
        diff += step >> 2
    if nibble & 8:
        diff = -diff
    pred = pred + diff
    if pred > 32767:
        pred = 32767
    elif pred < -32768:
        pred = -32768
    index += _IMA_INDEX[nibble & 7]
    if index < 0:
        index = 0
    elif index > 88:
        index = 88
    return pred, index


def _decode_ima_block(block: bytes, channels: int) -> list[list[int]]:
    """One ADPCM block → per-channel int16 sample lists. Block layout
    (WAVE registry): a 4-byte header per channel (predictor int16 LE,
    step index, reserved), then — mono — sequential nibble pairs
    (low nibble first), or — stereo — alternating 4-byte (8-nibble)
    groups per channel."""
    out: list[list[int]] = []
    states: list[tuple[int, int]] = []
    for ch in range(channels):
        (pred,) = struct.unpack_from("<h", block, ch * 4)
        index = block[ch * 4 + 2]
        if index > 88:
            raise ValueError("bad ADPCM step index")
        states.append((pred, index))
        out.append([pred])  # the header predictor IS sample 0
    body = block[4 * channels :]
    if channels == 1:
        pred, index = states[0]
        samples = out[0]
        for byte in body:
            for nib in (byte & 0x0F, byte >> 4):
                pred, index = _ima_step(nib, pred, index)
                samples.append(pred)
    else:
        # 4-byte groups alternate channels: L0..L7, R0..R7, L8.., ...
        for g in range(0, len(body) - len(body) % (4 * channels), 4 * channels):
            for ch in range(channels):
                pred, index = states[ch]
                samples = out[ch]
                for byte in body[g + 4 * ch : g + 4 * ch + 4]:
                    for nib in (byte & 0x0F, byte >> 4):
                        pred, index = _ima_step(nib, pred, index)
                        samples.append(pred)
                states[ch] = (pred, index)
    return out


def decode_wav(payload: bytes) -> tuple[int, np.ndarray] | None:
    """→ (sample_rate, mono float64 samples in [-1, 1]) for PCM 8/16-bit
    RIFF WAVE; None for anything else. Multi-channel mixes down by mean."""
    b = payload or b""
    try:
        if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
            return None
        pos = 12
        fmt = None
        data = None
        while pos + 8 <= len(b):
            cid = b[pos : pos + 4]
            (clen,) = struct.unpack_from("<I", b, pos + 4)
            body = b[pos + 8 : pos + 8 + clen]
            if cid == b"fmt ":
                fmt = body
            elif cid == b"data":
                data = body
            pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        if fmt is None or data is None or len(fmt) < 16:
            return None
        audio_fmt, channels, rate, _bps, align, bits = struct.unpack_from(
            "<HHIIHH", fmt, 0
        )
        if channels < 1 or rate <= 0:
            return None
        if audio_fmt == 0x11:  # IMA ADPCM
            if bits != 4 or channels > 2 or align <= 4 * channels:
                return None
            spb = None  # samples per block, from the extended fmt
            if len(fmt) >= 20:
                (cb,) = struct.unpack_from("<H", fmt, 16)
                if cb >= 2:
                    (spb,) = struct.unpack_from("<H", fmt, 18)
            chans: list[list[int]] = [[] for _ in range(channels)]
            for off in range(0, len(data), align):
                block = data[off : off + align]
                if len(block) < 4 * channels:
                    return None  # trailing fragment — malformed
                decoded = _decode_ima_block(block, channels)
                for ch in range(channels):
                    got = decoded[ch]
                    chans[ch].extend(got[:spb] if spb else got)
            arr = np.array(chans, dtype=np.float64) / 32768.0
            return int(rate), arr.mean(axis=0)
        if audio_fmt != 1:
            return None  # PCM/ADPCM only
        if bits == 16:
            n = len(data) // 2
            samples = (
                np.frombuffer(data, dtype="<i2", count=n).astype(np.float64) / 32768.0
            )
        elif bits == 8:
            samples = (
                np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0
            ) / 128.0
        else:
            return None
        if channels > 1:
            usable = (len(samples) // channels) * channels
            samples = samples[:usable].reshape(-1, channels).mean(axis=1)
        return int(rate), samples
    except Exception:
        return None


def window_energy(samples: np.ndarray, n_windows: int) -> list[float]:
    """RMS energy over ``n_windows`` equal slices — the MFCC-shaped
    fixed-dim descriptor real pipelines bucket clips by. Short clips pad
    with zero-energy windows."""
    out: list[float] = []
    n = len(samples)
    if n == 0:
        return [0.0] * n_windows
    for w in range(n_windows):
        a = n * w // n_windows
        z = n * (w + 1) // n_windows
        seg = samples[a:z]
        out.append(float(np.sqrt((seg * seg).mean())) if len(seg) else 0.0)
    return out
