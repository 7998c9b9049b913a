"""WAV (RIFF/PCM) audio decode — promotes ``audio_features`` from digest
stub to REAL windowed energy features for the one audio container that is
spec-simple enough to decode from scratch (PCM inside RIFF; no codec).
MP3/AAC/OGG stay honestly undecodable here (no codecs in the sandbox) and
keep the digest fallback.

The synthetic corpus is produced by an INDEPENDENT writer
(``sources.pages_gen.make_wav`` — integer-only synthesis, own writer ≠
parser). Failures return None — never raise (D2 containment).
"""

from __future__ import annotations

import struct

import numpy as np


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
        audio_fmt, channels, rate, _bps, _align, bits = struct.unpack_from(
            "<HHIIHH", fmt, 0
        )
        if audio_fmt != 1 or channels < 1 or rate <= 0:
            return None  # PCM only
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
