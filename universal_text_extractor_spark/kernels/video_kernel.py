"""Uncompressed AVI (RIFF video) demux — promotes ``frame_sample`` from
digest stub to REAL frames for the one video container that is
spec-simple enough to decode from scratch: RIFF 'AVI ' with BI_RGB
24-bit DIB frames ('00db' chunks), the raw-capture format. Compressed
video (H.264/VP9/…) stays honestly undecodable here (no codecs in the
sandbox) and keeps the digest fallback.

Same contract as :func:`..kernels.gif_kernel.open_gif`: a streaming
iterator of (delay_ms, HxWx3 RGB canvas) so a long clip never
materializes all frames; malformed blocks raise :class:`AviError` and
the caller decides whole-payload strictness. The synthetic corpus comes
from the INDEPENDENT writer ``sources.pages_gen.make_avi`` (own writer ≠
parser).

Reference ancestry: the reference has no video path (its media handling
stops at PIL images, utils/file_handlers.py:198-207); this operator
belongs to the task brief's multimodal surface (frame sampling for
training-data pipelines).
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np


class AviError(Exception):
    pass


def _chunks(b: bytes, pos: int, end: int):
    """RIFF chunk walk: yields (fourcc, body_start, body_len); chunks are
    word-aligned."""
    while pos + 8 <= end:
        cid = b[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", b, pos + 4)
        yield cid, pos + 8, clen
        pos += 8 + clen + (clen & 1)


def open_avi(
    payload: bytes,
) -> tuple[int, int, Iterator[tuple[int, np.ndarray]]] | None:
    """→ (width, height, frame iterator) or None when the container/
    stream headers don't parse to uncompressed 24-bit DIB video. The
    iterator yields (delay_ms, canvas HxWx3 uint8 RGB) per '00db' chunk
    and raises :class:`AviError` on a malformed frame."""
    b = payload or b""
    try:
        if len(b) < 24 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
            return None
        w = h = None
        delay_ms = 100
        movi_span = None
        have_vids = False
        top_down = False
        # RIFF size at offset 4 counts from offset 8 (form type + chunks)
        riff_end = min(len(b), 8 + struct.unpack_from("<I", b, 4)[0])
        for cid, start, clen in _chunks(b, 12, riff_end):
            if cid != b"LIST" or start + 4 > len(b):
                continue
            ltype = b[start : start + 4]
            if ltype == b"hdrl":
                for hid, hstart, hlen in _chunks(b, start + 4, start + clen):
                    if hid == b"LIST" and b[hstart : hstart + 4] == b"strl":
                        fcc_type = fcc_handler = None
                        scale = rate = 0
                        for sid, sstart, slen in _chunks(b, hstart + 4, hstart + hlen):
                            if sid == b"strh" and slen >= 32:
                                fcc_type = b[sstart : sstart + 4]
                                fcc_handler = b[sstart + 4 : sstart + 8]
                                scale, rate = struct.unpack_from("<II", b, sstart + 20)
                            elif sid == b"strf" and fcc_type == b"vids" and slen >= 40:
                                (
                                    _bi_size, bi_w, bi_h, _planes, bpp, comp,
                                ) = struct.unpack_from("<IiiHHI", b, sstart)
                                if bpp != 24 or comp != 0:
                                    return None  # compressed / non-DIB video
                                w, h = int(bi_w), abs(int(bi_h))
                                # negative biHeight = TOP-DOWN DIB: rows
                                # are already top-first and must not be
                                # flipped (r5 review, batch 4)
                                top_down = int(bi_h) < 0
                                have_vids = True
                                if rate:
                                    delay_ms = max(
                                        1, round(1000.0 * scale / rate)
                                    )
            elif ltype == b"movi":
                movi_span = (start + 4, min(start + clen, len(b)))
        if not have_vids or movi_span is None or not w or not h or w <= 0 or h <= 0:
            return None
    except Exception:
        return None

    stride = (w * 3 + 3) & ~3

    def frames() -> Iterator[tuple[int, np.ndarray]]:
        seen = False
        for cid, start, clen in _chunks(b, movi_span[0], movi_span[1]):
            if cid[2:4] not in (b"db", b"dc"):
                continue  # audio ('wb') / index data interleaved in movi
            if cid[2:4] == b"dc":
                raise AviError("compressed frame chunk")
            if clen < stride * h or start + clen > len(b):
                raise AviError("truncated frame")
            raw = np.frombuffer(b, np.uint8, stride * h, start)
            rows = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
            # DIB rows are bottom-up BGR (top-down when biHeight < 0)
            orows = rows if top_down else rows[::-1]
            yield delay_ms, orows[:, :, ::-1].copy()
            seen = True
        if not seen:
            raise AviError("no frames")

    return w, h, frames()
