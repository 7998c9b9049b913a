"""Image metadata kernel (K17, SURVEY.md §2.3) — no OCR in this environment.

Reference semantics for the OCR-disabled image path
(reference utils/file_handlers.py:198-207)::

    [Image: {width}x{height}, Format: {format}]
    OCR was not enabled. Enable OCR to extract text content from this image.

Dimensions parsed from raw header bytes (PNG/JPEG/GIF/BMP/TIFF) — no PIL, so
output depends only on this module. Unknown/corrupt image headers fall back
to the no-PIL literal ``[Image file - OCR not enabled]`` (reference :207).

OCR recognition itself lives in :mod:`.ocr_kernel` (K13 — REAL since r3:
a deterministic glyph matcher replacing the r1/r2 unavailable-literal
stub); K14-K16 preprocessing in :mod:`.image_prep`. This module stays the
``use_ocr=False`` metadata path.
"""

from __future__ import annotations

import struct
_NO_OCR_SUFFIX = "OCR was not enabled. Enable OCR to extract text content from this image."


def _png_size(b: bytes):
    if len(b) >= 24 and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        return w, h, "PNG"
    return None


def _gif_size(b: bytes):
    if len(b) >= 10:
        w, h = struct.unpack("<HH", b[6:10])
        return w, h, "GIF"
    return None


def _bmp_size(b: bytes):
    if len(b) >= 26:
        w, h = struct.unpack("<ii", b[18:26])
        return w, abs(h), "BMP"
    return None


def _jpeg_size(b: bytes):
    i, n = 2, len(b)
    while i + 9 < n:
        if b[i] != 0xFF:
            i += 1
            continue
        marker = b[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seglen = struct.unpack(">H", b[i + 2 : i + 4])[0]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h, w = struct.unpack(">HH", b[i + 5 : i + 9])
            return w, h, "JPEG"
        i += 2 + seglen
    return None


def _tiff_size(b: bytes):
    from .tiff_kernel import tiff_size

    dims = tiff_size(b)
    if dims is None:
        return None
    return dims[0], dims[1], "TIFF"


def parse_image_header(payload: bytes):
    """Dispatch on magic bytes and parse (width, height, format) from the
    header, or None for non-image/corrupt payloads. Shared by the K17
    extraction branch below and operators/multimodal.py."""
    try:
        if payload.startswith(b"\x89PNG\r\n\x1a\n"):
            return _png_size(payload)
        if payload.startswith((b"GIF87a", b"GIF89a")):
            return _gif_size(payload)
        if payload.startswith(b"BM"):
            return _bmp_size(payload)
        if payload.startswith(b"\xff\xd8\xff"):
            return _jpeg_size(payload)
        if payload.startswith((b"II*\x00", b"MM\x00*")):
            return _tiff_size(payload)
    except Exception:
        return None
    return None


def extract_image_metadata(payload: bytes) -> tuple[str, list[str]]:
    """Returns (text, logs). Never raises."""
    logs = ["OCR not enabled for image file"]
    try:
        dims = parse_image_header(payload)
        if dims is None:
            return "[Image file - OCR not enabled]", logs
        w, h, fmt = dims
        # reference utils/file_handlers.py:204-205
        return f"[Image: {w}x{h}, Format: {fmt}]\n{_NO_OCR_SUFFIX}", logs
    except Exception:
        return "[Image file - OCR not enabled]", logs
