"""Charset detection / normalization (kernel K4, SURVEY.md §2.3).

The reference reads every text-ish format with ``encoding='utf-8',
errors='replace'`` (reference utils/file_handlers.py:222, :795, :895, :939,
:1031, :1162) and declares-but-never-imports ``chardet``
(reference requirements.txt:39). This module supplies that promised charset
detection as a small deterministic rule set (no third-party deps, so the
output depends only on this code — required for byte-identity across
environments, SURVEY.md §7.2).
"""

from __future__ import annotations

_BOMS = (
    (b"\xef\xbb\xbf", "utf-8-sig"),
    (b"\xff\xfe\x00\x00", "utf-32-le"),
    (b"\x00\x00\xfe\xff", "utf-32-be"),
    (b"\xff\xfe", "utf-16-le"),
    (b"\xfe\xff", "utf-16-be"),
)


def decode_utf8_replace(payload: bytes) -> str:
    """Exact reference read semantics: utf-8 with U+FFFD replacement
    (reference utils/file_handlers.py:222)."""
    if payload is None:
        return ""
    return payload.decode("utf-8", errors="replace")


def detect_charset(payload: bytes) -> str:
    """Deterministic charset sniff: BOM > strict-UTF-8 validity > windows-1252.

    windows-1252 is the fallback (not latin-1): every byte decodes, matching
    the de-facto web default; deterministic by construction.
    """
    if not payload:
        return "utf-8"
    for bom, enc in _BOMS:
        if payload.startswith(bom):
            return enc
    try:
        payload.decode("utf-8", errors="strict")
        return "utf-8"
    except UnicodeDecodeError:
        return "windows-1252"


def detect_and_decode(payload: bytes) -> str:
    """Charset-detected decode with replacement-char normalization.

    Used by the HTML branch (the reference's aspirational chardet role);
    plain-text branch keeps the reference's literal utf-8/replace semantics
    via :func:`decode_utf8_replace`.
    """
    if payload is None:
        return ""
    enc = detect_charset(payload)
    text = payload.decode(enc, errors="replace")
    # A BOM-less decode of utf-8 keeps any U+FEFF; normalize a single
    # leading BOM char away so utf-8 and utf-8-sig inputs agree.
    if text.startswith("﻿"):
        text = text[1:]
    return text
