"""Golden-file kernel tests (SURVEY.md §5 item 2): every fixture's extracted
text must be byte-identical to the committed golden. These goldens ARE the
reference oracle the north rule's byte-identity invariant is checked against.
"""

from __future__ import annotations

import json
import random

import pytest

from conftest import FIXTURES
from universal_text_extractor_spark.kernels import (
    detect_content_type,
    extract_payload,
)
from universal_text_extractor_spark.kernels.charset import detect_and_decode
from universal_text_extractor_spark.kernels.html_kernel import (
    extract_html,
    extract_main_content,
)

MANIFEST = json.loads((FIXTURES / "manifest.json").read_text())


@pytest.mark.parametrize("entry", MANIFEST, ids=[e["name"] for e in MANIFEST])
def test_golden_byte_identity(entry):
    payload = (FIXTURES / f"{entry['name']}.bin").read_bytes()
    expected = (FIXTURES / f"{entry['name']}.expected.txt").read_bytes()
    ct = detect_content_type(entry["url"], payload)
    assert ct == entry["content_type"]
    text, ocr_used, success, error, _logs = extract_payload(
        entry["url"], payload, ct, use_ocr=entry.get("use_ocr", False)
    )
    assert text.encode("utf-8") == expected
    assert ocr_used == entry["ocr_used"]
    assert success == entry["success"]
    assert error == entry["error"]


@pytest.mark.parametrize(
    "entry",
    [e for e in MANIFEST if e.get("has_main")],
    ids=[e["name"] for e in MANIFEST if e.get("has_main")],
)
def test_golden_main_content(entry):
    payload = (FIXTURES / f"{entry['name']}.bin").read_bytes()
    expected = (FIXTURES / f"{entry['name']}.main.txt").read_bytes()
    got = extract_main_content(detect_and_decode(payload))
    assert got.encode("utf-8") == expected


def test_boilerplate_removed():
    payload = (FIXTURES / "html_boilerplate.bin").read_bytes()
    main = extract_main_content(detect_and_decode(payload))
    assert "Real Headline" in main
    assert "genuine article body" in main
    assert "Home" not in main  # nav stripped
    assert "Copyright" not in main  # footer stripped
    assert "link one" not in main  # link farm (high link density)


def test_total_function_never_raises():
    """D2 containment (reference utils/file_handlers.py:255-257): no input
    may raise — fuzz every branch with adversarial bytes."""
    rng = random.Random(123)
    blobs = [
        b"",
        b"\x00" * 64,
        bytes(rng.getrandbits(8) for _ in range(4096)),
        b"%PDF-1.4 garbage" + bytes(rng.getrandbits(8) for _ in range(512)),
        b"<html><p" + b"\xff" * 100,
        b"{\\rtf1 \\u99999999999? {{{",
        b"\xff\xfe" + b"\x00" * 33,
    ]
    types = ["html", "xml", "txt", "pdf", "rtf", "csv", "eml", "image", "unknown", None]
    for blob in blobs:
        for t in types:
            text, ocr_used, success, error, logs = extract_payload(
                "https://x.example.com/f", blob, t
            )
            assert isinstance(text, str)
            assert isinstance(logs, list)


def test_html_title_absent_is_untitled():
    text, _ = extract_html("<html><body><p>x</p></body></html>")
    assert text.startswith("Title: Untitled\n\n")


def test_error_literal_shape():
    # force an exception inside a kernel via a type confusion
    text, _, success, error, _ = extract_payload("https://x/y.txt", None, "txt")
    assert success is False or text == ""  # decode of None → "" → Warning path
