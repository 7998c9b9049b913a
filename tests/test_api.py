"""Single-doc convenience API (reference text_extractor_api.py surface,
fixed contract per SURVEY.md §3.2) — result-dict keys, error envelopes,
and byte-identity with the pipeline kernels."""

from __future__ import annotations

import json

import pytest

from conftest import FIXTURES
from universal_text_extractor_spark.api import TextExtractor, extract_text

MANIFEST = json.loads((FIXTURES / "manifest.json").read_text())
KEYS = {"success", "text", "file_type", "ocr_used", "error"}


def test_extract_from_file_matches_goldens(tmp_path):
    """API output == golden kernel output for every fixture (the API and
    the pipeline share the kernels, so this is byte-identity by
    construction — the test locks the wiring)."""
    x = TextExtractor()
    for entry in MANIFEST[:12]:
        payload = (FIXTURES / f"{entry['name']}.bin").read_bytes()
        expected = (FIXTURES / f"{entry['name']}.expected.txt").read_bytes()
        # stage under the url's basename so extension detection matches
        p = tmp_path / entry["url"].rsplit("/", 1)[-1]
        p.write_bytes(payload)
        res = x.extract_from_file(str(p))
        assert set(res) == KEYS
        assert res["text"].encode("utf-8") == expected
        assert res["file_type"] == entry["content_type"]
        assert res["success"] == entry["success"]


def test_missing_file_envelope():
    res = TextExtractor().extract_from_file("/nonexistent/x.pdf")
    assert res == {
        "success": False,
        "error": "File not found: /nonexistent/x.pdf",
        "text": "",
        "file_type": None,
        "ocr_used": False,
    }


def test_extract_from_image_ocr_roundtrip(tmp_path):
    """Reference :80-128 with the live glyph backend: rendered text comes
    back through extract_from_image; a missing file is the error
    envelope."""
    import random

    from universal_text_extractor_spark.sources.pages_gen import make_ocr_page

    p = tmp_path / "scan.png"
    # scale 3: survives the preprocess=True (binarize+median) default path
    p.write_bytes(make_ocr_page(random.Random(5), ["HELLO API", "LINE 2"], scale=3))
    res = TextExtractor().extract_from_image(str(p))
    assert res["success"] is True and res["ocr_used"] is True
    assert res["text"] == "HELLO API\nLINE 2"
    res = TextExtractor().extract_from_image(str(p), preprocess=False)
    assert res["text"] == "HELLO API\nLINE 2"
    res = TextExtractor().extract_from_image(str(tmp_path / "missing.png"))
    assert res["success"] is False and res["ocr_used"] is False


def test_supported_formats_shape():
    fmts = TextExtractor().get_supported_formats()
    assert {"documents", "images", "ocr_available", "ocr_backends"} == set(fmts)
    assert fmts["ocr_available"] is True and fmts["ocr_backends"] == ["glyph-5x7"]


def test_extract_text_raises_on_failure(tmp_path):
    with pytest.raises(Exception, match="Text extraction failed"):
        extract_text(str(tmp_path / "missing.html"))


def test_batch_extract_keys(tmp_path):
    names = []
    for entry in MANIFEST[:3]:
        p = tmp_path / entry["url"].rsplit("/", 1)[-1]
        p.write_bytes((FIXTURES / f"{entry['name']}.bin").read_bytes())
        names.append(str(p))
    out = TextExtractor().batch_extract(names)
    assert set(out) == {n.rsplit("/", 1)[-1] for n in names}


def test_extract_dataframe_is_fused_pipeline(spark):
    from universal_text_extractor_spark.sources.pages_gen import generate_pages_df

    df = TextExtractor().extract_dataframe(
        generate_pages_df(spark, 20, partitions=2), num_partitions=2
    )
    assert df.count() == 20
    assert "text" in df.columns and "content_type" in df.columns
