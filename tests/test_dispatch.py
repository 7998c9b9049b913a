"""Parity test: the JVM Column-expression sniff (functions/sniff.py) must
agree with the Python kernel detector (kernels/dispatch.py) on EVERY row of
the synthetic corpus + all fixtures (the rule-parity contract both modules
document)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from conftest import FIXTURES
from universal_text_extractor_spark.functions.sniff import content_type_col
from universal_text_extractor_spark.kernels import detect_content_type
from universal_text_extractor_spark.sources.pages_gen import make_page


def test_sniff_parity_corpus(spark):
    n = 1000
    pages = [make_page(i) for i in range(n)]
    manifest = json.loads((FIXTURES / "manifest.json").read_text())
    for e in manifest:
        pages.append(
            {
                "url": e["url"],
                "warc_ts": None,
                "html": (FIXTURES / f"{e['name']}.bin").read_bytes(),
                "text": "",
                "lang": "en",
            }
        )
    # tricky urls: query strings, fragments, dots in host, no path dot
    extra = [
        ("https://a.example.com/x.HTML?q=1#frag", b"zz"),
        ("https://a.example.com/x.pdf?download=true", b"zz"),
        ("https://a.b.example.com/plain", b"hello world"),
        ("https://a.example.com/dir.name/file", b"hello"),
        ("https://a.example.com/", b"<html><body>x</body></html>"),
        ("https://a.example.com/x.verylongext", b"text"),
        ("https://a.example.com/x.tar.gz", b"\x1f\x8b\x08junk\x00\x01"),
    ]
    for u, b in extra:
        pages.append({"url": u, "warc_ts": None, "html": b, "text": "", "lang": "en"})

    df = spark.createDataFrame(
        [(p["url"], p["html"]) for p in pages], "url string, html binary"
    )
    got = {
        r["url"]: r["ct"]
        for r in df.select("url", content_type_col(F.col("url"), F.col("html")).alias("ct")).collect()
    }
    mismatches = []
    for p in pages:
        want = detect_content_type(p["url"], p["html"])
        if got[p["url"]] != want:
            mismatches.append((p["url"], got[p["url"]], want))
    assert not mismatches, mismatches[:10]
