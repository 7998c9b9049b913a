"""End-to-end pipeline tests (SURVEY.md §5 item 3): per-url byte-identity of
the Spark pipeline vs the kernel oracle for 100% of urls, lineage-table
invariants, and the single-reused-shuffle physical-plan property."""

from __future__ import annotations

import re

from universal_text_extractor_spark.kernels import detect_content_type, extract_payload
from universal_text_extractor_spark.operators.extract import (
    extract_pages,
    extract_pages_fused,
    lineage_metrics,
)
from universal_text_extractor_spark.sources.pages_gen import (
    generate_pages_df,
    make_page,
)

N = 1000


def _oracle(i: int):
    p = make_page(i)
    ct = detect_content_type(p["url"], p["html"])
    text, ocr_used, success, error, _ = extract_payload(p["url"], p["html"], ct)
    return p["url"], ct, text, ocr_used, success, error


def test_pipeline_byte_identity(spark):
    pages = generate_pages_df(spark, N, partitions=4)
    ext = extract_pages(pages, num_partitions=8)
    rows = {r["url"]: r for r in ext.collect()}
    assert len(rows) == N
    bad = []
    for i in range(N):
        url, ct, text, ocr_used, success, error = _oracle(i)
        r = rows[url]
        if (
            r["content_type"] != ct
            or r["text"] != text
            or r["ocr_used"] != ocr_used
            or r["success"] != success
            or r["error"] != error
        ):
            bad.append(url)
    assert not bad, f"{len(bad)} mismatching urls, e.g. {bad[:5]}"


def test_lineage_invariants(spark):
    pages = generate_pages_df(spark, N, partitions=4)
    ext = extract_pages(pages, num_partitions=8).cache()
    try:
        metrics = lineage_metrics(ext, run_id="testrun").collect()
        # Σ doc_count = input row count (FIXTURES.md §2)
        assert sum(m["doc_count"] for m in metrics) == N
        # every post-shuffle partition that held rows has exactly one row
        pids = [m["partition_id"] for m in metrics]
        assert len(pids) == len(set(pids))
        # failure_count consistency with the extracted table
        failures = ext.filter("NOT success").count()
        assert sum(m["failure_count"] for m in metrics) == failures
        # byte accounting
        total_bytes = sum(m["input_bytes"] for m in metrics)
        assert total_bytes == sum(len(make_page(i)["html"]) for i in range(N))
        for m in metrics:
            assert m["byte_range_start"] <= m["byte_range_end"]
            assert m["extraction_latency"] >= 0.0
    finally:
        ext.unpersist()


def test_single_shuffle_reused(spark):
    """The branch fan-out must not re-shuffle per branch: exactly one real
    Exchange for the salted repartition; all other branches see a
    ReusedExchange (scale property — SURVEY.md §3.1)."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        pages = generate_pages_df(spark, 50, partitions=2)
        ext = extract_pages(pages, num_partitions=4)
        plan = ext._jdf.queryExecution().executedPlan().toString()
        n_branches = plan.count("ArrowEvalPython") + 1  # +1 literal branch
        reused = len(re.findall(r"ReusedExchange", plan))
        assert reused >= n_branches - 1, (
            f"expected ≥{n_branches - 1} reused exchanges:\n{plan[:2000]}"
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_fused_equals_union(spark):
    """The single-pass fused dispatch (throughput path) must be
    byte-identical to the filter+union branch plan (north-star architecture)
    on every stable column — same kernels, same dispatch rules, so equality
    holds by construction; this locks it."""
    pages = generate_pages_df(spark, N, partitions=4)
    stable = ["url", "content_type", "partition_id", "input_bytes",
              "text", "ocr_used", "success", "error", "logs"]
    union_rows = {
        r["url"]: r
        for r in extract_pages(pages, num_partitions=8).select(*stable).collect()
    }
    fused_rows = {
        r["url"]: r
        for r in extract_pages_fused(pages, num_partitions=8).select(*stable).collect()
    }
    assert set(union_rows) == set(fused_rows)
    bad = [
        u
        for u, r in union_rows.items()
        if tuple(r) != tuple(fused_rows[u])
    ]
    assert not bad, f"{len(bad)} fused/union mismatches, e.g. {bad[:3]}"


def test_fused_single_stage_plan(spark):
    """The fused path must be exactly one shuffle + one Python stage."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        pages = generate_pages_df(spark, 50, partitions=2)
        plan = (
            extract_pages_fused(pages, num_partitions=4)
            ._jdf.queryExecution().executedPlan().toString()
        )
        # exactly one dispatch stage (the generator contributes its own
        # MapInPandas gen(...) below the exchange) and one shuffle
        assert plan.count("MapInPandas dispatch") == 1, plan
        assert plan.count("Exchange") == 1, plan
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_generator_partition_invariance(spark):
    """Index-purity: the generated table must be identical at any
    parallelism (prerequisite for the scaling bench)."""
    a = {r["url"]: r["html"] for r in generate_pages_df(spark, 200, partitions=1).collect()}
    b = {r["url"]: r["html"] for r in generate_pages_df(spark, 200, partitions=7).collect()}
    assert a == b


def test_salted_repartition_breaks_host_skew(spark):
    """North rule: 'explicit repartitioning by url-hash with salting to
    break host-level skew'. The corpus's hosts are Zipfian (the heaviest
    host holds far more than a fair share), yet the salted
    xxhash64(url)-keyed exchange must land near-uniform partitions —
    asserted via the lineage doc counts the pipeline already emits."""
    from urllib.parse import urlparse

    n, parts = 4000, 16
    pages = generate_pages_df(spark, n, partitions=4)
    # premise: host-keyed partitioning WOULD be skewed (top host's share
    # is several fair shares) — otherwise this test proves nothing
    hosts = [urlparse(make_page(i)["url"]).netloc for i in range(n)]
    top_share = max(
        sum(1 for h in hosts if h == hh) for hh in set(hosts)
    ) / n
    assert top_share > 2.5 / parts, top_share
    ext = extract_pages_fused(pages, num_partitions=parts).cache()
    try:
        counts = [
            m["doc_count"]
            for m in lineage_metrics(ext, run_id="skewtest").collect()
        ]
        assert sum(counts) == n
        mean = n / parts
        # salted url-hash: every partition within a tight band of fair
        assert max(counts) <= 1.35 * mean, counts
        assert min(counts) >= 0.65 * mean, counts
    finally:
        ext.unpersist()


def test_main_content_mode(spark):
    """main_content=True (north-star boilerplate removal): the HTML branch
    emits extract_main_content output, every other branch stays
    byte-identical to the default mode, and fused ≡ union holds under the
    flag."""
    from universal_text_extractor_spark.kernels import detect_and_decode
    from universal_text_extractor_spark.kernels.html_kernel import (
        extract_main_content,
    )

    pages = generate_pages_df(spark, 400, partitions=4)
    stable = ["url", "content_type", "text", "ocr_used", "success", "error", "logs"]
    plain = {
        r["url"]: r
        for r in extract_pages_fused(pages, num_partitions=8)
        .select(*stable)
        .collect()
    }
    fused = {
        r["url"]: r
        for r in extract_pages_fused(pages, num_partitions=8, main_content=True)
        .select(*stable)
        .collect()
    }
    union = {
        r["url"]: r
        for r in extract_pages(pages, num_partitions=8, main_content=True)
        .select(*stable)
        .collect()
    }
    assert set(plain) == set(fused) == set(union)
    bad = [u for u in fused if tuple(fused[u]) != tuple(union[u])]
    assert not bad, f"{len(bad)} fused/union mismatches under main_content"

    payloads = {r["url"]: r["html"] for r in pages.collect()}
    n_html = 0
    for u, r in fused.items():
        if r["content_type"] == "html":
            n_html += 1
            want = extract_main_content(detect_and_decode(payloads[u] or b""))
            assert r["text"] == want, u
            assert (
                "Extracted main content from HTML (boilerplate removed)"
                in r["logs"]
            )
        else:  # every non-html branch is unchanged by the flag
            assert tuple(r) == tuple(plain[u]), u
    assert n_html > 100  # the corpus is html-dominated; the mode was exercised


def test_fused_equals_union_under_ocr_options(spark):
    """r4: the fused ≡ union byte-identity must hold under the new OCR
    option surface too (language + handwriting_mode thread through both
    dispatch paths identically), and the options must be visibly live:
    an unknown language turns every OCR'd image into the no-text
    literal."""
    from universal_text_extractor_spark.kernels.ocr_kernel import (
        NO_TEXT_LITERAL,
    )

    pages = generate_pages_df(spark, 300, partitions=4)
    stable = ["url", "content_type", "text", "ocr_used", "success", "error"]
    kw = dict(
        num_partitions=4, use_ocr=True,
        ocr_language="fra", handwriting_mode=True,
    )
    union_rows = {
        r["url"]: tuple(r)
        for r in extract_pages(pages, **kw).select(*stable).collect()
    }
    fused_rows = {
        r["url"]: tuple(r)
        for r in extract_pages_fused(pages, **kw).select(*stable).collect()
    }
    assert union_rows == fused_rows

    bad_lang = {
        r["url"]: r["text"]
        for r in extract_pages_fused(
            pages, num_partitions=4, use_ocr=True, ocr_language="zz"
        ).collect()
        if r["content_type"] == "image"
    }
    assert bad_lang and all(
        t == NO_TEXT_LITERAL or t.startswith("[")  # metadata-less payloads
        for t in bad_lang.values()
    )
    assert any(t == NO_TEXT_LITERAL for t in bad_lang.values())
