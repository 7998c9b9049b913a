"""Crawl→training-corpus pipeline (plans/corpus.py): stage semantics over
a planted corpus — junk dies at quality, exact clones at dedup, shingle
near-clones at LSH, and the survivors land in the corpus parquet with
stage counts that reconcile."""

from __future__ import annotations

from pyspark.sql import Row

from universal_text_extractor_spark.plans.corpus import build_training_corpus

_BASE = (
    "the quick brown fox jumps over the lazy dog while the storm gathers "
    "slowly across the valley and every farmer watches the clouds roll in "
    "before the harvest begins in earnest this autumn season brings change "
)


def _page(url: str, body: str) -> Row:
    html = f"<html><head><title>t</title></head><body><p>{body}</p></body></html>"
    return Row(url=url, warc_ts=None, html=html.encode(), text="", lang="en")


def test_build_training_corpus(spark, tmp_path):
    pages = [
        _page("https://a.example/keep1.html", _BASE + "unique tail one here today"),
        # exact clone of keep1 (same extracted text, higher url hash or lower —
        # either way exactly one survives)
        _page("https://b.example/clone.html", _BASE + "unique tail one here today"),
        # near clone: same shingle mass, different tail → jaccard ≥ 0.7
        _page("https://c.example/near.html", _BASE + "unique tail two here today"),
        # independent keeper
        _page(
            "https://d.example/keep2.html",
            "completely different content about spark partitioning and the "
            "catalyst optimizer with broadcast joins and shuffle planning in "
            "large distributed analytical engines running columnar scans",
        ),
        # junk: fails min_tokens
        _page("https://e.example/junk.html", "too short"),
        # junk: fails alpha ratio
        _page("https://f.example/nums.html", "1 2 3 4 5 6 7 8 9 10 " * 5),
    ]
    df = spark.createDataFrame(
        pages,
        schema="url string, warc_ts timestamp, html binary, text string, lang string",
    )
    out = str(tmp_path / "corpus_out")
    stats = build_training_corpus(spark, df, out, num_partitions=4)

    assert stats["extracted_ok"] == 6
    assert stats["quality_kept"] == 4  # junk + nums die
    assert stats["exact_unique"] == 3  # one of the exact clones dies
    assert stats["near_dup_unique"] == 2  # the near clone dies
    # monotone by construction
    assert (
        stats["extracted_ok"]
        >= stats["quality_kept"]
        >= stats["exact_unique"]
        >= stats["near_dup_unique"]
    )

    final = spark.read.parquet(f"{out}/corpus")
    urls = {r["url"] for r in final.select("url").collect()}
    assert "https://d.example/keep2.html" in urls
    # exactly one member of the {keep1, clone, near} family survives
    fam = {u for u in urls if u != "https://d.example/keep2.html"}
    assert len(fam) == 1 and fam < {
        "https://a.example/keep1.html",
        "https://b.example/clone.html",
        "https://c.example/near.html",
    }
    # docs carry the frame columns + predicted language
    row = final.filter(final.url == "https://d.example/keep2.html").first()
    assert row["lang"] == "en" and row["source"] == "d.example"
    assert row["doc_id"] is not None and row["n_chars"] > 0

    read_stats = spark.read.parquet(f"{out}/stats").first().asDict()
    assert read_stats == stats


def test_bucket_min_fast_path(spark, tmp_path):
    """verify_jaccard=False: the pair-free bucket-min purge kills the
    planted clones without materializing candidate pairs; exact-unique
    keepers with disjoint shingles survive."""
    pages = [
        _page("https://a.example/keep1.html", _BASE + "unique tail one here today"),
        _page("https://c.example/near.html", _BASE + "unique tail two here today"),
        _page(
            "https://d.example/keep2.html",
            "completely different content about spark partitioning and the "
            "catalyst optimizer with broadcast joins and shuffle planning in "
            "large distributed analytical engines running columnar scans",
        ),
    ]
    df = spark.createDataFrame(
        pages,
        schema="url string, warc_ts timestamp, html binary, text string, lang string",
    )
    out = str(tmp_path / "fast_out")
    stats = build_training_corpus(
        spark, df, out, num_partitions=4, verify_jaccard=False
    )
    assert stats["exact_unique"] == 3
    assert stats["near_dup_unique"] == 2  # near clone dies via bucket-min
    urls = {
        r["url"] for r in spark.read.parquet(f"{out}/corpus").select("url").collect()
    }
    assert "https://d.example/keep2.html" in urls and len(urls) == 2


def test_corpus_from_committed_extraction(spark, tmp_path):
    """The resume-friendly shape: a committed run_extraction output feeds
    build_training_corpus(extracted=...) — identical corpus to the
    one-shot path over the same pages."""
    from universal_text_extractor_spark.plans.pipeline import run_extraction

    pages = [
        _page("https://a.example/keep1.html", _BASE + "unique tail one here today"),
        _page("https://b.example/clone.html", _BASE + "unique tail one here today"),
        _page(
            "https://d.example/keep2.html",
            "completely different content about spark partitioning and the "
            "catalyst optimizer with broadcast joins and shuffle planning in "
            "large distributed analytical engines running columnar scans",
        ),
    ]
    df = spark.createDataFrame(
        pages,
        schema="url string, warc_ts timestamp, html binary, text string, lang string",
    )
    run_dir = str(tmp_path / "run")
    run_extraction(spark, df, run_dir, n_buckets=2, num_partitions=2)
    extracted = spark.read.parquet(f"{run_dir}/extracted")

    out_a = str(tmp_path / "from_run")
    stats_a = build_training_corpus(spark, None, out_a, extracted=extracted)
    out_b = str(tmp_path / "one_shot")
    stats_b = build_training_corpus(spark, df, out_b, num_partitions=2)
    assert stats_a == stats_b
    ca = {r["url"] for r in spark.read.parquet(f"{out_a}/corpus").collect()}
    cb = {r["url"] for r in spark.read.parquet(f"{out_b}/corpus").collect()}
    assert ca == cb and "https://d.example/keep2.html" in ca


def test_stage_scratch_cleaned_and_no_caching(spark, tmp_path):
    """r3 verdict item #3: stage boundaries are parquet spills, not
    executor-memory caches — out_dir ends with only corpus/stats, and the
    module holds no persist()/cache() calls (stage memory must stay
    independent of corpus size)."""
    import inspect
    import random

    from pyspark.sql import Row

    from universal_text_extractor_spark.plans import corpus as corpus_mod

    src = inspect.getsource(corpus_mod)
    assert ".persist(" not in src and ".cache(" not in src

    rng = random.Random(3)
    words = ("alpha beta gamma delta epsilon zeta eta theta".split())
    pages = [
        Row(
            url=f"https://s.example/{i}.txt",
            warc_ts=None,
            html=(" ".join(rng.choices(words, k=40))).encode(),
            text="",
            lang="en",
        )
        for i in range(30)
    ]
    df = spark.createDataFrame(
        pages,
        schema="url string, warc_ts timestamp, html binary, text string, lang string",
    )
    out = tmp_path / "staged"
    build_training_corpus(spark, df, str(out), num_partitions=2)
    names = sorted(p.name for p in out.iterdir())
    assert names == ["corpus", "stats"], names
