"""Driver-harness mirror (SURVEY.md §5 item 4): run every ``queries()``
entry on Spark and its ``oracle_sql()`` twin on DuckDB over the same
parquet, compare row-count + schema-width + order-insensitive values.
This is a local pre-flight of CORRECTNESS_r{N}.json."""

from __future__ import annotations

import datetime
import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("UTES_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # collapse -0.0 and fp noise at display precision
        return round(v, 9)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    # None-safe sort key (CUBE/ROLLUP rows carry NULL grouping keys);
    # equality still compares the actual normalized values
    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", sorted(QUERIES), ids=sorted(QUERIES))
def test_query_vs_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = list(sdf.columns)
    if name not in ORACLES:
        pytest.skip(f"{name}: rows-only check (no oracle)")
    res = duck.execute(ORACLES[name])
    drows = res.fetchall()
    dcols = [d[0] for d in res.description]
    assert sorted(scols) == sorted(dcols), f"column names differ: {scols} vs {dcols}"
    assert len(srows) == len(drows), f"row counts differ: {len(srows)} vs {len(drows)}"
    sset, dset = _rowset(scols, srows), _rowset(dcols, drows)
    diffs = [(a, b) for a, b in zip(sset, dset) if a != b]
    assert not diffs, f"{len(diffs)} differing rows; first 3: {diffs[:3]}"


def test_every_query_has_oracle_or_reason():
    missing = set(QUERIES) - set(ORACLES)
    # s5 is the one declared rows-only exception (iterative k-means). m1
    # gained a byte-level DuckDB twin in r2, m3 a writer-pixel twin in r3;
    # m2/dd5 were retired from the registry in r3 (graded-window cap) but
    # stay locked below / in test_multimodal.py.
    allowed_no_oracle = {"s5_kmeans_profile"}
    assert missing <= allowed_no_oracle, f"queries without oracle: {missing}"


def test_registry_within_graded_window():
    """The driver grades at most 50 entries (r2 lesson: entries 51-52 got
    no CORRECTNESS rows). Keep the registry at ≤50 so every declared query
    is actually checked."""
    assert len(QUERIES) <= 50, f"registry has {len(QUERIES)} entries (> 50)"


def test_retired_dd5_simhash_groups_still_parity(spark, duck):
    """dd5 left the driver registry (subsumed by dd6) but the operator and
    its DuckDB twin must keep agreeing."""
    from universal_text_extractor_spark.operators import dedup as D

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    srows = sorted(tuple(r) for r in D.simhash_dedup_groups(docs).collect())
    drows = sorted(tuple(r) for r in duck.execute(entry_mod._simhash_sql(16)).fetchall())
    assert srows == drows


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["lang", "source", "n_docs", "avg_chars", "avg_tokens", "max_chars"]


def test_dedup_flat_equals_array(spark):
    """_shingles_flat (narrow regex-lookahead formulation) must produce the
    same shingle set per doc as the array expression shingles_col — both
    over the NORMALIZED word basis, including text that leads/trails with
    non-space whitespace (trim removes only spaces; the r5 audit caught
    the pre-normalization basis emitting junk shingles like ' b c' for
    3,266 leading-newline docs in the 20k bench corpus)."""
    from pyspark.sql import functions as F

    from universal_text_extractor_spark.operators import dedup as D

    edge = spark.createDataFrame(
        [
            (90_000_001, "\nalpha beta gamma delta"),
            (90_000_002, "alpha beta gamma\t\n"),
            (90_000_003, "\t one\ttwo three four \n"),
        ],
        "doc_id long, text string",
    )
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .limit(500)
        .select("doc_id", "text")
        .unionByName(edge)
    )
    # the edge docs must shingle cleanly: no empty-token artifacts
    got = {
        r["shingle"]
        for r in D._shingles_flat(edge).collect()
        if r["shingle"].startswith(" ") or r["shingle"].endswith(" ")
        or "  " in r["shingle"]
    }
    assert got == set(), got
    flat = {
        (r["doc_id"], r["shingle"])
        for r in D._shingles_flat(docs).collect()
    }
    arr = {
        (r["doc_id"], s)
        for r in D._shingled(docs).collect()
        for s in r["shingles"]
    }
    assert flat == arr


def test_shingles_fuzz_vs_python_oracle(spark):
    """300 random whitespace-laden texts (tabs, newlines, runs, unicode
    words, leading/trailing junk) → _shingles_flat must equal an
    INDEPENDENT pure-Python oracle: normalize whitespace, split on single
    spaces, distinct k-grams. One Spark job for the whole batch."""
    import random

    from universal_text_extractor_spark.operators import dedup as D

    rng = random.Random(42)
    seps = [" ", "  ", "\t", "\n", " \n ", "\t\t", "\r\n", "   "]
    vocab = ["alpha", "B3ta", "Γάμμα", "d-e", "x", "Y.", "zz", "q'w"]
    rows = []
    for i in range(300):
        n = rng.randint(0, 12)
        body = "".join(
            rng.choice(vocab) + rng.choice(seps) for _ in range(n)
        )
        text = rng.choice(["", " ", "\n", "\t "]) + body
        rows.append((i, text))

    def oracle(text: str) -> set[str]:
        words = text.lower().split()  # str.split collapses all whitespace
        k = D.SHINGLE_K
        return {
            " ".join(words[j : j + k]) for j in range(len(words) - k + 1)
        }

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got: dict[int, set] = {}
    for r in D._shingles_flat(docs).collect():
        got.setdefault(r["doc_id"], set()).add(r["shingle"])
    for i, text in rows:
        assert got.get(i, set()) == oracle(text), (i, repr(text))


def test_exact_purge_with_real_duplicates(spark, duck):
    """dd7 on data that actually CONTAINS duplicates (the sf corpus has
    none, which would make the oracle check vacuous for the grouping key):
    whitespace/case variants collapse to one canonical doc in BOTH
    engines."""
    from universal_text_extractor_spark.operators import dedup as D

    rows = [
        (1, "en", "s0", 11, "Hello  World"),
        (2, "en", "s0", 11, "hello world"),     # dup of 1 (case+ws)
        (3, "fr", "s1", 5, "autre"),
        (4, "en", "s2", 11, " hello   world "),  # dup of 1 (trim+ws)
        (5, "fr", "s1", 6, "autre!"),            # NOT a dup of 3
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, n_chars long, text string"
    )
    got = sorted(r["doc_id"] for r in D.exact_dedup_purge(df).collect())
    assert got == [1, 3, 5]
    # and the DuckDB twin agrees on the same in-memory table
    duck.execute("CREATE OR REPLACE TABLE _dup_docs AS SELECT * FROM (VALUES "
                 + ", ".join(f"({i}, '{l}', '{s}', {n}, '{t.replace(chr(39), chr(39)*2)}')"
                             for i, l, s, n, t in rows)
                 + ") t(doc_id, lang, source, n_chars, text)")
    sql = ORACLES["dd7_exact_purge"].replace("FROM documents", "FROM _dup_docs")
    want = sorted(r[0] for r in duck.execute(sql).fetchall())
    assert want == [1, 3, 5]


def test_simhash_64bit_production_width(spark):
    """r4 verdict item #6: the docstring's 'use 64 bits at production
    corpus sizes' claim, now constructible (bit 63 is the BIGINT sign
    bit, weight −2^63) and verified against a driver-side brute-force
    popcount oracle: fingerprints match a pure-Python SimHash, and banded
    pairs at hamming ≤ 3 equal the all-pairs answer (pigeonhole recall is
    width-independent)."""
    import hashlib
    import random

    from pyspark.sql import Row

    from universal_text_extractor_spark.operators import dedup as D

    def md5_long(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def py_simhash(text: str, bits: int = 64) -> int:
        toks = text.strip().lower().split()
        fp = 0
        for bb in range(bits):
            # bits >= 60 come from the second, prefix-seeded md5 (md5_long
            # is 60-bit; one hash's bits 60-63 would be constant zero)
            def bit(t: str) -> int:
                if bb < 60:
                    return (md5_long(t) >> bb) & 1
                return (md5_long("hi:" + t) >> (bb - 60)) & 1

            c = sum(1 if bit(t) else -1 for t in toks)
            if c > 0:
                fp |= 1 << bb
        return fp - (1 << 64) if fp >= (1 << 63) else fp  # as signed 64

    rng = random.Random(29)
    vocab = [f"w{j}" for j in range(200)]
    base = rng.choices(vocab, k=120)
    texts = {0: " ".join(base)}
    for i in range(1, 8):  # near clones: flip a few tokens
        t = list(base)
        for _ in range(i):
            t[rng.randrange(len(t))] = rng.choice(vocab)
        texts[i] = " ".join(t)
    for i in range(8, 20):  # unrelated docs
        texts[i] = " ".join(rng.choices(vocab, k=120))
    # whitespace-edge clone (r5 review finding): leading \n / trailing \t
    # must not inject a phantom empty token — doc 20 is token-identical to
    # doc 0, so the pair MUST surface at hamming 0
    texts[20] = "\n\t " + texts[0] + " \n"

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in texts.items()],
        schema="doc_id long, text string",
    )
    got_fp = {
        r["doc_id"]: r["simhash"]
        for r in D.simhash_fingerprints(docs, bits=64).collect()
    }
    want_fp = {i: py_simhash(t) for i, t in texts.items()}
    assert got_fp == want_fp
    assert any(v < 0 for v in want_fp.values()), "fixture must hit bit 63"

    def ham(a: int, b: int) -> int:
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    want_pairs = sorted(
        (a, b, ham(want_fp[a], want_fp[b]))
        for a in texts
        for b in texts
        if a < b and ham(want_fp[a], want_fp[b]) <= 3
    )
    assert want_pairs, "fixture must contain hamming<=3 pairs at 64 bits"
    got_pairs = sorted(
        tuple(r)
        for r in D.simhash_near_dup_pairs(docs, bits=64, max_hamming=3).collect()
    )
    assert got_pairs == want_pairs
