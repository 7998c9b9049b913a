"""Text-analysis operators over ``documents``: language-ID, quality scores,
token counts, fingerprinting (task brief: first-class alongside SURVEY §2).

Everything is JVM Column expressions — no Python UDFs in any of these.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text_funcs import quality_score_cols, token_count_col, words_col
from .dedup import md5_long

# tiny per-language function-word lists for the n-gram/stopword heuristic
# language-ID (deterministic; mirrored verbatim in the oracle SQL)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "with", "for", "was"),
    "fr": ("le", "la", "les", "et", "de", "des", "un", "une", "est", "que"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu"),
    "es": ("el", "la", "los", "las", "y", "de", "que", "es", "un", "una"),
    "pt": ("o", "a", "os", "as", "e", "de", "que", "um", "uma", "não"),
}


def lang_score_col(text: Column, lang: str) -> Column:
    """Share of tokens that are function words of ``lang`` (4 dp)."""
    toks = words_col(text)
    markers = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))
    return F.round(hits / F.greatest(F.size(toks), F.lit(1)), 4)


def lang_id_col(text: Column) -> Column:
    """argmax over language scores; ties broken by language-code order;
    'unknown' when no marker hits at all."""
    scores = [(lang, lang_score_col(text, lang)) for lang in sorted(LANG_MARKERS)]
    best = F.greatest(*[s for _, s in scores])
    pred = F.lit("unknown")
    # build reverse WHEN chain so the FIRST lang in sorted order wins ties
    for lang, s in reversed(scores):
        pred = F.when((s == best) & (best > 0), F.lit(lang)).otherwise(pred)
    return pred


def language_id(documents: DataFrame) -> DataFrame:
    """Predicted language per doc + agreement with the ground-truth lang
    column, aggregated per (lang, predicted).

    Flat formulation: one token explode, all per-language marker hits in a
    single hash aggregate (``isin`` over each small marker set compiles to
    an InSet — whole-stage codegen; the ``F.filter`` array lambda in
    lang_score_col evaluates interpreted per token × per language). Same
    scores/argmax as lang_id_col; the t5 oracle locks it."""
    langs = sorted(LANG_MARKERS)
    ex = documents.select(
        "doc_id", F.explode(words_col(F.col("text"))).alias("w")
    )
    hits = ex.groupBy("doc_id").agg(
        F.count("*").alias("n_tok"),
        *[
            F.sum(
                F.when(F.col("w").isin(*LANG_MARKERS[lang]), 1).otherwise(0)
            ).alias(f"hits_{lang}")
            for lang in langs
        ],
    )
    # empty-token docs drop out of the explode → left join back, zero hits
    base = documents.select("doc_id", "lang").join(hits, "doc_id", "left")
    safe_tok = F.greatest(F.coalesce(F.col("n_tok"), F.lit(0)), F.lit(1))
    scored = base.select(
        "doc_id",
        "lang",
        *[
            F.round(
                F.coalesce(F.col(f"hits_{lang}"), F.lit(0)) / safe_tok, 4
            ).alias(f"s_{lang}")
            for lang in langs
        ],
    )
    best = F.greatest(*[F.col(f"s_{lang}") for lang in langs])
    pred = F.lit("unknown")
    for lang in reversed(langs):  # first lang in sorted order wins ties
        pred = F.when((F.col(f"s_{lang}") == best) & (best > 0), F.lit(lang)).otherwise(pred)
    return (
        scored.select("lang", pred.alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count("*").alias("cnt"))
        .orderBy("lang", "predicted")
    )


def quality_scores(documents: DataFrame) -> DataFrame:
    """Per-document quality heuristics (length/punct/stopword ratios)."""
    cols = quality_score_cols(F.col("text"))
    return documents.select(
        "doc_id", *[c.alias(name) for name, c in cols.items()]
    )


def quality_filter(
    documents: DataFrame,
    min_alpha_ratio: float = 0.81,
    min_tokens: int = 15,
) -> DataFrame:
    """The quality PURGE (companion to the t3 report — the operator a
    training-data pipeline actually runs): keep documents whose
    alphabetic-character ratio and token count clear the thresholds.
    Language-agnostic signals only (length/punctuation class); the
    stopword ratio stays a report metric because its list is
    English-biased. Pure scan+filter — pushes to the source, no shuffle.
    Returns (doc_id, lang, n_tokens, alpha_ratio)."""
    alpha = F.length(F.regexp_replace(F.col("text"), r"[^\p{L}]", ""))
    ratio = F.round(
        alpha / F.greatest(F.length("text"), F.lit(1)), 4
    )
    n_tok = token_count_col(F.col("text"))
    return (
        documents.select(
            "doc_id", "lang", n_tok.alias("n_tokens"), ratio.alias("alpha_ratio")
        )
        .filter(
            (F.col("alpha_ratio") >= min_alpha_ratio)
            & (F.col("n_tokens") >= min_tokens)
        )
    )


def quality_summary(documents: DataFrame) -> DataFrame:
    """Corpus-level quality profile per lang. Stopword counting is the flat
    explode+InSet formulation (see language_id) instead of
    quality_score_cols' interpreted array filter; scalar ratios (length /
    alpha) stay plain column expressions."""
    from ..functions.text_funcs import STOPWORDS, token_count_col

    stops = (
        documents.select(
            "doc_id", F.explode(words_col(F.col("text"))).alias("w")
        )
        .filter(F.col("w").isin(*STOPWORDS))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_stop"))
    )
    n_chars = F.length("text")
    alpha = F.length(F.regexp_replace(F.col("text"), r"[^\p{L}]", ""))
    n_tok = token_count_col(F.col("text"))
    base = documents.select(
        "doc_id", "lang",
        n_chars.alias("n_chars"),
        alpha.alias("alpha"),
        n_tok.alias("n_tokens"),
    ).join(stops, "doc_id", "left")
    scored = base.select(
        "lang",
        "n_chars",
        "n_tokens",
        F.round(F.col("alpha") / F.greatest(F.col("n_chars"), F.lit(1)), 4).alias(
            "alpha_ratio"
        ),
        F.round(
            F.coalesce(F.col("n_stop"), F.lit(0))
            / F.greatest(F.col("n_tokens"), F.lit(1)),
            4,
        ).alias("stopword_ratio"),
    )
    return (
        scored.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
            F.round(F.avg("n_tokens"), 2).alias("avg_tokens"),
            F.round(F.avg("alpha_ratio"), 4).alias("avg_alpha_ratio"),
            F.round(F.avg("stopword_ratio"), 4).alias("avg_stopword_ratio"),
        )
        .orderBy("lang")
    )


def token_counts(documents: DataFrame) -> DataFrame:
    """Whitespace + word-regex token counts per doc (BPE-ish proxy: words,
    numbers, and punctuation runs counted separately)."""
    bpe_ish = F.size(
        F.regexp_extract_all(
            F.col("text"), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0)
        )
    )
    return documents.select(
        "doc_id",
        token_count_col(F.col("text")).alias("ws_tokens"),
        bpe_ish.alias("bpe_ish_tokens"),
        F.length("text").alias("n_chars"),
    )


FINGERPRINT_STRIDE = 4


def fingerprints(documents: DataFrame, k: int = 5) -> DataFrame:
    """Winnowing-style document fingerprint: min md5-hash over character
    k-grams sampled every FINGERPRINT_STRIDE positions of the normalized
    text (rolling-hash family; the stride is the cheap cousin of winnowing's
    per-window min — 4× fewer hashes, same near-dup detection power; md5
    bridge keeps the DuckDB oracle exact)."""
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    n = F.length(norm)
    # flat formulation: explode the sampled positions, hash each gram as a
    # plain column, min-aggregate per doc. The array version (transform +
    # array_min) evaluates interpreted per gram — this stays in whole-stage
    # codegen and the shuffle carries only (doc_id, hash). Generate+Project
    # pipeline means the normalized text is NOT duplicated per gram row.
    ex = documents.select(
        "doc_id",
        norm.alias("nt"),
        F.explode(
            F.sequence(
                F.lit(1),
                F.greatest(n - F.lit(k - 1), F.lit(1)),
                F.lit(FINGERPRINT_STRIDE),
            )
        ).alias("i"),
    )
    h = ex.select(
        "doc_id", md5_long(F.col("nt").substr(F.col("i"), F.lit(k))).alias("h")
    )
    return h.groupBy("doc_id").agg(F.min("h").alias("fingerprint"))


def doc_profile(documents: DataFrame) -> DataFrame:
    """Flagship rollup: per (lang, source) doc counts + char/token stats."""
    return (
        documents.groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
            F.round(F.avg(token_count_col(F.col("text"))), 2).alias("avg_tokens"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("lang", "source")
    )
