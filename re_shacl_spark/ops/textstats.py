"""Text-analysis operators for training-data pipelines, over the ``documents``
table (doc_id, text, lang, source, n_chars).

Everything is built-in pyspark.sql.functions — JVM-side, whole-stage codegen,
no Python in the hot path.  Hashes are md5-derived (hex → bigint) so the DuckDB
oracle reproduces values bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny deterministic stopword profiles for heuristic language ID
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu"],
    "es": ["el", "la", "de", "que", "y", "en", "un"],
    "fr": ["le", "la", "de", "et", "un", "est", "que"],
}

TOKEN_SPLIT = r"\s+"
# BPE-ish word/number/punct segmentation for token counting
BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace + BPE-ish token counts per document."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    return df.select(
        "doc_id",
        F.size(F.split(F.trim(t), TOKEN_SPLIT)).alias("ws_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(BPE_ISH), 0)).alias("bpe_tokens"),
        F.length(t).alias("chars"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic quality heuristics: length, mean word length, punctuation
    ratio, stopword ratio (en profile), uppercase ratio.  All column algebra."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    words = F.split(F.trim(t), TOKEN_SPLIT)
    n_words = F.size(words)
    n_chars = F.length(t)
    stop_arr = F.array(*[F.lit(w) for w in LANG_PROFILES["en"]])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, F.lower(w))))
    n_punct = F.size(F.regexp_extract_all(t, F.lit(r"[^\w\s]"), 0))
    n_upper = F.size(F.regexp_extract_all(t, F.lit(r"[A-Z]"), 0))
    mean_wlen = F.when(n_words > 0, (n_chars - n_words + 1) / n_words).otherwise(F.lit(0.0))
    score = (
        F.when((n_words >= 10) & (n_words <= 100000), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when((mean_wlen >= 3) & (mean_wlen <= 12), F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when(n_words > 0, F.least(F.lit(0.2), 2.0 * n_stop / n_words)).otherwise(F.lit(0.0))
        + F.when(
            (n_chars > 0) & (n_punct / n_chars < 0.2), F.lit(0.2)
        ).otherwise(F.lit(0.0))
    )
    return df.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(mean_wlen, 4).alias("mean_word_len"),
        n_stop.alias("n_stopwords"),
        n_punct.alias("n_punct"),
        n_upper.alias("n_upper"),
        F.round(score, 4).alias("quality"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: per-language stopword hit counts, argmax with
    deterministic tiebreak (lexicographic language code)."""
    t = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    words = F.split(F.trim(t), TOKEN_SPLIT)
    scores = []
    for lang in sorted(LANG_PROFILES):
        arr = F.array(*[F.lit(w) for w in LANG_PROFILES[lang]])
        scores.append(
            F.struct(
                F.size(F.filter(words, lambda w: F.array_contains(arr, w))).alias("hits"),
                # negate code point order inside the struct-max trick: max picks
                # highest hits, then LOWEST lang code — emulate with reverse sort
                F.lit(lang).alias("lang"),
            )
        )
    # argmax via array_max over structs: struct comparison is field-order, so
    # (hits, lang) max would break ties by HIGHEST lang; sort descending by hits
    # then ascending lang via aggregate
    arr = F.array(*scores)
    best = F.aggregate(
        arr,
        F.struct(F.lit(-1).alias("hits"), F.lit("zz").alias("lang")),
        lambda acc, x: F.when(
            (x["hits"] > acc["hits"]) | ((x["hits"] == acc["hits"]) & (x["lang"] < acc["lang"])),
            x,
        ).otherwise(acc),
    )
    return df.select(
        "doc_id",
        best["lang"].alias("pred_lang"),
        best["hits"].alias("lang_hits"),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of whitespace/case-normalized text, plus a
    64-bit integer form (first 15 hex digits) for compact joins.  Byte-stable
    and DuckDB-reproducible."""
    norm = F.regexp_replace(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+", " ")
    h = F.md5(norm)
    return df.select(
        "doc_id",
        h.alias("fp_md5"),
        F.conv(F.substring(h, 1, 15), 16, 10).cast("long").alias("fp64"),
    )
