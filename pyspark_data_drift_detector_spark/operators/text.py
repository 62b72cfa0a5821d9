"""Text analysis operators for large-scale training-data pipelines.

Beyond the reference's surface (BASELINE.json north star): language ID,
quality scoring, token counting, and document fingerprinting over a text
column. Everything is built-in ``pyspark.sql.functions`` expressions —
JVM-side, whole-stage-codegen'd, no Python in the hot path — so each
operator is a narrow map over the corpus (no shuffle at all except where a
groupBy is the point).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword-hit heuristic.
# Deliberately small + disjoint-ish so the same lists embed in the DuckDB
# oracle SQL verbatim.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "is", "in"],
    "de": ["der", "die", "das", "und", "ist", "nicht"],
    "es": ["el", "los", "las", "una", "es", "y"],
    "fr": ["le", "les", "des", "est", "et", "dans"],
}

PUNCT_CLASS = "[.,!?;:]"
# BPE-ish pre-tokenization: letter runs, digit runs, single other symbols
BPE_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def tokens_expr(text: Column) -> Column:
    """Whitespace tokens of trimmed text (empty text → single empty token)."""
    return F.split(F.trim(text), "\\s+")


def text_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document quality statistics + a composite quality score.

    All expressions are deterministic and mirrored 1:1 in the DuckDB oracle:
    token count (whitespace), BPE-ish token count, char count, avg word
    length, punctuation ratio, stopword ratio (English list), and
    ``quality_score = 0.4·min(1, n_tokens/50) + 0.3·word_len_band +
    0.3·min(1, stopword_ratio·5)``.
    """
    text = F.col(text_col)
    toks = tokens_expr(text)
    n_tokens = F.size(toks)
    n_chars = F.length(text)
    non_space = F.length(F.regexp_replace(text, "\\s", ""))
    avg_word_len = non_space / F.greatest(n_tokens, F.lit(1))
    punct = F.length(text) - F.length(F.regexp_replace(text, PUNCT_CLASS, ""))
    punct_ratio = punct / F.greatest(n_chars, F.lit(1))
    stop_arr = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
    stop_hits = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    stopword_ratio = stop_hits / F.greatest(n_tokens, F.lit(1))
    bpe_tokens = F.size(F.regexp_extract_all(text, F.lit(BPE_PATTERN), F.lit(0)))

    length_score = F.least(F.lit(1.0), n_tokens / F.lit(50.0))
    word_len_score = F.when((avg_word_len >= 3) & (avg_word_len <= 8), 1.0).otherwise(0.5)
    stop_score = F.least(F.lit(1.0), stopword_ratio * 5)
    quality = 0.4 * length_score + 0.3 * word_len_score + 0.3 * stop_score

    return df.select(
        F.col(id_col),
        n_tokens.cast("long").alias("n_tokens"),
        bpe_tokens.cast("long").alias("n_bpe_tokens"),
        n_chars.cast("long").alias("n_chars"),
        avg_word_len.alias("avg_word_len"),
        punct_ratio.alias("punct_ratio"),
        stopword_ratio.alias("stopword_ratio"),
        quality.alias("quality_score"),
    )


def language_id(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Stopword-hit language detection.

    Per language: count tokens in its stopword list; detected language is
    the max-hit language (tie → lexicographically first), 'unknown' if no
    list scores a hit. Fully expression-based; scales as a narrow map.
    """
    toks = tokens_expr(F.col(text_col))

    def _in(arr):
        return lambda t: F.array_contains(arr, t)

    hits = {}
    for lang, words in LANG_STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in words])
        hits[lang] = F.size(F.filter(toks, _in(arr)))
    out = df.select(F.col(id_col), *[h.alias(f"hits_{lang}") for lang, h in hits.items()])
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in LANG_STOPWORDS])
    detected = F.lit("unknown")
    # iterate reversed-sorted so earlier languages win ties
    for lang in sorted(LANG_STOPWORDS, reverse=True):
        detected = F.when(
            (F.col(f"hits_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(detected)
    return out.withColumn("detected_lang", detected)


def fingerprint(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Normalization fingerprint: md5 of lowercase, whitespace-collapsed text."""
    normalized = F.regexp_replace(F.lower(F.trim(F.col(text_col))), "\\s+", " ")
    return df.select(
        F.col(id_col),
        F.md5(normalized).alias("fingerprint"),
    )
