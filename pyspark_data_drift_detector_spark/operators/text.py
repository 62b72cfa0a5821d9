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


def normalize_text_expr(text: Column) -> Column:
    """Canonical text form for normalization-insensitive matching:
    lowercase, punctuation/symbols → space, whitespace runs collapsed,
    trimmed. The standard pre-step before exact dedup so that
    case/punctuation/spacing variants of one document collapse to one
    content key (raw-byte md5 treats them as distinct). ASCII character
    classes only — the patterns replay identically in RE2 (the DuckDB
    oracle) and Java regex.

    Pure narrow map (three regexp_replace + lower + trim): parallelizes
    with the scan, ships nothing.
    """
    lowered = F.lower(text)
    no_punct = F.regexp_replace(lowered, "[^a-z0-9\\s]", " ")
    collapsed = F.regexp_replace(no_punct, "\\s+", " ")
    return F.trim(collapsed)


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


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Split documents into fixed-token-window chunks with overlap — the
    standard pre-tokenization step that turns variable-length documents
    into training-sequence-sized pieces (stride < chunk_size gives
    ``chunk_size − stride`` tokens of overlap between consecutive chunks).

    Chunk ``i`` covers tokens ``[i·stride, i·stride + chunk_size)`` of the
    single-space token array; the last chunk may be short, and a document
    shorter than ``chunk_size`` yields exactly one chunk. Output:
    ``(doc_id, chunk_id, n_chunk_tokens, chunk_text)``.

    Plan: a narrow fan-out map (sequence + posexplode inside the row) —
    no shuffle; output rows ≈ input tokens / stride. Small inputs are
    round-robin fanned out first so the explosion parallelizes
    (``ensure_min_partitions`` is a no-op at scale). Integer-only chunk
    arithmetic replays exactly in the SQL oracle.
    """
    if stride <= 0 or chunk_size <= 0:
        raise ValueError("chunk_size and stride must be positive")
    from pyspark_data_drift_detector_spark.operators.parallelism import (
        ensure_min_partitions,
    )

    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    # ceil((n - chunk_size) / stride) + 1, in integer arithmetic
    n_chunks = F.when(n <= chunk_size, F.lit(1)).otherwise(
        F.floor((n - chunk_size + stride - 1) / F.lit(stride)).cast("int") + 1
    )
    base = ensure_min_partitions(df).select(
        F.col(id_col), toks.alias("__toks"), n_chunks.alias("__nc")
    )
    exploded = base.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.col("__nc") - 1)).alias("chunk_id"),
        F.col("__toks"),
    )
    chunk = F.slice(F.col("__toks"), F.col("chunk_id") * stride + 1, chunk_size)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def text_quality_drift(
    df_ref: DataFrame,
    df_curr: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rel_threshold: float = 0.1,
    js_threshold: float = 0.1,
) -> DataFrame:
    """Corpus-level text-quality drift between two document snapshots —
    the training-data-pipeline face of the drift engine (a crawler or
    filter change shows up as shifted token counts, quality scores, or
    language mix long before model metrics move).

    One row out: mean token-count / quality-score relative shifts and the
    Jensen-Shannon distance between detected-language distributions. The
    per-document stats come from ``text_stats``/``language_id`` (pure
    expressions, narrow maps), so the whole thing is two scans and two
    O(1)/O(languages) aggregates — and the math replays in SQL.
    """
    sides = []
    for tag, df in (("r", df_ref), ("c", df_curr)):
        stats = text_stats(df, text_col, id_col).select("n_tokens", "quality_score")
        lang = language_id(df, text_col, id_col).select("detected_lang")
        sides.append(
            (
                stats.select(F.lit(tag).alias("__side"), "n_tokens", "quality_score"),
                lang.select(F.lit(tag).alias("__side"), "detected_lang"),
            )
        )
    tagged_stats = sides[0][0].unionByName(sides[1][0])
    tagged_lang = sides[0][1].unionByName(sides[1][1])

    r = F.col("__side") == "r"
    agg = tagged_stats.agg(
        F.sum(r.cast("long")).alias("ref_n"),
        F.sum((~r).cast("long")).alias("curr_n"),
        F.avg(F.when(r, F.col("n_tokens"))).alias("ref_mean_tokens"),
        F.avg(F.when(~r, F.col("n_tokens"))).alias("curr_mean_tokens"),
        F.avg(F.when(r, F.col("quality_score"))).alias("ref_mean_quality"),
        F.avg(F.when(~r, F.col("quality_score"))).alias("curr_mean_quality"),
    )

    lang_cells = tagged_lang.groupBy("detected_lang").agg(
        F.sum(r.cast("long")).alias("rc"), F.sum((~r).cast("long")).alias("cc")
    )
    # O(languages) rows — totals via the same groupBy+broadcast discipline
    # as everywhere else
    totals = lang_cells.agg(F.sum("rc").alias("tr"), F.sum("cc").alias("tc"))
    cells = lang_cells.crossJoin(F.broadcast(totals))
    pp = F.col("rc") / F.greatest(F.col("tr"), F.lit(1))
    qq = F.col("cc") / F.greatest(F.col("tc"), F.lit(1))
    m = (pp + qq) / 2
    kl_p = F.when((pp > 0) & (m > 0), pp * F.log2(pp / m)).otherwise(F.lit(0.0))
    kl_q = F.when((qq > 0) & (m > 0), qq * F.log2(qq / m)).otherwise(F.lit(0.0))
    lang_js = cells.agg(
        F.sqrt(F.greatest(F.lit(0.0), (F.sum(kl_p) + F.sum(kl_q)) / 2)).alias("lang_js")
    )

    out = agg.crossJoin(lang_js)

    def rel(a, b):
        return F.when(a != 0, F.abs((b - a) / a)).otherwise(
            F.when(b != 0, F.lit(1.0)).otherwise(F.lit(0.0))
        )

    tok_shift = rel(F.col("ref_mean_tokens"), F.col("curr_mean_tokens"))
    q_shift = rel(F.col("ref_mean_quality"), F.col("curr_mean_quality"))
    tok_flag = tok_shift > rel_threshold
    q_flag = q_shift > rel_threshold
    js_flag = F.col("lang_js") > js_threshold
    return out.select(
        F.col("ref_n").cast("long").alias("ref_n"),
        F.col("curr_n").cast("long").alias("curr_n"),
        "ref_mean_tokens",
        "curr_mean_tokens",
        tok_shift.alias("token_shift"),
        "ref_mean_quality",
        "curr_mean_quality",
        q_shift.alias("quality_shift"),
        "lang_js",
        (tok_flag | q_flag | js_flag).alias("drift_detected"),
        F.array_compact(
            F.array(
                F.when(tok_flag, F.lit("token_count_shift")),
                F.when(q_flag, F.lit("quality_score_shift")),
                F.when(js_flag, F.lit("language_mix_shift")),
            )
        ).alias("drift_causes"),
    )


#: PII patterns shared by the scrubber and its tests. Kept to syntax both
#: Java regex (Spark executors) and RE2 (the DuckDB oracle) interpret
#: identically: character classes, bounded repetition, \b word boundaries —
#: no lookarounds, no backreferences.
PII_PATTERNS: dict[str, str] = {
    # order is semantic: specific before general — an SSN or IPv4 would
    # otherwise be consumed by the broader phone pattern
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "phone": r"\+?[0-9][0-9()\- ]{7,14}[0-9]",
}


def pii_scrub(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Redact PII spans and count them, one narrow map — no shuffle.

    Each pattern class is counted (``n_<class>``) with
    ``regexp_count`` and then replaced by ``[<CLASS>]`` in order of
    ``patterns`` (email before phone by default, so a digit-bearing email
    local-part is consumed as an email, not a phone). Counting happens on
    the PRE-redaction text per class applied sequentially — the count of
    class k is measured after classes 1..k-1 were already redacted, so a
    span never double-counts across classes.

    Training-pipeline shape: a pure projection over the corpus — the plan
    stays a single whole-stage-codegen map over the scan, pushdown and
    pruning intact. Output: ``id_col``, ``scrubbed`` (redacted text),
    ``n_<class>`` per pattern, ``n_pii_total``.
    """
    pats = patterns if patterns is not None else PII_PATTERNS
    if not pats:
        raise ValueError("no patterns")
    cur = F.col(text_col)
    out_cols = [F.col(id_col)]
    counts = []
    for name, rex in pats.items():
        counts.append(F.regexp_count(cur, F.lit(rex)).alias(f"n_{name}"))
        cur = F.regexp_replace(cur, rex, f"[{name.upper()}]")
    total = None
    for c in [F.col(f"n_{n}") for n in pats]:
        total = c if total is None else total + c
    return df.select(
        *out_cols, *counts, cur.alias("scrubbed")
    ).withColumn("n_pii_total", total.cast("long"))


_FORMAT_LADDER: list[tuple[str, str]] = [
    # first-match-wins; ASCII classes only so Java regex and RE2 (the
    # DuckDB oracle) agree — the normalize_text_expr convention
    ("integer", r"^[+-]?[0-9]+$"),
    ("decimal", r"^[+-]?[0-9]+\.[0-9]+$"),
    ("date", r"^[0-9]{4}-[0-9]{2}-[0-9]{2}$"),
    ("datetime",
     r"^[0-9]{4}-[0-9]{2}-[0-9]{2}[ T][0-9]{2}:[0-9]{2}(:[0-9]{2})?$"),
    ("uuid",
     r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-"
     r"[0-9a-fA-F]{12}$"),
    ("email", r"^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$"),
    ("url", r"^https?://[^\s]+$"),
    ("tagged_id", r"^[A-Za-z]+#[0-9]+$"),
]


def format_profile(
    df: DataFrame,
    columns: list[str],
) -> DataFrame:
    """Semantic FORMAT profile of string columns: classify every value
    against a fixed first-match regex ladder (integer / decimal / date /
    datetime / uuid / email / url / tagged-id / empty / other) and
    report per-(column, format) counts and shares. The companion to
    ``infer_column_types``: where inference names the column's dominant
    type, this shows the full mixture — the 0.1% of malformed dates in
    an otherwise clean column is exactly what a format-drift alarm
    needs and what a dominant-type label hides.

    NULLs report as the ``null`` class (completeness lives here too, so
    shares sum to 1 per column over ALL rows). One scan, one melted
    ``groupBy(column, format)``; shares from a SUM window over the
    O(columns x formats) panel.
    """
    from pyspark_data_drift_detector_spark.functions.quoting import (
        ensure_safe_columns,
    )

    if not columns:
        raise ValueError("columns must be non-empty")
    ensure_safe_columns(columns)
    stacks = ", ".join(
        f"'{c}', CAST(`{c}` AS STRING)" for c in columns
    )
    melted = df.selectExpr(
        f"stack({len(columns)}, {stacks}) AS (column_name, v)"
    )
    # Column-API rlike, NOT an embedded SQL string: selectExpr would
    # re-parse the pattern as a SQL string literal and STRIP the regex
    # backslashes ('\\.' -> any char, '[^\\s]' -> "not the letter s") —
    # silently corrupting the decimal/email/url classes
    v = F.col("v")
    classify = F.when(v.isNull(), "null").when(F.trim(v) == "", "empty")
    for name, pat in _FORMAT_LADDER:
        classify = classify.when(v.rlike(pat), name)
    classify = classify.otherwise("other")
    return (
        melted.select("column_name", classify.alias("format"))
        .groupBy("column_name", "format")
        .agg(F.expr("CAST(count(1) AS BIGINT) AS n"))
        # O(columns x formats) panel — the total window is bounded
        .selectExpr(
            "*",
            "n / CAST(sum(n) OVER (PARTITION BY column_name) AS DOUBLE)"
            " AS share",
        )
    )


def format_state(df: DataFrame, columns: list[str]) -> DataFrame:
    """Additive per-(column, format) counts for one ingest batch — the
    format member of the vet-the-increment state tables
    (``token_share_state`` convention): long rows that SUM across
    appends, so the corpus-so-far format mixture never re-reads prior
    batches."""
    return format_profile(df, columns).select("column_name", "format", "n")


def format_drift_incremental(
    new_df: DataFrame,
    state: DataFrame,
    columns: list[str],
    threshold: float = 0.02,
) -> DataFrame:
    """Does THIS ingest batch's format mixture match the corpus-so-far
    mixture? The data-quality tripwire for continuous ingestion — an
    upstream producer switching date formats, or a parser starting to
    emit empty strings, rotates the batch mixture immediately. Batch
    shares compare against the rolled-up :func:`format_state`; prior
    batches are never re-read.

    Output per (column, format): ``ref_n, curr_n, ref_share,
    curr_share, share_abs_diff, drift_detected`` (flag on the
    5-decimal-rounded diff). Formats seen on only one side align via a
    full-outer join (keys are never NULL — ``'null'`` is itself a
    class). Raises on an empty state.
    """
    # persisted BEFORE the guard (the logprob_incremental convention):
    # isEmpty and the join below otherwise each re-instantiate the state
    # rollup. O(columns × formats) rows.
    prior = state.groupBy("column_name", "format").agg(
        F.expr("CAST(sum(n) AS BIGINT) AS ref_n")
    ).persist()
    if prior.isEmpty():
        raise ValueError(
            "format state is empty — append at least one batch of"
            " format_state before vetting an increment against it"
        )
    batch = format_state(new_df, columns).selectExpr(
        "column_name", "format", "n AS curr_n"
    )
    counts = (
        prior.join(batch, ["column_name", "format"], "full_outer")
        .selectExpr(
            "column_name",
            "format",
            "coalesce(ref_n, 0L) AS ref_n",
            "coalesce(curr_n, 0L) AS curr_n",
        )
    )
    # O(columns x formats) panel: the per-column total windows are bounded
    return counts.selectExpr(
        "*",
        "ref_n / CAST(nullif(sum(ref_n) OVER (PARTITION BY column_name),"
        " 0) AS DOUBLE) AS ref_share",
        "curr_n / CAST(nullif(sum(curr_n) OVER (PARTITION BY"
        " column_name), 0) AS DOUBLE) AS curr_share",
    ).selectExpr(
        "*",
        "round(abs(coalesce(curr_share, 0.0D) - coalesce(ref_share,"
        f" 0.0D)), 5) AS share_abs_diff",
    ).selectExpr(
        "*",
        f"share_abs_diff > {float(threshold)!r}D AS drift_detected",
    )


def pack_documents(
    df: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_col: str | None = None,
    num_buckets: int = 32,
    group_col: str | None = None,
) -> DataFrame:
    """Deterministic sequence packing for training-data prep: assign each
    document to a fixed-token-budget pack (context window) by contiguous
    fill in ``id_col`` order — ``pack_id = exclusive_prefix_tokens DIV
    budget``. The assignment is a pure function of the data (stable
    across partitioning, layout, and re-runs), so packs are reproducible
    and append-only corpora extend their last pack instead of reshuffling
    everything.

    Semantics: a document whose tokens straddle a boundary stays WHOLE in
    the pack where it starts (packs can overfill by at most one document;
    ``packing_stats`` reports the fill ratios). Pass a precomputed
    ``token_col`` to pack by a real tokenizer's counts; default is the
    engine's whitespace token count (``text_stats`` convention). For a
    shuffled or curriculum order, pre-compute the order into ``id_col``
    (e.g. a hash for shuffled packing).

    Scale shape: the global running sum is the distributed two-phase
    prefix sum (``cumulative.bucketed_cumsum``): equi-depth id-range
    buckets × broadcast offsets — parallelism ``num_buckets``, no task
    ever sorts the whole corpus, and the integer sums are bit-exact (the
    oracle replays a plain window cumsum). One scan, one groupBy-free
    pass over O(docs) rows.

    ``group_col`` packs WITHIN each group instead (pack_id restarts per
    group — the shard-per-source layout pretraining runs actually
    write, so one pack never mixes sources); the group key rides the
    prefix sum's key slot, so parallelism becomes groups × buckets. The
    group is restored in the output AS A STRING (NULL groups pack
    together via an internal sentinel — a real group literally named
    ``'__null__'`` would collide with it).
    """
    from pyspark_data_drift_detector_spark.functions.quoting import (
        ensure_safe_columns,
    )
    from pyspark_data_drift_detector_spark.operators.cumulative import (
        bucketed_cumsum,
    )

    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    ensure_safe_columns(
        [id_col, token_col or text_col]
        + ([group_col] if group_col else [])
    )
    if token_col is not None:
        toks = F.col(token_col).cast("long")
    else:
        toks = F.size(tokens_expr(F.col(text_col))).cast("long")
    key_expr = (
        F.coalesce(F.col(group_col).cast("string"), F.lit("__null__"))
        if group_col
        else F.lit("all")
    )
    docs = df.select(
        key_expr.alias("__corpus"),
        F.col(id_col).alias("doc_id"),
        toks.alias("n_tokens"),
    )
    cum = bucketed_cumsum(
        docs.select("__corpus", "doc_id", "n_tokens"),
        key="__corpus", order="doc_id", counts=["n_tokens"],
        num_buckets=num_buckets,
    )
    out = cum.selectExpr(
        "__corpus",
        "doc_id",
        "n_tokens",
        f"(cum_n_tokens - n_tokens) DIV {int(budget)} AS pack_id",
    )
    if group_col:
        # restore the group (incl. NULL) from the sentinel-coalesced key
        return out.selectExpr(
            f"CASE WHEN __corpus = '__null__' THEN NULL ELSE __corpus END"
            f" AS `{group_col}`",
            "doc_id",
            "n_tokens",
            "pack_id",
        )
    return out.drop("__corpus")


def packing_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Per-pack fill panel over :func:`pack_documents` output: ``pack_id,
    n_docs, pack_tokens, fill_ratio, overflowed`` — the padding-waste /
    boundary-straddle report a packing run is judged by. One tiny keyed
    groupBy (O(packs) rows)."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    return (
        packed.groupBy("pack_id")
        .agg(
            F.expr("count(1) AS n_docs"),
            F.expr("CAST(sum(n_tokens) AS BIGINT) AS pack_tokens"),
        )
        .selectExpr(
            "pack_id",
            "n_docs",
            "pack_tokens",
            f"CAST(pack_tokens AS DOUBLE) / {int(budget)} AS fill_ratio",
            f"pack_tokens > {int(budget)} AS overflowed",
        )
    )
