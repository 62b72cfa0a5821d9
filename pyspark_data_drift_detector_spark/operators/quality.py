"""Corpus-hygiene operators for training-data pipelines.

Three n-gram families a large-scale LLM data pipeline runs between raw
ingest and training (beyond the per-document quality score in
``operators/text.py``):

- ``repetition_stats`` — per-document repetition diagnostics in the
  style of the Gopher quality rules (Rae et al. 2021 §A1.1): fraction of
  characters covered by the most frequent word n-gram, duplicate-word
  fraction, and a combined ``repetitive`` flag. Degenerate, loop-generated
  or boilerplate-stuffed documents score high and get filtered before
  tokenization.
- ``boilerplate_ngrams`` — corpus-level inversion of the same signal
  (C4-style, Raffel et al. 2020 §2.2): n-grams occurring in many distinct
  documents are navigation chrome / license headers / templates, and the
  resulting list drives line- or span-level stripping.
- ``decontaminate`` — benchmark decontamination: flag documents sharing
  any word n-gram with an evaluation set (the standard n-gram-overlap
  test-set leak check, e.g. GPT-3 appendix C).

All three are pure DataFrame algebra — no Python UDFs.

Scale notes (100 TB corpus):
- ``repetition_stats`` is a pure narrow map: even the per-doc top n-gram
  is computed inside the row (sort + run-length fold), so it shuffles
  nothing and scales exactly like the scan.
- The corpus-level operators explode ~tokens-per-doc rows per document;
  the follow-up ``groupBy`` keys are (doc_id, gram) or (gram) — both
  high-cardinality, well-distributed, and partially aggregated map-side.
- ``decontaminate`` joins against the benchmark's DISTINCT n-gram set,
  which is tiny relative to the corpus (benchmarks are MBs, corpora TBs)
  — always broadcast; the corpus side never shuffles.
- ``boilerplate_ngrams`` pre-aggregates per document (array_distinct
  inside the row) before the global count, so a document repeating one
  n-gram a million times still contributes 1 to its document frequency
  without a skewed shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyspark_data_drift_detector_spark.operators.parallelism import (
    ensure_min_partitions,
)

# cov = occurrences × chars fits well under this for any real document
# chunk (docs are pre-split upstream); packing (count, cov) into one long
# makes "max by count, tie-break by coverage" a single MAX in any engine.
_COV_PACK = 1_000_000


def _space_tokens(text: Column) -> Column:
    """Plain single-space tokenization (DuckDB ``string_split`` parity)."""
    return F.split(text, " ")


def ngrams_expr(text: Column, n: int) -> Column:
    """All word n-grams of ``text`` in order, repeats kept (unlike
    ``dedup.shingles_expr`` which deduplicates for set semantics)."""
    toks = _space_tokens(text)
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1)))
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))


def _top_gram_packed(grams: Column) -> Column:
    """``max(count·10⁶ + count·chars)`` over a document's gram multiset,
    computed INSIDE the row: sort the gram array, then a run-length fold
    (``F.aggregate`` — a Tungsten-codegen'd loop) tracks the current run
    and the best packed (count, coverage) seen. Identical algebra to a
    groupBy(doc, gram) count + max, with zero shuffles — the whole
    statistic is a narrow map, so it parallelizes with the scan and ships
    nothing. O(m log m) per row for the sort, m = grams per document."""
    sorted_g = F.array_sort(grams)
    init = F.struct(
        # prev's init value is irrelevant: run=0 makes the first element
        # start a fresh run even on a false match
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def merge(acc: Column, x: Column) -> Column:
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        packed = run * _COV_PACK + run * F.length(x)
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], packed).alias("best"),
        )

    return F.aggregate(sorted_g, init, merge, lambda acc: acc["best"])


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram_sizes: tuple[int, ...] = (2, 3),
    top_frac_thresholds: dict[int, float] | None = None,
    min_distinct_ratio: float = 0.35,
) -> DataFrame:
    """Per-document repetition diagnostics (Gopher-style quality rules).

    Output per document: ``n_tokens``, ``distinct_ratio`` (distinct words /
    words), ``dup_word_frac`` (1 − distinct_ratio), and per requested n a
    ``top_{n}gram_count`` / ``top_{n}gram_char_frac`` pair — the occurrence
    count of the document's most frequent n-gram and the fraction of the
    document's characters covered by its repetitions (count × n-gram chars
    / doc chars). Ties on count break toward larger coverage, so the
    result is deterministic. ``repetitive`` flags documents whose top
    n-gram coverage exceeds the per-n threshold (default 0.12 for n=2,
    0.18 for n=3 — between the corpus p90 and p99 on the fixtures) or
    whose distinct-word ratio falls below ``min_distinct_ratio``.

    Plan: a pure narrow map — every statistic, including the per-n top
    gram, is computed inside the row (``_top_gram_packed``: sort + run-
    length fold over the gram array). Zero shuffles, zero joins; the
    operator scales exactly like the scan that feeds it.
    """
    thresholds = {2: 0.12, 3: 0.18}
    if top_frac_thresholds:
        thresholds.update(top_frac_thresholds)

    text = F.col(text_col)
    toks = _space_tokens(text)
    # the run-length folds do ~n·tokens-per-doc work per row; parallelism is
    # the input split count — fan a small input out first (no-op at scale)
    base = ensure_min_partitions(df).select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        (F.size(F.array_distinct(toks)) / F.size(toks)).alias("distinct_ratio"),
        F.length(text).alias("__n_chars"),
        *[
            _top_gram_packed(ngrams_expr(text, n)).alias(f"__top{n}")
            for n in ngram_sizes
        ],
    )

    cols = [
        F.col(id_col),
        "n_tokens",
        "distinct_ratio",
        (F.lit(1.0) - F.col("distinct_ratio")).alias("dup_word_frac"),
    ]
    flag = F.col("distinct_ratio") < F.lit(min_distinct_ratio)
    for n in ngram_sizes:
        # unpack (count, coverage): max() picked highest count, ties broken
        # by coverage — replayable as the same MAX in SQL
        count_n = (F.col(f"__top{n}") / _COV_PACK).cast("long")
        frac_n = (F.col(f"__top{n}") % _COV_PACK) / F.col("__n_chars")
        cols += [
            count_n.alias(f"top_{n}gram_count"),
            frac_n.alias(f"top_{n}gram_char_frac"),
        ]
        # a gram must actually repeat to count as repetition — otherwise
        # short documents trip the char-frac rule on a single occurrence
        flag = flag | ((count_n >= 2) & (frac_n > F.lit(thresholds.get(n, 0.2))))
    return base.select(*cols, flag.alias("repetitive"))


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    min_avg_word_len: float = 2.0,
    max_avg_word_len: float = 12.0,
    min_distinct_ratio: float = 0.2,
    min_stopword_ratio: float = 0.01,
) -> DataFrame:
    """C4/Gopher-style composite quality gate: the actual keep/drop
    decision a pipeline applies before tokenization (Raffel et al. 2020
    §2.2; Rae et al. 2021 §A1.1), as opposed to the diagnostics in
    ``repetition_stats``/``text.text_stats``.

    Rules (each failure appends a reason): token count within
    ``[min_tokens, max_tokens]``; mean word length within
    ``[min_avg_word_len, max_avg_word_len]``; distinct-word ratio ≥
    ``min_distinct_ratio``; English stopword ratio ≥
    ``min_stopword_ratio`` (the C4 "has real prose" proxy). Output per
    document: the four statistics, ``passes``, and ``fail_reasons``.

    Plan: a pure narrow map — every statistic is computed inside the row
    from the token array; zero shuffles, scales exactly like the scan.
    All expressions replay 1:1 in the DuckDB oracle.
    """
    from pyspark_data_drift_detector_spark.operators.text import LANG_STOPWORDS

    text = F.col(text_col)
    toks = _space_tokens(text)
    n_tokens = F.size(toks)
    non_space = F.length(F.regexp_replace(text, " ", ""))
    avg_word_len = non_space / F.greatest(n_tokens, F.lit(1))
    distinct_ratio = F.size(F.array_distinct(toks)) / F.greatest(n_tokens, F.lit(1))
    stop_arr = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
    stop_hits = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    stopword_ratio = stop_hits / F.greatest(n_tokens, F.lit(1))

    base = df.select(
        F.col(id_col),
        n_tokens.cast("long").alias("n_tokens"),
        avg_word_len.alias("avg_word_len"),
        distinct_ratio.alias("distinct_ratio"),
        stopword_ratio.alias("stopword_ratio"),
    )
    reasons = F.array_compact(
        F.array(
            F.when(F.col("n_tokens") < min_tokens, F.lit("too_short")),
            F.when(F.col("n_tokens") > max_tokens, F.lit("too_long")),
            F.when(
                (F.col("avg_word_len") < min_avg_word_len)
                | (F.col("avg_word_len") > max_avg_word_len),
                F.lit("word_length"),
            ),
            F.when(F.col("distinct_ratio") < min_distinct_ratio, F.lit("low_diversity")),
            F.when(F.col("stopword_ratio") < min_stopword_ratio, F.lit("low_stopword")),
        )
    )
    return base.select(
        "*",
        reasons.alias("fail_reasons"),
        (F.size(reasons) == 0).alias("passes"),
    )


def boilerplate_ngrams(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 4,
    min_doc_count: int = 3,
) -> DataFrame:
    """Corpus-level boilerplate detector: n-grams in ≥ ``min_doc_count``
    distinct documents, with document frequency and total occurrences.

    Two-level aggregation: ``groupBy(doc, gram)`` collapses a document's
    repeats first (keys stay high-cardinality and map-side combined), so
    the global ``groupBy(gram)`` receives at most one row per (doc, gram)
    — a document repeating boilerplate a million times contributes one
    row, not a million, to the hot gram's shuffle partition.
    """
    per_doc = (
        ensure_min_partitions(df)
        .select(
            F.col(id_col),
            F.explode(ngrams_expr(F.col(text_col), n)).alias("gram"),
        )
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("occ"))
    )
    return (
        per_doc.groupBy("gram")
        .agg(
            F.count(F.lit(1)).cast("long").alias("doc_count"),
            F.sum("occ").cast("long").alias("total_count"),
        )
        .filter(F.col("doc_count") >= min_doc_count)
    )


def doc_novelty(
    df: DataFrame,
    reference: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_gram_df: int | None = None,
) -> DataFrame:
    """Per-document NOVELTY against a reference corpus: the share of a
    document's DISTINCT word n-grams that the reference has never seen.
    The freshness signal an ingest pipeline tracks per batch — a
    scraper stuck re-crawling old pages shows novelty collapsing to ~0,
    a synthetic-data leak shows it pinned near 1 with repetitive
    internals; :func:`decontaminate`'s complement (overlap with a
    benchmark is bad; overlap with your own corpus is just old news).

    Output: ``id, n_grams`` (distinct), ``unseen_grams``, ``novelty``
    (unseen/distinct; documents with no grams — NULL/empty text — are
    absent, matching the tokenize-explode members). Grams compare as
    xxhash64 keys (the ``_hashed_shingle_index`` argument: counts are
    hash-invariant, the join ships 8-byte longs).

    Scale shape: the reference reduces to its DISTINCT gram-hash set
    (one shuffle, then reusable); the batch explodes to distinct
    (id, gram) pairs and LEFT-JOINs the reference set on the gram key —
    Spark co-partitions both sides; a reference too big to broadcast
    shuffle-joins, never collected. ``max_gram_df``: the boilerplate
    guard — batch grams with document frequency above the cap are
    counted as SEEN without consulting the reference (a gram shared by
    thousands of batch documents is boilerplate, not novelty, and its
    join fan-out is exactly the hot-shingle skew ``minhash_lsh_pairs``
    caps).
    """
    from pyspark_data_drift_detector_spark.operators.parallelism import (
        ensure_min_partitions,
    )

    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    grams = (
        ensure_min_partitions(df)
        .select(
            F.col(id_col).alias("id"),
            F.explode(ngrams_expr(F.col(text_col), n)).alias("g"),
        )
        # trim: a whitespace-only document's tokens concat_ws into a
        # bare-space gram that a <> '' check would keep
        .filter("trim(g) <> ''")
        .select("id", F.xxhash64("g").alias("gh"))
        .distinct()
    )
    ref_set = (
        ensure_min_partitions(reference)
        .select(F.explode(ngrams_expr(F.col(text_col), n)).alias("g"))
        .filter("trim(g) <> ''")
        .select(F.xxhash64("g").alias("gh"))
        .distinct()
        .withColumn("__seen", F.lit(True))
    )
    if max_gram_df is not None:
        hot = (
            grams.groupBy("gh")
            .agg(F.expr("count(1) AS __df"))
            .filter(F.col("__df") > max_gram_df)
            .select("gh")
            .withColumn("__hot", F.lit(True))
        )
        grams = grams.join(F.broadcast(hot), "gh", "left")
    else:
        grams = grams.withColumn("__hot", F.lit(None).cast("boolean"))
    return (
        grams.join(ref_set, "gh", "left")
        .groupBy("id")
        .agg(
            F.expr("CAST(count(1) AS BIGINT) AS n_grams"),
            F.expr(
                "CAST(sum(CASE WHEN __seen IS NULL AND __hot IS NULL"
                " THEN 1 ELSE 0 END) AS BIGINT) AS unseen_grams"
            ),
        )
        .selectExpr(
            f"id AS `{id_col}`",
            "n_grams",
            "unseen_grams",
            "unseen_grams / CAST(n_grams AS DOUBLE) AS novelty",
        )
    )


def decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 4,
) -> DataFrame:
    """Benchmark decontamination: per document, how many distinct word
    n-grams it shares with ``benchmark`` (any overlap ⇒ ``contaminated``).

    ``benchmark`` is a DataFrame with the same ``text_col`` (an eval set's
    prompts/answers). Its distinct n-gram set is small — always broadcast —
    so the corpus side aggregates without shuffling against it. Returns
    only contaminated documents: ``(doc_id, matched_ngrams, contaminated)``.

    Joins on the raw gram string: exact, engine-portable, and the
    broadcast side is bounded by the benchmark size. At extreme benchmark
    sizes swap the key for ``xxhash64(gram)`` (8-byte network cost; the
    plan is unchanged).
    """
    corpus = ensure_min_partitions(df).select(
        F.col(id_col),
        F.explode(F.array_distinct(ngrams_expr(F.col(text_col), n))).alias("gram"),
    )
    bench = benchmark.select(
        F.explode(F.array_distinct(ngrams_expr(F.col(text_col), n))).alias("gram")
    ).distinct()
    return (
        corpus.join(F.broadcast(bench), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("matched_ngrams"))
        .withColumn("contaminated", F.lit(True))
    )


def bloom_decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 4,
    m_bits: int = 1 << 20,
    k_hashes: int = 3,
) -> DataFrame:
    """Benchmark decontamination for benchmark sets too large to
    broadcast as strings: a Bloom filter built FROM the benchmark's
    n-grams prefilters the corpus, and only the surviving candidate
    grams meet the real benchmark set in an equi-join — the result is
    EXACT (false positives die in the confirm join), the win is that the
    expensive corpus-vs-benchmark comparison shrinks to the candidates.

    Stages (all DataFrame ops, nothing collected):

    1. benchmark grams → ``k_hashes`` probe positions each →
       ``groupBy(word) bit_or(mask)`` — the filter is ≤ ``m_bits/64``
       rows (1 MiB of longs for the default 2²⁰ bits) and BROADCASTS
       even when the gram strings would not;
    2. corpus grams probe the broadcast filter (a gram is a candidate
       only if ALL its probe bits are set);
    3. candidates ⋈ benchmark grams (shuffle equi-join, both sides now
       small-to-tiny) → per-document matched counts.

    Probe hashes derive from ``dedup.md5_hash60`` with per-probe salts —
    deterministic on any layout. Output matches ``decontaminate``:
    ``(doc_id, matched_ngrams, contaminated)``, only matched docs.
    """
    if m_bits < 64 or m_bits % 64:
        raise ValueError("m_bits must be a positive multiple of 64")
    if k_hashes < 1:
        raise ValueError("k_hashes must be >= 1")

    def probes_sql() -> str:
        """SQL array of (word, mask) probe structs over the `gram` column
        (md5_hash60-derived positions, per-probe salts)."""
        structs = []
        for i in range(k_hashes):
            h = (
                "(CAST(conv(substring(md5(concat_ws('|', gram, 'bloom"
                f"{i}')), 1, 15), 16, 10) AS BIGINT) % {int(m_bits)})"
            )
            structs.append(
                f"named_struct('word', CAST({h} DIV 64 AS BIGINT),"
                f" 'mask', shiftleft(CAST(1 AS BIGINT), CAST({h} % 64 AS INT)))"
            )
        return "array(" + ", ".join(structs) + ")"

    bench = benchmark.select(
        F.explode(F.array_distinct(ngrams_expr(F.col(text_col), n))).alias("gram")
    ).distinct()
    bloom = (
        bench.selectExpr(f"explode({probes_sql()}) AS p")
        .groupBy(F.col("p.word").alias("word"))
        .agg(F.expr("bit_or(p.mask) AS mask"))
    )

    corpus = ensure_min_partitions(df).select(
        F.col(id_col),
        F.explode(F.array_distinct(ngrams_expr(F.col(text_col), n))).alias("gram"),
    )
    probed = corpus.selectExpr(
        f"`{id_col}`", "gram", f"explode({probes_sql()}) AS p"
    ).join(
        F.broadcast(bloom),
        F.col("p.word") == F.col("word"),
        "left",
    )
    candidates = (
        probed.groupBy(id_col, "gram")
        .agg(
            F.min(
                (F.coalesce(F.col("mask"), F.lit(0)).bitwiseAND(F.col("p.mask"))
                 != 0).cast("int")
            ).alias("__all_hit")
        )
        .filter(F.col("__all_hit") == 1)
        .select(id_col, "gram")
    )
    return (
        candidates.join(bench, "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("matched_ngrams"))
        .withColumn("contaminated", F.lit(True))
    )


def ngram_overlap(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    threshold: float = 0.1,
) -> DataFrame:
    """Fractional benchmark-overlap decontamination (the GPT-3-style
    n-gram contamination measure): per document, the share of its
    DISTINCT word n-grams that appear anywhere in ``benchmark``.

    ``decontaminate`` answers "does the doc share ANY n-gram" (binary,
    inner semi-join, returns only hits); this returns EVERY document with
    its graded ``overlap_ratio`` so a pipeline can rank partial overlaps
    (paraphrased eval items, quoted snippets) instead of dropping on a
    single collision. ``contaminated`` flags ratio ≥ ``threshold``.

    Same scale shape as ``decontaminate``: the benchmark's distinct
    n-gram set broadcasts (eval sets are tiny next to a 100 TB corpus);
    the corpus side is a narrow explode + LEFT broadcast join + one
    groupBy on the doc id — no shuffle carries text, only
    ``(id, gram-hit)`` pairs. At extreme benchmark sizes swap the join
    key for ``xxhash64(gram)`` exactly as documented on
    ``decontaminate``.
    """
    from pyspark_data_drift_detector_spark.functions.quoting import ensure_safe_columns

    ensure_safe_columns([text_col, id_col])
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    corpus = ensure_min_partitions(df).select(
        F.col(id_col),
        F.explode(F.array_distinct(ngrams_expr(F.col(text_col), n))).alias("gram"),
    )
    bench = (
        benchmark.select(
            F.explode(F.array_distinct(ngrams_expr(F.col(text_col), n))).alias("gram")
        )
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    return (
        corpus.join(F.broadcast(bench), "gram", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_ngrams"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("long").alias("n_matched"),
        )
        .selectExpr(
            id_col,
            "n_ngrams",
            "n_matched",
            "n_matched / n_ngrams AS overlap_ratio",
            f"n_matched / n_ngrams >= {float(threshold)!r}D AS contaminated",
        )
    )


def c4_line_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words_per_line: int = 3,
    terminal_punct: str = ".!?\"'",
    drop_markers: tuple[str, ...] = ("lorem ipsum", "javascript", "{"),
) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2): keep only
    lines that (a) have at least ``min_words_per_line`` words, (b) end in
    terminal punctuation, and (c) contain no drop-marker substring
    (boilerplate/code tells), then reassemble the document.

    Pure narrow map over higher-order functions — ``split`` on newlines,
    one ``filter`` lambda, ``array_join`` back — so the corpus is never
    shuffled and the plan is one whole-stage-codegen projection. Output:
    ``id_col, cleaned (kept lines re-joined), n_lines, n_kept,
    kept_ratio``.
    """
    from pyspark_data_drift_detector_spark.functions.quoting import ensure_safe_columns

    ensure_safe_columns([text_col, id_col])
    if min_words_per_line < 1:
        raise ValueError("min_words_per_line must be >= 1")
    lines = F.split(F.col(text_col), "\n")

    def keep(line):
        words_ok = F.size(F.split(F.trim(line), r"\s+")) >= min_words_per_line
        punct_ok = F.substring(F.rtrim(line), -1, 1).isin(*list(terminal_punct))
        marker_hit = None
        for m in drop_markers:
            hit = F.contains(F.lower(line), F.lit(m.lower()))
            marker_hit = hit if marker_hit is None else (marker_hit | hit)
        return words_ok & punct_ok & ~marker_hit

    kept = F.filter(lines, keep)
    return df.select(
        F.col(id_col),
        F.array_join(kept, "\n").alias("cleaned"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        (F.size(kept) / F.greatest(F.size(lines), F.lit(1))).alias("kept_ratio"),
    )


def quality_classifier(
    df: DataFrame,
    weights: list[float],
    bias: float = 0.0,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_family: str = "xxhash",
    max_weights_cells: int = 65_536,
    inline_weights: bool = True,
) -> DataFrame:
    """fastText-style learned quality score: hashed word uni+bigram
    features → dot product with a trained weight vector → sigmoid — the
    CCNet/LLaMA "quality classifier" step (Wenzek et al. 2020 §4.3;
    Joulin et al. 2017), complementing the rule-based
    :func:`quality_filter` and the LM-perplexity scorers in
    ``operators/corpus.py``. Training happens OFFLINE; this operator
    applies the fitted ``(weights, bias)`` at corpus scale.

    Features: lowercase whitespace tokens, word unigrams plus space-joined
    bigrams (one shared hashing space, fastText convention), bucket =
    hash(gram) mod ``len(weights)``. ``hash_family='xxhash'`` (default) is
    the production hash (JVM codegen, no digest); ``'md5'`` is the
    oracle-replayable family (``operators.dedup.md5_hash60`` convention).
    Output per document: ``id_col, n_grams, logit, score, keep``
    (``score >= threshold``); NULL text → NULL score/keep (unknown
    content), empty text → ``sigmoid(bias)``.

    Plan: with ``inline_weights=True`` the weight vector is a plan
    literal (the ``semantic_decontaminate`` inlining pattern) and the
    whole operator is ONE narrow projection — an ``aggregate`` fold over
    the in-row gram array, zero shuffles, scaling exactly like the scan.
    The literal is capped at ``max_weights_cells`` (plan size, codegen
    limits); past the cap a ValueError steers to
    ``inline_weights=False``, which ships the weights as a broadcast
    DataFrame instead: explode grams → broadcast-join buckets →
    re-aggregate per document. That path shuffles only
    ``(doc_id, partial-sum)`` scalars with map-side combine — never the
    corpus text — so it holds at 100 TB for million-bucket vocabularies.
    """
    from pyspark_data_drift_detector_spark.functions.quoting import ensure_safe_columns

    ensure_safe_columns([text_col, id_col])
    if not weights:
        raise ValueError("weights must be a non-empty list of floats")
    if hash_family not in ("xxhash", "md5"):
        raise ValueError(f"hash_family must be 'xxhash' or 'md5', got {hash_family!r}")
    d = len(weights)
    if inline_weights and d > max_weights_cells:
        raise ValueError(
            f"{d} weight cells exceed max_weights_cells={max_weights_cells} "
            "as a plan literal; pass inline_weights=False to ship the "
            "weights as a broadcast DataFrame instead"
        )
    if hash_family == "md5":
        bucket = f"CAST(conv(substring(md5(g), 1, 15), 16, 10) AS BIGINT) % {d}"
    else:
        bucket = f"pmod(xxhash64(g), {d})"

    grams = df.selectExpr(
        f"`{id_col}`",
        rf"filter(split(trim(lower(`{text_col}`)), '\\s+'), t -> t != '') AS __toks",
    ).selectExpr(
        f"`{id_col}`",
        # slice lengths clamp at 0, so 0- and 1-token docs yield [] bigrams
        "concat(__toks, zip_with("
        "  slice(__toks, 1, greatest(size(__toks) - 1, 0)),"
        "  slice(__toks, 2, greatest(size(__toks) - 1, 0)),"
        "  (a, b) -> concat(a, ' ', b))) AS __grams",
    )
    score_cols = [
        "1.0D / (1.0D + exp(-logit)) AS score",
        f"(1.0D / (1.0D + exp(-logit))) >= {float(threshold)!r}D AS keep",
    ]
    if inline_weights:
        warr = "array(" + ", ".join(f"{float(w)!r}D" for w in weights) + ")"
        scored = grams.selectExpr(
            f"`{id_col}`",
            "CAST(size(__grams) AS INT) AS n_grams",
            f"aggregate(__grams, {float(bias)!r}D, (acc, g) ->"
            f" acc + element_at({warr}, CAST(({bucket}) AS INT) + 1)) AS logit",
        )
    else:
        spark = df.sparkSession
        wdf = spark.createDataFrame(
            [(i, float(w)) for i, w in enumerate(weights)], "bucket int, w double"
        )
        partial = (
            grams.selectExpr(f"`{id_col}`", "explode(__grams) AS g")
            .selectExpr(f"`{id_col}`", f"CAST(({bucket}) AS INT) AS bucket")
            .join(F.broadcast(wdf), "bucket")
            .groupBy(id_col)
            .agg(F.expr("sum(w) AS __sw"))
        )
        scored = (
            grams.selectExpr(f"`{id_col}`", "CAST(size(__grams) AS INT) AS n_grams")
            .join(partial, id_col, "left")
            .selectExpr(
                f"`{id_col}`",
                "n_grams",
                # n_grams IS NULL ⇔ NULL text; gram-less docs get bias alone
                "CASE WHEN n_grams IS NULL THEN CAST(NULL AS DOUBLE) ELSE"
                f" {float(bias)!r}D + coalesce(__sw, 0.0D) END AS logit",
            )
        )
    return scored.selectExpr(f"`{id_col}`", "n_grams", "logit", *score_cols)


#: Row gate for the single-task classifier fit: below this, the labels
#: plus the (doc, bucket, cnt) feature table (≤ ~2M numeric rows — tens
#: of MB packed) run the whole GD loop in ONE vectorized task. Same
#: convention as dedup.SMALL_COMPONENTS_EDGES / graph.SMALL_GRAPH_EDGES.
SMALL_FIT_ROWS = 2_000_000


def _fit_one_task(
    labels: DataFrame,
    counts: DataFrame,
    id_col: str,
    d: int,
    iters: int,
    lr: float,
) -> tuple[list[float], float]:
    """Run the full-batch GD loop of :func:`fit_quality_classifier` in
    one vectorized NumPy task over the gathered labels + sparse feature
    counts: per iteration, per-doc logit sums (``np.add.at`` scatter of
    ``cnt·w[bucket]``), the identical sigmoid-error expression, the mean
    bias gradient, per-bucket weight gradients, and the identical
    ``w - lr·g/n`` / ``b - lr·gb`` steps."""
    lab = labels.selectExpr(
        "0 AS __k", f"`{id_col}` AS __id", "CAST(NULL AS INT) AS bucket",
        "__y AS v",
    )
    cnt = counts.selectExpr(
        "1 AS __k", f"`{id_col}` AS __id", "bucket", "cnt AS v"
    )

    def fn(pdf):
        import numpy as np
        import pandas as pd

        lrows = pdf[pdf["__k"] == 0]
        crows = pdf[pdf["__k"] == 1]
        y = lrows["v"].to_numpy(dtype="float64")
        n = y.size
        c_idx = pd.Index(lrows["__id"]).get_indexer(crows["__id"])
        c_bucket = crows["bucket"].to_numpy(dtype="int64")
        c_v = crows["v"].to_numpy(dtype="float64")
        w = np.zeros(d, dtype="float64")
        b = 0.0
        for _ in range(iters):
            s = np.zeros(n, dtype="float64")
            np.add.at(s, c_idx, c_v * w[c_bucket])
            errv = 1.0 / (1.0 + np.exp(-(b + s))) - y
            gb = float(errv.mean())
            gw = np.zeros(d, dtype="float64")
            np.add.at(gw, c_bucket, c_v * errv[c_idx])
            w = np.array([w[i] - lr * float(gw[i]) / n for i in range(d)])
            b -= lr * gb
        return pd.DataFrame(
            {"bucket": [-1] + list(range(d)),
             "weight": [b] + [float(x) for x in w]}
        )

    fitted = {
        r["bucket"]: r["weight"]
        for r in lab.unionByName(cnt)
        .groupBy()
        .applyInPandas(fn, "bucket int, weight double")
        .collect()
    }
    return [fitted[i] for i in range(d)], fitted[-1]


def fit_quality_classifier(
    df: DataFrame,
    label_col: str,
    weights_dim: int = 256,
    iters: int = 5,
    lr: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_family: str = "xxhash",
    max_weights_cells: int = 65_536,
) -> tuple[list[float], float]:
    """TRAIN the fastText-style scorer :func:`quality_classifier`
    applies: full-batch logistic regression by gradient descent over the
    SAME hashed uni+bigram count features, expressed as DataFrame ops —
    the CCNet recipe fits exactly this (high-quality seed corpus = label
    1, e.g. wiki refs, vs crawl = 0; Wenzek et al. 2020 §4.3).

    ``label_col``: 0/1 (or boolean) column on ``df``. Documents with
    NULL text are excluded (no features, unknown content); gram-less
    documents still train the bias. Weights init at zero, so the fit is
    fully deterministic given the data — there is no seed.

    Per iteration (Lloyd-style driver loop, the :func:`similarity.fit_kmeans`
    contract): score every document under the current weights (ONE
    broadcast join of the O(d) weight table + a groupBy(doc) sum),
    compute per-document error, reduce to the O(d)-row mean gradient
    (groupBy bucket, map-side combine), collect O(d) scalars, step.
    Shuffles carry only (doc_id, partial-sum) / (bucket, partial-grad)
    scalars — never text. The per-(doc, bucket) count table is built
    once and cached across iterations. At 100 TB: fit on a labeled
    SAMPLE (classifier training sets are thousands of docs), apply the
    frozen weights corpus-wide with ``quality_classifier``.

    Returns ``(weights, bias)`` — exactly what ``quality_classifier``
    takes. ``weights_dim`` is capped at ``max_weights_cells`` so the
    APPLY step can inline the vector as a plan literal.
    """
    from pyspark_data_drift_detector_spark.functions.quoting import ensure_safe_columns

    ensure_safe_columns([text_col, id_col, label_col])
    if hash_family not in ("xxhash", "md5"):
        raise ValueError(f"hash_family must be 'xxhash' or 'md5', got {hash_family!r}")
    if weights_dim < 1 or weights_dim > max_weights_cells:
        raise ValueError(
            f"weights_dim must be in [1, {max_weights_cells}], got {weights_dim}"
        )
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    d = weights_dim
    if hash_family == "md5":
        bucket = f"CAST(conv(substring(md5(g), 1, 15), 16, 10) AS BIGINT) % {d}"
    else:
        bucket = f"pmod(xxhash64(g), {d})"

    grams = df.selectExpr(
        f"`{id_col}`",
        f"CAST(`{label_col}` AS DOUBLE) AS __y",
        rf"filter(split(trim(lower(`{text_col}`)), '\\s+'), t -> t != '') AS __toks",
    ).selectExpr(
        f"`{id_col}`",
        "__y",
        "concat(__toks, zip_with("
        "  slice(__toks, 1, greatest(size(__toks) - 1, 0)),"
        "  slice(__toks, 2, greatest(size(__toks) - 1, 0)),"
        "  (a, b) -> concat(a, ' ', b))) AS __grams",
    ).filter("__grams IS NOT NULL AND __y IS NOT NULL")
    labels = grams.select(F.col(id_col), "__y").persist()
    counts = (
        grams.select(F.col(id_col), F.expr("explode(__grams) AS g"))
        .selectExpr(f"`{id_col}`", f"CAST(({bucket}) AS INT) AS bucket")
        .groupBy(id_col, "bucket")
        .agg(F.expr("CAST(count(1) AS DOUBLE) AS cnt"))
        .persist()
    )
    n = labels.count()
    if n == 0:
        labels.unpersist()
        counts.unpersist()
        raise ValueError("no labeled documents with non-NULL text to fit on")
    spark = df.sparkSession
    w = [0.0] * d
    b = 0.0
    # Single-task fast path: below the row gate (count rides the persist
    # the loop needs anyway — the graph/components gate convention), the
    # compact (doc, bucket, cnt) feature table plus the labels run ALL
    # gradient-descent iterations in ONE vectorized NumPy task instead
    # of ~4 driver-blocking jobs per iteration (doc-sum join, error
    # materialization, two gradient collects). The update rule is
    # identical expression-for-expression; per-doc and per-bucket float
    # sums accumulate in a fixed row order instead of shuffle order —
    # inside the operator's pre-existing contract (the declared query
    # compares 5-dp-ROUNDED weights, and the distributed loop's own
    # shuffle-order sums were already nondeterministic at the ulp).
    # Above the gate, the distributed loop — the 100 TB path — is
    # unchanged.
    if n + counts.count() <= SMALL_FIT_ROWS:
        try:
            return _fit_one_task(labels, counts, id_col, d, iters, lr)
        finally:
            labels.unpersist()
            counts.unpersist()
    try:
        for _ in range(iters):
            wdf = spark.createDataFrame(
                [(i, w[i]) for i in range(d)], "bucket int, w double"
            )
            doc_sums = (
                counts.join(F.broadcast(wdf), "bucket")
                .groupBy(id_col)
                .agg(F.expr("sum(cnt * w) AS __s"))
            )
            err = (
                labels.join(doc_sums, id_col, "left")
                .selectExpr(
                    f"`{id_col}`",
                    f"1.0D / (1.0D + exp(-({b!r}D + coalesce(__s, 0.0D))))"
                    " - __y AS __err",
                )
                .persist()
            )
            grad_b = err.agg(F.expr("avg(__err)")).collect()[0][0]
            grads = {
                r["bucket"]: r["gw"]
                for r in counts.join(err, id_col)
                .groupBy("bucket")
                .agg(F.expr("sum(cnt * __err) AS gw"))
                .collect()
            }
            err.unpersist()
            w = [w[i] - lr * grads.get(i, 0.0) / n for i in range(d)]
            b -= lr * float(grad_b)
    finally:
        labels.unpersist()
        counts.unpersist()
    return w, b


def classifier_threshold_sweep(
    df: DataFrame,
    weights: list[float],
    bias: float = 0.0,
    thresholds: tuple[float, ...] = (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9),
    label_col: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_family: str = "xxhash",
    max_weights_cells: int = 65_536,
) -> DataFrame:
    """Operating-point sweep for a fitted :func:`quality_classifier`: the
    deployment decision a pipeline actually makes is "which keep
    threshold hits my corpus-size budget (and, on a labeled eval slice,
    at what precision/recall)". One row per threshold: ``threshold,
    n_scored, n_keep, keep_rate`` plus — when ``label_col`` (0/1) is
    given — ``tp, fp, fn, precision, recall, f1``. NULL-text documents
    are unscored and excluded from every count.

    Plan: score once (the classifier's shuffle-free inline projection),
    then EVERY threshold is a conditional sum inside ONE single-row
    aggregate, melted to rows expression-only — the sweep costs exactly
    one pass regardless of how many thresholds it evaluates (no
    per-threshold action, no threshold×doc explode).
    """
    if not thresholds:
        raise ValueError("thresholds must be non-empty")
    ts = [float(t) for t in thresholds]
    scored = quality_classifier(
        df,
        weights,
        bias=bias,
        text_col=text_col,
        id_col=id_col,
        hash_family=hash_family,
        max_weights_cells=max_weights_cells,
    ).select(F.col(id_col), F.col("score"))
    if label_col is not None:
        lab = df.select(F.col(id_col), F.expr(f"CAST(`{label_col}` AS DOUBLE) AS __y"))
        scored = scored.join(lab, id_col)
    scored = scored.filter("score IS NOT NULL")

    aggs = [F.expr("CAST(count(1) AS BIGINT) AS n_scored")]
    for i, t in enumerate(ts):
        aggs.append(F.expr(f"sum(CASE WHEN score >= {t!r}D THEN 1L ELSE 0L END) AS k{i}"))
        if label_col is not None:
            # label metrics are computed over LABELED rows only — a kept
            # document with a NULL label is unknown, not a false positive
            aggs.append(F.expr(
                f"sum(CASE WHEN score >= {t!r}D AND __y IS NOT NULL"
                f" THEN 1L ELSE 0L END) AS kl{i}"
            ))
            aggs.append(F.expr(
                f"sum(CASE WHEN score >= {t!r}D AND __y = 1.0D THEN 1L ELSE 0L END) AS tp{i}"
            ))
            aggs.append(F.expr(
                f"sum(CASE WHEN score < {t!r}D AND __y = 1.0D THEN 1L ELSE 0L END) AS fn{i}"
            ))
    wide = scored.agg(*aggs)

    structs = []
    for i, t in enumerate(ts):
        fields = [
            f"'threshold', {t!r}D",
            "'n_scored', n_scored",
            f"'n_keep', k{i}",
            f"'keep_rate', k{i} / CAST(nullif(n_scored, 0) AS DOUBLE)",
        ]
        if label_col is not None:
            fields += [
                f"'tp', tp{i}",
                f"'fp', kl{i} - tp{i}",
                f"'fn', fn{i}",
                f"'precision', tp{i} / CAST(nullif(kl{i}, 0) AS DOUBLE)",
                f"'recall', tp{i} / CAST(nullif(tp{i} + fn{i}, 0) AS DOUBLE)",
                f"'f1', 2.0D * tp{i} / CAST(nullif(kl{i} + tp{i} + fn{i}, 0) AS DOUBLE)",
            ]
        structs.append("named_struct(" + ", ".join(fields) + ")")
    return wide.selectExpr(f"inline(array({', '.join(structs)}))")
