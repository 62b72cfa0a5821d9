"""Passage-level exact-substring dedup (VERDICT r8 gap #2): token-window
fingerprints → hash counts → maximal spans, pair attribution, excision.

The reference has no passage operator; document-level MinHash/SimHash
miss a 100-token passage duplicated across otherwise-distinct documents
(the train-set-contamination shape suffix-array dedup exists for)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_data_drift_detector_spark.operators.dedup import (
    passage_duplicates,
    passage_excise,
    passage_pairs,
)

PASSAGE = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 tokens


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # docs 1 and 2 share the 8-token PASSAGE at different offsets
        (1, f"one two three {PASSAGE} x y z"),
        (2, f"{PASSAGE} completely different tail words here"),
        # doc 3: unique content, no shared windows
        (3, "nothing here overlaps with anything else at all ok"),
        # doc 4: shorter than the window — must emit nothing
        (4, "tiny doc"),
        # doc 5: empty text
        (5, ""),
        # doc 6: NULL text
        (6, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_passage_duplicates_spans(spark, docs):
    out = {
        r["doc_id"]: r
        for r in passage_duplicates(docs, window=5, stride=1).collect()
    }
    # PASSAGE is 8 tokens → 4 stride-1 windows of 5 shared by docs 1+2;
    # they merge into ONE maximal span covering the passage
    assert set(out) == {1, 2}
    d1, d2 = out[1], out[2]
    assert (d1["span_start"], d1["span_end"]) == (4, 11)  # after 3-token prefix
    assert (d2["span_start"], d2["span_end"]) == (1, 8)
    for d in (d1, d2):
        assert d["span_tokens"] == 8
        assert d["n_windows"] == 4
        assert d["max_dup_docs"] == 2


def test_passage_duplicates_all_identical_docs(spark):
    """Degenerate: every doc identical — one maximal span per doc covering
    the whole text, max_dup_docs = corpus size."""
    n = 6
    docs = spark.createDataFrame(
        [(i, PASSAGE) for i in range(n)], "doc_id long, text string"
    )
    rows = passage_duplicates(docs, window=5, stride=1).collect()
    assert len(rows) == n
    for r in rows:
        assert (r["span_start"], r["span_end"]) == (1, 8)
        assert r["max_dup_docs"] == n


def test_passage_duplicates_doc_shorter_than_window(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c")], "doc_id long, text string"
    )
    assert passage_duplicates(docs, window=5).count() == 0


def test_passage_duplicates_within_doc_repeat_not_flagged(spark):
    """min_docs counts DISTINCT documents: a passage repeated twice inside
    ONE doc is repetition (quality.repetition_stats' job), not cross-doc
    contamination."""
    docs = spark.createDataFrame(
        [(1, f"{PASSAGE} filler filler {PASSAGE}"),
         (2, "totally unrelated words that do not match anything")],
        "doc_id long, text string",
    )
    assert passage_duplicates(docs, window=5).count() == 0


def test_passage_pairs_and_cap(spark, docs):
    pairs = passage_pairs(docs, window=5, stride=1).collect()
    assert len(pairs) == 1
    p = pairs[0]
    assert (p["doc_a"], p["doc_b"]) == (1, 2)
    assert p["n_shared_windows"] == 4
    assert (p["a_min_start"], p["b_min_start"]) == (4, 1)
    # cap=1 excludes every shared hash (each is in 2 docs) → no pairs,
    # while passage_duplicates still reports the spans
    assert passage_pairs(docs, window=5, max_docs_per_hash=1).count() == 0


def test_passage_excise_rebuild(spark, docs):
    out = {r["doc_id"]: r for r in passage_excise(docs, window=5).collect()}
    assert out[1]["clean_text"] == "one two three x y z"
    assert out[1]["n_tokens"] == 14
    assert out[1]["excised_tokens"] == 8
    assert out[1]["kept_tokens"] == 6
    assert out[2]["clean_text"] == "completely different tail words here"
    # untouched docs pass through verbatim with zero excised
    assert out[3]["clean_text"] == docs.filter("doc_id = 3").first()["text"]
    assert out[3]["excised_tokens"] == 0
    assert out[4]["clean_text"] == "tiny doc"
    # empty text: one empty token, nothing excised
    assert out[5]["clean_text"] == ""
    assert out[5]["excised_tokens"] == 0
    # NULL text: NULL clean_text, zero counts
    assert out[6]["clean_text"] is None
    assert out[6]["n_tokens"] == 0
    assert out[6]["excised_tokens"] == 0
    assert out[6]["kept_tokens"] == 0
    assert passage_excise(docs, window=5).count() == docs.count()


def test_passage_excise_all_identical_docs(spark):
    """Degenerate: identical corpus — excision empties every document
    (keep-one semantics belong upstream, as documented)."""
    docs = spark.createDataFrame(
        [(i, PASSAGE) for i in range(4)], "doc_id long, text string"
    )
    rows = passage_excise(docs, window=5).collect()
    assert all(r["clean_text"] == "" and r["kept_tokens"] == 0 for r in rows)
    assert all(r["excised_tokens"] == 8 for r in rows)


def test_passage_stride_grid(spark):
    """stride > 1 only catches stride-aligned windows (documented recall
    tradeoff): the shared passage at offset 2 in doc 2 misses the odd
    stride-2 grid of doc 1's offset-1 copy unless windows align."""
    docs = spark.createDataFrame(
        [(1, f"{PASSAGE} tail1 tail2"),
         (2, f"pre {PASSAGE} other tail")],
        "doc_id long, text string",
    )
    # stride 1 finds it
    assert passage_duplicates(docs, window=5, stride=1).count() == 2
    # stride 2: doc1 windows start 1,3,5,…; doc2's copy sits at 2,4,…
    # — identical window TEXT requires identical token content, which the
    # offset parity prevents here
    assert passage_duplicates(docs, window=5, stride=2).count() == 0


def test_passage_spans_disjoint_islands(spark):
    """Two separate shared passages in one doc stay two spans."""
    other = "unique filler words in the middle that are long enough"
    p2 = "golf hotel india juliet kilo lima mike november"
    docs = spark.createDataFrame(
        [(1, f"{PASSAGE} {other} {p2}"),
         (2, f"{PASSAGE} nothing else shared with the first document"),
         (3, f"start is different here yes {p2}")],
        "doc_id long, text string",
    )
    spans = sorted(
        (r["span_start"], r["span_end"])
        for r in passage_duplicates(docs, window=5).filter("doc_id = 1").collect()
    )
    n_other = len(other.split())
    assert spans == [(1, 8), (9 + n_other, 16 + n_other)]


def test_passage_index_plan_shape(spark, docs):
    """The counts stage groups by the 8-byte hash (never window strings or
    pairs) and the excise rebuild stays a narrow map over the corpus scan."""
    from pyspark_data_drift_detector_spark.plans.inspect import simple_plan

    plan = simple_plan(passage_duplicates(docs, window=5))
    assert "whash" in plan
    # no cartesian/broadcast-nested-loop anywhere in the span path
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_passage_incremental_matches_full_rescan(spark, sf_dir):
    """Append-only contract: state built batch-by-batch + incremental
    check of the LAST batch == passage_duplicates over the FULL corpus
    restricted to that batch's documents (plus the prior_docs column)."""
    from pyspark_data_drift_detector_spark.operators.dedup import (
        passage_dedup_incremental,
        passage_duplicates,
        passage_state,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    prior = docs.filter("doc_id % 3 != 0")
    batch = docs.filter("doc_id % 3 = 0")
    state = passage_state(prior, window=8)

    inc = passage_dedup_incremental(batch, state, window=8).collect()
    full = (
        passage_duplicates(docs, window=8)
        .filter(F.col("doc_id") % 3 == 0)
        .collect()
    )
    key = lambda rows: sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"],
         r["n_windows"], r["max_dup_docs"])
        for r in rows
    )
    assert key(inc) == key(full)
    assert len(inc) > 0  # non-vacuous on the testdata


def test_passage_incremental_batch_only_and_state_hits(spark):
    from pyspark_data_drift_detector_spark.operators.dedup import (
        passage_dedup_incremental,
        passage_state,
    )

    prior = spark.createDataFrame(
        [(1, PASSAGE + " some old tail")], "doc_id long, text string"
    )
    state = passage_state(prior, window=5)
    batch = spark.createDataFrame(
        [
            (10, "pre " + PASSAGE),            # hits the state
            (11, "novel shared words here one two three four five"),
            (12, "novel shared words here one two three four five"),  # batch dup
            (13, "nothing in common with anything at all truly"),
            (14, "tiny"),                       # shorter than window
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in passage_dedup_incremental(batch, state, window=5).collect()
    }
    assert set(out) == {10, 11, 12}
    assert out[10]["prior_docs"] == 1
    assert out[10]["max_dup_docs"] == 2  # 1 prior + 1 batch
    assert (out[10]["span_start"], out[10]["span_end"]) == (2, 9)
    for v in (11, 12):  # within-batch duplication: no prior docs
        assert out[v]["prior_docs"] == 0
        assert out[v]["max_dup_docs"] == 2
        assert (out[v]["span_start"], out[v]["span_end"]) == (1, 9)


def test_passage_state_sink_streaming(spark, tmp_path):
    """The foreachBatch state sink appended per micro-batch feeds the same
    incremental decision as a batch-built state."""
    from pyspark_data_drift_detector_spark.operators.dedup import (
        passage_dedup_incremental,
        passage_state,
    )
    from pyspark_data_drift_detector_spark.streaming.state_tables import (
        passage_state_sink,
    )

    prior = spark.createDataFrame(
        [(1, PASSAGE + " some old tail"), (2, "other old words entirely distinct here")],
        "doc_id long, text string",
    )
    ingest_dir = tmp_path / "passage_ingest"
    prior.repartition(2).write.parquet(str(ingest_dir))
    stream = (
        spark.readStream.schema(prior.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(ingest_dir))
    )
    sink = passage_state_sink(str(tmp_path / "passage_state"), window=5)
    q = stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination(120)
    streamed = spark.read.parquet(str(tmp_path / "passage_state"))

    batch = spark.createDataFrame(
        [(10, "pre " + PASSAGE)], "doc_id long, text string"
    )
    key = lambda rows: sorted(tuple(r) for r in rows)
    assert key(
        passage_dedup_incremental(batch, streamed, window=5).collect()
    ) == key(
        passage_dedup_incremental(
            batch, passage_state(prior, window=5), window=5
        ).collect()
    )


def test_passage_pairs_repeated_window_counts_once(spark):
    """The doc cap alone does not bound within-doc REPEATS of one window
    text (their occurrence count would square in the pair join): the
    index collapses to one row per (hash, doc), so a degenerate 'na na
    na …' doc contributes each fingerprint once and n_shared_windows
    counts DISTINCT shared fingerprints."""
    na = " ".join(["na"] * 30)  # 26 identical 5-token windows per doc
    docs = spark.createDataFrame(
        [(1, na), (2, na)], "doc_id long, text string"
    )
    rows = passage_pairs(docs, window=5).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert r["n_shared_windows"] == 1  # one distinct fingerprint, not 26²
    assert (r["a_min_start"], r["b_min_start"]) == (1, 1)


def test_passage_keep_one_excision(spark):
    """keep_one=True: the smallest-id copy of each passage survives
    excision, every other copy is removed; the default still removes all.
    Survivorship is per WINDOW, so a doc can keep one shared passage and
    lose another whose survivor lives elsewhere."""
    p2 = "golf hotel india juliet kilo lima mike november"
    docs = spark.createDataFrame(
        [
            (1, PASSAGE),                               # survivor of PASSAGE
            (2, f"pre {PASSAGE} post"),
            (3, f"{p2} and {PASSAGE}"),                 # survivor of p2, loses PASSAGE
            (4, f"tail words only with {p2}"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in passage_excise(docs, window=5, keep_one=True).collect()
    }
    assert out[1]["clean_text"] == PASSAGE  # untouched survivor
    assert out[1]["excised_tokens"] == 0
    assert out[2]["clean_text"] == "pre post"
    assert out[3]["clean_text"] == p2 + " and"
    assert out[4]["clean_text"] == "tail words only with"
    # default scrubs every copy including the survivors
    scrub = {
        r["doc_id"]: r for r in passage_excise(docs, window=5).collect()
    }
    assert scrub[1]["clean_text"] == ""
    assert scrub[3]["clean_text"] == "and"

    # span REPORTING with keep_one: survivor docs emit no span
    spans = passage_duplicates(docs, window=5, keep_one=True)
    assert sorted(r["doc_id"] for r in spans.select("doc_id").distinct().collect()) == [2, 3, 4]


def test_passage_decontaminate_spans_and_excise(spark):
    """Span-level benchmark decontamination: corpus spans matching any
    benchmark window are localized and excised; the rest of the document
    survives (vs whole-doc dropping). Benchmark-internal duplication is
    irrelevant; corpus docs sharing windows only with EACH OTHER are
    untouched."""
    from pyspark_data_drift_detector_spark.operators.dedup import (
        passage_decontaminate,
        passage_decontaminate_excise,
    )

    bench = spark.createDataFrame(
        [(900, PASSAGE), (901, PASSAGE)],  # internal dup: no effect
        "doc_id long, text string",
    )
    other = "golf hotel india juliet kilo lima mike november"
    corpus = spark.createDataFrame(
        [
            (1, f"intro words {PASSAGE} closing words"),  # leak mid-doc
            (2, f"{other} again {other}"),                # corpus-only dup
            (3, "free of any leak entirely clean text here"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    spans = {
        r["doc_id"]: r
        for r in passage_decontaminate(corpus, bench, window=5).collect()
    }
    assert set(spans) == {1}
    assert (spans[1]["span_start"], spans[1]["span_end"]) == (3, 10)
    assert spans[1]["n_windows"] == 4

    out = {
        r["doc_id"]: r
        for r in passage_decontaminate_excise(corpus, bench, window=5).collect()
    }
    assert out[1]["clean_text"] == "intro words closing words"
    assert out[1]["excised_tokens"] == 8
    assert out[2]["excised_tokens"] == 0  # corpus-internal dup ≠ leak
    assert out[3]["clean_text"] == corpus.filter("doc_id=3").first()["text"]
    assert out[4]["clean_text"] is None and out[4]["n_tokens"] == 0
    assert len(out) == 4


def test_passage_decontaminate_benchmark_shorter_than_window(spark):
    from pyspark_data_drift_detector_spark.operators.dedup import (
        passage_decontaminate,
    )

    bench = spark.createDataFrame([(9, "too short")], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(1, "too short but windows need five tokens minimum")],
        "doc_id long, text string",
    )
    assert passage_decontaminate(corpus, bench, window=5).count() == 0


def test_passage_decontaminate_benchmark_ignores_stride(spark):
    """Review r9: stride applies to the CORPUS side only — a leak not
    aligned to the benchmark's stride grid must still be caught."""
    from pyspark_data_drift_detector_spark.operators.dedup import (
        passage_decontaminate,
    )

    bench = spark.createDataFrame(
        [(9, f"offset {PASSAGE} tail")],  # passage starts at token 2
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [(1, PASSAGE)],  # corpus copy starts at token 1
        "doc_id long, text string",
    )
    # corpus stride 1, benchmark indexed internally at stride 1: found
    # even though the benchmark copy sits off the old stride-4 grid
    spans = passage_decontaminate(corpus, bench, window=5, stride=4).collect()
    assert len(spans) == 1 and spans[0]["span_start"] == 1
