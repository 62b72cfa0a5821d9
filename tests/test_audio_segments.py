"""Silence/activity segmentation (operators/multimodal.audio_segments)."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark_data_drift_detector_spark.operators.multimodal import (
    attach_synthetic_audio,
    audio_segments,
    encode_wav,
)
from pyspark_data_drift_detector_spark.plans.inspect import count_shuffles


def _df(spark, arrays):
    rows = [
        (i + 1, bytearray(encode_wav(np.asarray(a, dtype=np.int16), 16000)))
        for i, a in enumerate(arrays)
    ]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_audio_segments_run_structure(spark):
    # 50 silence | 100 active | 10 silence (short, interior) | 40 active
    # | 30 silence: the interior 10-gap merges the two active runs
    clip = [0] * 50 + [1000] * 100 + [0] * 10 + [500] * 40 + [0] * 30
    r = audio_segments(_df(spark, [clip]), min_run=16).collect()[0]
    assert r["n_samples"] == 230
    assert r["silence_ratio"] == pytest.approx(90 / 230)
    assert r["n_silence_runs"] == 2        # the 50 and 30 runs qualify
    assert r["longest_silence"] == 50
    assert r["n_segments"] == 1            # 2 active runs - 1 short gap
    assert r["leading_silence"] == 50
    assert r["trailing_silence"] == 30


def test_audio_segments_structural_pause_splits(spark):
    # interior silence >= min_run does NOT merge: two segments remain
    clip = [1000] * 40 + [0] * 20 + [1000] * 40
    r = audio_segments(_df(spark, [clip]), min_run=16).collect()[0]
    assert r["n_segments"] == 2
    assert r["n_silence_runs"] == 1
    assert r["leading_silence"] == 0 and r["trailing_silence"] == 0


def test_audio_segments_degenerate_clips(spark):
    all_silent = [0] * 100
    all_active = [5000] * 64
    rows = {
        r["doc_id"]: r
        for r in audio_segments(_df(spark, [all_silent, all_active])).collect()
    }
    s, a = rows[1], rows[2]
    assert s["n_segments"] == 0 and s["silence_ratio"] == 1.0
    assert s["leading_silence"] == 100 and s["trailing_silence"] == 100
    assert a["n_segments"] == 1 and a["silence_ratio"] == 0.0
    assert a["longest_silence"] == 0


def test_audio_segments_threshold_is_strict(spark):
    # |s| < threshold: a sample AT the threshold is active
    clip = [199] * 32 + [200] * 32
    r = audio_segments(
        _df(spark, [clip]), silence_threshold=200, min_run=16
    ).collect()[0]
    assert r["leading_silence"] == 32 and r["trailing_silence"] == 0
    assert r["n_segments"] == 1


def test_audio_segments_corrupt_payload_isolated(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"not a wav"))], "doc_id long, payload binary"
    )
    r = audio_segments(df).collect()[0]
    assert r["decode_error"] and r["n_segments"] is None


def test_audio_segments_zero_shuffle_plan(spark, sf_dir):
    # same contract as decode_audio: one Arrow map in the scan
    # partitions, payload bytes never cross an exchange
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .filter("doc_id < 10")  # limit() would add a SinglePartition
        # exchange of its own and mask the contract under test
    )
    seg = audio_segments(attach_synthetic_audio(docs))
    assert count_shuffles(seg) == 0
