"""Dispatch-level tests for the snapshot sources (SURVEY §2.1 S1/S2).

The sandbox has no Delta Lake, so the Delta paths are pinned at the
dispatch level with recording fakes: what format is requested, whether
``versionAsOf`` time travel is applied (``data_loader.py:24``), and how
``latest_version`` reduces DESCRIBE HISTORY (``data_loader.py:42-65``).
"""

from __future__ import annotations

import pytest

from pyspark_data_drift_detector_spark.sources.snapshot import (
    latest_version,
    load_events,
    load_snapshot,
    sample_bounded,
)


class FakeDF:
    def __init__(self):
        self.cached = False

    def cache(self):
        self.cached = True
        return self


class FakeReader:
    def __init__(self):
        self.fmt = None
        self.options = {}
        self.loaded_path = None
        self.result = FakeDF()

    def format(self, fmt):
        self.fmt = fmt
        return self

    def option(self, key, value):
        self.options[key] = value
        return self

    def load(self, path):
        self.loaded_path = path
        return self.result


class FakeSpark:
    def __init__(self):
        self.reader = FakeReader()
        self.sql_calls = []
        self.sql_result = None

    @property
    def read(self):
        return self.reader

    def sql(self, query):
        self.sql_calls.append(query)
        return self.sql_result


def test_parquet_path_autodetects_parquet():
    spark = FakeSpark()
    load_snapshot(spark, "/data/t.parquet")
    assert spark.reader.fmt == "parquet"
    assert spark.reader.loaded_path == "/data/t.parquet"
    assert spark.reader.options == {}


def test_parquet_path_ignores_version():
    # versionAsOf is a Delta-only option; the parquet fallback must not set it
    spark = FakeSpark()
    load_snapshot(spark, "/data/t.parquet", version=7)
    assert spark.reader.fmt == "parquet"
    assert "versionAsOf" not in spark.reader.options


def test_delta_time_travel_sets_version():
    spark = FakeSpark()
    load_snapshot(spark, "/delta/tbl", version=3)
    assert spark.reader.fmt == "delta"
    assert spark.reader.options == {"versionAsOf": 3}


def test_delta_latest_no_version_option():
    spark = FakeSpark()
    load_snapshot(spark, "/delta/tbl")
    assert spark.reader.fmt == "delta"
    assert spark.reader.options == {}


def test_explicit_fmt_overrides_autodetect():
    spark = FakeSpark()
    load_snapshot(spark, "/delta/tbl.parquet", version=1, fmt="delta")
    assert spark.reader.fmt == "delta"
    assert spark.reader.options == {"versionAsOf": 1}


def test_cache_opt_in():
    spark = FakeSpark()
    out = load_snapshot(spark, "/data/t.parquet", cache=True)
    assert out.cached


class FakeHistory:
    def __init__(self, version):
        self._version = version

    def agg(self, *_):
        return self

    def first(self):
        return {"v": self._version}


def test_latest_version_reduces_history(spark):
    # real session required only because F.max builds a JVM-backed Column
    fake = FakeSpark()
    fake.sql_result = FakeHistory(12)
    assert latest_version(fake, "/delta/tbl") == 12
    assert fake.sql_calls == ["DESCRIBE HISTORY delta.`/delta/tbl`"]


def test_latest_version_empty_history_raises(spark):
    fake = FakeSpark()
    fake.sql_result = FakeHistory(None)
    with pytest.raises(ValueError):
        latest_version(fake, "/delta/tbl")


def test_load_events_timestamp_passthrough(spark, sf_dir):
    # the current testdata ships ts as a parquet timestamp; the loader must
    # keep it a timestamp (the r2 bench crash was a blind `ts div 1000`)
    df = load_events(spark, sf_dir)
    assert dict(df.dtypes)["ts"] in ("timestamp", "timestamp_ntz")
    assert df.limit(1).count() == 1


def test_sample_bounded_disabled_and_small(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/nation.parquet")
    n = df.count()
    assert sample_bounded(df, sample_size=0) is df
    assert sample_bounded(df, sample_size=n + 10).count() == n
