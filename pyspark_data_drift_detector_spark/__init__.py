"""PySpark-native data drift / data-quality analytics engine.

A brand-new, Spark-first re-expression of the capabilities of
``JayaBigDataIsCool/pyspark_data_drift_detector`` (reference read-only at
``/root/reference/``; see SURVEY.md for the metric-by-metric semantics map).

Architectural stance (SURVEY.md §7.1): one core primitive — a *profile
aggregation* computed in a single wide ``agg`` per DataFrame — and every
drift metric is expression math over a join of two profile tables. Only
O(columns)-sized summaries ever reach the driver; all category/frequency
math stays distributed, so the engine scales to arbitrarily large tables.
"""

from pyspark_data_drift_detector_spark.config import DriftConfig, generate_config, load_config
from pyspark_data_drift_detector_spark.pipeline import detect_drift

__version__ = "0.1.0"

__all__ = [
    "DriftConfig",
    "generate_config",
    "load_config",
    "detect_drift",
    "run_data_drift_detection",
    "build_report",
    "corpus_drift_report",
    "embedding_drift_report",
    "clean_corpus",
    "corpus_funnel",
]


def run_data_drift_detection(*args, **kwargs):
    from pyspark_data_drift_detector_spark.runner import run_data_drift_detection as _run

    return _run(*args, **kwargs)


def build_report(*args, **kwargs):
    from pyspark_data_drift_detector_spark.report import build_report as _build

    return _build(*args, **kwargs)


# The per-modality flagship reports (lazy: corpus/embedding pipelines pull
# heavy operator modules) — tabular is detect_drift above.
def corpus_drift_report(*args, **kwargs):
    from pyspark_data_drift_detector_spark.corpus_pipeline import (
        corpus_drift_report as _r,
    )

    return _r(*args, **kwargs)


def embedding_drift_report(*args, **kwargs):
    from pyspark_data_drift_detector_spark.embedding_pipeline import (
        embedding_drift_report as _r,
    )

    return _r(*args, **kwargs)


def clean_corpus(*args, **kwargs):
    from pyspark_data_drift_detector_spark.corpus_pipeline import clean_corpus as _r

    return _r(*args, **kwargs)


def corpus_funnel(*args, **kwargs):
    from pyspark_data_drift_detector_spark.corpus_pipeline import corpus_funnel as _r

    return _r(*args, **kwargs)
