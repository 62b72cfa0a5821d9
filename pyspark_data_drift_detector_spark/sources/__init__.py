from pyspark_data_drift_detector_spark.sources.snapshot import (
    load_snapshot,
    load_table,
    latest_version,
    sample_bounded,
    split_snapshot_pair,
    write_results,
)

__all__ = [
    "load_snapshot",
    "load_table",
    "latest_version",
    "sample_bounded",
    "split_snapshot_pair",
    "write_results",
]
