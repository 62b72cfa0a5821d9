"""Arrow-batched pandas UDFs (the only Python-side execution in the engine).

Kept in their own module WITHOUT ``from __future__ import annotations`` so
pyspark can resolve the pandas type hints. These run over O(columns)-sized
summary tables, never over raw data.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf

from pyspark_data_drift_detector_spark.functions.stats import chi2_sf


@pandas_udf("double")
def chi2_sf_udf(chi: pd.Series, dof: pd.Series) -> pd.Series:
    out = []
    for c, d in zip(chi, dof):
        if c is None or d is None or pd.isna(c) or pd.isna(d):
            out.append(None)
        else:
            out.append(chi2_sf(float(c), int(d)))
    return pd.Series(out, dtype="float64")
