"""Custom aggregate functions (Arrow-batched grouped-agg pandas UDFs).

The §2.8 UDAF surface: when no builtin aggregate fits, a GROUPED_AGG
pandas UDF receives the whole group as one Arrow-backed Series — the
JVM still does the shuffle/grouping; Python sees each group exactly once.

NOTE: this module deliberately has NO ``from __future__ import
annotations`` — pandas_udf infers the UDF kind (scalar vs grouped-agg)
from real type hints, and stringified hints break that inspection.
"""

import pandas as pd
from pyspark.sql import functions as F


@F.pandas_udf("double")
def mad(v: pd.Series) -> float:
    """Median absolute deviation: ``median(|x - median(x)|)``.

    Chosen as the demo UDAF because it is *selection-based* — medians
    interpolate between order statistics with exact double arithmetic, so
    the result is bit-reproducible regardless of row order (an
    accumulation-based UDAF like a geometric mean would be
    order-sensitive in the low bits and unfit for hash comparison).
    """
    med = v.median()
    return float((v - med).abs().median())
