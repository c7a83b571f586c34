"""Differential comparison helpers: Spark result vs DuckDB oracle.

Mirrors the driver's correctness gate (``__spark_entry__.py`` contract):
row count, column-name set, and an order-insensitive value comparison with
columns sorted by name. Used by ``test_oracle_parity.py`` so mismatches are
caught locally before the driver runs the real gate at sf0.01.
"""

from __future__ import annotations

import math
from collections import Counter
from typing import Any

import duckdb
import pandas as pd

from pubic_multi_platform_to_postgres_spark.queries.registry import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        return con.execute(sql).df()
    finally:
        con.close()


def _norm_value(v: Any) -> Any:
    """Canonicalize one cell for cross-engine comparison."""
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<NULL>"
        # exact float repr: both engines must agree bit-for-bit (queries are
        # engineered for determinism; see registry docstring)
        return repr(v)
    if isinstance(v, pd.Timestamp):
        if v.tzinfo is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_norm_value(x) for x in v)
    if type(v).__module__ == "numpy":  # numpy scalar (int32/float32/bool_)
        return _norm_value(v.item())
    if isinstance(v, (int, bool, str)):
        return v
    if pd.isna(v):
        return "<NULL>"
    return str(v)


def to_multiset(df: pd.DataFrame) -> Counter:
    df = df[sorted(df.columns)]
    return Counter(
        tuple(_norm_value(v) for v in row) for row in df.itertuples(index=False, name=None)
    )


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> None:
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spark_pdf.columns)} "
        f"oracle={sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )
    ms, mo = to_multiset(spark_pdf), to_multiset(oracle_pdf)
    if ms != mo:
        only_spark = list((ms - mo).items())[:5]
        only_oracle = list((mo - ms).items())[:5]
        raise AssertionError(
            f"{name}: value mismatch\n  only in spark: {only_spark}\n"
            f"  only in oracle: {only_oracle}"
        )
