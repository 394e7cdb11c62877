"""Comparison helpers: order-insensitive, dtype-normalized frame equality."""

import numpy as np
import pandas as pd


def normalize(df: pd.DataFrame, key_cols) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if pd.api.types.is_numeric_dtype(df[c]) and not \
                pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("Float64")
        elif df[c].dtype == object or pd.api.types.is_string_dtype(df[c]):
            if not pd.api.types.is_datetime64_any_dtype(df[c]):
                df[c] = df[c].astype("string")
    df = df[sorted(df.columns)]
    keys = list(key_cols) if key_cols else list(df.columns)
    df = df.sort_values(keys, kind="mergesort",
                        na_position="last", ignore_index=True)
    return df


def assert_frames_equal(actual: pd.DataFrame, expected: pd.DataFrame,
                        key_cols, check_like=True):
    a = normalize(actual, key_cols)
    e = normalize(expected, key_cols)
    assert sorted(a.columns) == sorted(e.columns), \
        f"columns differ: {sorted(a.columns)} vs {sorted(e.columns)}"
    assert len(a) == len(e), f"row counts differ: {len(a)} vs {len(e)}"
    pd.testing.assert_frame_equal(a, e, check_dtype=False)
