"""Property-based tests (hypothesis) for the cleaning operator semantics.

The reference's semantics are pandas semantics (SURVEY.md §4.3); these
properties pin the tricky equivalences on arbitrary inputs, not just the
churn fixture's values:

- bucketize ≡ pd.cut with right-closed intervals (§4.3.3)
- median_fill ≡ pandas exact interpolating median (§4.3.1)
- to_numeric(errors="coerce") ≡ cast-to-double null semantics (§4.3.2)

One shared Spark session; each example is a small single-job comparison.
"""

from __future__ import annotations

import math

import pandas as pd
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from etl_pipeline_telecom_spark.functions.cleaning import bucketize, coerce_numeric, median_fill

EDGES = [-1, 12, 36, 60, float("inf")]
LABELS = ["New", "Regular", "Loyal", "Champion"]


@settings(max_examples=12, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=100), min_size=1, max_size=30))
def test_bucketize_matches_pd_cut(spark, values):
    expected = pd.cut(pd.Series(values), bins=EDGES, labels=LABELS).astype(str).tolist()
    df = spark.createDataFrame([(v,) for v in values], "tenure int")
    got = [r[0] for r in df.select(bucketize("tenure", EDGES[1:-1], LABELS)).collect()]
    assert got == expected


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.one_of(st.none(), st.integers(min_value=-1000, max_value=1000)),
        min_size=1,
        max_size=25,
    ).filter(lambda vs: any(v is not None for v in vs))
)
def test_median_fill_matches_pandas_median(spark, values):
    series = pd.Series([float(v) if v is not None else math.nan for v in values])
    expected_median = series.median()  # exact, interpolating
    df = spark.createDataFrame([(float(v) if v is not None else None,) for v in values], "x double")
    filled = median_fill(df, ["x"])
    got = {r[0] for r in filled.collect()}
    assert None not in got
    original = {v for v in series.dropna()}
    assert got <= original | {expected_median}
    if series.isna().any():
        assert expected_median in got


@settings(max_examples=12, deadline=None)
@given(st.lists(st.sampled_from(["1.5", " ", "", "abc", "42", "-0.25", "1e3", "nan"]), min_size=1, max_size=20))
def test_coerce_numeric_matches_to_numeric_coerce(spark, values):
    expected = pd.to_numeric(pd.Series(values), errors="coerce")
    df = spark.createDataFrame([(v,) for v in values], "s string")
    got = [r[0] for r in df.select(coerce_numeric("s")).collect()]
    for g, e in zip(got, expected):
        if pd.isna(e):
            # pandas "nan" string coerces to NaN; Spark cast gives NaN for
            # "nan" and NULL for unparseable — both are "not a number"
            assert g is None or math.isnan(g)
        else:
            assert g == e
