"""Golden tests: Spark churn pipeline vs the reference's own committed outputs.

- transform parity: full 7,043-row staged table must match
  ``/root/reference/data/staged/churn_staged.csv`` value-for-value.
- analytics parity: on the 1000-row prefix (the notebook's truncated
  PostgREST fetch, SURVEY.md §4.3.7) the metrics must reproduce
  ``data/processed/*`` (values pinned from BASELINE.md).
"""

from __future__ import annotations

import math
import os

import pandas as pd
import pytest

REF = "/root/reference"
RAW = f"{REF}/data/raw/WA_Fn-UseC_-Telco-Customer-Churn.csv"
STAGED = f"{REF}/data/staged/churn_staged.csv"

pytestmark = pytest.mark.skipif(not os.path.exists(RAW), reason="reference data not present")


@pytest.fixture(scope="module")
def spark_staged(spark):
    from etl_pipeline_telecom_spark.plans.churn import read_raw, transform_churn

    return transform_churn(read_raw(spark, RAW)).toPandas()


def test_transform_matches_reference_staged(spark_staged):
    golden = pd.read_csv(STAGED)
    got = spark_staged
    assert list(got.columns) == list(golden.columns)
    assert len(got) == len(golden) == 7043
    for col in golden.columns:
        g, s = golden[col], got[col]
        if g.dtype.kind in "fi":
            assert s.astype(float).round(9).equals(g.astype(float).round(9)), f"numeric mismatch in {col}"
        else:
            assert s.astype(str).equals(g.astype(str)), f"string mismatch in {col}"


def test_median_fill_semantics(spark_staged):
    # the 11 blank-TotalCharges rows (all tenure=0) must hold the exact
    # pandas median of the 7032 parseable values
    raw = pd.read_csv(RAW)
    tc = pd.to_numeric(raw["TotalCharges"], errors="coerce")
    expected_fill = tc.median()
    filled = spark_staged.loc[raw["tenure"].values == 0, "TotalCharges"]
    blank_rows = raw["TotalCharges"].str.strip().eq("").values
    assert blank_rows.sum() == 11
    got_fill = spark_staged.loc[blank_rows, "TotalCharges"]
    assert (got_fill == expected_fill).all()


@pytest.mark.parametrize("nrows", [1000, None])
def test_analytics_match_notebook_pandas(spark, nrows):
    """Spark analytics must match the notebook's own pandas logic
    (etl_analysis.ipynb cell8), transcribed here, on the same input.

    The published data/processed numbers can't be reproduced from a CSV
    prefix — the notebook's 1000 PostgREST rows came back in unspecified
    server order (SURVEY.md §4.3.7) — so the golden is pandas-vs-Spark on
    deterministic input (1000-row prefix and full table).
    """
    from etl_pipeline_telecom_spark.plans.churn import churn_analytics, normalize_header

    pdf = pd.read_csv(STAGED)
    if nrows:
        pdf = pdf.head(nrows)
    pdf.columns = [normalize_header(c) for c in pdf.columns]
    # the notebook fetched from Supabase, whose table carries a BIGSERIAL id
    # (scripts/load.py:46) — include it like the fetched frame has it
    pdf.insert(0, "id", range(1, len(pdf) + 1))

    tables = {k: v.toPandas() for k, v in churn_analytics(spark.createDataFrame(pdf)).items()}

    # --- pandas reference computation (cell7/cell8 transcription) ---
    ref = pdf.copy()
    ref["churn_flag"] = ref["churn"].str.strip().str.lower().map({"yes": 1, "no": 0})
    valid = ref["churn_flag"].dropna()
    exp_churn_pct = round(valid.sum() / len(valid) * 100, 3)

    summary = tables["summary"].iloc[0]
    assert summary["total_rows"] == len(ref)
    assert summary["unique_rows"] == len(ref.drop_duplicates())
    assert math.isclose(summary["churn_percentage"], exp_churn_pct, abs_tol=1e-9)

    exp_avg = ref.groupby("contract", dropna=False)["monthlycharges"].mean().round(3)
    avg = tables["avg_by_contract"].set_index("contract")["avg_monthly_charges"]
    for k, v in exp_avg.items():
        assert math.isclose(avg[k], v, abs_tol=1e-9), f"avg mismatch for {k}"

    exp_tc = ref["tenure_group"].fillna("UNKNOWN").astype(str).value_counts()
    tc = tables["tenure_counts"].set_index("tenure_group")["count"]
    assert tc.to_dict() == exp_tc.to_dict()

    exp_ic = ref["internetservice"].fillna("UNKNOWN").astype(str).value_counts().rename_axis("v").reset_index(name="count")
    exp_ic["pct"] = (exp_ic["count"] / exp_ic["count"].sum() * 100).round(2)
    ic = tables["internet_counts"].set_index("internet_service")
    for _, row in exp_ic.iterrows():
        assert ic.loc[row["v"], "count"] == row["count"]
        assert math.isclose(ic.loc[row["v"], "pct"], row["pct"], abs_tol=1e-9)

    piv = pd.crosstab(ref["tenure_group"].fillna("UNKNOWN").astype(str), ref["churn_flag"].fillna(0).astype(int))
    piv = piv.rename(columns={0: "not_churned_count", 1: "churned_count"})
    piv["total"] = piv["churned_count"] + piv["not_churned_count"]
    piv["churn_rate_pct"] = (piv["churned_count"] / piv["total"] * 100).round(3)
    got_piv = tables["pivot"].set_index("tenure_group")
    for key in piv.index:
        for c in ("not_churned_count", "churned_count", "total"):
            assert got_piv.loc[key, c] == piv.loc[key, c], f"pivot {key}.{c}"
        assert math.isclose(got_piv.loc[key, "churn_rate_pct"], piv.loc[key, "churn_rate_pct"], abs_tol=1e-9)


def test_header_normalization():
    from etl_pipeline_telecom_spark.plans.churn import normalize_header

    # rule from scripts/load.py:121-143 — CamelCase-origin names lose
    # underscores, snake_case-origin names keep them
    assert normalize_header("MonthlyCharges") == "monthlycharges"
    assert normalize_header("SeniorCitizen") == "seniorcitizen"
    assert normalize_header("tenure_group") == "tenure_group"
    assert normalize_header("tenure") == "tenure"
    assert normalize_header("StreamingTV") == "streamingtv"


def test_end_to_end_pipeline(spark, tmp_path):
    from etl_pipeline_telecom_spark.plans.churn import run_pipeline

    paths = run_pipeline(spark, RAW, str(tmp_path))
    staged = pd.read_csv(paths["staged"])
    assert len(staged) == 7043 and len(staged.columns) == 24
    for key in ("summary", "avg_by_contract", "tenure_counts", "internet_counts", "pivot"):
        assert os.path.exists(paths[key]), key
    import json

    with open(paths["summary_json"]) as fh:
        data = json.load(fh)
    assert isinstance(data, list) and data[0]["total_rows"] == 7043
