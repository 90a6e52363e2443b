"""Data-quality validation operators (SURVEY.md §2.12: V1–V6).

The reference's ``scripts/validate.py:50-135`` runs six printed checks:
null counts (V1, ``:70-73``), local row count (V2, ``:80``), local↔remote
count reconciliation (V3, ``:87-92``), and domain checks (V4–V6,
``:94-118``). Here they are a reusable ``expect``-style suite that emits
a results DataFrame instead of prints — and, critically for scale, ALL
scalar observations are computed in ONE aggregation pass over the input
(one job, one scan, map-side partials), not one scan per check as the
reference does.

Domain checks use ``collect_set`` — only sound for low-cardinality
columns (the reference's domains are ≤4 values); a high-cardinality
"domain" check should be rewritten as a violation COUNT instead, which
``expect_domain(..., as_violations=True)`` does.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

RESULT_SCHEMA = "check string, passed boolean, observed string, expected string"


@dataclass(frozen=True)
class Expectation:
    """One check: an aggregate observation column + a pass predicate."""

    name: str
    observed: Column  # aggregate expression → scalar, stringified for the report
    expected: str
    passed: "callable"  # python predicate over the observed scalar


def expect_no_nulls(col: str) -> Expectation:
    """V1 — zero nulls in a required column (``validate.py:70-73``)."""
    return Expectation(
        name=f"no_nulls:{col}",
        observed=F.sum(F.col(col).isNull().cast("long")),
        expected="0",
        passed=lambda v: v == 0,
    )


def expect_row_count(minimum: int = 1) -> Expectation:
    """V2 — table has at least ``minimum`` rows (``validate.py:80``)."""
    return Expectation(
        name="row_count_min",
        observed=F.count(F.lit(1)),
        expected=f">={minimum}",
        passed=lambda v, m=minimum: v >= m,
    )


def expect_domain(col: str, allowed: set, *, subset: bool = False, as_violations: bool = False) -> Expectation:
    """V4–V6 — distinct values equal (or ⊆) an allowed set
    (``validate.py:94-118``). ``as_violations`` counts out-of-domain rows
    instead of collecting the set — the scale-safe form.

    NULLs count as an observed value ``∅NULL∅`` (the reference's pandas
    ``unique()`` surfaces NaN and fails set equality — ``validate.py:97``),
    so null contamination fails the check in both forms. ``collect_set``
    alone would silently drop them."""
    allowed_sorted = sorted(str(a) for a in allowed)
    if as_violations:
        return Expectation(
            name=f"domain_violations:{col}",
            # isin is NULL on NULL input; coalesce(False) makes NULL a violation
            observed=F.sum(
                (~F.coalesce(F.col(col).isin(list(allowed)), F.lit(False))).cast("long")
            ),
            expected="0",
            passed=lambda v: v == 0,
        )
    return Expectation(
        name=f"domain:{col}",
        observed=F.array_join(
            F.array_sort(F.collect_set(F.coalesce(F.col(col).cast("string"), F.lit("∅NULL∅")))),
            ",",
        ),
        expected=("⊆" if subset else "=") + "{" + ",".join(allowed_sorted) + "}",
        passed=(
            (lambda v, a=set(allowed_sorted): set(v.split(",")) <= a)
            if subset
            else (lambda v, a=",".join(allowed_sorted): v == a)
        ),
    )


def expect_unique(col: str) -> Expectation:
    """Key uniqueness: distinct count == row count."""
    return Expectation(
        name=f"unique:{col}",
        observed=F.count(F.lit(1)) - F.count_distinct(F.col(col)),
        expected="0",
        passed=lambda v: v == 0,
    )


def expect_counts_match(other_count: int) -> Expectation:
    """V3 — reconcile against an external count (``validate.py:87-92``).

    ``other_count`` comes from the remote system (e.g. ``jdbc_count``);
    the comparison itself is driver-side, as in the reference."""
    return Expectation(
        name="count_reconciliation",
        observed=F.count(F.lit(1)),
        expected=str(other_count),
        passed=lambda v, n=other_count: v == n,
    )


def run_expectations(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Evaluate every expectation in ONE aggregation job → results DataFrame.

    The single ``agg`` means one scan however many checks run; each
    observation is a map-side partial aggregate. Results are assembled
    driver-side (they are |checks| rows — tiny by construction).
    """
    obs_cols = [e.observed.alias(f"_e{i}") for i, e in enumerate(expectations)]
    row = df.agg(*obs_cols).collect()[0]
    spark = df.sparkSession
    results = [
        (e.name, bool(e.passed(row[i])), str(row[i]), e.expected)
        for i, e in enumerate(expectations)
    ]
    return spark.createDataFrame(results, schema=RESULT_SCHEMA)


def churn_expectations() -> list[Expectation]:
    """The reference's exact staged-table suite (V1, V2, V4, V5, V6)."""
    return [
        expect_no_nulls("tenure"),
        expect_no_nulls("MonthlyCharges"),
        expect_no_nulls("TotalCharges"),
        expect_row_count(1),
        expect_domain("tenure_group", {"New", "Regular", "Loyal", "Champion"}),
        expect_domain("monthly_charge_segment", {"Low", "Medium", "High"}),
        expect_domain("contract_type_code", {0, 1, 2}, subset=True),
    ]
