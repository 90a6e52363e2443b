"""Scalar / expression functions (SURVEY.md §2.4: F1–F13).

Every helper returns a native ``pyspark.sql.Column`` expression — no Python
UDFs. The reference implements two of these as row-at-a-time lambdas
(``scripts/transform.py:48-50``, ``etl_analysis.ipynb cell7:12-26``); native
expressions keep them inside whole-stage codegen and SQL-expressible for the
DuckDB oracle, and are the only form that survives a 100 TB scan without a
Python serde wall.

Semantic parity notes (SURVEY.md §4.3):
- F1: Spark ``try_cast``/cast of a non-numeric string yields NULL, matching
  ``pd.to_numeric(errors="coerce")`` (``scripts/transform.py:20``).
- F2: median fill must be the *exact* interpolating median (pandas
  ``.median()``, ``scripts/transform.py:23-25``) — ``F.median``, never
  ``percentile_approx``, when hash-matching an oracle. At 100 TB exact
  median is a full sort; callers can pass ``approx=True`` to trade
  exactness for a single-pass sketch.
- F4: ``pd.cut`` bins are right-closed (``scripts/transform.py:36-38``) —
  the ``<=`` when-chain reproduces interval membership exactly.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def coerce_numeric(col: Column | str, to: str = "double") -> Column:
    """F1 — string→numeric coercion; unparseable → NULL.

    Parity: ``pd.to_numeric(errors="coerce")`` at ``scripts/transform.py:20``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("string").try_cast(to)


def median_fill(df: DataFrame, cols: Sequence[str], *, approx: bool = False) -> DataFrame:
    """F2 — fill numeric NULLs with the column median.

    Exact interpolating median by default (parity with pandas ``.median()``,
    ``scripts/transform.py:23-25``). ``approx=True`` switches to
    ``percentile_approx`` — the scale path: one pass, no full sort.
    The medians are computed in ONE aggregate job over all columns, then
    applied with ``na.fill`` (no per-column scan).
    """
    agg_fn = (lambda c: F.percentile_approx(c, 0.5)) if approx else F.median
    aggs = [agg_fn(F.col(c)).alias(c) for c in cols]
    medians = df.agg(*aggs).collect()[0].asDict()
    return df.na.fill({c: m for c, m in medians.items() if m is not None})


def const_fill(df: DataFrame, value, cols: Sequence[str] | None = None) -> DataFrame:
    """F3/F13 — fill NULLs with a constant (``"Unknown"`` fill at
    ``scripts/transform.py:28-29``; sentinel fills at nb ``cell8:17,21,28``).

    With ``cols=None`` and a string value, fills every string column —
    the reference's "all object columns" behavior.
    """
    if cols is None and isinstance(value, str):
        cols = [f.name for f in df.schema.fields if f.dataType.typeName() == "string"]
    return df.na.fill(value, subset=list(cols) if cols else None)


def bucketize(col: Column | str, edges: Sequence[float], labels: Sequence[str]) -> Column:
    """F4 — static-edge right-closed binning with labels.

    Parity: ``pd.cut(tenure, bins=[-1,12,36,60,inf], labels=[...])`` at
    ``scripts/transform.py:36-38``: value v gets label i where
    edges[i] < v <= edges[i+1]; the last label catches everything above.
    ``edges`` excludes the leading -inf/-1 edge: pass ``[12, 36, 60]`` with
    four labels.
    """
    if len(labels) != len(edges) + 1:
        raise ValueError("need len(labels) == len(edges) + 1")
    c = F.col(col) if isinstance(col, str) else col
    expr = F.when(c <= edges[0], labels[0])
    for edge, label in zip(edges[1:], labels[1:-1]):
        expr = expr.when(c <= edge, label)
    return expr.otherwise(labels[-1])


def segment3(col: Column | str, low: float, high: float, labels: Sequence[str] = ("Low", "Medium", "High")) -> Column:
    """F5 — 3-way nested conditional.

    Parity: ``np.where(mc<30,"Low", np.where(mc<=70,"Medium","High"))`` at
    ``scripts/transform.py:41-44`` — note ``<`` then ``<=``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c < low, labels[0]).when(c <= high, labels[1]).otherwise(labels[2])


def normalize_string(col: Column | str) -> Column:
    """F6 — ``astype(str).str.lower().str.strip()`` (``scripts/transform.py:47,62``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.trim(c.cast("string")))


def membership_flag(col: Column | str, values: Sequence[str]) -> Column:
    """F7 — membership → 0/1 int flag.

    Replaces the reference's row lambda (``scripts/transform.py:48-50``)
    with a codegen-able ``isin`` over the normalized string.
    """
    return normalize_string(col).isin(list(values)).cast("int")


def eq_flag(col: Column | str, value: str) -> Column:
    """F8 — equality → 0/1 flag (``.str.lower().eq("yes").astype(int)``,
    ``scripts/transform.py:53``)."""
    return (normalize_string(col) == value.lower()).cast("int")


def dict_encode(col: Column | str, mapping: Mapping[str, int], default: int = -1) -> Column:
    """F9 — dict-map encode with a default for unmatched keys.

    Parity: contract encoding at ``scripts/transform.py:56-63``
    ({month-to-month:0, one year:1, two year:2}, else −1). Built as a
    when-chain over the normalized value so it stays SQL-expressible.
    """
    norm = normalize_string(col)
    expr = None
    for k, v in mapping.items():
        cond = norm == k.lower()
        expr = F.when(cond, v) if expr is None else expr.when(cond, v)
    return (expr.otherwise(default) if expr is not None else F.lit(default)).cast("int")


# truthy/falsy token sets for to_flag (etl_analysis.ipynb cell7:12-26)
_TRUE_TOKENS = ("yes", "y", "true", "1")
_FALSE_TOKENS = ("no", "n", "false", "0")


def to_flag(col: Column | str) -> Column:
    """F10 — canonical 0/1 flag from mixed bool/str/numeric input.

    Parity: the notebook's ``to_flag`` UDF (``etl_analysis.ipynb
    cell7:12-26``): numeric 1→1, other numerics→0; else lower/strip in
    {yes,y,true,1}→1, {no,n,false,0}→0, anything else → NULL. Expressed as
    a native when-chain (the numeric branch via ``try_cast``).
    """
    c = F.col(col) if isinstance(col, str) else col
    s = F.lower(F.trim(c.cast("string")))
    num = s.try_cast("double")
    return (
        F.when(c.isNull(), F.lit(None).cast("int"))
        .when(num.isNotNull(), (num == 1.0).cast("int"))
        .when(s.isin(*_TRUE_TOKENS), 1)
        .when(s.isin(*_FALSE_TOKENS), 0)
        .otherwise(F.lit(None).cast("int"))
    )
