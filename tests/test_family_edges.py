"""Crafted-edge pins for families whose edges random fixtures miss.

- e5: half-open band bounds — a value EXACTLY on a band edge belongs to
  the upper band ([lo, hi)); continuous random values never land there.
- g1: even-count group median — pandas and the SQL oracle must both
  interpolate (mean of the middle two), pinned on a 2-element group.
- x2: map canonicalization — per-user type:count strings sort the same
  regardless of aggregation/arrival order, incl. a single-type user.

Each pin asserts hand-computed values AND round-trips the crafted
fixture through the full oracle compare (the driver's hash discipline).
"""

from __future__ import annotations

import datetime as dt
import os

import pytest

from etl_pipeline_telecom_spark import catalog

from .oracle_harness import compare
from .test_r6_ops import _write_events

pytestmark = pytest.mark.usefixtures("spark")

catalog._load_all_plans()


def test_e5_value_exactly_on_band_edge_goes_to_upper_band(spark, tmp_path):
    from etl_pipeline_telecom_spark.plans.eventtime import e5_band_range_join

    t0 = dt.datetime(2024, 1, 5, 12, 0, 0)
    s = dt.timedelta(seconds=1)
    _write_events(
        tmp_path,
        [
            (1, t0 + 1 * s, 1, "click", 0.0),   # low edge → low
            (2, t0 + 2 * s, 1, "click", 4.99),  # low
            (3, t0 + 3 * s, 1, "click", 5.0),   # mid edge → mid, NOT low
            (4, t0 + 4 * s, 1, "click", 14.99),  # mid
            (5, t0 + 5 * s, 1, "click", 15.0),  # high edge → high, NOT mid
        ],
    )
    got = {r["band"]: (r["cnt"], r["sum_value"]) for r in e5_band_range_join(spark, str(tmp_path)).collect()}
    assert got["low"] == (2, 4.99)
    assert got["mid"] == (2, round(5.0 + 14.99, 2))
    assert got["high"] == (1, 15.0)
    spec = catalog.REGISTRY["e5_band_range_join"]
    ok, msg = compare(spark, str(tmp_path), spec.fn, spec.sql)
    assert ok, msg


def test_g1_even_count_group_interpolates_median(spark, tmp_path):
    from etl_pipeline_telecom_spark.plans.semistructured import g1_grouped_median

    rows = [
        (0, "a", "en", "even2", 10),
        (1, "b", "en", "even2", 13),  # median (10+13)/2 = 11.5
        (2, "c", "en", "odd3", 5),
        (3, "d", "en", "odd3", 7),
        (4, "e", "en", "odd3", 9),  # median 7
        (5, "f", "en", "single", 42),  # median 42
    ]
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([r[4] for r in rows], pa.int64()),
        }),
        os.path.join(str(tmp_path), "documents.parquet"),
    )
    got = {
        r["source"]: (r["median_chars"], r["n_docs"])
        for r in g1_grouped_median(spark, str(tmp_path)).collect()
    }
    assert got["even2"] == (11.5, 2)
    assert got["odd3"] == (7.0, 3)
    assert got["single"] == (42.0, 1)
    spec = catalog.REGISTRY["g1_grouped_median"]
    ok, msg = compare(spark, str(tmp_path), spec.fn, spec.sql)
    assert ok, msg


def test_x2_map_canonicalization_is_order_independent(spark, tmp_path):
    from etl_pipeline_telecom_spark.plans.semistructured import x2_event_type_map

    t0 = dt.datetime(2024, 1, 5, 12, 0, 0)
    s = dt.timedelta(seconds=1)
    # user 1's types arrive interleaved and out of alphabetical order;
    # user 2 has a single type
    _write_events(
        tmp_path,
        [
            (1, t0 + 1 * s, 1, "view", 1.0),
            (2, t0 + 2 * s, 1, "click", 1.0),
            (3, t0 + 3 * s, 1, "view", 1.0),
            (4, t0 + 4 * s, 1, "error", 1.0),
            (5, t0 + 5 * s, 1, "click", 1.0),
            (6, t0 + 6 * s, 2, "signup", 1.0),
        ],
    )
    got = {r["user_id"]: r["type_counts"] for r in x2_event_type_map(spark, str(tmp_path)).collect()}
    assert got[1] == "click:2,error:1,view:2"
    assert got[2] == "signup:1"
    spec = catalog.REGISTRY["x2_event_type_map"]
    ok, msg = compare(spark, str(tmp_path), spec.fn, spec.sql)
    assert ok, msg
