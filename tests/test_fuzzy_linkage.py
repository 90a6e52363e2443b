"""Crafted pins for the fuzzy record-linkage blockers (d14 / d15).

The sf fixtures' supplier names are uniform-length generated strings, so
random data never exercises the INDEL half of lev<=1 linkage (insert/
delete pairs change length). These pins craft the exact cases:

- a substitution pair (equal length)    — d14 and d15 must both find it
- an end-insertion pair  (length +1)    — d15 only (d14 is same-length by design)
- a mid-insertion pair   (length +1)    — d15 only
- a deletion pair        (length -1)    — d15 only (symmetric to insertion)
- a transposition        (lev = 2)      — the deletion-neighborhood blocker
  PROPOSES it (del-at-1 of "AB" == del-at-2 of "BA" == "B" is false;
  actually del("AB",1)="B", del("BA",2)="B" — same key), so the exact
  levenshtein verify must DROP it
- an unrelated name                     — in no pair

Each result is asserted against the hand answer AND round-tripped
through ``oracle_harness.compare`` (the driver's hash-style compare) on
the crafted parquet.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from etl_pipeline_telecom_spark import catalog

from .oracle_harness import compare

NAMES = [
    "ACME CORP",   # substitution pair with ACME CORB
    "ACME CORB",
    "BOLT",        # end-insertion pair with BOLTS, mid-insertion with BOALT
    "BOLTS",
    "BOALT",
    "WIDGET",      # deletion pair with WIDGT
    "WIDGT",
    "AB",          # transposition with BA: lev 2, must be dropped
    "BA",
    "ZETA",        # unrelated
]


def _write_supplier(tmp_path) -> str:
    table = pa.table(
        {
            "s_suppkey": pa.array(list(range(1, len(NAMES) + 1)), pa.int64()),
            "s_name": pa.array(NAMES, pa.string()),
            "s_nationkey": pa.array([0] * len(NAMES), pa.int32()),
            "s_acctbal": pa.array([0.0] * len(NAMES), pa.float64()),
        }
    )
    d = str(tmp_path)
    pq.write_table(table, os.path.join(d, "supplier.parquet"))
    return d


def _pairs(df):
    return {(r["name_a"], r["name_b"], r["dist"]) for r in df.collect()}


def test_d15_finds_substitution_insert_and_delete_pairs(spark, tmp_path):
    d = _write_supplier(tmp_path)
    spec = catalog.specs()["d15_fuzzy_indel_pairs"]
    got = _pairs(spec.fn(spark, d))
    assert got == {
        ("ACME CORB", "ACME CORP", 1),  # substitution
        ("BOLT", "BOLTS", 1),           # end insertion
        ("BOALT", "BOLT", 1),           # mid insertion
        ("WIDGET", "WIDGT", 1),         # deletion
    }
    # the transposition (lev 2) was proposed by the blocker but dropped,
    # and the unrelated name pairs with nothing
    names_in_pairs = {p[0] for p in got} | {p[1] for p in got}
    assert {"AB", "BA", "ZETA"}.isdisjoint(names_in_pairs)
    ok, msg = compare(spark, d, spec.fn, spec.sql)
    assert ok, msg


def _lev(a: str, b: str) -> int:
    import itertools

    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_d14_same_length_only_and_subset_of_d15(spark, tmp_path):
    d = _write_supplier(tmp_path)
    d14 = catalog.specs()["d14_fuzzy_name_pairs"]
    d15 = catalog.specs()["d15_fuzzy_indel_pairs"]
    got14 = _pairs(d14.fn(spark, d))
    got15 = _pairs(d15.fn(spark, d))
    # d14 (position-mask, same-length) finds exactly the substitution pair
    assert got14 == {("ACME CORB", "ACME CORP", 1)}
    # and is a strict subset of d15 on this fixture (indels exist)
    assert got14 < got15
    ok, msg = compare(spark, d, d14.fn, d14.sql)
    assert ok, msg


def test_d15_matches_bruteforce_on_crafted_names(spark, tmp_path):
    """The blocker must equal the O(n^2) python brute force exactly."""
    d = _write_supplier(tmp_path)
    spec = catalog.specs()["d15_fuzzy_indel_pairs"]
    got = _pairs(spec.fn(spark, d))
    want = {
        (a, b, _lev(a, b))
        for i, a in enumerate(sorted(NAMES))
        for b in sorted(NAMES)[i + 1:]
        if _lev(a, b) <= 1
    }
    assert got == want
