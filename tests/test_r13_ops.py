"""Crafted-data pins for the round-13 operators.

Same discipline as test_r7-r12_ops: hand-computed expectations on tiny
crafted fixtures (the hash gate is blind to bugs BOTH engines share —
d19's lesson), plus the DuckDB oracle round-trip where the operator has
one.
"""

from __future__ import annotations

import hashlib
import os

import pytest

from etl_pipeline_telecom_spark import catalog

from .oracle_harness import compare
from .test_r12_ops import _write_docs

pytestmark = pytest.mark.usefixtures("spark")

catalog._load_all_plans()


def _roundtrip(spark, d: str, name: str) -> None:
    spec = catalog.REGISTRY[name]
    ok, msg = compare(spark, d, spec.fn, spec.sql)
    assert ok, f"{name}: {msg}"


# ---------------------------------------------------------------------------
# pipe5: streaming incremental curation against persisted state
# ---------------------------------------------------------------------------

# A corpus where every gate fires on a KNOWN batch doc, including the two
# state-dependent paths no batch rerun exercises: an arrival dropped only
# because of the PERSISTED base store, and one dropped only because of a
# doc ADMITTED BY AN EARLIER MICRO-BATCH.
#
# base (doc_id % 7 != 3): 1, 2 — two copies of the same 25-word doc; the
#   frozen LM trains on them, so every train-seen bigram carries 0 bits
#   and the frozen threshold is exactly 0 (a doc passes the perplexity
#   gate iff it has >= 1 train-seen bigram).
# batch (doc_id % 7 == 3), slice = (doc_id // 7) % 4:
#   3  (slice 0) exact copy of base doc 1       -> dropped at exact_dedup
#   31 (slice 0) "the qa1 the qa2 ..." — every bigram train-unseen
#                                               -> dropped at perplexity
#   59 (slice 0) unique quality doc             -> ADMITTED
#   38 (slice 1) base doc 1 with last word swapped (shingle J = 5/6)
#                                               -> dropped at fuzzy (BASE anchor)
#   66 (slice 1) doc 59 with one word swapped   -> dropped at fuzzy
#                                    (anchored to the slice-0 ADMISSION)
#   17 (slice 2) no language markers            -> dropped at langid
#   45 (slice 2) "the cat and dog nap" x5       -> within-slice pair rep, ADMITTED
#   73 (slice 2) 45 with one 'nap' -> 'map'     -> dropped (non-rep of the pair)
#   24 (slice 3) three words                    -> dropped at gopher_rules
_P5_BASE = "the cat and dog sat " * 5
_P5_UNIQ = (
    "the cat ate food and the dog ate bones and the cat ran fast "
    "and the dog ran far and all sat here"
)
_PIPE5_ROWS = [
    (1, _P5_BASE, "en", "web"),
    (2, _P5_BASE, "en", "web"),
    (3, _P5_BASE, "en", "web"),
    (17, " ".join(f"zoqa{i}" for i in range(25)), "en", "web"),
    (24, "the and cat", "en", "web"),
    (31, " ".join(f"the qa{i}" for i in range(1, 13)), "en", "web"),
    (38, _P5_BASE.rstrip().rsplit(" ", 1)[0] + " fowl", "en", "web"),
    (45, "the cat and dog nap " * 5, "en", "web"),
    (59, _P5_UNIQ, "en", "web"),
    (66, _P5_UNIQ.replace("bones", "rocks"), "en", "web"),
    (73, ("the cat and dog nap " * 5).rstrip().rsplit(" ", 1)[0] + " map", "en", "web"),
]

_PIPE5_EXPECT = {
    # slice: (n0, n1, n2, n3, n4, n5)
    0: (3, 3, 3, 2, 1, 1),
    1: (2, 2, 2, 2, 2, 0),
    2: (3, 2, 2, 2, 2, 1),
    3: (1, 1, 0, 0, 0, 0),
}


def _pipe5_state_dir(sf_dir: str) -> str:
    key = hashlib.md5(
        f"{os.path.abspath(sf_dir)}:{os.getpid()}".encode()
    ).hexdigest()[:10]
    return os.path.join("/tmp", f"spark_graft_pipe5_state_{key}")


def test_pipe5_crafted_every_gate_fires(spark, tmp_path):
    from etl_pipeline_telecom_spark.plans.pipeline import pipe5_incremental_curation

    d = _write_docs(tmp_path, _PIPE5_ROWS)
    rows = pipe5_incremental_curation(spark, d).collect()
    got = {(r.slice_id, r.stage_ord): (r.docs_in, r.docs_out) for r in rows}
    assert len(rows) == 24
    for s, (n0, n1, n2, n3, n4, n5) in _PIPE5_EXPECT.items():
        chain = [n0, n1, n2, n3, n4, n5]
        for o in range(6):
            di = n0 if o == 0 else chain[o - 1]
            assert got[(s, o)] == (di, chain[o]), (s, o, got[(s, o)])
    # the two state-dependent drops really happened at the fuzzy stage:
    # slice 1 lost both docs there (38 to the base anchor, 66 to the
    # slice-0 admission) and nowhere earlier
    assert got[(1, 5)] == (2, 0)


def test_pipe5_crafted_admitted_state(spark, tmp_path):
    """The delta store ends the run holding EXACTLY the admitted docs —
    59 (slice 0) and 45 (slice 2) — with base-consistent fingerprints."""
    from etl_pipeline_telecom_spark.plans.pipeline import pipe5_incremental_curation

    d = _write_docs(tmp_path, _PIPE5_ROWS)
    pipe5_incremental_curation(spark, d).collect()
    state = spark.read.parquet(os.path.join(_pipe5_state_dir(d), "admitted"))
    got = {(r.slice_id, r.doc_id) for r in state.collect()}
    assert got == {(0, 59), (2, 45)}


def test_pipe5_oracle_roundtrip_crafted(spark, tmp_path):
    _roundtrip(spark, _write_docs(tmp_path, _PIPE5_ROWS), "pipe5_incremental_curation")


def test_pipe5_oracle_roundtrip(spark, sf_dir):
    _roundtrip(spark, sf_dir, "pipe5_incremental_curation")


def test_pipe5_stream_state_equals_audit(spark, sf_dir):
    """Stream-vs-batch set equality, per slice: the ids the foreachBatch
    path ADMITTED INTO THE STORE == the ids the audit recompute admits.
    (The oracle hash already fails if a wrong admit shifts a later
    slice's counts; this pins the admitted SETS directly, catching a
    count-preserving swap the funnel could miss.)"""
    from etl_pipeline_telecom_spark.plans.pipeline import (
        _pipe5_audit,
        pipe5_incremental_curation,
    )

    pipe5_incremental_curation(spark, sf_dir).collect()
    state_dir = _pipe5_state_dir(sf_dir)
    state = spark.read.parquet(os.path.join(state_dir, "admitted"))
    stream_adm = {}
    for r in state.select("slice_id", "doc_id").collect():
        stream_adm.setdefault(int(r.slice_id), set()).add(int(r.doc_id))
    audit_adm: dict[int, object] = {}
    _pipe5_audit(spark, sf_dir, state_dir, admitted_out=audit_adm).collect()
    for s, adm_df in audit_adm.items():
        audit_ids = {int(r.doc_id) for r in adm_df.collect()}
        assert stream_adm.get(s, set()) == audit_ids, f"slice {s}"


def test_pipe5_base_index_files_physically_untouched(spark, sf_dir):
    """The curation pass PROBES the persisted base band index, never
    rewrites it — the p11/v15 physical-pin pattern (path, size, mtime)."""
    from etl_pipeline_telecom_spark.plans.dedup import persisted_band_index
    from etl_pipeline_telecom_spark.plans.pipeline import pipe5_incremental_curation

    persisted_band_index(spark, sf_dir)  # ensure built
    base = os.path.abspath(sf_dir)
    slug = "".join(
        c if c.isalnum() else "_" for c in base.rstrip("/").rsplit("/", 1)[-1]
    )
    table = f"lsh_band_index_{slug}_{hashlib.sha1(base.encode()).hexdigest()[:8]}"
    pkg = os.path.dirname(
        os.path.dirname(os.path.abspath(catalog.__file__))
    )
    idx_dir = os.path.join(pkg, ".scratch", table)

    def snap():
        return sorted(
            (f, os.path.getsize(os.path.join(idx_dir, f)),
             os.path.getmtime(os.path.join(idx_dir, f)))
            for f in os.listdir(idx_dir)
            if not f.startswith(".")
        )

    before = snap()
    assert before, "base index is empty"
    pipe5_incremental_curation(spark, sf_dir).collect()
    assert snap() == before, "curation touched the base index files"


def test_pipe5_funnel_chaining_and_state_vectors(spark, sf_dir):
    """Chaining + the built-in dup vector at fixture scale: docs_in
    chains from the previous stage's docs_out within every slice, and
    the dup re-insertions (orig % 70 == 0 lands the copy in the batch)
    make the exact_dedup stage provably fire against the base store."""
    from etl_pipeline_telecom_spark.plans.pipeline import pipe5_incremental_curation

    rows = sorted(
        pipe5_incremental_curation(spark, sf_dir).collect(),
        key=lambda r: (r.slice_id, r.stage_ord),
    )
    assert [(r.slice_id, r.stage_ord) for r in rows] == [
        (s, o) for s in range(4) for o in range(6)
    ]
    for s in range(4):
        sl = rows[s * 6 : (s + 1) * 6]
        assert sl[0].docs_in == sl[0].docs_out  # arrived
        for prev, cur in zip(sl, sl[1:]):
            assert cur.docs_in == prev.docs_out, (s, cur.stage)
        for r in sl:
            assert r.dropped == r.docs_in - r.docs_out
    assert sum(r.dropped for r in rows if r.stage == "exact_dedup") > 0
    assert sum(r.docs_out for r in rows if r.stage == "fuzzy_dedup") > 0
