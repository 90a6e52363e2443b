"""Session-2 property pins for the round-9 operators.

Test-only hardening: laws that hold for ANY input, checked over
seeded-random corpora — complements the crafted pins in test_r9_ops.py.
"""

from __future__ import annotations

import random

import pytest

from etl_pipeline_telecom_spark import catalog

pytestmark = pytest.mark.usefixtures("spark")

catalog._load_all_plans()


def test_m8_scene_numpy_path_equals_reference_grays():
    """The operator's per-scene numpy derivation (one md5 grid per scene
    + vectorized brightness add) must equal the reference per-frame
    `_m8_gray` for every (doc, frame) — the equivalence the 324x->15.6x
    scale rewrite relies on."""
    import hashlib

    import numpy as np

    from etl_pipeline_telecom_spark.plans.multimodal import (
        _M8_PX,
        _M8_SCENE_LEN,
        _m8_gray,
    )

    rnd = random.Random(9_002)
    for _ in range(60):
        doc = rnd.randrange(0, 10_000_000)
        nf = rnd.choice((8, 12, 16))
        for scene in range(nf // _M8_SCENE_LEN):
            raw = b"".join(
                hashlib.md5(f"{doc}:{scene}:{k}".encode()).digest()
                for k in range(9)
            )[:_M8_PX]
            base = np.frombuffer(raw, dtype=np.uint8).astype(np.int64) % 250
            for j in range(_M8_SCENE_LEN):
                f = scene * _M8_SCENE_LEN + j
                assert (base + j).tolist() == _m8_gray(doc, f), (doc, f)


def _random_messy_url(rnd: random.Random) -> str:
    scheme = rnd.choice(("http", "HTTP", "https", "HtTpS"))
    host = rnd.choice(("Example.COM", "www.example.com", "WWW.Sub.Example.org", "a.b.c"))
    port = rnd.choice(("", ":80", ":443", ":8080"))
    path = rnd.choice(("", "/", "/x", "/x/", "/docs/1", "/A/B/"))
    params = rnd.sample(
        ["a=1", "b=2", "utm_source=x", "utm_medium=y", "z=", "q=%20"],
        rnd.randrange(0, 5),
    )
    query = "?" + "&".join(params) if params else ""
    frag = rnd.choice(("", "#sec", "#a/b?c=1"))
    return f"{scheme}://{host}{port}{path}{query}{frag}"


def test_d19_canonicalization_is_idempotent(spark):
    """canonical(canonical(u)) == canonical(u): every rule must be a
    projection (fragment/utm gone, params sorted, case folded, port and
    trailing slash stripped) — a rule that keeps rewriting on its own
    output would merge URLs unstably between pipeline stages."""
    from pyspark.sql import functions as F

    from etl_pipeline_telecom_spark.plans.dedup import canonical_url

    rnd = random.Random(9_003)
    urls = [(_random_messy_url(rnd),) for _ in range(300)]
    df = spark.createDataFrame(urls, "raw string")
    out = df.select(
        canonical_url(F.col("raw")).alias("c1"),
        canonical_url(canonical_url(F.col("raw"))).alias("c2"),
    )
    bad = out.where(F.col("c1") != F.col("c2")).collect()
    assert bad == [], bad[:5]


def test_d19_canonical_never_contains_noise(spark):
    """Canonical URLs never carry a fragment, a utm_* param, a default
    port, an upper-case scheme/host, or a www. prefix."""
    from pyspark.sql import functions as F

    from etl_pipeline_telecom_spark.plans.dedup import canonical_url

    rnd = random.Random(9_004)
    urls = [(_random_messy_url(rnd),) for _ in range(300)]
    df = spark.createDataFrame(urls, "raw string").select(
        canonical_url(F.col("raw")).alias("c")
    )
    for pat in ("#", "utm_", ":80/", ":443/", "://www\\."):
        n = df.where(F.col("c").rlike(pat)).count()
        assert n == 0, pat
    host = F.regexp_extract("c", r"^([a-z]+)://([^/?#]*)", 0)
    assert df.where(host != F.lower(host)).count() == 0


def test_a25_random_splits_equal_python_replay(spark, tmp_path):
    """KMV estimator law over randomized cohort splits: for any date
    split the operator equals the independent hashlib replay (both
    estimator and <k fallback paths get exercised across trials)."""
    import pandas as pd

    from .test_r9_ops import _a25_python_replay

    rnd = random.Random(9_005)
    paths_hit = set()
    for trial in range(3):
        n = rnd.choice((30, 120, 400))
        cks = rnd.sample(range(1, 5000), n)
        years = [rnd.choice((1995, 1996, 1997, 1998, 1999, 2000)) for _ in cks]
        d = tmp_path / f"t{trial}"
        d.mkdir()
        import pyarrow as pa
        import pyarrow.parquet as pq

        pdf = pd.DataFrame(
            {
                "o_orderkey": range(len(cks)),
                "o_custkey": cks,
                "o_orderdate": [pd.Timestamp(f"{y}-06-01") for y in years],
            }
        )
        pq.write_table(pa.Table.from_pandas(pdf), d / "orders.parquet",
                       coerce_timestamps="us")
        want = _a25_python_replay([(c, y <= 1997) for c, y in zip(cks, years)])
        got = {
            r["measure"]: (r["est"], r["exact"])
            for r in catalog.REGISTRY["a25_kmv_theta_setops"].fn(spark, str(d)).collect()
        }
        assert got == want, (trial, n)
        paths_hit.add("est" if got["union"][0] != got["union"][1] or n >= 64 else "exact")
    assert paths_hit  # at least one trial ran
