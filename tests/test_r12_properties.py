"""Property-based tests (hypothesis) for the round-12 integer-exactness
laws — pure-python replays of the formulas, no Spark session, so the
laws themselves (not just the fixture instances the crafted pins cover)
are exercised across the input space.
"""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st


def _bl(x: int) -> int:
    """length(bin(x)) — the floor-log2 surrogate both engines share."""
    return x.bit_length()


# ---------------------------------------------------------------------------
# t30: stupid-backoff scoring laws
# ---------------------------------------------------------------------------


def _t30_bits(cnt: int | None, cc: int | None, ucnt: int | None, T: int) -> int:
    """One eval bigram's bits under t30's three-path rule."""
    if cnt is not None:
        return _bl(cc) - _bl(cnt)
    if ucnt is not None:
        return 1 + _bl(T) - _bl(ucnt)
    return 1 + _bl(T)


@settings(max_examples=300)
@given(
    st.integers(min_value=1, max_value=10**12),  # bigram count
    st.integers(min_value=0, max_value=10**12),  # extra context mass
)
def test_t30_seen_path_bits_are_nonnegative_and_monotone(cnt, extra):
    """cc >= cnt by construction (the bigram is part of its context's
    mass), so seen bits are never negative; and growing the bigram's own
    count with the context fixed never increases its surprisal."""
    cc = cnt + extra
    assert _t30_bits(cnt, cc, None, 1) >= 0
    if cnt > 1:
        assert _t30_bits(cnt, cc, None, 1) <= _t30_bits(cnt - 1, cc, None, 1)


@settings(max_examples=300)
@given(
    st.integers(min_value=1, max_value=10**12),  # ucnt
    st.integers(min_value=0, max_value=10**12),  # extra corpus mass
)
def test_t30_backoff_path_dominates_oov_and_stays_positive(ucnt, extra):
    """T >= ucnt (the word is part of the train mass), so backoff bits
    are >= 1; a KNOWN w2 never scores worse than an OOV one under the
    same model — the smoothing is order-correct."""
    T = ucnt + extra
    b = _t30_bits(None, None, ucnt, T)
    assert b >= 1
    assert b <= _t30_bits(None, None, None, T)


@settings(max_examples=200)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["seen", "backoff", "oov"]),
            st.integers(min_value=1, max_value=10**9),
            st.integers(min_value=0, max_value=10**9),
        ),
        min_size=1,
        max_size=200,
    ),
    st.integers(min_value=1, max_value=10**12),
)
def test_t30_doc_factoring_equals_per_bigram_sum(paths, T):
    """The per-doc factored form (bits_seen + (n_backoff+n_oov)*(1+bl(T))
    − Σ bl(ucnt)) must equal the naive per-bigram sum for ANY path mix —
    the algebra the Spark plan relies on to keep the 1-row scalar off
    the bigram-sized frame."""
    naive = 0
    bits_seen = n_bo = n_oov = bl_bo = 0
    for kind, a, extra in paths:
        if kind == "seen":
            cnt, cc = a, a + extra
            naive += _bl(cc) - _bl(cnt)
            bits_seen += _bl(cc) - _bl(cnt)
        elif kind == "backoff":
            ucnt = min(a, T)
            naive += 1 + _bl(T) - _bl(ucnt)
            n_bo += 1
            bl_bo += _bl(ucnt)
        else:
            naive += 1 + _bl(T)
            n_oov += 1
    factored = bits_seen + (n_bo + n_oov) * (1 + _bl(T)) - bl_bo
    assert factored == naive


# ---------------------------------------------------------------------------
# sm11: largest-remainder apportionment over cells
# ---------------------------------------------------------------------------


def _sm11_quotas(survivors: list[int]) -> tuple[int, list[int]]:
    budget = 1_000_000 * sum(survivors)
    s = [int(math.floor(math.sqrt(n) * 1000)) for n in survivors]
    s_tot = sum(s)
    base = [(budget * v) // s_tot for v in s]
    rem = [(budget * v) % s_tot for v in s]
    deficit = budget - sum(base)
    order = sorted(range(len(s)), key=lambda i: (-rem[i], i))
    bonus = set(order[:deficit])
    return budget, [b + (1 if i in bonus else 0) for i, b in enumerate(base)]


@settings(max_examples=300)
@given(st.lists(st.integers(min_value=1, max_value=10**6), min_size=1, max_size=64))
def test_sm11_apportionment_conserves_for_any_cell_profile(survivors):
    budget, q = _sm11_quotas(survivors)
    assert sum(q) == budget  # exact conservation, every profile
    assert all(v >= 0 for v in q)


@settings(max_examples=300)
@given(st.lists(st.integers(min_value=1, max_value=10**6), min_size=2, max_size=64))
def test_sm11_temperature_flattens_but_preserves_order(survivors):
    """sqrt weighting: a strictly larger cell never gets a smaller quota
    (order preserved), but its quota RATIO never exceeds its size ratio
    (the flattening that makes it a temperature < 1 mix)."""
    budget, q = _sm11_quotas(survivors)
    for i in range(len(survivors)):
        for j in range(len(survivors)):
            if survivors[i] > survivors[j]:
                assert q[i] >= q[j] - 1  # ±1 largest-remainder granularity
                # flattening: quota share grows slower than size share
                assert q[i] * survivors[j] <= (q[j] + 1) * survivors[i]


# ---------------------------------------------------------------------------
# pipe4: funnel-table laws
# ---------------------------------------------------------------------------


@settings(max_examples=300)
@given(
    st.integers(min_value=0, max_value=10**9),
    st.lists(st.floats(min_value=0.0, max_value=1.0), min_size=5, max_size=5),
)
def test_pipe4_funnel_rows_chain_and_conserve(n0, keep_fracs):
    """For ANY per-stage survival profile, the funnel construction yields
    rows where docs_in chains, dropped = in − out, every count is
    monotone non-increasing, and the weights row's mass equals 10^6 ×
    the fuzzy stage's docs_in."""
    ns = [n0]
    for f in keep_fracs:
        ns.append(int(ns[-1] * f))
    n0_, n1, n2, n3, n4, n5 = ns
    m = 1_000_000
    rows = [
        (0, n0_, n0_, n0_ * m),
        (1, n0_, n1, n1 * m),
        (2, n1, n2, n2 * m),
        (3, n2, n3, n3 * m),
        (4, n3, n4, n4 * m),
        (5, n4, n5, n5 * m),
        (6, n5, n5, n4 * m),
    ]
    for (o1, i1, u1, _), (o2, i2, u2, _) in zip(rows, rows[1:]):
        assert i2 == u1 and o2 == o1 + 1
    for _, di, do, _ in rows:
        assert do <= di
    assert rows[6][3] == rows[5][1] * m  # mass conservation across dedup
