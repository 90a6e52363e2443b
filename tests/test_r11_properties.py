"""Property-based tests (hypothesis) for the round-11 integer-exactness
laws — pure-python replays of the formulas, no Spark session, so the
laws themselves (not just the fixture instances the crafted pins cover)
are exercised across the input space.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

SCALE = 1_000_000


def _apportion(size: int) -> list[int]:
    """sm10's largest-remainder split of one document's mass across a
    cluster: base = SCALE div n, +1 for the first SCALE mod n members
    (by doc_id order — position is what matters here)."""
    base, rem = divmod(SCALE, size)
    return [base + (1 if i < rem else 0) for i in range(size)]


@settings(max_examples=300)
@given(st.integers(min_value=1, max_value=100_000))
def test_sm10_apportionment_conserves_exactly(size):
    w = _apportion(size)
    assert sum(w) == SCALE  # the conservation law, for EVERY cluster size
    assert max(w) - min(w) <= 1  # largest-remainder fairness
    assert sorted(w, reverse=True) == w  # bonus goes to the earliest members


@settings(max_examples=200)
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=10_000),  # score value
                  st.integers(min_value=1, max_value=50)),      # count
        min_size=1,
        max_size=60,
    )
)
def test_t29_value_domain_terciles_satisfy_the_cutoff_law(hist):
    """t29's cutoff rule on an arbitrary (value, count) histogram: c_head
    is the SMALLEST value whose cumulative count reaches n/3 (by integer
    cross-multiplication 3*cum >= n), c_tail likewise for 2n/3; bucket
    membership is value-based, so head/middle counts bracket the exact
    thirds with ties landing low."""
    agg: dict[int, int] = {}
    for v, c in hist:
        agg[v] = agg.get(v, 0) + c
    values = sorted(agg)
    n = sum(agg.values())
    cum = 0
    c_head = c_tail = None
    for v in values:
        cum += agg[v]
        if c_head is None and 3 * cum >= n:
            c_head = v
        if c_tail is None and 3 * cum >= 2 * n:
            c_tail = v
    assert c_head is not None and c_tail is not None and c_head <= c_tail
    n_head = sum(c for v, c in agg.items() if v <= c_head)
    n_hm = sum(c for v, c in agg.items() if v <= c_tail)
    ties_h = agg[c_head]
    ties_t = agg[c_tail]
    assert 3 * n_head >= n and 3 * (n_head - ties_h) < n
    assert 3 * n_hm >= 2 * n and 3 * (n_hm - ties_t) < 2 * n


@settings(max_examples=200)
@given(
    st.lists(st.integers(min_value=0, max_value=2_000_000), min_size=1, max_size=200)
)
def test_m10_m11_cross_multiplied_mean_threshold_is_division_free_exact(vals):
    """The g_density/g_energy gate (x * n >= sum) must agree with exact
    rational comparison x >= sum/n for every input — the reason the gate
    never divides (integer division would round, float division would
    drift cross-engine)."""
    from fractions import Fraction

    s, n = sum(vals), len(vals)
    for x in vals:
        assert (x * n >= s) == (Fraction(x) >= Fraction(s, n))


@settings(max_examples=300)
@given(st.integers(min_value=1, max_value=10**12), st.integers(min_value=1, max_value=10**6))
def test_t28_micro_probability_stays_in_bigint(cnt, tot):
    """t28's mu = (cnt * 10^6) div tot: for any cnt <= tot (a bucket
    count never exceeds its class total), mu <= 10^6 and the scaled
    numerator stays far inside int64."""
    cnt = min(cnt, tot)
    mu = (cnt * SCALE) // tot
    assert 0 <= mu <= SCALE
    assert cnt * SCALE < 2**63
