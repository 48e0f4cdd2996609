"""Property-based tests (hypothesis) for the round-5j/k/l fixed-point
constructions: the NDCG discount tables, the Benford expectation
table, the integer KS statistic, and the TWAP trapezoid. Pure-Python
math checks — the oracle-parity suite already proves both engines
evaluate the shared expressions identically; these lock the MATH the
expressions implement."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from metoffice_spark.operators.mining import _BENFORD_FP
from metoffice_spark.operators.nonparam import _NDCG_DISC, _NDCG_IDEAL, _NDCG_K


def test_ndcg_tables_consistent():
    """Discounts strictly decrease; prefix sums are exact; rank-1
    discount is exactly 1e6 (log2(2) = 1)."""
    assert _NDCG_DISC[0] == 1_000_000
    assert all(a > b for a, b in zip(_NDCG_DISC, _NDCG_DISC[1:]))
    for k in range(_NDCG_K + 1):
        assert _NDCG_IDEAL[k] == sum(_NDCG_DISC[:k])


@settings(max_examples=200, deadline=None)
@given(st.lists(st.booleans(), min_size=1, max_size=40))
def test_ndcg_dcg_never_exceeds_ideal(gains):
    """For ANY binary gain vector, table-DCG@k <= table-IDCG(n_pos):
    the invariant that makes the final fixed-point divide <= 1e6."""
    dcg = sum(
        _NDCG_DISC[p] for p, g in enumerate(gains[:_NDCG_K]) if g
    )
    n_pos = sum(gains)
    idcg = _NDCG_IDEAL[min(n_pos, _NDCG_K)]
    if n_pos:
        assert 0 <= dcg <= idcg


def test_benford_table_is_log10():
    """Literals match round(1e6*log10(1+1/d)), strictly decreasing,
    and sum to 1e6 within the rounding of nine literals."""
    for d, p in _BENFORD_FP.items():
        assert p == round(1_000_000 * math.log10(1 + 1 / d))
    vals = [_BENFORD_FP[d] for d in range(1, 10)]
    assert all(a > b for a, b in zip(vals, vals[1:]))
    assert abs(sum(vals) - 1_000_000) <= 9


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=30),
    st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=30),
)
def test_ks_integer_route_matches_float_ecdf(a, b):
    """The exact-integer KS numerator agrees with the float ECDF
    definition: D = max |F_a(x) - F_b(x)| over observed points."""
    xs = sorted(set(a) | set(b))
    na, nb = len(a), len(b)
    d_num = max(
        abs(sum(1 for v in a if v <= x) * nb - sum(1 for v in b if v <= x) * na)
        for x in xs
    )
    d_float = max(
        abs(sum(1 for v in a if v <= x) / na - sum(1 for v in b if v <= x) / nb)
        for x in xs
    )
    assert 0 <= d_num <= na * nb
    assert math.isclose(d_num / (na * nb), d_float, rel_tol=0, abs_tol=1e-12)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**6),  # epoch s
            st.integers(min_value=0, max_value=49_002),  # cents fp
        ),
        min_size=2,
        max_size=25,
    )
)
def test_twap_trapezoid_bounded_by_extremes(obs):
    """For any event sequence with a positive span, the integer TWAP
    lies within [min(v), max(v)] — the convex-combination property
    the truncating divide must preserve."""
    obs = sorted(obs)
    span = obs[-1][0] - obs[0][0]
    if span == 0:
        return
    num = sum(
        (obs[i][1] + obs[i + 1][1]) * (obs[i + 1][0] - obs[i][0])
        for i in range(len(obs) - 1)
    )
    twap = num // (2 * span)
    vals = [v for _, v in obs]
    assert min(vals) <= twap <= max(vals)
