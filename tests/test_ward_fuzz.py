"""Property-based fuzzing of the constrained-Ward engine against the oracle.

Integer-valued inputs keep every f32 operation exact (values << 2^24), so the
engine must reproduce the Go-transliterated oracle bit-for-bit — including
cluster numbering and tie-breaks — for ANY generated instance. This is the
strongest parity statement the test suite makes (SURVEY.md §4 items 2-3).
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from imageclust_tpu.cluster import oracle
from imageclust_tpu.cluster.ward import (
    ConstraintError,
    calculate_optimal_clusters,
    constrained_ward,
)


@st.composite
def clustering_instance(draw, exact_domain=False):
    n = draw(st.integers(4, 24))
    d = draw(st.integers(1, 4))
    if exact_domain:
        # Bit-exact parity is only GUARANTEED when every intermediate value
        # is exactly representable: with max_size=2 all centroids stay dyadic
        # (averages of <=2 integer points), sums of dyadics this small are
        # order-independent, and the Ward size factor rounds identically on
        # both sides. Beyond that, mathematically EQUAL distances reached
        # through different centroid histories round to different f32 values
        # per computation path (e.g. 13/6 via a dyadic centroid vs via a
        # 1/3-rounded centroid), so the argmin legitimately differs between
        # ANY two implementations — including the Go reference and a
        # restructured version of itself. The fuzzer found exactly such a
        # case; see test_invariants_hold_for_any_instance for the contract
        # that holds on the full domain.
        min_size = draw(st.integers(1, 2))
        max_size = 2
    else:
        min_size = draw(st.integers(1, 4))
        max_size = draw(st.integers(min_size, min_size + 4))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    # small integer coordinates: exact f32 arithmetic, dense ties
    x = rng.integers(0, 4, size=(n, d)).astype(np.float32)
    return x, min_size, max_size


@settings(max_examples=80, deadline=None)
@given(clustering_instance(exact_domain=True))
def test_engine_matches_oracle_exactly(instance):
    x, min_size, max_size = instance
    ids = [f"i{k}" for k in range(len(x))]
    try:
        calculate_optimal_clusters(len(x), min_size, max_size)
    except ConstraintError:
        want, ok = oracle.perform_clustering_with_constraints(
            x, ids, min_size, max_size
        )
        assert not ok  # both sides must agree the instance is infeasible
        return
    want, ok = oracle.perform_clustering_with_constraints(
        x, ids, min_size, max_size
    )
    assert ok
    got = constrained_ward(x, ids, min_size=min_size, max_size=max_size,
                           update_rule="centroid")
    assert got.cluster_map == want


@settings(max_examples=50, deadline=None)
@given(clustering_instance())
def test_invariants_hold_for_any_instance(instance):
    x, min_size, max_size = instance
    ids = [f"i{k}" for k in range(len(x))]
    try:
        res = constrained_ward(x, ids, min_size=min_size, max_size=max_size)
    except ConstraintError:
        return
    placed = [m for v in res.cluster_map.values() for m in v]
    # partition: every item exactly once, across clusters + dropped
    assert sorted(placed + res.dropped) == sorted(ids)
    # size bounds
    for members in res.cluster_map.values():
        assert min_size <= len(members) <= max_size
    # sequential ids
    assert list(res.cluster_map.keys()) == list(range(len(res.cluster_map)))
