"""Property test: the union+carry-forward as-of join agrees with a
naive quadratic reference on randomized inputs (the DuckDB native
ASOF oracle covers real data; this covers adversarial shapes — empty
right side, all-before, all-after, shared keys, equal timestamps)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from mapreduce_experiment_spark.operators.asof import asof_join

lefts = st.lists(
    st.tuples(st.integers(1, 3), st.integers(0, 20)), min_size=1, max_size=12)
rights = st.lists(
    st.tuples(st.integers(1, 3), st.integers(0, 20)), max_size=12)


def _naive(left, right):
    out = {}
    for i, (k, lt) in enumerate(left):
        cands = [rt for rk, rt in right if rk == k and rt <= lt]
        out[i] = max(cands) if cands else None
    return out


@settings(max_examples=15, deadline=None)
@given(left=lefts, right=rights)
def test_asof_matches_naive(spark, left, right):
    # Dedup right (key, ts) — the operator's documented contract.
    right = sorted({(k, t) for k, t in right})
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)],
        "lid long, k long, lt long")
    rdf = spark.createDataFrame(right, "k long, rt long") if right \
        else spark.createDataFrame([], "k long, rt long")
    got = {
        r.lid: r.rt
        for r in asof_join(ldf, rdf, on=["k"], left_ts="lt",
                           right_ts="rt", right_payload=["rt"]).collect()
    }
    assert got == _naive(left, right)


def test_asof_rejects_payload_name_clash(spark):
    """r14 review: a right_payload name that also exists on the left
    was silently dropped at the end and replaced by the carried as-of
    value — left data loss with no error. Reserved internal names are
    guarded the same way."""
    import pytest

    ldf = spark.createDataFrame([(1, 1, 5, 9.0)],
                                "lid long, k long, lt long, price double")
    rdf = spark.createDataFrame([(1, 3, 7.0)],
                                "k long, rt long, price double")
    with pytest.raises(ValueError, match="already((.|\n)*)exist"):
        asof_join(ldf, rdf, on=["k"], left_ts="lt", right_ts="rt",
                  right_payload=["price"])
    l2 = spark.createDataFrame([(1, 1, 5, 0)],
                               "lid long, k long, lt long, _side long")
    with pytest.raises(ValueError, match="reserved"):
        asof_join(l2, rdf.drop("price"), on=["k"], left_ts="lt",
                  right_ts="rt", right_payload=["rt"])
