"""Unit pins for bench.py's pure logic — the adaptive run policy and
the per-field metric merge. No Spark session needed."""

from __future__ import annotations

import importlib.util
import os
import sys


def _bench():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(repo, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    # bench imports the package at module top; make sure repo is on path
    sys.path.insert(0, repo)
    spec.loader.exec_module(mod)
    return mod


def test_more_runs_policy():
    b = _bench()
    # always take a second sample
    assert b._more_runs([])
    assert b._more_runs([5.0])
    # trivial queries (best <= 1 s) stop at 2
    assert not b._more_runs([0.4, 0.5])
    # non-trivial queries always get a third sample, even when the
    # first two agree (a load burst can cover two back-to-back runs)
    assert b._more_runs([2.0, 2.05])
    # fourth sample only when the runs disagree (spread > 1.4x)
    assert not b._more_runs([2.0, 2.05, 2.1])
    assert b._more_runs([2.0, 3.5, 2.9])
    # hard stop at 4 regardless of spread
    assert not b._more_runs([2.0, 6.0, 5.0, 4.0])


def test_stage_delta_sums_counters_and_maxes_peak():
    b = _bench()
    before = {(1, 0): {"shuffle_write_bytes": 10,
                       "peak_execution_memory_bytes": 100}}
    after = {
        (1, 0): {"shuffle_write_bytes": 10,
                 "peak_execution_memory_bytes": 100},  # pre-existing stage
        (2, 0): {"shuffle_write_bytes": 7,
                 "peak_execution_memory_bytes": 50},
        (3, 0): {"shuffle_write_bytes": 5,
                 "peak_execution_memory_bytes": 80},
    }
    d = b._stage_delta(before, after)
    assert d["shuffle_write_bytes"] == 12        # counters sum
    assert d["peak_execution_memory_bytes"] == 80  # high-water mark maxes


def test_metric_merge_keeps_metrics_observed_by_any_run():
    """The round-6 ADVICE fix, pinned from both directions by calling
    bench's ACTUAL merge (extracted to _merge_deltas per r6 ADVICE —
    the earlier source-substring pin could survive a regression that
    kept the substring but changed surrounding logic): a key missing
    from one run's delta must neither be zeroed (the original defect)
    nor dropped (the first fix's defect) — the merge keeps the min
    over the runs that observed it."""
    b = _bench()
    assert b._merge_deltas({"a": 5, "b": 9}, {"a": 7, "c": 3}) \
        == {"a": 5, "b": 9, "c": 3}
    # min is taken per-key, in both directions
    assert b._merge_deltas({"a": 7}, {"a": 5}) == {"a": 5}
    # an empty (drifted) snapshot neither zeroes nor drops anything
    assert b._merge_deltas({"a": 4}, {}) == {"a": 4}
    assert b._merge_deltas({}, {"a": 4}) == {"a": 4}


def test_suite_order_is_seeded_and_recorded():
    """The r8 burst-decorrelation contract: the same seed must yield
    the same order (resumable comparisons), different seeds must be
    able to differ, and the shuffle is a permutation of the headline
    set — pinned against the same RNG construction bench uses."""
    import random

    names = sorted(f"q{i}" for i in range(10))
    a, b2 = list(names), list(names)
    random.Random(1234).shuffle(a)
    random.Random(1234).shuffle(b2)
    assert a == b2 and sorted(a) == names
    c = list(names)
    random.Random(4321).shuffle(c)
    assert sorted(c) == names
