"""Registry-ordering contract tests.

The round driver verifies a PREFIX of the registry (observed: the
first 50 registrations in round 1), so exposure order is part of the
driver contract. These tests pin it: every query that is new, changed
this round, or lacked a round-1 verdict must sit inside the first 50.
"""

from __future__ import annotations

import os

from mapreduce_experiment_spark.plans.registry import _ORDER, SPECS

# Round 3 contract: every query changed/added in round 3, the trio
# that changed in round 2 without re-verification, and the two whose
# upstream derive_edges was rewritten after their last verdict.
_MUST_BE_IN_WINDOW = {
    # changed or added in round 3
    "grouping_sets_sql", "approx_distinct_counts",
    "approx_order_percentiles", "ngram_jaccard_pairs",
    "kmeans_centroids", "kmeans_ivf_assignments", "knn_ivf_trained",
    "packed_sequences", "decontamination_pairs",
    # r2-changed, verdict stale since
    "triangles", "triangles_faithful", "pagerank",
    # input rewritten in r2 after their r1 verdicts
    "symmetrize", "adjacency",
}

WINDOW = 50


def test_order_names_all_registered():
    """A typo'd name in _ORDER would silently fall out of the window."""
    specs = SPECS()
    missing = [n for n in _ORDER if n not in specs]
    assert not missing, f"_ORDER names not registered: {missing}"


def test_no_duplicates_in_order():
    assert len(_ORDER) == len(set(_ORDER))


def test_unverified_and_changed_queries_inside_window():
    window = list(SPECS())[:WINDOW]
    out = _MUST_BE_IN_WINDOW - set(window)
    assert not out, f"queries outside the driver verification window: {out}"


def test_registry_has_expected_size():
    """Guards the ADVICE finding: an ImportError inside a plans module
    must not silently shrink the registry (it now raises, but a module
    REMOVED by accident would still pass — pin the count)."""
    assert len(SPECS()) >= 80


# --- mechanical rotation enforcement ---------------------------------------
# The round-2 verdict flagged that _ORDER's contract ("changed this
# round goes first") was only enforced by discipline: triangles/
# pagerank changed in r2 yet sat outside the window. This test makes
# forgetting impossible: any query registered in — or importing — a
# package module touched since the previous round's base commit must
# either sit inside the window or be explicitly attested unchanged
# below (a conscious, reviewable act in the diff).

_ROUND_BASE = "fd608ce"  # driver's round-2 commit; bump each round

# Queries living in touched modules whose own plan + oracle are
# attested unchanged this round (round 3: grouping_sets_sql was the
# only edit in queries_profiling; queries_similarity only gained the
# kmeans/trained-IVF additions; operators/dedup's change was confined
# to the ngram prefix-filter cache lifecycle).
_ATTESTED_UNCHANGED = {
    "nation_participants_full_outer", "value_distribution_stats",
    "price_quantity_correlation", "event_type_counts_salted",
    "lineitem_profile",
    "embedding_near_dups", "srp_bucket_stats", "knn_ivf",
    "knn_bruteforce", "knn_bruteforce_blas", "ivf_assignments",
    "exact_dedup_groups", "minhash_signatures", "minhash_dedup_pairs",
    "simhash_signatures", "simhash_near_dups", "dedup_clusters",
}

_PKG = "mapreduce_experiment_spark"


def _package_deps(modname: str) -> set[str]:
    """Package modules a plans module references (one hop through its
    globals: imported modules + the defining modules of imported
    functions/classes)."""
    import sys
    import types

    deps = {modname}
    mod = sys.modules.get(modname)
    if mod is None:
        return deps
    for v in vars(mod).values():
        if isinstance(v, types.ModuleType):
            m = v.__name__
        else:
            m = getattr(v, "__module__", None)
        if isinstance(m, str) and m.startswith(_PKG):
            deps.add(m)
    # The registry module is rotation INFRASTRUCTURE imported by every
    # plans module; counting it would make any _ORDER edit flag all ~84
    # queries at once. Its behavior is covered by the other tests here.
    deps.discard(f"{_PKG}.plans.registry")
    return deps


def test_changed_modules_rotate_into_window():
    import subprocess

    try:
        out = subprocess.run(
            ["git", "diff", "--name-only", _ROUND_BASE, "HEAD"],
            capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ).stdout
    except (OSError, subprocess.CalledProcessError) as e:
        import pytest
        pytest.skip(f"git history unavailable: {e}")
    changed_mods = {
        p.removesuffix(".py").replace("/", ".")
        for p in out.splitlines()
        if p.startswith(_PKG + "/") and p.endswith(".py")
    }
    specs = SPECS()
    window = set(list(specs)[:WINDOW])
    offenders = [
        n for n, s in specs.items()
        if _package_deps(s.module) & changed_mods
        and n not in window and n not in _ATTESTED_UNCHANGED
    ]
    assert not offenders, (
        "queries whose code changed since the last round are outside "
        f"the driver verification window: {offenders} — rotate them "
        "into _ORDER's first 50 or attest them unchanged"
    )
