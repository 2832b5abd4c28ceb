"""Registry-ordering contract tests.

The round driver verifies a PREFIX of the registry (observed: the
first 50 registrations in round 1), so exposure order is part of the
driver contract. These tests pin it: every query that is new, changed
this round, or lacked a round-1 verdict must sit inside the first 50.
"""

from __future__ import annotations

import os

from mapreduce_experiment_spark.plans.registry import _ORDER, SPECS

# Round 6 contract: the two new queries (canonical_url_groups,
# clean_corpus), the changed-plan triangles (explicit closure-stage
# partition count in the shared _simple_triangle_corners helper),
# knn_ivf_pruned (deferred from r5 — its first driver verdict), and
# ALL 46 remaining queries whose last driver verdict was r4
# (everything outside the r5 window minus the 3 round-6 retirements —
# keeps every verdict <= 1 round old).
_MUST_BE_IN_WINDOW = {
    # new, changed, or deferred in round 6
    "canonical_url_groups", "clean_corpus", "triangles",
    "knn_ivf_pruned",
    # last driver verdict r4 (the r5 out-of-window set minus the
    # retired brand_revenue_by_year / daily_event_type_pivot /
    # order_value_histogram)
    "approx_order_percentiles", "asia_market_share",
    "connected_components", "decontaminated_corpus",
    "decontamination_external", "decontamination_pairs",
    "dedup_clusters", "dedup_survivors", "doc_chunks",
    "embedding_near_dups", "event_type_counts_salted",
    "hourly_event_counts", "ivf_assignments", "knn_bruteforce",
    "knn_ivf", "lineitem_profile", "media_byte_histograms",
    "media_frame_sample", "media_metadata", "monthly_retention_cohorts",
    "nation_participants_full_outer", "order_size_distribution",
    "packed_sequence_fragments", "packed_sequences",
    "price_quantity_correlation", "purchase_last_click_asof",
    "quality_filtered_corpus", "repetition_scores", "session_stats",
    "session_window_stats", "signup_to_purchase_funnel",
    "source_mixture_sample", "srp_bucket_stats",
    "stateful_streaming_sessions", "stratified_event_sample",
    "streaming_event_dedup", "streaming_hourly_counts",
    "streaming_minhash_dedup", "streaming_triangle_count",
    "streaming_view_attribution", "top_parts_per_nation",
    "triangle_count", "trigram_counts", "value_band_range_join",
    "value_distribution_stats", "volume_shipping",
}

WINDOW = 50

# New queries that could NOT fit this round's 50-slot window and whose
# driver verification is therefore deferred EXACTLY one round: they
# must sit immediately after the window boundary so the next rotation
# picks them up first, and they carry local oracle gating
# (test_registry_oracle, sf0.001 + sf0.01) in the meantime.
# corpus_shuffle was registered AFTER the r6 rotation froze
# WINDOW_r06.json, so it takes the registry's last free slot through
# this mechanism — and squares the r7 arithmetic: 49 r5-greens + 1
# deferred = exactly the 50-slot window.
_DEFERRED_TO_NEXT_WINDOW = ["corpus_shuffle"]


def test_order_is_exactly_the_window():
    """ADVICE r3: _ORDER listed 52 names before the 'boundary (50)'
    comment, silently pushing its last two entries outside the
    driver's window. Pin the list to EXACTLY the window size (plus
    the explicitly-deferred tail) so the boundary comment can never
    lie again."""
    assert len(_ORDER) == WINDOW + len(_DEFERRED_TO_NEXT_WINDOW), (
        f"_ORDER has {len(_ORDER)} names; the driver verifies exactly "
        f"{WINDOW} — trim or fill so position matches intent"
    )


def test_deferred_queries_sit_just_past_the_boundary():
    """A deferred new query must be FIRST in line for the next
    round's window — listed in _ORDER immediately after the 50, not
    floating in registration order where a future edit could push it
    back again."""
    tail = _ORDER[WINDOW:WINDOW + len(_DEFERRED_TO_NEXT_WINDOW)]
    assert tail == _DEFERRED_TO_NEXT_WINDOW
    window = list(SPECS())[:WINDOW]
    assert not set(_DEFERRED_TO_NEXT_WINDOW) & set(window)


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

_ROUND_BASE = "a5a5f4c"  # driver's round-5 commit; bump each round

# Queries living in touched modules whose own plan + oracle are
# attested unchanged this round. Round 6's package edits are:
# operators/graph.py (one hunk INSIDE _simple_triangle_corners — the
# explicit closure-stage partition count; only ``triangles`` and
# ``triangle_count`` reach that helper, both in-window),
# operators/dedup.py (APPENDED canonical_url operators + the
# dedup_survivors broadcast-hint removal — a hunk inside the
# dedup_survivors function body only; dedup_survivors is in-window),
# plans/queries_dedup.py (APPENDED canonical_url_groups/clean_corpus
# registrations + the span-oracle constants refactored into
# _span_cte()/_SPAN_REMOVAL_TAIL — generated oracle TEXT verified
# byte-identical to HEAD in-session for all 11 pre-existing
# registrations), plans/queries_analytics.py (three query
# RETIREMENTS — remaining registrations untouched, all in-window),
# operators/similarity.py (bounded-probe-set guard inside
# knn_ivf_pruned only; in-window), plans/queries_similarity.py
# (stale-index GC horizon inside q_knn_ivf_pruned only; in-window).
# Every name below is r5-green with plan + oracle text untouched by
# those hunks.
_ATTESTED_UNCHANGED = {
    # registered in queries_graph / reach operators/graph.py (hunk
    # confined to _simple_triangle_corners, which none of these call)
    # and operators/dedup.py via the static import chain
    # queries_graph -> streaming.pipeline -> operators.dedup
    # (dedup hunks: appended functions + dedup_survivors body).
    "edges_derive", "symmetrize", "adjacency", "degrees",
    "candidate_pairs", "pagerank", "triangles_faithful",
    # registered in queries_events / same streaming.pipeline ->
    # operators.dedup transitive chain (no dedup code on their path).
    "sessionize_events", "user_value_scd2",
    # registered in queries_dedup.py / reach operators/dedup.py:
    # append-only hunks + the dedup_survivors-body hunk (none of
    # these call dedup_survivors), oracle text byte-identical.
    "exact_dedup_groups", "minhash_signatures", "minhash_dedup_pairs",
    "ngram_jaccard_pairs", "simhash_signatures", "simhash_near_dups",
    "repeated_spans", "span_deduped_corpus",
    # registered in queries_similarity.py / reach
    # operators/similarity.py: both r6 hunks live inside the
    # knn_ivf_pruned path (operator + registered query), which none
    # of these touch.
    "knn_bruteforce_blas", "kmeans_centroids",
    "kmeans_ivf_assignments", "knn_ivf_trained",
}

def _round_sorted(paths: list[str]) -> list[str]:
    """Sort round-stamped artifact files by NUMERIC round: plain
    lexicographic sort would place r100 before r99 once the round
    number gains a digit, silently making files[-1] a stale round."""
    import re

    return sorted(paths, key=lambda p: int(re.search(r"_r(\d+)", p).group(1)))


_PKG = "mapreduce_experiment_spark"


def _module_file(modname: str) -> str | None:
    import importlib.util

    try:
        spec = importlib.util.find_spec(modname)
    except (ImportError, ValueError):
        return None
    return getattr(spec, "origin", None) if spec else None


def _direct_imports(modname: str) -> set[str]:
    """Package modules ``modname`` imports, by STATIC analysis of its
    source (ast): catches module-level AND function-local imports —
    the r3 one-hop runtime-globals scan missed both transitive chains
    and imports inside function bodies (ADVICE r3)."""
    import ast

    path = _module_file(modname)
    if not path or not path.endswith(".py"):
        return set()
    with open(path) as f:
        tree = ast.parse(f.read())
    # Relative-import resolution base: a plain module resolves level-1
    # against its parent package, but a package __init__ resolves
    # level-1 against ITSELF (one fewer part to drop).
    parts = modname.split(".")
    pkg_extra = 1 if path.endswith("__init__.py") else 0
    deps: set[str] = set()

    def add(name: str) -> None:
        if name.startswith(_PKG):
            deps.add(name)

    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                add(a.name)
        elif isinstance(node, ast.ImportFrom):
            if node.level:
                drop = node.level - pkg_extra
                base = parts[:len(parts) - drop] if drop > 0 else parts
                target = ".".join(base + ([node.module] if node.module else []))
            else:
                target = node.module or ""
            add(target)
            # `from X import Y` where Y is itself a module (subpackage
            # import): count X.Y too if it resolves to a file.
            for a in node.names:
                cand = f"{target}.{a.name}" if target else a.name
                if cand.startswith(_PKG) and _module_file(cand):
                    deps.add(cand)
    return deps


def _package_deps(modname: str) -> set[str]:
    """Transitive closure of package-module imports reachable from
    ``modname`` (fixed-point over the static import graph)."""
    deps = {modname}
    frontier = [modname]
    while frontier:
        m = frontier.pop()
        for d in _direct_imports(m):
            if d not in deps:
                deps.add(d)
                frontier.append(d)
    # The registry module is rotation INFRASTRUCTURE imported by every
    # plans module; counting it would make any _ORDER edit flag all ~84
    # queries at once. Its behavior is covered by the other tests here.
    deps.discard(f"{_PKG}.plans.registry")
    return deps


def test_package_deps_sees_transitive_and_local_imports():
    """The dep scan must reach operators → functions chains and
    function-local imports (operators/text.py imports hash60 inside
    its packing core): a future edit to functions/textfns.py has to
    flag every text/dedup query, not slip past the rotation gate."""
    deps = _package_deps(f"{_PKG}.plans.queries_text")
    assert f"{_PKG}.operators.text" in deps
    assert f"{_PKG}.functions.textfns" in deps  # transitive + local-import


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
        and n not in _DEFERRED_TO_NEXT_WINDOW
    ]
    assert not offenders, (
        "queries whose code changed since the last round are outside "
        f"the driver verification window: {offenders} — rotate them "
        "into _ORDER's first 50 or attest them unchanged"
    )


def test_driver_window_contract_holds():
    """Post-round check (r3 verdict item 6): the driver's observed
    verification window must stay at WINDOW queries, and every key it
    verified must still be a registered query. If the driver ever
    shrinks the window or a verified name disappears, the rotation
    math would silently leave queries unverified — fail loudly
    instead. (Keys are compared against the registry, not today's
    _ORDER: _ORDER legitimately changes between rounds.)"""
    import glob
    import json

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = _round_sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))
    if not files:
        import pytest
        pytest.skip("no driver correctness file yet")
    latest = files[-1]
    keys = list(json.load(open(latest)))
    assert len(keys) == WINDOW, (
        f"{os.path.basename(latest)} verified {len(keys)} queries, "
        f"expected {WINDOW} — the driver's window changed; re-derive "
        "the rotation math in plans/registry.py"
    )
    unknown = [k for k in keys if k not in SPECS()]
    assert not unknown, f"driver verified queries no longer registered: {unknown}"


def test_window_snapshots_match_driver_verification():
    """Post-round window check, automated (r4 verdict item 6): at
    rotation time each round commits WINDOW_r{N}.json = _ORDER[:50];
    when the driver later writes CORRECTNESS_r{N}.json its keys must
    equal that snapshot exactly — comparing against a committed
    snapshot rather than today's _ORDER makes the check valid even
    after the next round's rotation has already edited _ORDER."""
    import glob
    import json

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    checked = 0
    for wf in _round_sorted(glob.glob(os.path.join(repo, "WINDOW_r*.json"))):
        cf = wf.replace("WINDOW_", "CORRECTNESS_")
        if not os.path.exists(cf):
            continue  # snapshot for a round the driver hasn't run yet
        want = json.load(open(wf))
        got = list(json.load(open(cf)))
        assert got == want, (
            f"{os.path.basename(cf)} keys differ from the committed "
            f"{os.path.basename(wf)} snapshot: the driver did not "
            "verify the window the rotation intended"
        )
        checked += 1
    # the snapshot mechanism starts at r5; nothing to compare is fine
    # for older rounds, but the CURRENT snapshot must always exist.
    assert glob.glob(os.path.join(repo, "WINDOW_r*.json")), \
        "no WINDOW_r*.json snapshot committed"


def test_current_window_snapshot_is_fresh():
    """The latest WINDOW_r{N}.json must equal today's _ORDER[:50] —
    regenerate the snapshot whenever the rotation changes."""
    import glob
    import json

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = _round_sorted(glob.glob(os.path.join(repo, "WINDOW_r*.json")))
    assert files, "no WINDOW_r*.json committed — regenerate the snapshot"
    latest = json.load(open(files[-1]))
    assert latest == list(SPECS())[:WINDOW], (
        f"{os.path.basename(files[-1])} is stale vs _ORDER[:50] — "
        "regenerate it (python -c \"import json; from "
        "mapreduce_experiment_spark.plans.registry import SPECS; "
        "print(json.dumps(list(SPECS())[:50]))\")"
    )


def _round_of(path: str) -> int:
    import re

    return int(re.search(r"_r(\d+)", os.path.basename(path)).group(1))


def test_no_query_exceeds_one_round_staleness():
    """The freshness invariant, made mechanical — restructured per the
    r5 verdict so a round's SHIPPED tree is never red by design.

    Two observable repo states:

    - Rotation committed for the coming round (latest WINDOW_r{N}
      post-dates the latest CORRECTNESS file): verify the rotation's
      COMPLETENESS — every registered query must be (a) green in the
      latest correctness file, (b) in the new window, or (c)
      explicitly deferred. A query in none of the three would
      silently age to 2+ rounds without a verdict.
    - Driver verdict is current (WINDOW round <= CORRECTNESS round —
      the judging-time state): the tree is green AS SHIPPED; the
      forcing function instead checks that no package work has been
      committed on top of the verdict WITHOUT rotating first. A
      session that starts changing package code before committing the
      next rotation goes red on its first commit — the tripwire now
      fires at work-start, not at judging time."""
    import glob
    import json
    import subprocess

    import pytest

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfiles = _round_sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))
    wfiles = _round_sorted(glob.glob(os.path.join(repo, "WINDOW_r*.json")))
    if not cfiles:
        pytest.skip("no driver correctness file yet")
    assert wfiles, "no WINDOW_r*.json committed"
    cround, wround = _round_of(cfiles[-1]), _round_of(wfiles[-1])

    if wround > cround:
        # Rotation committed: check its completeness.
        latest = json.load(open(cfiles[-1]))
        green = {k for k, v in latest.items()
                 if isinstance(v, dict) and v.get("hash_match")}
        specs = SPECS()
        window = set(list(specs)[:WINDOW])
        stale = [n for n in specs
                 if n not in green and n not in window
                 and n not in _DEFERRED_TO_NEXT_WINDOW]
        assert not stale, (
            f"queries neither verified last round nor scheduled this "
            f"round: {stale} — rotate them into _ORDER's window"
        )
        return

    # Judging-time state: red only if package work landed after the
    # verdict without a rotation.
    try:
        verdict_commit = subprocess.run(
            ["git", "log", "-n1", "--format=%H", "--",
             os.path.basename(cfiles[-1])],
            capture_output=True, text=True, check=True, cwd=repo,
        ).stdout.strip()
        # `git log -- <untracked file>` exits 0 with EMPTY output; the
        # downstream diff would then fail and be mis-reported as "git
        # unavailable", silently disabling this tripwire. An
        # uncommitted latest verdict is itself the unrotated-work
        # state — fail with the accurate message.
        assert verdict_commit, (
            f"{os.path.basename(cfiles[-1])} exists but is not "
            "committed — commit the driver verdict and the "
            f"WINDOW_r{cround + 1}.json rotation before package work"
        )
        changed = subprocess.run(
            ["git", "diff", "--name-only", verdict_commit, "HEAD"],
            capture_output=True, text=True, check=True, cwd=repo,
        ).stdout.splitlines()
    except (OSError, subprocess.CalledProcessError) as e:
        pytest.skip(f"git history unavailable: {e}")
    pkg_changed = [p for p in changed if p.startswith(_PKG + "/")]
    assert not pkg_changed, (
        f"package files changed since {os.path.basename(cfiles[-1])} "
        f"without committing a WINDOW_r{cround + 1}.json rotation: "
        f"{pkg_changed} — rotate _ORDER and commit the snapshot FIRST"
    )
