"""Registry-ordering contract tests.

The round driver verifies a PREFIX of the registry (observed: the
first 50 registrations in round 1), so exposure order is part of the
driver contract. These tests pin it: every query that is new, changed
this round, or lacked a round-1 verdict must sit inside the first 50.
"""

from __future__ import annotations

import os

from mapreduce_experiment_spark.plans.registry import _ORDER, SPECS, WINDOW

# Round 19 contract: steady-state alternate-round cadence, ninth
# full cycle. The r18 driver verdict landed (CORRECTNESS_r18.json
# 50/50 green, keys == WINDOW_r18.json), so the r18 window rotates
# out and the new window is the registry's stalest set: exactly the
# 50 r17-greens (WINDOW_r17.json keys verbatim — nothing retired or
# deferred in r18). 50 = 50, zero slack. This window delivers the
# first post-change driver verdicts for the r18 optimization round's
# heaviest rewrites (the r18 VERDICT's item 2 lists exactly these):
# triangle_count / triangles, connected_components + the dedup/
# curation chain (clean_corpus, dedup_clusters, dedup_survivors,
# decontaminated_corpus), streaming_minhash_dedup, and
# streaming_triangle_count (which additionally carries this round's
# delta-shaped state rewrite).
_MUST_BE_IN_WINDOW = {
    # last driver verdict r17
    "knn_ivf_maintained", "streaming_minhash_dedup",
    "stateful_streaming_sessions", "streaming_view_attribution",
    "knn_ivf_pruned", "embedding_near_dups_indexed",
    "streaming_event_dedup", "embedding_near_dups_probe",
    "approx_order_percentiles", "asia_market_share", "clean_corpus",
    "connected_components", "decontaminated_corpus",
    "decontamination_external", "decontamination_pairs",
    "dedup_clusters", "dedup_survivors", "doc_chunks",
    "event_type_counts_salted", "hourly_event_counts",
    "ivf_assignments", "knn_bruteforce", "knn_ivf",
    "lineitem_profile", "media_byte_histograms", "media_frame_sample",
    "media_metadata", "monthly_retention_cohorts",
    "nation_participants_full_outer", "order_size_distribution",
    "packed_sequence_fragments", "packed_sequences",
    "price_quantity_correlation", "purchase_last_click_asof",
    "quality_filtered_corpus", "repetition_scores", "session_stats",
    "session_window_stats", "signup_to_purchase_funnel",
    "source_mixture_sample", "stratified_event_sample",
    "streaming_hourly_counts", "streaming_triangle_count",
    "top_parts_per_nation", "triangle_count", "triangles",
    "trigram_counts", "value_band_range_join",
    "value_distribution_stats", "volume_shipping",
}

# WINDOW is imported from the registry — the single source of truth
# (ADVICE r13: scripts/rehearse.py hardcoded 50 and could silently
# split the wrong halves). An erroneous edit to registry.WINDOW can't
# slip through: test_driver_window_contract_holds compares it against
# the key count of the latest CORRECTNESS_r*.json the driver actually
# wrote.

# Names the latest driver correctness file verified that have since
# been consciously RETIRED from the registry (each leaves a tombstone
# comment at its former registration site and a preserved local
# oracle check). test_driver_window_contract_holds exists to catch
# verified names disappearing SILENTLY; listing one here is the
# explicit, reviewable act that distinguishes a retirement from an
# accident. Prune entries when the next correctness file lands.
_RETIRED_AFTER_VERDICT: set[str] = set()
# (r11: pruned srp_bucket_stats — CORRECTNESS_r10.json landed and no
# longer lists it; its tombstone + preserved oracle check remain at
# plans/queries_similarity.py / test_retired_srp_bucket_stats_oracle_still_holds.
# r12: nothing retired — CORRECTNESS_r11.json keys all remain registered.
# r13: nothing retired — CORRECTNESS_r12.json keys all remain registered.
# r14: nothing retired — CORRECTNESS_r13.json keys all remain registered.
# r15: nothing retired — CORRECTNESS_r14.json keys all remain registered.
# r16: nothing retired — CORRECTNESS_r15.json keys all remain registered.
# r17: nothing retired — CORRECTNESS_r16.json keys all remain registered.
# r18: nothing retired — CORRECTNESS_r17.json keys all remain registered.
# r19: nothing retired — CORRECTNESS_r18.json keys all remain registered.)

# New queries that could NOT fit this round's 50-slot window and whose
# driver verification is therefore deferred EXACTLY one round: they
# must sit immediately after the window boundary so the next rotation
# picks them up first, and they carry local oracle gating
# (test_registry_oracle, sf0.001 + sf0.01) in the meantime.
# Round 18: nothing new registered (registry at the 100-query
# ceiling; growth requires a funded retirement), so nothing defers.
_DEFERRED_TO_NEXT_WINDOW: list[str] = []


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


def test_rehearse_script_splits_on_registry_window():
    """ADVICE r13: scripts/rehearse.py hardcoded names[:50]; if the
    window size ever changed, rehearsal would silently test the wrong
    halves while these registry tests kept passing. The script must
    import WINDOW from the registry and carry no literal 50-split."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "scripts", "rehearse.py")) as f:
        src = f.read()
    assert "from mapreduce_experiment_spark.plans.registry import WINDOW" in src
    assert "names[:WINDOW]" in src and "names[WINDOW:]" in src
    assert "names[:50]" not in src and "names[50:]" not in src


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

_ROUND_BASE = "a93354e"  # r18 driver commit (verdict landed); bump each round

# Queries living in touched modules whose own plan + oracle are
# attested unchanged this round (measured against _ROUND_BASE = the
# r18 driver commit).
#
# Round 19 plan (optimization round 2 of 2): the window carries the
# r18 rewrites to their driver verdict (VERDICT item 2); the round's
# own heavy target (streaming_triangle_count delta state) is
# in-window. Out-of-window optimization targets from the VERDICT's
# ranked list (pagerank loop state, ngram_jaccard_pairs window pass,
# _edge_common_closers cache hygiene reaching the graph family, span
# family A/B) are attested below with value-neutrality arguments +
# local oracle gates (scripts/check_oracle.py at sf0.001/sf0.01) at
# the time each edit lands, plus the round-end rehearsal of both
# halves.
#
# r19 attestations (each added when its edit landed):
#
# 1. operators/graph.py + operators/text.py — DOCSTRING-ONLY edits
#    (r18 ADVICE items: _edge_common_closers orientation-sink-head
#    omission note; fingerprints unique-doc_id assumption). No
#    expression change (bytecode-identical modules). Every
#    out-of-window query in their import closure attested on that
#    basis: edges_derive, symmetrize, adjacency, degrees,
#    candidate_pairs, pagerank, triangles_faithful, lang_id,
#    quality_scores, token_counts, token_frequencies, pii_redaction,
#    tfidf_doc_pairs, fingerprints, bm25_topk, and the dedup-module
#    sharers below.
# 2. streaming/triangles.py — the r19 delta-state rewrite. Its ONLY
#    registered consumer (streaming_triangle_count) is IN-window;
#    sessionize_events / user_value_scd2 /
#    stateful_streaming_sessions_evicting / exact_dedup_groups /
#    minhash_dedup_pairs / ngram_jaccard_pairs / simhash_near_dups /
#    repeated_spans / span_deduped_corpus / canonical_url_groups
#    reach the changed modules only through package import-graph
#    closure (no runtime call into any changed function) and are
#    attested on that basis; their own plans and oracles are
#    byte-identical at attestation time. Entries here are RE-CHECKED
#    whenever a later r19 edit touches their modules for real, and
#    replaced by an explicit argument + local oracle gate then (see
#    ngram/pagerank/spans notes appended below as they land).
# 3. operators/graph.py — pagerank loop restructure (VERDICT item 4)
#    and _edge_common_closers lifecycle (item 6; in-window consumers
#    triangle_count/triangles, out-of-window triangles_faithful).
#    Value-neutrality: pagerank keeps the identical integer
#    fixed-point arithmetic per round (same join/agg/update
#    expressions, only partitioning + checkpoint mechanics moved);
#    the closure change swaps persist()+count() for eager
#    localCheckpoint (same rows). Gated by scripts/check_oracle.py
#    (pagerank, triangles_faithful, adjacency, degrees, symmetrize,
#    candidate_pairs, edges_derive) at sf0.001 + sf0.01 at commit
#    time, plus the round-end rehearsal of both halves.
# 4. operators/dedup.py — ngram_jaccard_pairs second-window removal
#    (VERDICT item 3; out-of-window): the per-doc prefix length now
#    joins the set SIZES from the already-checkpointed shingle-set
#    table instead of a second count(*) window over the same
#    partition — identical n per doc by construction (count of
#    distinct exploded rows == collect_set size). Gated by
#    check_oracle (ngram_jaccard_pairs, minhash_dedup_pairs,
#    exact_dedup_groups, canonical_url_groups, simhash_near_dups,
#    repeated_spans, span_deduped_corpus) at sf0.001 + sf0.01.
#
# Empirical backstop: both rehearsal halves re-run at sf0.01 at
# round close (BENCHNOTES r19).
_ATTESTED_UNCHANGED: set[str] = {
    "edges_derive", "symmetrize", "adjacency", "degrees",
    "candidate_pairs", "pagerank", "triangles_faithful",
    "exact_dedup_groups", "minhash_dedup_pairs", "ngram_jaccard_pairs",
    "simhash_near_dups", "repeated_spans", "span_deduped_corpus",
    "canonical_url_groups", "lang_id", "quality_scores",
    "token_counts", "token_frequencies", "pii_redaction",
    "tfidf_doc_pairs", "fingerprints", "bm25_topk",
    "sessionize_events", "user_value_scd2",
    "stateful_streaming_sessions_evicting",
}


def _round_sorted(paths: list[str]) -> list[str]:
    """Sort round-stamped artifact files by NUMERIC round: plain
    lexicographic sort would place r100 before r99 once the round
    number gains a digit, silently making files[-1] a stale round."""
    import re

    return sorted(paths, key=lambda p: int(
        re.search(r"_r(\d+)", os.path.basename(p)).group(1)))


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
    unknown = [k for k in keys
               if k not in SPECS() and k not in _RETIRED_AFTER_VERDICT]
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
    with open(files[-1]) as f:
        raw = f.read()
    # ADVICE r11: WINDOW_r11.json shipped without a trailing newline,
    # unlike the earlier snapshots — keep future artifacts POSIX-clean.
    assert raw.endswith("\n"), (
        f"{os.path.basename(files[-1])} is missing its trailing newline"
    )
    latest = json.loads(raw)
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
        if not verdict_commit:
            # `git log -- <untracked file>` exits 0 with EMPTY output.
            # An UNCOMMITTED latest verdict is the normal just-judged
            # state, not unrotated work: the driver drops
            # CORRECTNESS_r{N}.json untracked AFTER the build session's
            # final commit, so for two consecutive rounds this branch
            # made the judging-time tree red by design (r6 verdict,
            # What's wrong #1). The tripwire's actual invariant is
            # "no package work lands on top of a verdict without a
            # rotation" — so: green when the verdict file is newer
            # than every commit (verdict newer than all work), red
            # only when commits made AFTER the verdict dropped touch
            # the package.
            # mtime is the only drop-time signal an untracked file
            # has; it is trustworthy here because driver artifacts are
            # never rewritten by the build session (re-touching
            # CORRECTNESS_r{N}.json would reset the clock and soften
            # this check — don't).
            head_time = int(subprocess.run(
                ["git", "log", "-1", "--format=%ct", "HEAD"],
                capture_output=True, text=True, check=True, cwd=repo,
            ).stdout.strip())
            vtime = int(os.path.getmtime(cfiles[-1]))
            if head_time <= vtime:
                return
            touched = subprocess.run(
                ["git", "log", f"--since=@{vtime}", "--name-only",
                 "--format="],
                capture_output=True, text=True, check=True, cwd=repo,
            ).stdout.splitlines()
            late = sorted({p for p in touched if p.startswith(_PKG + "/")})
            assert not late, (
                f"package files committed after the uncommitted "
                f"{os.path.basename(cfiles[-1])} was dropped, without "
                f"a WINDOW_r{cround + 1}.json rotation: {late} — "
                "rotate _ORDER and commit the snapshot FIRST"
            )
            return
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


def test_staleness_tripwire_handles_just_judged_state(tmp_path):
    """The r6 verdict's What's-wrong #1, proven mechanically instead of
    argued: the driver drops CORRECTNESS_r{N}.json UNTRACKED after the
    session's final commit, and for two consecutive rounds that normal
    just-judged state made ``test_no_query_exceeds_one_round_staleness``
    the tree's only red at judging time. Simulate both sides of the
    fixed contract in a scratch clone:

    - untracked verdict newer than every commit → the tripwire is
      GREEN (just-judged, nothing to rotate yet);
    - a package commit landing AFTER the verdict dropped, with no new
      rotation → the tripwire goes RED (the actual violation).
    """
    import json
    import subprocess
    import sys
    import time

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    clone = tmp_path / "clone"
    subprocess.run(["git", "clone", "--quiet", repo, str(clone)],
                   check=True, capture_output=True)

    import glob
    wfiles = _round_sorted(glob.glob(str(clone / "WINDOW_r*.json")))
    wround = _round_of(wfiles[-1])
    keys = json.load(open(wfiles[-1]))
    # zero-padded like the real driver artifacts, so the fake never
    # coexists with a differently-spelled tracked file of the same
    # round (a same-round tie would make cfiles[-1] glob-order-
    # dependent)
    fake = str(clone / f"CORRECTNESS_r{wround:02d}.json")
    json.dump({k: {"rows_match": True, "schema_match": True,
                   "hash_match": True, "err": None} for k in keys},
              open(fake, "w"))

    def run_tripwire():
        return subprocess.run(
            [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider",
             "tests/test_registry_order.py::"
             "test_no_query_exceeds_one_round_staleness"],
            cwd=clone, capture_output=True, text=True)

    # Just-judged state: verdict file mtime AFTER the last commit —
    # a full day ahead so a future-dated HEAD (clock-skewed committer)
    # cannot flip the comparison.
    os.utime(fake, (time.time() + 86400, time.time() + 86400))
    r = run_tripwire()
    assert r.returncode == 0, (
        "tripwire red in the just-judged state (untracked verdict, no "
        f"commits after it):\n{r.stdout[-2000:]}"
    )

    # Violation: package work committed after the verdict dropped,
    # with no WINDOW_r{N+1} rotation.
    os.utime(fake, (time.time() - 60, time.time() - 60))
    probe = clone / _PKG / "_tripwire_probe.py"
    probe.write_text("# unrotated package work (tripwire probe)\n")
    subprocess.run(["git", "add", str(probe)], cwd=clone, check=True,
                   capture_output=True)
    subprocess.run(
        ["git", "-c", "user.name=probe", "-c", "user.email=probe@localhost",
         "commit", "-q", "-m", "probe: package work without rotation"],
        cwd=clone, check=True, capture_output=True)
    r = run_tripwire()
    assert r.returncode != 0, (
        "tripwire stayed green after package work was committed on top "
        "of an unrotated verdict"
    )
    assert "_tripwire_probe" in r.stdout
