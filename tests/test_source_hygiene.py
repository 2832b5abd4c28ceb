"""Package-wide source hygiene pins.

The r10-r12 advice cycle converted every load-bearing bare ``assert``
in package code to an explicit raise, because ``python -O`` strips
asserts: the simhash pigeonhole guard would have silently MISSED
near-dup pairs, and the k=5→k=7 oracle-rewrite guard would have
silently no-opped. The sweep is complete (grep found zero remaining);
this test pins it mechanically so a new bare assert in the package —
which would reintroduce the -O failure mode — fails review here
instead of resurfacing as a silent semantic hole.

Tests themselves are exempt: pytest rewrites their asserts and they
never ship in the -O execution path.
"""

from __future__ import annotations

import ast
import os

import mapreduce_experiment_spark as pkg

_PKG_DIR = os.path.dirname(os.path.abspath(pkg.__file__))


def _package_sources() -> list[str]:
    out = []
    for root, _dirs, files in os.walk(_PKG_DIR):
        out.extend(os.path.join(root, f) for f in files if f.endswith(".py"))
    return sorted(out)


def test_package_sources_walk_finds_the_package():
    """If the walk ever comes back empty (moved package, packaging
    change), the pin below would pass vacuously — fail loudly."""
    srcs = _package_sources()
    assert len(srcs) >= 20, srcs


def test_no_bare_asserts_in_package_code():
    offenders = []
    for path in _package_sources():
        with open(path) as f:
            tree = ast.parse(f.read(), filename=path)
        for node in ast.walk(tree):
            if isinstance(node, ast.Assert):
                offenders.append(
                    f"{os.path.relpath(path, _PKG_DIR)}:{node.lineno}")
    assert not offenders, (
        "bare assert in package code (stripped under python -O — "
        f"raise an explicit exception instead): {offenders}"
    )


def test_explicit_guards_survive_python_O():
    """The sweep's point, proven end-to-end: under ``python -O`` the
    converted guards must still FIRE. Exercises the flagship one (the
    simhash pigeonhole bound, whose violation silently misses pairs
    rather than erroring) and the maintained-IVF module-level rewrite
    guard's import path. The guard validates its argument before
    touching the DataFrame, so no Spark session is needed. The
    checking script itself avoids assert — it runs under -O too."""
    import subprocess
    import sys

    script = """
import sys
sys.path.insert(0, ".")
if sys.flags.optimize != 1:
    raise SystemExit("not running under -O")
from mapreduce_experiment_spark.operators.dedup import (
    SIMHASH_CHUNKS, simhash_near_dup_pairs)
try:
    simhash_near_dup_pairs(None, max_hamming=SIMHASH_CHUNKS)
    raise SystemExit("pigeonhole guard did not fire under -O")
except ValueError:
    print("pigeonhole-guard-fired")
from mapreduce_experiment_spark.plans import queries_similarity as QS
if QS._KNN_IVF_SQL_K7.count("WHERE rank <= 7") != 1:
    raise SystemExit("k7 oracle rewrite broken under -O")
print("k7-rewrite-ok")
"""
    r = subprocess.run([sys.executable, "-O", "-c", script],
                       capture_output=True, text=True, timeout=120,
                       cwd=os.path.dirname(_PKG_DIR))
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr[-2000:]}"
    assert "pigeonhole-guard-fired" in r.stdout
    assert "k7-rewrite-ok" in r.stdout
