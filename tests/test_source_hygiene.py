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
never ship in the -O execution path — EXCEPT tests/oracle_util.py,
which scripts/rehearse.py imports as the oracle gate for -O
rehearsals, so it (plus scripts/, bench.py, __spark_entry__.py) is
included in the scan.
"""

from __future__ import annotations

import ast
import os

import mapreduce_experiment_spark as pkg

_PKG_DIR = os.path.dirname(os.path.abspath(pkg.__file__))


_REPO_DIR = os.path.dirname(_PKG_DIR)

# Non-test files that ALSO run in the -O execution path (r13 review
# finding: scripts/rehearse.py is documented to run under python -O,
# and it gates through tests/oracle_util.assert_matches — a bare
# assert in either silently weakens the oracle gate to values-only).
_EXTRA_O_PATH_SOURCES = (
    os.path.join(_REPO_DIR, "tests", "oracle_util.py"),
    os.path.join(_REPO_DIR, "scripts"),
    os.path.join(_REPO_DIR, "bench.py"),
    os.path.join(_REPO_DIR, "__spark_entry__.py"),
)


def _package_sources() -> list[str]:
    out = []
    for top in (_PKG_DIR,) + _EXTRA_O_PATH_SOURCES:
        if os.path.isfile(top):
            out.append(top)
            continue
        for root, _dirs, files in os.walk(top):
            out.extend(os.path.join(root, f)
                       for f in files if f.endswith(".py"))
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
                    f"{os.path.relpath(path, _REPO_DIR)}:{node.lineno}")
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


def test_oracle_gate_fires_under_python_O():
    """r13 review finding, proven closed end-to-end: assert_matches'
    schema/row-count/type checks were bare asserts, so a ``python -O``
    rehearsal (scripts/rehearse.py's documented mode) silently passed
    a result missing an entire oracle column — the gate degraded to
    values-only. Now converted to explicit raises; this subprocess
    pins that the cheapest structural check (column mismatch) FIRES
    with asserts stripped. Duck-typed stand-in for the Spark side —
    assert_matches only touches .schema.fields and .toPandas()."""
    import subprocess
    import sys

    script = """
import sys
sys.path.insert(0, ".")
if sys.flags.optimize != 1:
    raise SystemExit("not running under -O")
import pandas as pd
from tests.oracle_util import assert_matches

class FakeField:
    def __init__(self, name):
        self.name = name
        self.dataType = None

class FakeSchema:
    fields = [FakeField("a")]

class FakeDF:
    schema = FakeSchema()
    def toPandas(self):
        return pd.DataFrame({"a": [1, 2]})

try:
    assert_matches(FakeDF(), pd.DataFrame({"a": [1, 2], "b": [3, 4]}), "p")
    raise SystemExit("oracle gate did not fire under -O")
except AssertionError:
    print("oracle-gate-fired")
"""
    r = subprocess.run([sys.executable, "-O", "-c", script],
                       capture_output=True, text=True, timeout=120,
                       cwd=_REPO_DIR)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr[-2000:]}"
    assert "oracle-gate-fired" in r.stdout
