"""CLI smoke tests (argument handling — §2 row 13 parity done right)."""

from __future__ import annotations

import subprocess
import sys


def _run(*args):
    return subprocess.run(
        [sys.executable, "-m", "mapreduce_experiment_spark.cli", *args],
        capture_output=True, text=True, cwd="/root/repo", timeout=300)


def test_list_names_queries():
    r = _run("list")
    assert r.returncode == 0
    assert "triangle_count" in r.stdout and "minhash_dedup_pairs" in r.stdout


def test_unknown_query_is_a_clean_error():
    r = _run("query", "no_such_query")
    assert r.returncode == 2
    assert "unknown query" in r.stderr


def test_missing_subcommand_errors():
    r = _run()
    assert r.returncode == 2
