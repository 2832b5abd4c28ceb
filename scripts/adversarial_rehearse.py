"""Adversarial-DATA rehearsal: run registry queries against their
DuckDB oracles over a synthesized DIRTY corpus instead of the clean
shipped testdata.

The r14 adversarial sweeps worked primitive-by-primitive (tokenize
chain, vector fold, JSON, dates, PII) and found real cross-engine
divergences on exactly the inputs the shipped ASCII corpus never
exercises. This script generalizes that to WHOLE-QUERY granularity:
rebuild ``documents`` and ``embeddings`` with hostile-but-in-contract
content (unicode traps, NULL/empty text, planted exact/near/span
duplicates, dirty URLs, zero-norm / extreme-magnitude / duplicate
vectors), keep every other table shipped-clean, and rehearse the full
registry with the driver's own gate (rows + schema + order-insensitive
values, tests/oracle_util).

In-contract means the documented engine contracts stay respected:

- U+0130 ('I' with dot) is excluded from the text alphabet — the one
  KNOWN tokenize divergence (Java SpecialCasing splits, DuckDB simple-
  fold merges; demonstrated + pinned by
  test_tokenize_chain_cross_engine_property).
- Embedding components are finite floats (NaN/Inf have no defined
  ranking contract); zero-norm vectors ARE in contract (cos := -1
  floor, r13).
- ``events`` is rebuilt hostile too (part 3): ts collisions, gaps at
  EXACTLY the 30-min session boundary, extreme µs-aligned dates
  (1960 / epoch 0 / 2260 — all inside the nanos-int64 bound), shuffled
  arrival order, half-cent and huge money values, NULL values,
  NULL/''/unknown event types, dirty-JSON props. Its in-contract
  bounds: ``event_id`` is UNIQUE (streaming_event_dedup's oracle IS
  the batch table — a replayed row is the STREAM side's job to
  simulate), ``ts`` is NON-NULL, µs-aligned, and STRICTLY AFTER
  epoch (Spark initializes event-time watermarks at epoch, so any
  watermarked operator drops ts <= 0 as late-from-birth; a NULL ts
  additionally has no defined cross-engine window order — Spark
  sorts NULLS FIRST, DuckDB NULLS LAST), ``value`` is NON-NULL and
  finite (the stateful sessionizer accumulates exact int64 cents
  and guards NULL loudly; negative values ARE in contract since the
  sign-symmetric quantization fix).

Usage:

    python scripts/adversarial_rehearse.py                  # all 100
    python scripts/adversarial_rehearse.py --half window
    python scripts/adversarial_rehearse.py --seed 3         # new corpus

Any FAIL is a finding: either a real engine/oracle divergence to fix
or an undocumented data contract to document and gate.
"""

from __future__ import annotations

import argparse
import os
import random
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The tokenize property test's adversarial alphabet (minus U+0130, the
# documented divergence): regex metacharacters, every whitespace trap
# (NEL, NBSP, ideographic space, U+2028/U+2029 via URLs below), CJK,
# an astral emoji, combining marks, fullwidth digits, ß/Σ/ς/ı.
_ALPHABET = ("abz09AZ" ".,!?#$^&*()[]{}|\\-_=+~`'\"" " \t\n\r\x0b\x0c"
             "\xa0\x85  " "中文\U0001F600" "\xe9́ı\xdfΣς"
             "０１")

_WORDS = ("the data spark query join filter group window token stream "
          "merge sort hash scan table row column agg fast slow key part "
          "naïve café 中文分析 Σigma straße 😀emoji ０１fullwidth").split()

_BOILER = ("this content is licensed under a creative commons "
           "attribution share alike license version four point zero")

_DIRTY_URLS = [
    "https://Example.COM/path/Page?utm=1#frag",
    "http://www.example.com/path/Page",
    "example.com/path/Page/",
    "  HTTPS://WWW.EXAMPLE.com/path/Page//\t",
    "https://example.com/path/Page/ ",          # the \z-vs-$ trap
    "https://example.com/path/Page/",
    "https://example.com/path/Page/ ",
    "https://other.org/API/Users",                    # path case preserved
    "https://other.org/api/users",
    "ftp://weird.scheme/keeps",                       # non-http scheme kept
    "", "   ", None,
    "https://example.com/\U0001F600/emoji",
    "https://xn--caf-dma.fr/café",
]


def _rand_text(rng: random.Random) -> str:
    n = rng.randrange(3, 40)
    return " ".join(rng.choice(_WORDS) for _ in range(n))


def _rand_junk(rng: random.Random) -> str:
    return "".join(rng.choice(_ALPHABET) for _ in range(rng.randrange(0, 80)))


def build_documents(rng: random.Random, n: int = 400):
    """(doc_id, text, lang, source, n_chars) rows with planted
    structure for every dedup/text family: exact dups, token-edit near
    dups, repeated boilerplate spans, and the degenerate text shapes
    (NULL, empty, whitespace-only, punctuation-only, unbroken CJK,
    emoji/combining-mark soup, one very long doc)."""
    rows = []
    langs = ["en", "es", "de", "zh", None, "xx", ""]

    def add(text, source=None):
        i = len(rows)
        rows.append((i, text, rng.choice(langs),
                     source if source is not None
                     else _DIRTY_URLS[i % len(_DIRTY_URLS)],
                     len(text) if text is not None else None))

    # plain word-soup base corpus
    base = [_rand_text(rng) for _ in range(n // 2)]
    for t in base:
        add(t)
    # exact duplicates (same text, new id/url)
    for t in rng.sample(base, 20):
        add(t)
    # near duplicates: one token substituted / appended
    for t in rng.sample(base, 20):
        toks = t.split()
        toks[rng.randrange(len(toks))] = rng.choice(_WORDS)
        add(" ".join(toks))
    # boilerplate spans planted mid-document (span-level dedup)
    for t in rng.sample(base, 12):
        cut = rng.randrange(len(t))
        add(t[:cut] + " " + _BOILER + " " + t[cut:])
    # degenerate shapes
    add(None)
    add("")
    add("   \t\n  ")
    add(".,!?#$%")
    add("中文没有空格的一整段连续文本再长一点也只是一个词元" * 8)
    add("\U0001F600 \U0001F600a\U0001F600 éclair \xdfẞ")
    add("０１ ΣΣ σς ıstanbul")
    add(" ".join(["tok"] * 600))            # long, highly repetitive
    add(_BOILER)                            # doc == the span itself
    add("a")
    # unicode junk soup (bounded — oracle minhash unrolls in SQL)
    while len(rows) < n:
        add(_rand_junk(rng))
    return rows


def build_embeddings(rng: random.Random, dim: int = 64, n: int = 400):
    """(vec_id, embedding float32[dim], label) with zero-norm, tiny-
    and large-magnitude, duplicate, near-duplicate, antiparallel, and
    one-hot vectors. ids stay 0..n-1 (vec_id<10 are the kNN queries,
    <16 the IVF seeds — both get ordinary random vectors so the
    query/seed contracts hold)."""
    import numpy as np

    vecs = []
    for i in range(n):
        v = np.array([rng.uniform(-1, 1) for _ in range(dim)],
                     dtype=np.float64)
        vecs.append(v)
    # planted structure in the corpus range (ids >= 16)
    vecs[20] = np.zeros(dim)                          # zero norm
    vecs[21] = np.zeros(dim)                          # zero-norm pair
    vecs[22] = vecs[30].copy()                        # exact duplicate
    vecs[23] = vecs[30] + 1e-7                        # near duplicate
    vecs[24] = -vecs[30]                              # antiparallel
    vecs[25] = np.eye(dim)[0]                         # one-hot
    vecs[26] = np.eye(dim)[0] * 1e18                  # huge magnitude
    vecs[27] = np.eye(dim)[0] * 1e-30                 # tiny magnitude
    vecs[28] = vecs[26].copy()                        # huge duplicate
    rows = [(i, [float(np.float32(x)) for x in v], rng.randrange(8))
            for i, v in enumerate(vecs)]
    return rows


_GAP_US = 30 * 60 * 1_000_000          # events.SESSION_GAP_MIN
_US = 1_000_000
_DAY = 86_400 * _US
_T0 = 1_704_067_200 * _US              # 2024-01-01 00:00:00 UTC
_TYPES = ("view", "click", "purchase", "signup", "error")
_DIRTY_PROPS = ['{"k": 7}', '{"k": "7"}', '{"k": 7.9}', '{"k": true}',
                'not json', '{"k": 7', None, '{}', '{"k": null}',
                '{"k": -12}', '{"k": [1,2]}']


def build_events(rng: random.Random):
    """(event_id, ts_us, user_id, event_type, value, props) with
    planted session-boundary, tie, extreme-date, and money-rounding
    structure. All in-contract (see module docstring): unique ids,
    non-null µs-aligned ts, finite values."""
    rows = []

    def add(us, user, etype="view", value=1.0, props=None):
        i = len(rows)
        rows.append((i, us,  user, etype,
                     value, props if props is not None
                     else f'{{"k": {i % 97}}}'))

    # u1: gap EXACTLY at / around the 30-min session boundary
    t = _T0
    for gap in (0, 1, _GAP_US - 1, _GAP_US, _GAP_US + 1, _GAP_US,
                2 * _GAP_US, 1, _GAP_US + 1):
        t += gap
        add(t, 1, rng.choice(_TYPES))
    # u2: five events on ONE microsecond (order falls to event_id)
    for _ in range(5):
        add(_T0 + 3 * _DAY, 2, rng.choice(_TYPES), round(rng.uniform(0, 9), 2))
    # u3: extreme µs-aligned dates — epoch+1µs, 1970-01-02, 2033,
    # 2024, and two hours shy of the nanos-int64 cap
    # (2262-04-11T23:47:16). Pre-/at-epoch ts are OUT of contract:
    # Spark initializes event-time watermarks AT epoch, so any
    # watermarked streaming operator drops ts <= 0 as late-from-birth
    # (demonstrated live: a 1960 and an epoch-0 event were the exact
    # two rows streaming_event_dedup lost). The 2-hour headroom below
    # the cap is for DERIVED times — session/window ends (ts + 30 min,
    # hourly buckets) must stay ns-representable for the pandas-side
    # oracle compare (engine timestamps are µs and unaffected).
    for us in (1, _DAY, 2_000_000_000 * _US, _T0 + 5 * _DAY,
               (9_223_372_036 - 7_200) * _US):
        add(us, 3, rng.choice(_TYPES))
    # u4: a single lonely event
    add(_T0 + 7 * _DAY, 4, "signup", 0.0)
    # u5: money-rounding traps — exact .5 cents (0.125*100), the
    # inexact x.xx5 family, negatives, zero, tiny
    for v in (0.125, 2.675, 0.005, -0.005, -2.675, 0.0, 1e-7, -1e-7,
              0.115, 327.535):
        t += rng.randrange(1, _GAP_US)
        add(t, 5, "purchase", v)
    # u6: NULL / '' / unknown event types (value stays NON-NULL: the
    # stateful sessionizer's exact-cents contract, loudly guarded)
    base6 = _T0 + 9 * _DAY
    add(base6, 6, None, 1.0)
    add(base6 + 1, 6, "", 2.0)
    add(base6 + 2, 6, "weird", 3.0)
    # u7: huge magnitudes. Bounded by the VERIFICATION domain, not
    # the engine's: the profiling-moments oracle multiplies per-row
    # BIGINT cents (overflow beyond ~3e9 cents — the documented
    # residual in test_moment_aggregates_survive_int64_overflow;
    # the ENGINE is exact decimal(38) far beyond). 2e7 = 2e9 cents,
    # just inside; r15 may HUGEINT-ify the oracle and raise this.
    for v in (2e7, -2e7, 1.9e7):
        add(base6 + _GAP_US + rng.randrange(1, _GAP_US), 7, "click", v)
    # negative user id
    add(_T0 + 11 * _DAY, -5, "view", 1.23)
    # u8: dense random day with view→purchase attribution pairs
    for _ in range(200):
        add(_T0 + 13 * _DAY + rng.randrange(0, _DAY), 8,
            rng.choice(_TYPES), round(rng.uniform(-50, 350), 2),
            rng.choice(_DIRTY_PROPS) if rng.random() < 0.3 else None)
    # several mid-size users for the group-by surface
    for u in range(9, 15):
        for _ in range(30):
            add(_T0 + rng.randrange(0, 20 * _DAY), u,
                rng.choice(_TYPES), round(rng.uniform(0, 300), 2))
    rng.shuffle(rows)                  # hostile arrival order on disk
    return [(eid, us, u, et, v, p)
            for eid, (_, us, u, et, v, p) in enumerate(rows)]


def write_advdata(out_dir: str, base_dir: str, seed: int) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mapreduce_experiment_spark.schemas import TABLE_NAMES

    os.makedirs(out_dir, exist_ok=True)
    for name in TABLE_NAMES:
        src = os.path.join(base_dir, f"{name}.parquet")
        if (name in ("documents", "embeddings", "events")
                or not os.path.exists(src)):
            continue
        shutil.copyfile(src, os.path.join(out_dir, f"{name}.parquet"))

    rng = random.Random(seed)
    docs = build_documents(rng)
    d_ids, d_text, d_lang, d_src, d_n = (list(c) for c in zip(*docs))
    pq.write_table(pa.table(
        {"doc_id": pa.array(d_ids, pa.int64()),
         "text": pa.array(d_text, pa.string()),
         "lang": pa.array(d_lang, pa.string()),
         "source": pa.array(d_src, pa.string()),
         "n_chars": pa.array(d_n, pa.int64())}),
        os.path.join(out_dir, "documents.parquet"))

    embs = build_embeddings(rng)
    e_ids, e_vec, e_lab = (list(c) for c in zip(*embs))
    pq.write_table(pa.table(
        {"vec_id": pa.array(e_ids, pa.int64()),
         "embedding": pa.array(e_vec, pa.list_(pa.float32())),
         "label": pa.array(e_lab, pa.int32())}),
        os.path.join(out_dir, "embeddings.parquet"))

    evs = build_events(rng)
    v_id, v_us, v_uid, v_et, v_val, v_pr = (list(c) for c in zip(*evs))
    pq.write_table(pa.table(
        {"event_id": pa.array(v_id, pa.int64()),
         "ts": pa.array(v_us, pa.timestamp("us")),
         "user_id": pa.array(v_uid, pa.int64()),
         "event_type": pa.array(v_et, pa.string()),
         "value": pa.array(v_val, pa.float64()),
         "props": pa.array(v_pr, pa.string())}),
        os.path.join(out_dir, "events.parquet"))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--half", choices=("window", "complement", "all"),
                    default="all")
    ap.add_argument("--base", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="/tmp/spark_graft_advdata")
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--only", default=None,
                    help="comma-separated query names (overrides --half)")
    args = ap.parse_args()

    write_advdata(args.out, args.base, args.seed)
    print(f"adversarial tables written to {args.out} (seed {args.seed})")

    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master(f"local[{args.cpus}]")
             .config("spark.ui.enabled", "false").getOrCreate())

    import __spark_entry__ as entry
    from mapreduce_experiment_spark.plans.registry import WINDOW
    from tests.oracle_util import assert_matches, run_oracle

    q, o = entry.queries(), entry.oracle_sql()
    names = list(q)
    half = {"window": names[:WINDOW], "complement": names[WINDOW:],
            "all": names}[args.half]
    if args.only:
        half = [n for n in args.only.split(",") if n]
    t00 = time.time()
    failures: list[tuple[str, str]] = []
    for i, name in enumerate(half):
        t0 = time.time()
        try:
            if name not in o:
                raise AssertionError("no_oracle")
            df = q[name](spark, args.out)
            assert_matches(df, run_oracle(o[name], args.out), name)
            verdict = "OK"
        except Exception as ex:  # noqa: BLE001 — report and continue
            verdict = f"FAIL {str(ex)[:300]}"
            failures.append((name, verdict))
        print(f"[{i + 1}/{len(half)}] {name}: {verdict} "
              f"({time.time() - t0:.1f}s)", flush=True)
    print(f"RESULT adversarial {args.half} seed={args.seed}: "
          f"{len(half) - len(failures)}/{len(half)} OK, "
          f"wall {time.time() - t00:.0f}s")
    for name, msg in failures:
        print("FAIL", name, msg)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
