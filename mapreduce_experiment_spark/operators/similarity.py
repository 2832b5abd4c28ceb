"""Embedding similarity search.

Two paths, same output contract (query_id, neighbor_id, rank, cos):

- **Brute force**: queries × corpus with a per-query top-k window.
  Exact; the right plan when the query set is small (broadcast) even
  at a 100 TB corpus — the corpus is scanned once, map-side, and only
  k rows per query survive per partition before the final merge.
- **IVF** (inverted file): corpus vectors are pre-assigned to their
  nearest centroid (one narrow pass + a broadcast of centroids);
  queries probe the ``nprobe`` nearest centroids and search only
  those buckets. Sub-linear scan at scale; deterministic here
  (centroids are fixed seed vectors) so it is value-testable against
  a mirrored SQL oracle.

Everything is built from joins + higher-order functions; ranking uses
quantized cosine (6dp) with id tie-breaks for cross-engine stability.
"""

from __future__ import annotations

import functools as _functools

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import as_double, dot, q6

N_CENTROIDS = 16
N_PROBE = 4

# SRP-LSH parameters: SRP_BANDS bands of SRP_ROWS sign bits each.
# Collision prob per bit for angle θ is 1-θ/π, so a TRUE duplicate
# pair (cos≥0.9, θ≤26°) collides in ≥1 band with p ≈ 1-(1-0.855^6)^12
# ≈ 0.999; borderline pairs (cos≈0.5) are caught with p ≈ 0.67 —
# the standard LSH recall/candidate-volume trade.
SRP_BANDS = 12
SRP_ROWS = 6
EMBED_DIM = 64  # testdata embeddings.parquet vector width


@_functools.lru_cache(maxsize=8)
def _srp_planes_cached(n_planes: int, dim: int) -> tuple[tuple[float, ...], ...]:
    import hashlib

    return tuple(
        tuple(1.0 if hashlib.md5(
            f"srp-{p}-{i}".encode()).digest()[0] % 2 == 0
            else -1.0 for i in range(dim))
        for p in range(n_planes)
    )


def srp_planes(n_planes: int = SRP_BANDS * SRP_ROWS,
               dim: int = EMBED_DIM) -> list[list[float]]:
    """Deterministic Rademacher (±1) hyperplanes for sign-random-
    projection hashing. Components come from md5 of the (plane, index)
    pair — no RNG state, so the SAME planes are embeddable as literals
    in both the Spark plan and the DuckDB oracle SQL.

    The md5 work (thousands of digests) is memoized per (n_planes,
    dim) — this is called on every index write, probe-time config
    validation, and oracle build. The cache holds immutable tuples;
    the fresh outer lists returned here keep callers free to mutate."""
    return [list(p) for p in _srp_planes_cached(n_planes, dim)]


def srp_signatures(embeddings: DataFrame, bands: int = SRP_BANDS,
                   rows: int = SRP_ROWS) -> DataFrame:
    """(vec_id, band_id, band_val) sign-projection signatures.

    Each band value packs ``rows`` sign bits of q6-quantized plane dot
    products (quantized so a last-ulp summation difference between
    engines cannot flip a sign at the boundary). Executed as ONE numpy
    matmul per Arrow batch (`mapInPandas`) — 72 dot products × 64 dims
    per row as JVM fold expressions bloats the Catalyst tree and runs
    interpreted; the BLAS path is both the fast and the scale shape
    (narrow input, map-side only, no shuffle).
    """
    import numpy as np
    import pandas as pd

    p_mat = np.array(srp_planes(bands * rows), dtype=np.float64)  # (P, dim)
    weights = (1 << np.arange(rows, dtype=np.int64))

    def sig(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            ids = pdf["vec_id"].to_numpy()
            mat = np.array(list(pdf["vec"]), dtype=np.float64)  # (n, dim)
            d = mat @ p_mat.T                                    # (n, P)
            bits = (np.floor(d * 1_000_000 + 0.5) >= 0).astype(np.int64)
            bv = bits.reshape(n, bands, rows) @ weights          # (n, bands)
            yield pd.DataFrame({
                "vec_id": np.repeat(ids, bands),
                "band_id": np.tile(np.arange(bands, dtype=np.int64), n),
                "band_val": bv.ravel(),
            })

    v = _prep(embeddings).select("vec_id", "vec")
    return v.mapInPandas(sig, schema="vec_id long, band_id long, band_val long")


def _self_join_cands(sigs: DataFrame) -> DataFrame:
    """Distinct canonical candidate pairs from a signature self-join
    on (band_id, band_val) — shared by the recompute path and the
    persisted-index path (duplicated byte-for-byte before r13), so a
    candidate-generation change can never apply to one and not the
    other."""
    a = sigs.select(F.col("vec_id").alias("id_a"), "band_id", "band_val")
    b = sigs.select(F.col("vec_id").alias("id_b"), "band_id", "band_val")
    return (
        a.join(b, ["band_id", "band_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def _verify_pairs(cands: DataFrame, embeddings: DataFrame,
                  threshold: float) -> DataFrame:
    """Exact-cosine verify of canonical (id_a, id_b) candidates against
    ``embeddings`` — the threshold join shared by every LSH near-dup
    path (four near-identical copies before r13; the zero-norm guard
    in _cos now lands everywhere by construction)."""
    v = _prep(embeddings)
    va = v.select(F.col("vec_id").alias("id_a"), F.col("vec").alias("va"),
                  F.col("norm").alias("na"))
    vb = v.select(F.col("vec_id").alias("id_b"), F.col("vec").alias("vb"),
                  F.col("norm").alias("nb"))
    return (
        cands.join(va, "id_a").join(vb, "id_b")
        .select("id_a", "id_b",
                _cos(F.col("va"), F.col("vb"), F.col("na"), F.col("nb"))
                .alias("cos"))
        .where(F.col("cos") >= threshold)
    )


def embedding_near_dup_pairs_lsh(embeddings: DataFrame,
                                 threshold: float = 0.45) -> DataFrame:
    """Bucketed embedding near-duplicates: SRP-LSH candidates + exact
    cosine verify. Replaces the all-pairs crossJoin (quadratic) with
    the 100 TB-shaped plan: signatures are one narrow map-side pass,
    candidates come from an equi-join on (band_id, band_val) —
    same-bucket vectors only — then the exact cosine runs on the
    (distinct) candidate set, never on the full N².
    """
    return _verify_pairs(_self_join_cands(srp_signatures(embeddings)),
                         embeddings, threshold)


def _prep(embeddings: DataFrame) -> DataFrame:
    """Vectors as doubles with the norm precomputed ONCE per vector —
    the per-pair cosine is then a single dot product, not three
    (norms recomputed per pair would triple the dominant cost)."""
    vec = as_double(F.col("embedding"))
    return embeddings.select(
        "vec_id", vec.alias("vec"), F.sqrt(dot(vec, vec)).alias("norm")
    )


def _cos(va: F.Column, vb: F.Column, na: F.Column, nb: F.Column) -> F.Column:
    """q6-quantized cosine, with cos := -1.0 when either norm is zero.

    A zero-norm embedding has no direction: unguarded, Spark 4's
    ANSI-on default hard-fails the whole query with DIVIDE_BY_ZERO on
    a single degenerate row, and the BLAS mirror's silent NaN ranked
    FIRST under cos DESC (r13 review — both verified live). -1.0 is
    the cosine floor, so degenerate vectors rank last in every kNN
    path and can never clear a near-dup threshold; a genuine
    antiparallel pair also scores -1, which is indistinguishable here
    and equally never a neighbor of interest. Value-neutral on all
    shipped testdata (zero zero-norm vectors at every SF, checked)."""
    den = na * nb
    return q6(F.when(den == F.lit(0.0), F.lit(-1.0))
              .otherwise(dot(va, vb) / den))


def embedding_near_dup_pairs(embeddings: DataFrame,
                             threshold: float = 0.45) -> DataFrame:
    """All-pairs cosine near-duplicates — EXACT but quadratic; kept as
    the recall reference for tests. The registered query uses
    :func:`embedding_near_dup_pairs_lsh` (bucketed, scale path)."""
    v = _prep(embeddings)
    a = v.select(F.col("vec_id").alias("id_a"), F.col("vec").alias("va"),
                 F.col("norm").alias("na"))
    b = v.select(F.col("vec_id").alias("id_b"), F.col("vec").alias("vb"),
                 F.col("norm").alias("nb"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b",
                _cos(F.col("va"), F.col("vb"), F.col("na"), F.col("nb"))
                .alias("cos"))
        .where(F.col("cos") >= threshold)
    )


def knn_bruteforce(embeddings: DataFrame, n_queries: int = 10,
                   k: int = 5) -> DataFrame:
    """Exact top-k cosine neighbors for the query set ``vec_id <
    n_queries`` over the corpus ``vec_id >= n_queries``.

    The query side is tiny → Catalyst broadcasts it; the corpus scan
    is map-side and the only shuffle is the per-query top-k window on
    ``query_id``.
    """
    v = _prep(embeddings)
    queries = v.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qv"),
        F.col("norm").alias("qn"))
    corpus = v.where(F.col("vec_id") >= n_queries).select(
        F.col("vec_id").alias("neighbor_id"), F.col("vec").alias("nv"),
        F.col("norm").alias("nn"))
    scored = (
        F.broadcast(queries).crossJoin(corpus)
        .select("query_id", "neighbor_id",
                _cos(F.col("qv"), F.col("nv"), F.col("qn"), F.col("nn"))
                .alias("cos"))
    )
    return _topk(scored, k)


def knn_bruteforce_blas(embeddings: DataFrame, n_queries: int = 10,
                        k: int = 5) -> DataFrame:
    """Brute-force top-k via Arrow + numpy matmul (`mapInPandas`).

    Same contract and scores as :func:`knn_bruteforce`, different
    execution: the tiny query matrix rides into each Arrow batch as a
    closure; each corpus batch computes all query·corpus products as
    ONE BLAS matmul. For wide embeddings (≥~256 dims) this beats the
    JVM expression fold by an order of magnitude; per-query top-k
    still happens in Spark so only |corpus_partition|×|queries| score
    rows shuffle — and those could be pre-topped per partition if the
    row count ever dominated.

    Scores are quantized to 6dp like the JVM path; numpy's pairwise
    summation can differ from the sequential fold in the last ulp,
    which the quantization absorbs (verified against the same oracle).
    """
    import numpy as np
    import pandas as pd

    v = _prep(embeddings)
    qrows = (v.where(F.col("vec_id") < n_queries)
             .select("vec_id", "vec", "norm").collect())
    q_ids = np.array([r.vec_id for r in qrows])
    q_mat = np.array([r.vec for r in qrows], dtype=np.float64)
    q_norm = np.array([r.norm for r in qrows], dtype=np.float64)

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue  # empty Arrow batch: (0,) mat breaks the matmul
            ids = pdf["vec_id"].to_numpy()
            mat = np.array(list(pdf["vec"]), dtype=np.float64)
            norm = pdf["norm"].to_numpy(dtype=np.float64)
            # Mirror _cos's zero-norm floor: numpy 0/0 is a silent NaN
            # that ranks FIRST under cos DESC (r13 review); divide by
            # a substituted 1.0 so the masked lanes never raise.
            den = q_norm[:, None] * norm[None, :]
            cos = np.where(den == 0.0, -1.0,
                           (q_mat @ mat.T) / np.where(den == 0.0, 1.0, den))
            cos = np.floor(cos * 1_000_000 + 0.5) / 1_000_000.0
            nq, nc = cos.shape
            yield pd.DataFrame({
                "query_id": np.repeat(q_ids, nc),
                "neighbor_id": np.tile(ids, nq),
                "cos": cos.ravel(),
            })

    corpus = v.where(F.col("vec_id") >= n_queries)
    scored = corpus.mapInPandas(
        score, schema="query_id long, neighbor_id long, cos double")
    return _topk(scored, k)


# --- trained IVF: deterministic Lloyd k-means ------------------------------
#
# The seed-centroid IVF above trades training for determinism; this is
# the shape a real 100 TB embedding pipeline runs: k-means-trained
# centroids, then the same bucket/probe machinery. Determinism is kept
# by doing ALL distance/update arithmetic in int64 micro-units
# (components quantized once via floor(x*1e6 + 0.5)): integer sums are
# summation-order-independent, integer argmin has no float ties, and
# the centroid mean is an exact floor division — so a DuckDB oracle
# can replay training bit-for-bit as unrolled SQL.
#
# Driver/cluster split mirrors Spark MLlib's KMeans: centroids are
# driver state (k×d ints, broadcast into each pass's Arrow closure);
# the data never leaves the executors. Each Lloyd round is one
# map-side assignment pass + per-batch partial sums (k×d rows per
# batch — map-side combine in pandas) + one tiny shuffle/collect.
# Empty clusters drop (both engines' group-bys skip them identically).

KMEANS_K = N_CENTROIDS
KMEANS_ITER = 3
QUANT_SCALE = 1_000_000
# Saturation bound for quantized components (micro-units; |x| <= 16).
# Without it a huge-magnitude vector (legal float32 — think corrupt
# or unnormalized embeddings in a 100 TB corpus) made
# `astype(np.int64)` overflow UNDEFINED numpy garbage on the engine
# side while the oracle's strict BIGINT cast crashed (r14 adversarial
# rehearsal, 1e18-component vector, reproduced live). Clamping is the
# deterministic defined behavior (same family as the zero-norm
# cos := -1 floor): out-of-range components saturate identically in
# both engines, and the integer squared-L2 stays exact —
# d * (2*QUANT_MAX)^2 <= int64max for any d <= 8,984. Shipped data
# (|x| <= 0.58) never clamps. Pinned by
# test_kmeans_survives_extreme_magnitudes.
QUANT_MAX = 16_000_000


def _quantize_mat(mat):
    """float64 (n, d) -> saturating int64 micro-units, mirroring the
    SQL CAST(least(greatest(floor(CAST(x AS DOUBLE) * 1e6 + 0.5),
    -QUANT_MAX), QUANT_MAX) AS BIGINT)."""
    import numpy as np

    return np.clip(np.floor(mat * QUANT_SCALE + 0.5),
                   -QUANT_MAX, QUANT_MAX).astype(np.int64)


def _sqdist_int(mat, cents):
    """Exact integer squared-L2 distance matrix (n, k): numpy int64
    matmul (no BLAS float path), magnitudes bounded by the QUANT_MAX
    clamp — d * (2*QUANT_MAX)^2 << 2^63."""
    return ((mat * mat).sum(axis=1)[:, None]
            - 2 * (mat @ cents.T)
            + (cents * cents).sum(axis=1)[None, :])


def _vec_batches(embeddings: DataFrame):
    return _prep(embeddings).select("vec_id", "vec")


def kmeans_train(embeddings: DataFrame, k: int = KMEANS_K,
                 n_iter: int = KMEANS_ITER):
    """``n_iter`` Lloyd rounds from the ``vec_id < k`` seed vectors.

    Returns ``(cent_ids, cents)``: surviving centroid ids (ascending)
    and their int64 micro-unit vectors, one row each. Update rule per
    dimension is ``sum // count`` — EXACT integer floor division over
    Python ints, valid at every magnitude. The SQL mirror
    (plans/queries_similarity._kmeans_cte) replays it in exact HUGEINT
    arithmetic with a floor-mod adjustment; no double rounding on
    either side (ADVICE r17: a DOUBLE-cast oracle form diverges once
    per-(centroid,pos) |sum| >= 2^53).
    """
    import numpy as np

    v = _vec_batches(embeddings).persist()
    try:  # unpersist even when a training collect throws, else the
        # cached plan holds executor storage for the app's lifetime
        seeds = sorted(v.where(F.col("vec_id") < k).collect(),
                       key=lambda r: r.vec_id)
        cent_ids = [r.vec_id for r in seeds]
        cents = _quantize_mat(
            np.array([r.vec for r in seeds], dtype=np.float64))
        for _ in range(n_iter):
            agg = (
                _kmeans_partial_sums(v, cent_ids, cents)
                .groupBy("centroid_id", "pos")
                .agg(F.sum("psum").alias("s"), F.sum("pcnt").alias("cnt"))
                .collect()
            )
            by_cid: dict[int, dict[int, tuple[int, int]]] = {}
            for r in agg:
                by_cid.setdefault(r.centroid_id, {})[r.pos] = (r.s, r.cnt)
            cent_ids = sorted(by_cid)
            d = cents.shape[1]
            cents = np.array(
                [[by_cid[cid][p][0] // by_cid[cid][p][1]
                  for p in range(1, d + 1)]
                 for cid in cent_ids],
                dtype=np.int64,
            )
    finally:
        v.unpersist()
    return cent_ids, cents


def _kmeans_partial_sums(v: DataFrame, cent_ids, cents) -> DataFrame:
    """One Lloyd half-step: assign each vector to its nearest centroid
    (int argmin; ties -> lowest centroid id, numpy argmin's first-hit
    on the id-sorted centroid array) and emit per-batch partial sums —
    (centroid_id, pos, psum, pcnt) with pos 1-based to match the SQL
    mirror."""
    import numpy as np
    import pandas as pd

    ids_arr = list(cent_ids)
    c = cents

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = _quantize_mat(np.array(list(pdf["vec"]), dtype=np.float64))
            nearest = _sqdist_int(mat, c).argmin(axis=1)
            d = mat.shape[1]
            for j, cid in enumerate(ids_arr):
                sel = mat[nearest == j]
                if not len(sel):
                    continue
                yield pd.DataFrame({
                    "centroid_id": np.int64(cid),
                    "pos": np.arange(1, d + 1, dtype=np.int64),
                    "psum": sel.sum(axis=0),
                    "pcnt": np.int64(len(sel)),
                })

    return v.mapInPandas(
        gen, schema="centroid_id long, pos long, psum long, pcnt long")


def kmeans_assignments_df(embeddings: DataFrame, cent_ids, cents) -> DataFrame:
    """Map-side nearest-centroid assignment of EVERY vector under the
    given (trained) centroids — (vec_id, centroid_id), no shuffle."""
    import numpy as np
    import pandas as pd

    ids_arr = np.array(list(cent_ids), dtype=np.int64)
    c = cents

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = _quantize_mat(np.array(list(pdf["vec"]), dtype=np.float64))
            nearest = _sqdist_int(mat, c).argmin(axis=1)
            yield pd.DataFrame({
                "vec_id": pdf["vec_id"].to_numpy(),
                "centroid_id": ids_arr[nearest],
            })

    return _vec_batches(embeddings).mapInPandas(
        gen, schema="vec_id long, centroid_id long")


def kmeans_centroid_dists(embeddings: DataFrame, cent_ids, cents,
                          n_queries: int) -> DataFrame:
    """All (query, centroid) integer squared distances for the probe
    ranking — k rows per query, ranked by (dist, centroid_id) in the
    caller's window."""
    import numpy as np
    import pandas as pd

    ids_arr = np.array(list(cent_ids), dtype=np.int64)
    c = cents
    k = len(ids_arr)

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = _quantize_mat(np.array(list(pdf["vec"]), dtype=np.float64))
            dists = _sqdist_int(mat, c)
            n = len(pdf)
            yield pd.DataFrame({
                "query_id": np.repeat(pdf["vec_id"].to_numpy(), k),
                "centroid_id": np.tile(ids_arr, n),
                "dist": dists.ravel(),
            })

    q = _vec_batches(embeddings).where(F.col("vec_id") < n_queries)
    return q.mapInPandas(gen, schema="query_id long, centroid_id long, dist long")


def knn_ivf_trained(embeddings: DataFrame, n_queries: int = 10, k: int = 5,
                    n_centroids: int = KMEANS_K, n_iter: int = KMEANS_ITER,
                    nprobe: int = N_PROBE) -> DataFrame:
    """IVF kNN over TRAINED centroids: Lloyd training, nearest-trained-
    centroid buckets, integer-L2 probe ranking, exact-cosine scoring
    of the probed buckets (same output contract as :func:`knn_ivf`).

    Assignment/probe use exact integer L2 (k-means' native metric);
    final scoring stays q6-quantized cosine so the contract matches
    the untrained path. At 100 TB the bucketed corpus is written
    partitioned by centroid_id, making each probe a partition-pruned
    scan; here the pruning is the equi-join on centroid_id.

    Recall honesty: the registered oracle mirrors the bucketing, so it
    proves cross-engine agreement, not neighbor quality — recall@5 vs
    :func:`knn_bruteforce` is gated at ≥0.8 (observed 0.90) by
    ``tests/test_pipeline_ops.py::test_ivf_recall_vs_bruteforce``.
    """
    cent_ids, cents = kmeans_train(embeddings, n_centroids, n_iter)

    wp = Window.partitionBy("query_id").orderBy("dist", "centroid_id")
    probes = (
        kmeans_centroid_dists(embeddings, cent_ids, cents, n_queries)
        .withColumn("prn", F.row_number().over(wp))
        .where(F.col("prn") <= nprobe)
        .select("query_id", "centroid_id")
    )
    buckets = kmeans_assignments_df(embeddings, cent_ids, cents).where(
        F.col("vec_id") >= n_queries)

    v = _prep(embeddings)
    cands = _score_bucket_cands(probes, buckets, v,
                                _ivf_queries(v, n_queries))
    return _topk(cands, k)


def _assign_to_centroids(corpus: DataFrame,
                         centroids: DataFrame) -> DataFrame:
    """(vec_id, centroid_id) nearest-centroid assignment of prepped
    ``corpus`` vectors against prepped ``centroids`` (centroid_id,
    cv, cn) — the scoring + argmax core shared by
    :func:`ivf_assignments` (seed-centroid bucketing) and
    :func:`append_ivf_index` (daily-ingest batch assignment), so the
    two paths can never diverge on tie-breaking.

    The argmax is ``max_by`` over a UNIQUE ordering struct
    ``(cos, -centroid_id)`` — identical selection to the previous
    row_number window (max cos, ties to the LOWEST centroid id;
    uniqueness of the struct per vector makes the aggregate
    order-insensitive, hence deterministic across partial merges).
    Aggregate, not window, deliberately (r16): each vector's k scored
    rows are born in ONE input partition (map-side crossJoin
    fan-out), so the partial aggregate collapses them before the
    exchange — the shuffle carries ONE row per vector, where the
    window form shuffled AND sorted all k×N scored rows (k=16 → a
    16×-inflated corpus-cardinality exchange at 100 TB). The struct
    ordering buffer makes this a SortAggregate (its sorts are LOCAL,
    map-side, k·N·log(k·N) CPU — not a shuffle); packing the ordering
    into one long would buy HashAggregate but impose a hidden
    centroid_id < 2^32 contract on a shared helper — rejected."""
    scored = (
        corpus.crossJoin(F.broadcast(centroids))
        .select("vec_id", "centroid_id",
                _cos(F.col("vec"), F.col("cv"), F.col("norm"), F.col("cn"))
                .alias("cos"))
    )
    return scored.groupBy("vec_id").agg(
        F.max_by(
            "centroid_id",
            F.struct(F.col("cos"), (-F.col("centroid_id")).alias("nid")),
        ).alias("centroid_id")
    )


def ivf_assignments(embeddings: DataFrame,
                    n_centroids: int = N_CENTROIDS) -> DataFrame:
    """Assign every corpus vector to its nearest centroid.

    Centroids are the seed vectors ``vec_id < n_centroids`` — a
    deterministic stand-in for k-means (which would converge to
    data-dependent floats and break value-level oracle checks).
    One broadcast join + one argmax aggregate (``max_by`` with
    map-side partial combine — r16 rewrite); no iteration.
    """
    v = _prep(embeddings)
    centroids = v.where(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("centroid_id"), F.col("vec").alias("cv"),
        F.col("norm").alias("cn"))
    return _assign_to_centroids(v.where(F.col("vec_id") >= n_centroids),
                                centroids)


def _ivf_queries(v: DataFrame, n_queries: int) -> DataFrame:
    """The (query_id, qv, qn) probe side — shared by the in-memory
    and persisted-index IVF paths so tie-breaking and the query-set
    definition can never diverge between them (their value-parity is
    a tested contract)."""
    return v.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qv"),
        F.col("norm").alias("qn"))


def _ivf_probes(v: DataFrame, n_queries: int, n_centroids: int,
                nprobe: int) -> DataFrame:
    """Per-query nprobe nearest seed centroids by quantized cosine,
    (ccos desc, centroid_id) tie-break — the single source of truth
    for probe selection."""
    queries = _ivf_queries(v, n_queries)
    centroids = v.where(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("centroid_id"), F.col("vec").alias("cv"),
        F.col("norm").alias("cn"))
    probe_scored = (
        F.broadcast(queries).crossJoin(F.broadcast(centroids))
        .select("query_id", "centroid_id",
                _cos(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn"))
                .alias("ccos"))
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.col("ccos").desc(), F.col("centroid_id"))
    return (
        probe_scored.withColumn("rn", F.row_number().over(wp))
        .where(F.col("rn") <= nprobe)
        .select("query_id", "centroid_id")
    )


def _topk(cands: DataFrame, k: int) -> DataFrame:
    """Per-query top-k by (cos desc, neighbor_id) — the shared final
    ranking of every kNN path (since r13 actually called by every
    path: brute-force, BLAS, trained, and the two IVF paths inlined
    copies before, which a future tie-break change would have
    silently skipped — r13 review)."""
    wk = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id"))
    return (
        cands.withColumn("rank", F.row_number().over(wk).cast("long"))
        .where(F.col("rank") <= k)
    )


def _score_bucket_cands(probes: DataFrame, buckets: DataFrame,
                        v: DataFrame, queries: DataFrame) -> DataFrame:
    """probes(query_id, centroid_id) ⋈ buckets(vec_id, centroid_id) →
    exact-cosine-scored candidates — the candidate join shared by
    :func:`knn_ivf` and :func:`knn_ivf_trained` (duplicated verbatim
    before r13, invisible to the shared-helper tests)."""
    corpus = v.select(F.col("vec_id").alias("neighbor_id"),
                      F.col("vec").alias("nv"), F.col("norm").alias("nn"))
    return (
        probes.join(buckets, "centroid_id")
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .join(corpus, "neighbor_id")
        .join(F.broadcast(queries), "query_id")
        .select("query_id", "neighbor_id",
                _cos(F.col("qv"), F.col("nv"), F.col("qn"), F.col("nn"))
                .alias("cos"))
    )


def _ivf_buckets(embeddings: DataFrame, n_queries: int,
                n_centroids: int) -> DataFrame:
    """Bucketed corpus (excludes queries AND centroid seeds, matching
    ivf_assignments' corpus definition) — shared by the in-memory
    probe join and the index writer so the two paths can never
    disagree on membership."""
    return ivf_assignments(embeddings, n_centroids).where(
        F.col("vec_id") >= n_queries)


def knn_ivf(embeddings: DataFrame, n_queries: int = 10, k: int = 5,
            n_centroids: int = N_CENTROIDS, nprobe: int = N_PROBE) -> DataFrame:
    """Approximate top-k: probe the ``nprobe`` nearest centroids per
    query and search only their buckets.

    At 100 TB the bucketed corpus is written partitioned by
    ``centroid_id`` so a probe prunes partitions at the scan; here the
    pruning is the equi-join on centroid_id (the persisted, pruned
    variant is :func:`knn_ivf_pruned`, value-identical by test).

    Recall honesty: the oracle mirrors the approximation; true-neighbor
    recall@5 vs :func:`knn_bruteforce` is gated at ≥0.8 (observed
    0.92) by ``test_ivf_recall_vs_bruteforce``.
    """
    v = _prep(embeddings)
    probes = _ivf_probes(v, n_queries, n_centroids, nprobe)
    buckets = _ivf_buckets(embeddings, n_queries, n_centroids)
    cands = _score_bucket_cands(probes, buckets, v,
                                _ivf_queries(v, n_queries))
    return _topk(cands, k)


def write_ivf_index(embeddings: DataFrame, path: str,
                    n_queries: int = 10,
                    n_centroids: int = N_CENTROIDS) -> None:
    """Materialize the IVF index :func:`knn_ivf` describes: the
    bucketed corpus written ``partitionBy("centroid_id")``, each
    vector stored with its precomputed norm. This is the persistence
    step that turns the probe's equi-join into a partition-PRUNED
    scan — at 100 TB the index is written once and every query batch
    reads only ``nprobe`` of ``n_centroids`` directories."""
    buckets = _ivf_buckets(embeddings, n_queries, n_centroids)
    v = _prep(embeddings)
    (buckets.join(v, "vec_id")
     .select("vec_id", "vec", "norm", "centroid_id")
     .write.mode("overwrite").partitionBy("centroid_id").parquet(path))


def append_ivf_index(batch: DataFrame, centroids_src: DataFrame, path: str,
                     *, n_queries: int = 10,
                     n_centroids: int = N_CENTROIDS) -> None:
    """Append a new vector batch into the persisted IVF index — the
    write half of the daily-ingest cycle for the centroid-partitioned
    index (the SRP analogue is :func:`append_srp_index`). The batch
    is assigned against the SAME seed centroids the index was built
    with (``centroids_src`` is the original corpus table; ids <
    ``n_centroids`` are the seeds), sharing the exact scoring +
    tie-break core with :func:`ivf_assignments`, then appended
    ``partitionBy(centroid_id)`` — each append only adds files under
    the partitions it touches, and probes keep pruning by directory
    exactly as before. The index MEMBERSHIP contract is enforced
    here too, not just in :func:`write_ivf_index`: rows with ids
    below ``n_queries`` / ``n_centroids`` are query vectors /
    centroid seeds, never corpus (``_ivf_buckets``), so a
    re-delivered or corrected low-id vector in the batch is filtered
    out — otherwise the next probe would return a query as its own
    rank-1 neighbor, silently diverging from a full rebuild. Value
    parity of the appended index with a full rebuild over
    corpus+batch is pinned by ``test_ivf_index_append_cycle``."""
    cv = _prep(centroids_src)
    centroids = cv.where(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("centroid_id"), F.col("vec").alias("cv"),
        F.col("norm").alias("cn"))
    bv = _prep(batch).where(
        F.col("vec_id") >= max(n_queries, n_centroids))
    assign = _assign_to_centroids(bv, centroids)
    (assign.join(bv, "vec_id")
     .select("vec_id", "vec", "norm", "centroid_id")
     .write.mode("append").partitionBy("centroid_id").parquet(path))


def compact_ivf_index(spark, path: str, new_path: str) -> None:
    """Compact an appended-to IVF index into ``new_path`` — the
    maintenance job that completes the centroid-partitioned index's
    ingest cycle, mirroring :func:`compact_srp_index` for the SRP
    family (r9: the SRP side had write/append/compact; the IVF side
    stopped at append, leaving each ``centroid_id=`` directory to
    gain one file per daily :func:`append_ivf_index` forever).

    One hash repartition on ``centroid_id`` puts every centroid's
    rows in exactly one task, so each partition directory comes out
    holding exactly ONE data file (a task may own several centroids —
    still one file per directory; AQE coalescing only widens a task's
    centroid set, never splits one). That single shuffle IS the cost
    of compaction — an off-peak maintenance job, not a query-path
    cost, identical to the SRP analysis. A NEW directory plus a
    caller-side cutover is again the only safe shape: rewriting in
    place would yank files out from under a concurrent probe's
    already-planned partition-pruned scan. Unlike the SRP table there
    are no catalog properties to carry — the IVF contract (seed
    centroids = ids below ``n_centroids``) is positional in the data
    itself and survives the rewrite byte-for-byte (row multiset
    parity and probe value parity pinned by
    ``test_ivf_index_compaction``)."""
    idx = spark.read.parquet(path)
    (idx.repartition(F.col("centroid_id"))
     .write.mode("overwrite").partitionBy("centroid_id")
     .parquet(new_path))


SRP_INDEX_BUCKETS = 16


def srp_config_props(bands: int, rows: int,
                     dim: int = EMBED_DIM) -> dict[str, str]:
    """The banding configuration an SRP index is bound to, as table
    properties: bands/rows/dim plus an md5 fingerprint of the actual
    plane matrix (the planes are md5-derived from indices, so the
    fingerprint also pins the generation scheme itself — a future
    change to :func:`srp_planes` invalidates old indexes loudly
    instead of silently probing with different geometry). The plane
    matrix, its repr, and the fingerprint are memoized — this runs on
    every index write AND every probe-time validation."""
    return {"srp.bands": str(bands), "srp.rows": str(rows),
            "srp.dim": str(dim),
            "srp.planes_md5": _srp_planes_md5(bands * rows, dim)}


@_functools.lru_cache(maxsize=8)
def _srp_planes_md5(n_planes: int, dim: int) -> str:
    import hashlib

    return hashlib.md5(repr(srp_planes(n_planes, dim)).encode()).hexdigest()


def validate_srp_index_config(spark, table: str, bands: int, rows: int,
                              dim: int = EMBED_DIM) -> None:
    """Raise ValueError unless ``table`` was written with exactly this
    banding configuration (r7 ADVICE: a mismatched probe equi-join
    silently misses true pairs — band values pack ``rows`` sign bits,
    so there is no schema-level error to save you)."""
    got = {r["key"]: r["value"]
           for r in spark.sql(f"SHOW TBLPROPERTIES {table}").collect()}
    want = srp_config_props(bands, rows, dim)
    bad = {k: (got.get(k), v) for k, v in want.items() if got.get(k) != v}
    if bad:
        raise ValueError(
            f"SRP index {table!r} banding config mismatch (probe would "
            f"silently miss true pairs): "
            + "; ".join(f"{k}: index={g!r} probe={w!r}"
                        for k, (g, w) in sorted(bad.items())))


def write_srp_index(embeddings: DataFrame, table: str, path: str | None = None,
                    bands: int = SRP_BANDS, rows: int = SRP_ROWS,
                    n_buckets: int = SRP_INDEX_BUCKETS) -> None:
    """Materialize the SRP-LSH signature index as a BUCKETED table on
    (band_id, band_val) — the embedding analogue of
    :func:`write_ivf_index` (r6 verdict "What's missing" #2): a 100 TB
    pipeline computes signatures ONCE, persists them, and probes the
    persisted index incrementally instead of re-projecting the whole
    corpus per query batch.

    Why bucketBy, not partitionBy: the near-dup candidate generator is
    a SELF-equi-join on (band_id, band_val). ``bucketBy`` on exactly
    those keys makes both sides of that join arrive pre-shuffled —
    Spark plans the join with NO Exchange on either side (pinned by
    ``test_srp_index_self_join_is_shuffle_free``), which at corpus
    scale deletes the single biggest data movement near-dedup has.
    (partitionBy would give directory pruning instead, but 12x64
    directories of tiny files and a full shuffle per self-join is the
    wrong trade; bucket pruning on scan is a non-goal here since Spark
    prunes buckets only for single-column bucket specs.)

    The index stores only (vec_id, band_id, band_val) — 24 bytes/row,
    signatures-not-vectors: the wide embedding payload stays in the
    corpus table and is joined back onto the (tiny) verified-candidate
    set, mirroring the band-join discipline of minhash_dedup_pairs.
    The pre-write ``repartition(n_buckets, keys)`` uses the same
    murmur3 pmod as the bucket spec, so every task holds exactly the
    rows of its own bucket -> one file per bucket, no small-file spray.

    The banding configuration travels WITH the index as table
    properties (r7 ADVICE: the bands/rows contract between writer and
    prober was documented but not machine-checked — a mismatched probe
    silently misses true pairs rather than erroring):
    :func:`embedding_near_dups_probe_index` validates them and raises
    on mismatch.
    """
    sigs = srp_signatures(embeddings, bands, rows)
    w = (sigs.repartition(n_buckets, F.col("band_id"), F.col("band_val"))
         .write.mode("overwrite")
         .bucketBy(n_buckets, "band_id", "band_val")
         .sortBy("band_id", "band_val")
         .format("parquet"))
    if path is not None:
        # External table at an explicit location (callers that manage
        # their own warehouse/GC directory); bucketing metadata still
        # lives in the catalog either way.
        w = w.option("path", path)
    w.saveAsTable(table)
    props = srp_config_props(bands, rows)
    kv = ", ".join(f"'{k}'='{v}'" for k, v in props.items())
    embeddings.sparkSession.sql(
        f"ALTER TABLE {table} SET TBLPROPERTIES ({kv})")


def append_srp_index(batch: DataFrame, table: str,
                     bands: int = SRP_BANDS, rows: int = SRP_ROWS,
                     n_buckets: int = SRP_INDEX_BUCKETS) -> None:
    """Append a new batch's signatures into an existing SRP index —
    the write half of the daily-ingest cycle (probe the batch with
    :func:`embedding_near_dups_probe_index`, THEN append it so
    tomorrow's batch sees it as corpus). The banding config is
    validated against the table properties first, exactly like the
    probe: appending signatures computed with different geometry would
    poison the index silently.

    The append keeps the bucket layout intact — same bucketBy spec,
    same pre-write repartition, so each bucket gains one sorted file
    per append and the candidate self-join STAYS Exchange-free
    (pinned by ``test_srp_index_append_cycle``). At 100 TB an ingest
    pipeline compacts buckets on a schedule; correctness never
    depends on file count."""
    validate_srp_index_config(batch.sparkSession, table, bands, rows)
    sigs = srp_signatures(batch, bands, rows)
    (sigs.repartition(n_buckets, F.col("band_id"), F.col("band_val"))
     .write.mode("append")
     .bucketBy(n_buckets, "band_id", "band_val")
     .sortBy("band_id", "band_val")
     .format("parquet")
     .saveAsTable(table))


def compact_srp_index(spark, table: str, new_table: str,
                      path: str | None = None,
                      n_buckets: int = SRP_INDEX_BUCKETS) -> None:
    """Compact an appended-to SRP index (one file per bucket per
    append — :func:`append_srp_index`) back to one file per bucket,
    into ``new_table``. A NEW table plus a caller-side cutover is the
    only safe shape: rewriting in place would yank files out from
    under a concurrent reader's already-planned scan — the same
    reasoning as the per-app artifact naming. The banding-config
    table properties are carried over, so probes against the
    compacted table pass the same machine validation.

    Bucketed READING is disabled for the maintenance scan: a bucketed
    read hands the writer one partition per (bucket, source file) and
    the matching repartition is elided as already-satisfied, so the
    "compaction" would pass every source file through 1:1 (observed:
    a 2-files-per-bucket source compacted to... 2 files per bucket).
    Reading plain forces one real murmur3 shuffle into exactly
    ``n_buckets`` tasks — one file per bucket out. That one shuffle
    IS the cost of compaction; at 100 TB it is an off-peak
    maintenance job, not a query-path cost."""
    prev = spark.conf.get("spark.sql.sources.bucketing.enabled")
    spark.conf.set("spark.sql.sources.bucketing.enabled", "false")
    try:
        sigs = spark.table(table)
        w = (sigs.repartition(n_buckets, F.col("band_id"), F.col("band_val"))
             .write.mode("overwrite")
             .bucketBy(n_buckets, "band_id", "band_val")
             .sortBy("band_id", "band_val")
             .format("parquet"))
        if path is not None:
            w = w.option("path", path)
        w.saveAsTable(new_table)
    finally:
        spark.conf.set("spark.sql.sources.bucketing.enabled", prev)
    got = {r["key"]: r["value"]
           for r in spark.sql(f"SHOW TBLPROPERTIES {table}").collect()}
    props = {k: v for k, v in got.items() if k.startswith("srp.")}
    if props:
        kv = ", ".join(f"'{k}'='{v}'" for k, v in props.items())
        spark.sql(f"ALTER TABLE {new_table} SET TBLPROPERTIES ({kv})")


def embedding_near_dups_from_index(spark, embeddings: DataFrame, table: str,
                                   threshold: float = 0.45) -> DataFrame:
    """:func:`embedding_near_dup_pairs_lsh` served from the PERSISTED
    signature index written by :func:`write_srp_index` — value-
    identical output (same planes, same q6 sign quantization, same
    verify), but candidate generation reads the bucketed signature
    table twice and joins shuffle-free instead of recomputing 768
    plane projections per vector per call.

    Incremental probing falls out of the same shape: a NEW document
    batch computes only its own signatures and equi-joins them against
    this index on (band_id, band_val) — the corpus side is never
    re-projected (:func:`embedding_near_dups_probe_index`, whose
    equivalence to re-running the full pipeline is pinned by
    ``test_srp_index_incremental_probe``).
    """
    return _verify_pairs(_self_join_cands(spark.table(table)),
                         embeddings, threshold)


def embedding_near_dups_probe_index(spark, batch: DataFrame,
                                    verify_vectors: DataFrame, table: str,
                                    threshold: float = 0.45,
                                    bands: int = SRP_BANDS,
                                    rows: int = SRP_ROWS) -> DataFrame:
    """Incremental near-dup probe: signatures are computed for the NEW
    ``batch`` only (one narrow Arrow pass over the batch — the indexed
    corpus is never re-projected) and equi-joined against the persisted
    signature index on (band_id, band_val). ``bands``/``rows`` MUST
    match the parameters the index was written with; that contract is
    machine-checked here against the banding config
    :func:`write_srp_index` stores as table properties —
    :func:`validate_srp_index_config` raises on mismatch instead of
    letting the equi-join silently miss true pairs (r7 ADVICE; pinned
    by ``test_srp_probe_rejects_mismatched_banding``). Returns (id_a, id_b,
    cos) with pairs CANONICALIZED as id_a < id_b (side attribution is
    numeric, not batch-vs-index — recover "which endpoint is new" from
    the caller's own id ranges), verified by exact cosine against
    ``verify_vectors``, which MUST cover corpus AND batch ids (a real
    deployment passes the corpus vector table). Renamed from
    ``batch_vectors`` (r13 review: the old name invited passing only
    the new batch's vectors, and the inner verify join then SILENTLY
    dropped every cross-split candidate pair); coverage is now
    machine-enforced — a candidate whose endpoint is missing from
    ``verify_vectors`` raises at execution time instead of vanishing.

    This is the daily-ingest shape of a 100 TB dedup pipeline: index
    once, then each arriving batch pays signatures-over-batch plus a
    bucket equi-join whose corpus side is a narrow 24-byte-row scan.
    Self-pairs within the batch are the caller's choice (a batch is
    normally probed against the index BEFORE being appended to it;
    pairs among batch rows come from the batch's own self-join, which
    is :func:`embedding_near_dup_pairs_lsh` on the batch alone).
    """
    validate_srp_index_config(spark, table, bands, rows)
    bsigs = srp_signatures(batch, bands, rows)
    isigs = spark.table(table)
    cands = (
        isigs.select(F.col("vec_id").alias("id_a"), "band_id", "band_val")
        .join(bsigs.select(F.col("vec_id").alias("id_b"),
                           "band_id", "band_val"),
              ["band_id", "band_val"])
        .where(F.col("id_a") != F.col("id_b"))
        .select(F.least("id_a", "id_b").alias("id_a"),
                F.greatest("id_a", "id_b").alias("id_b"))
        .distinct()
    )
    v = _prep(verify_vectors)
    va = v.select(F.col("vec_id").alias("id_a"), F.col("vec").alias("va"),
                  F.col("norm").alias("na"))
    vb = v.select(F.col("vec_id").alias("id_b"), F.col("vec").alias("vb"),
                  F.col("norm").alias("nb"))
    # LEFT joins + a throwing ELSE branch, NOT _verify_pairs' inner
    # joins: here the candidate ids come from the index + batch while
    # the vectors come from the caller, so an under-covering
    # verify_vectors used to drop pairs silently. The guard is the
    # else-branch VALUE of the cos expression itself — an optimizer
    # can only eliminate it by proving coverage, which it can't (the
    # r13 shape wrapped assert_true's null in when(...isNull...),
    # whose elimination would have silently disabled the guard across
    # a Spark upgrade — ADVICE r13). Still fully lazy: no extra
    # driver job, the guard fires with the query itself.
    missing = F.concat(
        F.lit("embedding_near_dups_probe_index: verify_vectors is "
              "missing the embedding for candidate pair ("),
        F.col("id_a"), F.lit(", "), F.col("id_b"),
        F.lit(") — pass the corpus AND batch vectors (corpus table "
              "in a real deployment)"))
    covered = F.col("va").isNotNull() & F.col("vb").isNotNull()
    return (
        cands.join(va, "id_a", "left").join(vb, "id_b", "left")
        .select("id_a", "id_b",
                F.when(covered,
                       _cos(F.col("va"), F.col("vb"),
                            F.col("na"), F.col("nb")))
                .otherwise(F.raise_error(missing).cast("double"))
                .alias("cos"))
        .where(F.col("cos") >= threshold)
    )


def knn_ivf_pruned(spark, embeddings: DataFrame, path: str,
                   n_queries: int = 10, k: int = 5,
                   n_centroids: int = N_CENTROIDS,
                   nprobe: int = N_PROBE) -> DataFrame:
    """:func:`knn_ivf` served from the persisted index at ``path``
    (written by :func:`write_ivf_index`): value-identical output, but
    the corpus scan is partition-pruned to the probed centroids —
    the plan the knn_ivf docstring promises at scale, demonstrated
    (``test_plans.py`` asserts the scan's PartitionFilters).

    The probed-centroid set is collected to the driver first (bounded
    by nprobe x n_queries — query-batch-sized, like the query vectors
    themselves) so the pruning is STATIC: visible in the plan before
    execution, no DPP runtime machinery needed.
    """
    v = _prep(embeddings)
    queries = _ivf_queries(v, n_queries)
    probes = _ivf_probes(v, n_queries, n_centroids, nprobe)
    # Static pruning only makes sense for a bounded probe set: the
    # IN-list is driver state AND a per-task filter. A misconfigured
    # huge query batch must fail loudly here, not build a
    # million-element predicate — batch-split or fall back to the
    # equi-join path (knn_ivf) instead.
    n_probe_ids = nprobe * n_queries
    if n_probe_ids > 10_000:
        raise ValueError(
            f"knn_ivf_pruned: nprobe*n_queries = {n_probe_ids} probed "
            "centroids exceeds the static-pruning bound (10000); "
            "split the query batch or use knn_ivf's equi-join path")
    # Collect the probe PAIRS once (bounded by the guard above) and
    # rebuild the broadcast side as a local relation: the old code
    # collected only the distinct centroid ids and then joined the
    # original `probes` plan, recomputing the whole query/centroid
    # scan + window a second time on the recurring hot path (r13
    # review).
    probe_rows = [(r.query_id, r.centroid_id) for r in probes.collect()]
    probe_ids = sorted({cid for _, cid in probe_rows})
    probes_local = spark.createDataFrame(
        probe_rows, "query_id long, centroid_id long")

    idx = spark.read.parquet(path).where(F.col("centroid_id").isin(probe_ids))
    cands = (
        F.broadcast(probes_local).join(idx, "centroid_id")
        .select("query_id", F.col("vec_id").alias("neighbor_id"),
                F.col("vec").alias("nv"), F.col("norm").alias("nn"))
        .join(F.broadcast(queries), "query_id")
        .select("query_id", "neighbor_id",
                _cos(F.col("qv"), F.col("nv"), F.col("qn"), F.col("nn"))
                .alias("cos"))
    )
    return _topk(cands, k)
