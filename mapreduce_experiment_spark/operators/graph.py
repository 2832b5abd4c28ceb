"""Triangle-enumeration pipeline — the reference's complete capability
surface, re-expressed as Catalyst plans.

Reference dataflow (SURVEY §exec summary; mapreducePredictionTwitter100.java):
``textFile → flatMapToPair(parse+symmetrize) → groupByKey →
flatMapToPair(candidate pairs + sentinel-0 edge markers) → groupByKey →
flatMap(close triangles) → distinct → collect``.

Here the hand-rolled tagged-groupByKey join (T100:52-153) becomes real
joins; the sentinel value 0 and its "no node ID 0" data-model
constraint (T100:58) disappear entirely. Two semantic modes (SURVEY
finding 3):

- ``simple`` (default): drop self-loops, dedup edges → the standard
  triangle set of the simple graph. Equals the reference's output on
  clean input (verified on every self-loop-free bundled dataset).
- ``faithful``: reproduces the reference's degenerate output on dirty
  input (self-loops ⇒ triangles like (1,1,2)) — derived analytically
  from edge multiplicities rather than by simulating multiset
  adjacency lists, so it is still all joins and still scales.

Scale notes (SURVEY §4, §7 hard parts):

- The primary plan is **degree-oriented**: each edge is oriented from
  its lower-(degree, id) endpoint, so every triangle is counted from
  its lowest-degree corner. This bounds per-node candidate fan-out by
  O(m^0.5) instead of O(max_degree) — the standard literature
  optimization the reference lacks — and is what survives heavy-tailed
  degree distributions at 100 TB. Since r18 the closure is a per-edge
  adjacency-array intersection (no open-triad rows are ever
  materialized; see :func:`_edge_common_closers`).
- Edge dedup happens BEFORE the candidate stage (the reference
  dedups only at the very end, after a quadratic candidate explosion:
  4,055,477 raw emissions for 587,314 distinct on 100k.txt).
- No ``collect()`` anywhere; adjacency lists exist only as a parity
  demo (:func:`adjacency`), never on the triangle path.
- AQE skew-join handles residual hot keys (session.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# --- §2 row 3: edge symmetrization ---------------------------------------
def symmetrize(edges: DataFrame) -> DataFrame:
    """Emit both orientations of every edge (T100:29-39).

    One narrow in-row explode — no shuffle, and ONE scan of the input.
    (The pre-r18 union of two projections evaluated the whole upstream
    subtree twice when it was not cached: for the registered queries
    over derive_edges that doubled the per-order pair expansion AND
    its dedup shuffle — adjacency measured 21.6 → 11.4 s executor CPU
    from this change alone. Row multiset identical: the union was
    UNION ALL, and explode emits the same two rows per edge.)
    """
    return edges.select(
        F.explode(F.array(
            F.struct(F.col("src"), F.col("dst")),
            F.struct(F.col("dst").alias("src"), F.col("src").alias("dst")),
        )).alias("e")
    ).select("e.src", "e.dst")


# --- derived: simple-graph normalization (SURVEY finding 3) ---------------
def canonical_edges(edges: DataFrame,
                    assume_canonical: bool = False) -> DataFrame:
    """Undirected edges as canonical ``u < v`` pairs, deduped, no self-loops.

    One shuffle (the distinct); every downstream join reuses it.
    ``assume_canonical=True`` skips the normalize+distinct when the
    caller guarantees the input already IS the canonical simple edge
    set (e.g. ``derive_edges`` emits distinct ``src < dst`` pairs) —
    at 100 TB that saves a full shuffle of the edge set.
    """
    if assume_canonical:
        return edges.select(F.col("src").alias("u"),
                            F.col("dst").alias("v"))
    return (
        edges.where(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("u"),
                F.greatest("src", "dst").alias("v"))
        .distinct()
    )


def edge_multiplicity(edges: DataFrame) -> DataFrame:
    """Unordered-pair multiplicities, self-loops included:
    ``(u, v, mult)`` with ``u <= v``. Until r18 this fed the faithful
    triangle path's literal multiset-adjacency replay; the shipped
    path now uses the decomposition documented in :func:`triangles`,
    and the replay survives as the test-side reference proving the
    decomposition lossless
    (test_faithful_decomposition_matches_multadj_replay)."""
    return (
        edges.select(F.least("src", "dst").alias("u"),
                     F.greatest("src", "dst").alias("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("mult"))
    )


# --- §2 row 4-5: adjacency lists (parity demo only) ------------------------
def adjacency(edges: DataFrame, as_string: bool = False) -> DataFrame:
    """Sorted adjacency list per node (T100:42 + in-task sort T100:68-74).

    The reference materializes this with groupByKey (full value
    shuffle, no combiner) and then ``collect()``s it to the driver
    (T100:45). Here it is a hash aggregate; it exists for parity and
    debugging — the triangle path never builds it (collect_list does
    not scale on heavy-tailed graphs; SURVEY §7 hard part b).

    ``as_string=True`` renders the list as a comma-joined string for
    cross-engine comparisons.
    """
    adj = (
        symmetrize(edges)
        .groupBy(F.col("src").alias("node"))
        .agg(F.array_sort(F.collect_list("dst")).alias("neighbors"))
    )
    if as_string:
        adj = adj.select(
            "node",
            F.concat_ws(
                ",", F.transform("neighbors", lambda x: x.cast("string"))
            ).alias("neighbors"),
        )
    return adj


def degrees_from_canonical(ce: DataFrame) -> DataFrame:
    # In-row explode, not union-of-projections: one scan of ce (which
    # is NOT always cached — the registered degrees/candidate_pairs
    # queries reach here with the full derive+dedup pipeline upstream,
    # and the union form ran it twice; r18 optimization round).
    return (
        ce.select(F.explode(F.array(F.col("u"), F.col("v"))).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )


def degrees(edges: DataFrame) -> DataFrame:
    """Simple-graph degree per node."""
    return degrees_from_canonical(canonical_edges(edges))


# --- §2 row 6: candidate pair generation (open triads) ---------------------
def candidate_pair_counts(edges: DataFrame) -> DataFrame:
    """Open-triad count per center node: C(degree, 2) on the simple graph.

    The reference materializes every candidate pair and collects them
    to the driver (T100:76-90, 17.9M pairs on 100k.txt). The count is
    the scalable summary: a degree aggregate and a scalar expression,
    no quadratic blowup.
    """
    # Integer DIV, not float `/ 2` + cast (r14 graph review): d(d-1)
    # is always even so the small-degree values are identical, but
    # above d ≈ 9.4e7 the double round-trip loses low bits — the
    # same int64-exactness discipline as the packing operators. (The
    # oracle moved from `/ 2` to `// 2` in the same commit; DuckDB's
    # float `/` additionally ROUNDS on the BIGINT cast where Spark
    # truncates, so the old forms also disagreed cross-engine in the
    # lossy range.)
    return degrees(edges).select(
        "node",
        F.expr("degree * (degree - 1) div 2").alias("n_candidate_pairs"),
    )


# --- §2 rows 6-9: triangle enumeration --------------------------------------
def _edge_common_closers(edges: DataFrame,
                         assume_canonical: bool = False,
                         _input_materialized: bool = False) -> DataFrame:
    """Each oriented edge with the ARRAY of out-neighbors common to its
    two endpoints: (w, x, common) where w→x is a degree-oriented edge
    and ``common`` = N+(w) ∩ N+(x). In the orientation DAG every
    triangle has a unique source corner w (out-degree 2 within the
    triangle: w→x, w→y, plus the closing x→y), so each triangle
    appears exactly once — as y ∈ common on its (w, x) edge. Shared by
    the enumeration (explodes ``common``), the count (sums sizes — no
    explode), and faithful mode via the simple path.

    NOTE: oriented edges whose head ``x`` has no out-neighbors in the
    orientation are OMITTED (the inner join on x drops them) — their
    intersection is necessarily empty, so both current consumers are
    unaffected, but a consumer expecting one row per oriented edge
    must outer-join (r18 ADVICE).

    r18 optimization round (guide §1.2 "the distributed algorithm"):
    this replaces the 2-path self-join + LEFT SEMI closure, which
    materialized every open triad as a join row — P = Σ C(d+(w), 2)
    rows (41.1M at sf0.1) probed one-by-one against the closing-edge
    hash table, and at scale SORTED for the closure's sort-merge join
    (the 10× probe's only spill: 13 GB of triad sort buffers). The
    intersection does the same element-level work inside two
    edge-count-sized joins — no triad rows exist, no O(P) sort, and
    the only payload crossing an exchange is the adjacency arrays
    (Σ|N+| = m elements) plus per-edge array copies. Measured (noop
    sink, scripts/attr_triangle.py): count at sf0.1 79.4 → 65.1 s CPU,
    enumeration 123.2 → 59.2 s CPU; at the 10× scale point 1,772 →
    499 s CPU and 98.1 → 26.4 s wall with the spill gone. Orientation
    bounds every array by O(√m) (max 97 at sf0.1), so per-row memory
    is small and a hot ``x`` join key carries small arrays."""
    # The canonical edge set feeds degrees AND orientation — cut and
    # materialize it once so the upstream scan/dedup (or, in the
    # derived-edges case, a whole join pipeline) runs once. At
    # cluster scale this is the deduped simple graph: far smaller
    # than the raw input and the right thing to keep hot.
    #
    # r19 cache-lifecycle fix (r18 VERDICT "What's wrong" #2 / ADVICE):
    # eager localCheckpoint instead of persist()+count() — the same
    # materialization job and the same blocks, but GC-scoped (the
    # ContextCleaner frees them when the returned plan is dropped)
    # rather than a plan-keyed CacheManager entry that outlived every
    # invocation. Nothing downstream reuses ce's (u,v)-hash
    # partitioning, so the checkpoint's partitioning loss is free.
    # ``_input_materialized=True`` (faithful mode) skips even that:
    # the caller already checkpointed the edge set and this call's
    # canonical_edges is a pure column rename of it (the r18 ADVICE's
    # "second persisted copy").
    ce = canonical_edges(edges, assume_canonical)
    if not _input_materialized:
        ce = ce.localCheckpoint(eager=True)
    # Re-shuffle the (small) oriented edge set on its low endpoint.
    # Without this, AQE coalesces the tiny upstream aggregates into a
    # handful of partitions and the compute-bound intersection stage
    # inherits that near-serial layout (same class as the pre-r18
    # triad join's measured 1.3–1.8× regression under AQE coalescing,
    # BENCHNOTES.md round-5). Orientation bounds per-key fan-out by
    # O(sqrt(m)), so hashing on lo cannot itself create a hot
    # partition.
    #
    # The partition COUNT must be explicit: AQE's coalescing targets
    # bytes (the 64 MB advisory size), but this exchange feeds work
    # proportional to Σ(|N+(w)|+|N+(x)|) per edge — far more compute
    # per shuffled byte than byte-based coalescing assumes. 2× the
    # cluster's core count keeps every core busy through stragglers
    # and scales with the cluster instead of hard-coding this box;
    # the floor of 64 preserves the measured local[32] operating
    # point even under smaller test sessions.
    nparts = max(64, 2 * ce.sparkSession.sparkContext.defaultParallelism)
    # The oriented edge set feeds e1's stream side AND both adj
    # broadcasts, and the adjacency table feeds two
    # DIFFERENTLY-ALIASED broadcasts whose subplans do not unify —
    # unmaterialized, the executed plan ran the degrees+orientation+
    # repartition pipeline THREE times and the collect_list twice
    # (read in the r18 executed plan; the same double-build the
    # streaming closure measured at 109 → 68 s CPU).
    #
    # r19 lifecycle: o is persisted only long enough to derive adj on
    # its exchange-free partitioning (the groupBy below reuses the
    # repartition's hash(lo) layout — cached-plan partitioning IS
    # visible statically, unlike a checkpoint's), then both survive
    # to the returned plan as eager localCheckpoints: GC-scoped RDD
    # blocks (ContextCleaner-freed with the result) instead of the
    # pre-r19 THREE CacheManager entries per invocation that nothing
    # ever unpersisted (r18 VERDICT What's-wrong #2). The extra cost
    # is one in-memory copy of o's blocks (no shuffle — fingerprint
    # pins unchanged); the checkpoint RDDs keep the 2×cores physical
    # partition layout for the intersection stage.
    o_p = _oriented_repartitioned(ce, nparts).persist()
    # Out-adjacency arrays, grouped on the SAME key/partitioning as the
    # repartition above — no extra exchange; the arrays total m
    # elements and each is O(√m) by orientation.
    adj = _out_adjacency(o_p).localCheckpoint(eager=True)
    o = o_p.localCheckpoint(eager=True)  # copy from the cache, no shuffle
    o_p.unpersist()
    e1 = o.join(adj, "lo").select(
        F.col("lo").alias("w"), F.col("hi").alias("x"),
        F.col("nbrs").alias("n_lo"))
    e2 = e1.join(adj.select(F.col("lo").alias("x"),
                            F.col("nbrs").alias("n_hi")), "x")
    return e2.select(
        "w", "x", F.array_intersect("n_lo", "n_hi").alias("common"))


def _oriented_repartitioned(ce: DataFrame, nparts: int) -> DataFrame:
    """The oriented edge set, explicitly REPARTITION_BY_NUM on its low
    endpoint — the pre-checkpoint subplan of the closure's stream
    side. Factored so the plan pins (test_plans) can explain the
    ACTUAL code path: since the r19 checkpoint lifecycle the final
    query plan truncates at the checkpoint scan, so the r6
    explicit-partition-count contract is pinned on this subplan."""
    return _oriented(ce).repartition(nparts, F.col("lo"))


def _out_adjacency(o: DataFrame) -> DataFrame:
    """Out-neighbor arrays per oriented low endpoint (bounded O(√m)
    by the degree orientation) — the closure's build side, factored
    for the same plan-pin reason as :func:`_oriented_repartitioned`."""
    return o.groupBy("lo").agg(F.collect_list("hi").alias("nbrs"))


def _simple_triangle_corners(edges: DataFrame,
                             assume_canonical: bool = False,
                             _input_materialized: bool = False) -> DataFrame:
    """Each triangle exactly once as (w, x, y): w the triangle's
    low-(degree,id) source corner, x its oriented out-neighbor on this
    edge, y the closing common out-neighbor — NOT yet sorted into
    canonical (a,b,c) order (x < y is NOT guaranteed, unlike the
    pre-r18 triad form; both consumers sort or count). Shared by the
    enumeration (which canonicalizes) and faithful mode."""
    ec = _edge_common_closers(edges, assume_canonical, _input_materialized)
    return ec.select("w", "x", F.explode("common").alias("y"))


def _oriented(ce: DataFrame) -> DataFrame:
    """Orient each simple edge from its lower-(degree, id) endpoint.

    Degree-ordered orientation: out-degree in the oriented graph is
    O(sqrt(m)) even for hubs, so the per-edge adjacency intersection
    cannot explode on heavy-tailed inputs. The reference pairs
    neighbors of EVERY node including hubs (T100:76-83) — O(d_max²).
    """
    deg = degrees_from_canonical(ce)
    du = deg.select(F.col("node").alias("u"), F.col("degree").alias("deg_u"))
    dv = deg.select(F.col("node").alias("v"), F.col("degree").alias("deg_v"))
    return (
        ce.join(du, "u").join(dv, "v")
        .select(
            F.when(
                (F.col("deg_u") < F.col("deg_v"))
                | ((F.col("deg_u") == F.col("deg_v")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("lo"), F.col("v").alias("hi")),
            ).otherwise(
                F.struct(F.col("v").alias("lo"), F.col("u").alias("hi"))
            ).alias("e")
        )
        .select("e.lo", "e.hi")
    )


def triangles(edges: DataFrame, mode: str = "simple",
              assume_canonical: bool = False,
              _input_materialized: bool = False) -> DataFrame:
    """Enumerate triangles as canonical ``(a, b, c)``, ``a <= b <= c``.

    ``simple``: per-edge adjacency intersection on the degree-oriented
    edge set (:func:`_edge_common_closers`) — the idiomatic
    replacement for the reference's candidate-generation +
    sentinel-marker + groupByKey closure (T100:52-153). Each triangle
    is produced exactly once, so the reference's final ``distinct()``
    over 4M raw emissions (T100:164) is unnecessary.

    ``faithful``: reproduces the reference's degenerate self-loop
    semantics (SURVEY finding 3) — sorted(x, y, w) is a triangle iff
    {x,y} is an input edge and w's multiset adjacency contains x and y
    at distinct positions — via the exact class decomposition below.
    On self-loop-free input the two modes agree (verified against the
    survey's golden counts).
    """
    if mode == "simple":
        tri = _simple_triangle_corners(edges, assume_canonical,
                                       _input_materialized)
        abc = F.array_sort(F.array("w", "x", "y"))
        return tri.select(
            abc.getItem(0).alias("a"),
            abc.getItem(1).alias("b"),
            abc.getItem(2).alias("c"),
        )
    if mode == "faithful":
        # Degenerate-output DECOMPOSITION (r18 optimization round).
        # The pre-r18 form replayed the reference's multiset-adjacency
        # condition literally: pair ⋈ madj ⋈ madj over the UNORIENTED
        # adjacency — O(Σ d(x)·mult) candidate rows, measured 332 s
        # executor CPU at sf0.1 where the oriented simple path costs
        # 73 s for the same clean input. But the condition factors
        # EXACTLY into three disjoint classes by the output triple's
        # node-multiset pattern (distinct triples; S = the simple
        # support graph, L = self-loop nodes):
        #
        # - 3 distinct nodes (x<y, w∉{x,y}): {x,y},{w,x},{w,y} ∈ S —
        #   precisely the simple-mode triangles of the support graph,
        #   so the degree-oriented plan applies.
        # - exactly two equal (sorted (ℓ,ℓ,z)): requires madj(ℓ,ℓ)≥1
        #   ⇒ ℓ ∈ L, plus the edge {ℓ,z} ∈ S. (The x==y branch with
        #   w≠x needs madj(w,x) ≥ 2 — a multi-edge — but a multi-edge
        #   is in S and that branch's x is in L, so it is a SUBSET of
        #   this class: multiplicities beyond existence never add
        #   triples.)
        # - all equal ((ℓ,ℓ,ℓ)): madj(ℓ,ℓ) = 2·mult ≥ 2 ⇔ ℓ ∈ L.
        #
        # The classes cannot overlap (different node-multiset
        # patterns) and each is produced exactly once below, so the
        # union IS the distinct set — no final distinct() needed.
        # Equivalence to the literal multadj replay is pinned by
        # test_faithful_decomposition_matches_multadj_replay on random
        # dirty graphs (self-loops + duplicates) and by the reference
        # goldens (30k.txt carries a real self-loop). On clean input
        # L = ∅ and this costs exactly the simple path.
        # Eager localCheckpoint, not persist (r19 cache-lifecycle fix):
        # consumed by the corners path and 2 joins; GC-scoped, so no
        # CacheManager entry outlives the returned plan. The simple
        # path below is told the input is already materialized so it
        # does not checkpoint a second copy of the same edge set (the
        # r18 ADVICE item).
        ce = canonical_edges(edges).localCheckpoint(eager=True)
        loops = (edges.where(F.col("src") == F.col("dst"))
                 .select(F.col("src").alias("l")).distinct())
        simple_tris = triangles(
            ce.select(F.col("u").alias("src"), F.col("v").alias("dst")),
            mode="simple", assume_canonical=True,
            _input_materialized=True)
        # u < v in ce, so each class-B triple is emitted pre-sorted.
        bl = ce.join(loops, F.col("u") == F.col("l")).select(
            F.col("u").alias("a"), F.col("u").alias("b"),
            F.col("v").alias("c"))
        br = ce.join(loops, F.col("v") == F.col("l")).select(
            F.col("u").alias("a"), F.col("v").alias("b"),
            F.col("v").alias("c"))
        dd = loops.select(F.col("l").alias("a"), F.col("l").alias("b"),
                          F.col("l").alias("c"))
        return simple_tris.unionByName(bl).unionByName(br).unionByName(dd)
    raise ValueError(f"unknown mode: {mode!r} (use 'simple' or 'faithful')")


def triangle_count(edges: DataFrame, mode: str = "simple",
                   assume_canonical: bool = False) -> DataFrame:
    """Total triangle count (§2 derived operator; the published metric).

    The simple-mode count never materializes per-triangle rows at all
    (r18): each oriented edge contributes |N+(w) ∩ N+(x)| — summing
    the intersection sizes counts every triangle exactly once without
    the explode or the canonical (a,b,c) sort projection. coalesce(0)
    matches the pre-r18 count-rows form on an edgeless input (sum over
    zero rows is NULL, count was 0).
    """
    if mode == "simple":
        return _edge_common_closers(edges, assume_canonical).agg(
            F.coalesce(F.sum(F.size("common")), F.lit(0))
            .cast("long").alias("n_triangles"))
    return triangles(edges, mode=mode).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )


PAGERANK_SCALE = 1_000_000_000_000  # ranks as integer micro-units


def pagerank(edges: DataFrame, n_iter: int = 10,
             assume_canonical: bool = False) -> DataFrame:
    """PageRank over the undirected (symmetrized) graph, computed in
    EXACT integer fixed-point arithmetic.

    Ranks live in units of 1e-12 (int64); per-edge contributions are
    integer division by out-degree and damping is the rational 85/100
    — every operation is integer, so the iteration is bit-identical
    across engines (float PageRank cannot be value-compared: the
    neighbor sum's order drifts). Fixed ``n_iter`` rounds; each round
    is one shuffle (contrib aggregation), with localCheckpoint
    truncating the join lineage.

    Returns (node, rank_micro) with rank_micro/1e12 ≈ probability.
    """
    ce = canonical_edges(edges, assume_canonical).persist()
    ce.count()
    sym = ce.select(F.col("u").alias("a"), F.col("v").alias("b")).unionByName(
        ce.select(F.col("v").alias("a"), F.col("u").alias("b")))
    deg = sym.groupBy("a").agg(F.count(F.lit(1)).alias("outdeg"))
    edges_deg = sym.join(deg, "a").persist()
    nodes = sym.select(F.col("a").alias("node")).distinct().persist()
    n = nodes.count()
    if n == 0:
        # An edgeless graph has no rank mass to distribute; unguarded,
        # PAGERANK_SCALE // n crashed driver-side with
        # ZeroDivisionError instead of returning the empty result
        # every other operator produces on empty input (r14 graph
        # review).
        for df in (edges_deg, ce, nodes):
            df.unpersist()
        return nodes.sparkSession.createDataFrame(
            [], "node long, rank_micro long")
    r0 = PAGERANK_SCALE // n
    base = (15 * r0) // 100

    ranks = nodes.select("node", F.lit(r0).alias("rank_micro"))
    for _ in range(n_iter):
        sums = (
            edges_deg.join(ranks, edges_deg.a == ranks.node)
            .select(F.col("b"),
                    F.expr("rank_micro div outdeg").alias("contrib"))
            .groupBy(F.col("b").alias("node"))
            .agg(F.sum("contrib").alias("sm"))
        )
        ranks = (
            nodes.join(sums, "node", "left")
            .select(
                "node",
                (F.lit(base)
                 + F.expr("85 * coalesce(sm, 0L) div 100")).alias("rank_micro"),
            )
            .localCheckpoint()
        )
    # Safe to drop every cached intermediate: localCheckpoint is eager,
    # so the returned ranks no longer depend on any of them.
    edges_deg.unpersist()
    ce.unpersist()
    nodes.unpersist()
    return ranks


def connected_components(edges: DataFrame, max_iter: int = 50,
                         assume_canonical: bool = False) -> DataFrame:
    """Connected components by min-label propagation to fixpoint.

    Iterative joins (the capability class the reference's one-shot
    pipeline lacks entirely): each round every node adopts the
    minimum label in its closed neighborhood; stop when no label
    changes. ``localCheckpoint`` truncates the lineage each round so
    plans don't grow unboundedly — the standard Spark idiom for
    iterative graph algorithms (GraphX does the same internally).

    Rounds needed = graph diameter ≤ ``max_iter``; each round is one
    shuffle on node id. Returns (node, component) with component =
    min node id in the component.
    """
    ce = canonical_edges(edges, assume_canonical).persist()
    ce.count()
    # Directed both ways once; reused every iteration.
    sym = ce.select(F.col("u").alias("a"), F.col("v").alias("b")).unionByName(
        ce.select(F.col("v").alias("a"), F.col("u").alias("b"))).persist()
    # Lazy init checkpoint (r18): round 1's changed-count is the first
    # action over it, same one-job-per-round rationale as the loop.
    labels = (
        ce.select(F.explode(F.array(F.col("u"), F.col("v"))).alias("node"))
        .distinct()
        .select("node", F.col("node").alias("component"))
        .localCheckpoint(eager=False)
    )
    converged = False
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("nbr_component"))
        )
        # The convergence flag rides INSIDE the propagation result, so
        # detecting a fixpoint costs one scan of the just-materialized
        # checkpoint blocks — not a second join-shuffle job per round
        # (the old labels never need re-reading). The checkpoint is
        # LAZY (r18 optimization round): the changed-count below is
        # the round's first action, so it materializes the checkpoint
        # blocks as a side effect — one Spark job per round instead of
        # two (eager checkpoint job + count job), halving the
        # fixed-overhead floor of every fixpoint round.
        new_labels = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
                (F.col("nbr_component") < F.col("component"))
                .alias("changed"),
            )
            .localCheckpoint(eager=False)
        )
        changed = new_labels.where(F.col("changed")).count()
        labels = new_labels.select("node", "component")
        if changed == 0:
            converged = True
            break
    ce.unpersist()
    sym.unpersist()
    if not converged:
        import warnings
        warnings.warn(
            f"connected_components: max_iter={max_iter} reached before "
            "fixpoint — labels may be unconverged (graph diameter "
            "exceeds the iteration budget)", RuntimeWarning)
    return labels
