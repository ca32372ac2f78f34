"""Connected components over a pair/edge relation (beyond-reference).

The finishing step of every near-duplicate pipeline: candidate pairs
from MinHash-LSH / sign-LSH / Jaccard (operators.dedup, .similarity)
form an undirected graph whose components are the duplicate CLUSTERS —
one canonical representative (the minimum id) survives per component.

Algorithm: iterative minimum-label propagation.  Each round every
vertex adopts the smallest label among itself and its neighbors; a
component converges in O(diameter) rounds (near-dup clusters are
near-cliques, so 2-4 rounds in practice).  Each round is ONE groupBy
shuffle over the undirected edge list + the label relation — the same
tagged-union merge shape as operators.pagerank, and the same
localCheckpoint lineage control.

At 100 TB: the edge list is pre-partitioned and persisted once; only
the (vid, label) relation iterates.  For adversarial long-chain graphs
use :func:`connected_components_star` (alternating large-star/
small-star contraction, O(log n) rounds); near-dup graphs do not need
it — their near-clique components converge in 2-4 min-label rounds at
a cheaper per-round cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


# Cached-row budget for one (long, long) edge row: 16 payload bytes
# plus tungsten/cache overhead.  Only feeds a partition-count estimate;
# within-2x accuracy is plenty.
_EDGE_ROW_BYTES = 48


def sized_edge_npart(
    relation: DataFrame,
    cap: int,
    known_rows: int | None = None,
    target_bytes: int = 64 << 20,
) -> int:
    """Scale-adaptive partition count for a loop-persisted edge
    relation (guide §2.2; the round rules' "derive partitioning from
    input size, not a core count"): estimated bytes over an
    advisory-style 64 MB target, clamped to [1, cap] where ``cap`` is
    the caller's defaultParallelism — the pre-r12 static choice, kept
    as the ceiling so an overestimate reproduces the old behavior.

    ``known_rows`` sizes from an exact row count (when the caller just
    materialized a persisted input); otherwise the optimizer's
    estimate is used.  The estimate errs HIGH on join/explode
    pipelines (q134's LSH-pair relation estimates ~300 GB at sf0.1),
    which clamps to cap — it never under-partitions a genuinely large
    graph; the scan/window pipelines the graph family feeds in here
    carry scan-proportional estimates (no selectivity guesses),
    measured accurate within 2x at every gate SF.  Locally this is
    what stops a 32-task-per-stage loop over a megabyte-scale graph
    from being task-launch-bound (measured: the q134 CC loop 4.1 s ->
    3.4 s at sf0.1 with identical output).
    """
    if known_rows is not None:
        est = known_rows * _EDGE_ROW_BYTES
    else:
        try:
            est = int(
                str(
                    relation._jdf.queryExecution()
                    .optimizedPlan()
                    .stats()
                    .sizeInBytes()
                )
            )
        except Exception:  # noqa: BLE001 — introspection surprise: old behavior
            return cap
    return max(1, min(cap, -(-est // target_bytes)))


def _undirected_edges(
    edges: DataFrame, src: str, dst: str, npart: int
) -> DataFrame:
    """Both-orientations (s, d) edge set of the undirected graph,
    deduped, repartitioned on the propagation key and persisted — the
    static side every iterative op here joins against each round.

    Canonicalize-then-mirror (r11, guide §2.3/§2.4): the former
    ``union(half, half-flipped).distinct()`` evaluated the caller's
    whole edge-derivation pipeline in BOTH union branches (only the
    scan-side exchange below the window is reusable, the window sort
    itself ran twice) and shuffled 2|E| rows through the distinct.
    Deduping the canonical (least, greatest) form first runs the
    pipeline's expensive tail once and halves the distinct's exchange;
    mirroring afterwards is two projections of the SAME deduplicated
    subtree, whose identical exchanges Spark reuses.  Canonical
    distinct == directed distinct of the undirected graph (a != b
    rows only), so the resulting edge set is identical.

    ``npart`` is a CAP (r12): the actual partition count is
    size-derived via :func:`sized_edge_npart`.  A persisted input (the
    LSH-pair callers persist their candidate relation) is materialized
    first — work the loop's first round needs anyway — so the sizing
    uses its exact row count instead of a join-pipeline estimate.
    """
    known = None
    if edges.storageLevel != StorageLevel.NONE:
        # mirrored rows <= 2 * input pairs (canonical dedup only shrinks)
        known = 2 * edges.count()
    canon = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("s"),
            F.greatest(F.col(src), F.col(dst)).alias("d"),
        )
        .where(F.col("s") != F.col("d"))
        .distinct()
    )
    mirrored = canon.unionByName(
        canon.select(F.col("d").alias("s"), F.col("s").alias("d"))
    )
    return (
        mirrored.repartition(
            sized_edge_npart(mirrored, cap=npart, known_rows=known), "s"
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 10,
) -> DataFrame:
    """Label every vertex of the undirected graph with its component's
    minimum vertex id.  Returns (vid long, component long).

    Converges early when a round changes no label (checked against a
    driver-side count of changed labels — a scalar, not data).

    Cache lifecycle: the both-orientations edge set is persisted for
    the duration of the loop and unpersisted on exit — safe because
    every round's convergence count materializes that round's
    localCheckpoint, so the returned labels read checkpoint blocks,
    not the edge lineage.  Nothing stays cached after the call.
    """
    spark = edges.sparkSession
    npart = spark.sparkContext.defaultParallelism
    # Undirected: materialize BOTH orientations once, partitioned by the
    # propagation source — each round is then ONE join (src side
    # co-located with the persisted partitioning) instead of two.
    e = _undirected_edges(edges, src, dst, npart)

    labels = e.select(F.col("s").alias("vid")).distinct().withColumn(
        "label", F.col("vid")
    )
    # Frontier (delta) propagation — r11, guide §2.2 (shuffle fewer
    # bytes): only vertices whose label CHANGED last round need to
    # offer this round.  Labels are min-monotone, so an offer from an
    # unchanged u is always dominated: by induction every neighbor v
    # already satisfies label(v) <= u's previous (= current) label from
    # the round u last offered.  Per-round labels are therefore
    # BIT-IDENTICAL to the all-offers form (the omitted terms never win
    # the min), and so are the round count and the convergence path —
    # but late rounds join |delta|-many probe rows against the edge set
    # instead of |V| (near-clique dedup graphs converge exponentially:
    # measured changed-counts 2337/2301/1777/293/15/1/0, so rounds 4+
    # shuffled edge-sized offers for an almost-empty frontier).  Round
    # 1 offers from every vertex, as before.
    active = labels

    changed = -1
    try:
        for _ in range(max_iterations):
            # Each active vertex offers its label to its neighbors; every
            # vertex keeps its own.  The keep row carries the previous
            # label in `old`, so after the min-groupBy the convergence
            # check is a filter-count on the checkpointed result — no
            # extra join per round (min ignores the NULL `old` on
            # propagated rows; every vid has exactly one keep row, so
            # `old` IS the previous label).
            offered = e.join(active, e.s == active.vid).select(
                F.col("d").alias("vid"),
                F.col("label"),
                F.lit(None).cast("long").alias("old"),
            )
            keep = labels.select("vid", "label", F.col("label").alias("old"))
            merged = (
                offered.unionByName(keep)
                .groupBy("vid")
                .agg(F.min("label").alias("label"), F.min("old").alias("old"))
                .localCheckpoint(eager=False)
            )
            changed_rows = merged.where(F.col("label") != F.col("old"))
            changed = changed_rows.count()
            labels = merged.select("vid", "label")
            # next round's frontier: a filtered read of the SAME
            # checkpoint blocks labels reads — no extra materialization
            active = changed_rows.select("vid", "label")
            if changed == 0:
                break
        else:
            # Silent truncation would return labels that are NOT
            # components (a >max_iterations-diameter chain keeps
            # non-minimal labels) — surface it instead.
            raise RuntimeError(
                f"connected_components did not converge in "
                f"{max_iterations} iterations ({changed} labels still "
                "changing); raise max_iterations (graph diameter bounds "
                "the rounds needed)"
            )
    finally:
        # The per-round count already materialized the final round's
        # checkpoint, so labels no longer reads the edge lineage.
        e.unpersist()

    return labels.select("vid", F.col("label").alias("component"))


def _release_local_checkpoint(df: DataFrame) -> None:
    """Free a localCheckpoint's storage blocks immediately instead of
    at Python-GC + ContextCleaner time.  PySpark exposes no handle to
    the checkpointed RDD, so reach through the JVM plan (the
    checkpointed Dataset's analyzed plan IS the LogicalRDD wrapping
    it).  Best-effort by design: on any plan-shape surprise the
    blocks simply revert to the old GC-time release — never fail the
    query over cleanup."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:  # noqa: BLE001
        pass


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 30,
) -> DataFrame:
    """Connected components by alternating large-star/small-star
    contraction (Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii,
    "Connected Components in MapReduce and Beyond", SoCC 2014) — the
    O(log n)-round variant for ADVERSARIAL graph shapes.  Same output
    contract as :func:`connected_components`: (vid long, component
    long) for every vertex of the edge relation, component = the
    minimum member id.

    When to use which: min-label propagation converges in O(diameter)
    rounds — 2-4 on near-dup pair graphs (near-cliques), where its
    cheaper per-round shape wins.  A long-CHAIN graph (linked-list
    link structure, sessionized event chains, adversarial crawls)
    makes diameter the bound: a 10^6-hop chain needs 10^6 min-label
    rounds but ~log^2(n) star rounds, because star contraction
    HALVES-or-better the tree height each alternation instead of
    moving labels one hop.

    Per alternation: large-star points every neighbor v > u at
    min(N(u) + {u}) (keeps connectivity, strictly reduces large-end
    heights); small-star re-roots every v <= u and u itself at the
    minimum.  Both are one groupBy (per-vertex min over the adjacency)
    plus one co-keyed join emitting re-targeted edges — edge-sized
    shuffles, no corpus blowup: the emitted set never exceeds the
    adjacency size, and every round's distinct() prunes the
    contracted duplicates.

    Convergence: each alternation's materializing job also returns a
    (count, xor-of-xxhash64-row-hashes) fingerprint; when it repeats,
    ONE exceptAll probe confirms set equality exactly (the fingerprint
    is necessary, the probe makes it sufficient — no reliance on the
    2^-64 collision odds, and no per-round probe shuffle).  The fixed
    point is a forest of depth-1 stars rooted at component minima.
    Lineage is cut per alternation (localCheckpoint materialized by
    the fingerprint job), and each superseded round's checkpoint
    blocks are released the moment the next round materializes
    (:func:`_release_local_checkpoint`), so live storage stays ~2
    edge-sized block sets regardless of round count; nothing leaks
    into the session (the same self-releasing discipline as the other
    iterative ops here).
    """
    half = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).where(
        F.col(src) != F.col(dst)
    )
    # canonical a < b, deduped; star edges stay canonical thereafter
    # (emissions always point a high vertex at a strictly smaller root)
    e = (
        half.select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )

    def fingerprint(cur: DataFrame) -> tuple[int, int]:
        # One fused job per alternation: materializes the round's
        # checkpoint AND yields (count, xor-of-row-hashes).  The edge
        # count alone cannot detect convergence (star forests keep it
        # CONSTANT — e.g. per-user chains: n_events - n_users edges
        # every round), and an exceptAll probe per round costs a
        # shuffle; XOR over xxhash64 of the distinct rows is
        # order-insensitive, one aggregate, and exact-confirmed below
        # before the loop exits.
        row = cur.agg(
            F.count(F.lit(1)).alias("c"),
            F.expr("bit_xor(xxhash64(a, b))").alias("f"),
        ).collect()[0]
        return row["c"], row["f"]

    prev = fingerprint(e)
    # Original vertex set, captured as vertex-sized checkpoint blocks
    # read off e's FIRST materialization (the fingerprint job above):
    # the final resolve join needs every vertex of the input, but by
    # then the loop has superseded (and released) e's blocks and
    # re-deriving from `half` would recompute the caller's whole edge
    # pipeline a second time (q144: the events window) — r11, guide
    # §2.4.  Eager: materialized NOW, while e's blocks are live.
    verts = (
        e.select(F.col("a").alias("vid"))
        .unionAll(e.select(F.col("b").alias("vid")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def star(cur: DataFrame, large: bool) -> DataFrame:
        # Canonical form lets both stars skip the doubled adjacency
        # (r11, guide §2.3): with every edge (a, b) satisfying a < b,
        # a vertex u's neighborhood minimum m(u) = min(N(u) + {u}) is
        # least(u, min{x : (x, u) in cur}) — out-neighbors are all
        # > u, so only the incoming side can beat u.  One |E|-row
        # groupBy replaces the 2|E|-row union+groupBy, and each star
        # joins |E| rows instead of 2|E|.
        min_in = cur.groupBy("b").agg(F.min("a").alias("__mn"))
        if large:
            # Large-star: neighbors v > u re-point at m(u).  In
            # canonical form those (u, v) adjacency rows are exactly
            # the edges (a, b) themselves, so the emission is
            # (m(a), b) with m(a) = least(a, __mn(a)) (least skips
            # the null __mn of vertices with no incoming edge).
            # m(a) <= a < b keeps the output canonical with no
            # self-loops, and no dedup is needed — one emission per
            # edge.  NOT checkpointed: the small-star half reads this
            # relation twice, but both reads sit on the SAME
            # hashpartitioning(b) exchange (identical subplans), so
            # exchange reuse computes it once; lineage stays bounded
            # because e itself is checkpointed each round.
            return cur.join(
                min_in.select(F.col("b").alias("a"), "__mn"), "a", "left"
            ).select(F.least("a", "__mn").alias("a"), "b")
        # Small-star: each center u re-roots its not-larger neighbors
        # and itself at m(u).  Centers with any incoming edge have
        # m(u) = __mn(u) (< u always); centers without incoming edges
        # would emit only the filtered (u, u) row, so min_in IS the
        # center list: edge rows emit (__mn(b), a), centers (__mn(b), b).
        out = cur.join(min_in, "b").select(
            F.col("__mn").alias("a"), F.col("a").alias("b")
        ).unionAll(min_in.select(F.col("__mn").alias("a"), "b"))
        return (
            out.where(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint(eager=False)
        )

    # Size-first AQE coalescing for the loop's jobs (r11, guide §2.2):
    # with parallelismFirst (the Spark default) every per-round
    # exchange fans a megabyte-scale contracted edge relation out to
    # defaultParallelism micro-partitions — dozens of ~50 KB tasks per
    # stage, 5 stages per alternation, launch overhead dominating.
    # Respecting the advisory size instead is the documented
    # production recommendation and is scale-neutral (big rounds
    # coalesce to many advisory-sized partitions; only genuinely small
    # rounds — late contractions — collapse, which is right at any
    # scale).  Scoped to the loop with restore: the co-partitioned
    # persisted-edge loops elsewhere (label prop, BFS, k-core) measure
    # SLOWER under size-first coalescing (their cached 32-partition
    # edge side then joins a 1-partition label side), so this is not a
    # session-wide default.
    spark = edges.sparkSession
    _PF = "spark.sql.adaptive.coalescePartitions.parallelismFirst"
    pf_before = spark.conf.get(_PF, "true")
    spark.conf.set(_PF, "false")
    try:
        for _ in range(max_iterations):
            e_new = star(star(e, large=True), large=False)
            fp = fingerprint(e_new)
            if fp == prev and e_new.exceptAll(e).limit(1).count() == 0:
                # fingerprint match is necessary, the exceptAll probe
                # makes it sufficient — run once, at the (apparent)
                # fixed point
                _release_local_checkpoint(e)
                e = e_new
                break
            # the probe (when it ran) was this round's last read of the
            # superseded e; only e_new's blocks stay live
            _release_local_checkpoint(e)
            e, prev = e_new, fp
        else:
            raise RuntimeError(
                f"connected_components_star did not converge in "
                f"{max_iterations} alternations; star contraction needs "
                "O(log^2 n) — check for id overflow or raise "
                "max_iterations"
            )
    finally:
        spark.conf.set(_PF, pf_before)

    # fixed point: (root, leaf) stars.  Every vertex resolves through
    # the leaf->root map; roots (and any vertex whose edges contracted
    # away) fall back to themselves.
    leafmap = e.select(F.col("b").alias("vid"), F.col("a").alias("__root"))
    return (
        verts.join(leafmap, "vid", "left")
        .select(
            F.col("vid").cast("long"),
            F.coalesce(F.col("__root"), F.col("vid"))
            .cast("long")
            .alias("component"),
        )
    )


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 10,
) -> DataFrame:
    """Group near-duplicate pairs into clusters: (vid, canonical_id)
    with canonical_id = the cluster's minimum member id.  Feed with the
    output of lsh_candidate_pairs / hyperplane_lsh_neardup /
    jaccard_pairs; rows NOT in any pair are untouched (they are their
    own canonical), so only the pair graph is processed.
    """
    cc = connected_components(
        pairs, src=id_a, dst=id_b, max_iterations=max_iterations
    )
    return cc.select("vid", F.col("component").alias("canonical_id"))


def _caller_owned_cache(result: DataFrame, *handles: DataFrame) -> DataFrame:
    """Attach persisted upstream handles to a lazily-returned result —
    the q85 persist-mode contract (ADVICE r08): ``result`` is lazy and
    keeps reading the persisted ``handles``, so they CANNOT be
    unpersisted here; the cached relations live until the CALLER
    releases them.  The handles ride on the result as
    ``result.cached_deps`` — in a long-lived session, after consuming
    the result, call ``h.unpersist()`` for each (or
    ``spark.catalog.clearCache()``) or repeated calls accumulate
    cached edge sets.  bench.py clears the cache between passes;
    library callers own this themselves.

    CAVEAT (ADVICE r10): ``cached_deps`` is a plain Python attribute,
    and every DataFrame transformation returns a NEW DataFrame — so
    ``op(...).select(...)`` silently drops the handles.  Grab them
    BEFORE wrapping (``r = op(...); deps = r.cached_deps;
    r.select(...)``); if the original reference is gone,
    ``spark.catalog.clearCache()`` is the recovery path."""
    result.cached_deps = list(handles)
    return result


def _oriented_triangles(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> tuple[DataFrame, DataFrame]:
    """Enumerate every triangle of the undirected graph EXACTLY ONCE as
    (u, w1, w2) — the three corners, with u the minimum corner in the
    (degree, id) total order and w1 < w2 — returning ``(triangles,
    canonical_edges)`` so callers reuse the persisted canonical edge
    set for their own degree work.  The canonical edge set is
    persisted MEMORY_AND_DISK and, because every consumer returns a
    lazy result, cannot be unpersisted here — the PUBLIC ops expose
    it as ``cached_deps`` on their results via
    :func:`_caller_owned_cache`; see its docstring for the ownership
    contract.  The compact-forward
    discipline shared by the per-vertex counts, the global count, and
    the clustering coefficient: orient each canonical edge from its
    lower-(degree, id) endpoint to the higher one, build wedges only
    from OUT-edges (fan-out capped at O(sqrt(|E|)) under any skew — a
    celebrity vertex contributes ~|E| wedges, not degree^2), close each
    wedge against the canonical edge set.  Each triangle has exactly
    one corner from which both others are out-neighbors, so no dedup
    pass is needed.

    Join discipline: no broadcasts, ever — the vertex and edge tables
    both scale with the data, and the broadcasts AQE (or a hint) would
    pick at test scale OOM by construction at target scale (see
    triangle_total_degree_oriented's docstring for the measured
    failures).  The degree attach is hinted SHUFFLE_HASH (the build
    side is one partition's slice of the vertex table — bounded, and
    it skips re-sorting the edge set twice, measured ~15% faster than
    merge at gate scale); the closing join is hinted sort-merge (both
    sides edge-sized).
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # Persisted (r11, guide §5): the relation feeds BOTH degree-attach
    # builds, and the r11 plan audit showed the join-key renames (a vs
    # b) pushing different isnotnull filters into the two subtrees, so
    # neither exchange reuse nor cache-plan matching fired — the whole
    # 2|E|-row union+aggregate (and its two cached-e scans) executed
    # twice per query.  Vertex-sized; rides the caller-owned
    # cached_deps contract like e itself.
    degrees = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    da = degrees.select(F.col("v").alias("a"), F.col("deg").alias("__da")).hint(
        "shuffle_hash"
    )
    db = degrees.select(F.col("v").alias("b"), F.col("deg").alias("__db")).hint(
        "shuffle_hash"
    )
    withdeg = e.join(da, "a").join(db, "b")
    a_first = (F.col("__da") < F.col("__db")) | (
        (F.col("__da") == F.col("__db")) & (F.col("a") < F.col("b"))
    )
    # Persisted (r11, guide §5): BOTH sides of the wedge self-join are
    # this relation under different aliases, and the r11 plan audit
    # showed the aliased sides defeating exchange reuse — the whole
    # degree-attach chain (two shuffled-hash joins over e) executed
    # once PER SIDE.  Edge-sized, same class as e; rides cached_deps.
    oriented = withdeg.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("w"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    o1 = oriented.select("u", F.col("w").alias("w1"))
    o2 = oriented.select("u", F.col("w").alias("w2")).hint("merge")
    # each unordered out-pair once; w1 < w2 makes the pair id-canonical,
    # so it probes the canonical edge set directly.  The self-join is
    # hinted sort-merge: BOTH sides are the full oriented edge set
    # (data-sized), and with real table stats Catalyst otherwise
    # broadcasts one of them — caught in r10 by the sf0.001 plan audit
    # (the r09 tiny-fixture plan test missed it; the broadcast-OOM
    # failure class is the measured one in
    # triangle_total_degree_oriented's docstring).  Sort-merge spills;
    # a data-sized hashed relation does not.
    pairs = o1.join(o2, "u").where(F.col("w1") < F.col("w2"))
    # Closing probe hinted SHUFFLE_HASH (r11, guide §3.1): the build
    # side is one partition's slice of the canonical edge set — the
    # same bounded-slice memory class as the degree attach above, NOT
    # the whole-relation broadcast r10 measured OOMing — while the
    # sort-merge pin paid a full sort of the WEDGE relation (the
    # enumerator's largest) on the probe side.  Broadcast stays banned
    # (the hint, like the others, pins the planner away from it).
    closing = e.select(F.col("a").alias("w1"), F.col("b").alias("w2")).hint(
        "shuffle_hash"
    )
    return pairs.join(closing, ["w1", "w2"], "left_semi"), e, degrees, oriented


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-vertex triangle counts over the undirected, canonicalized
    edge set (self-loops dropped, (a, b) with a < b, distinct).
    Returns (vid, n_triangles) where each triangle {a < b < c} is
    attributed to its SMALLEST vertex id — a deterministic attribution
    both engines reproduce.  The total triangle count is
    ``sum(n_triangles)``.

    r09: enumerates via the shared degree-oriented
    :func:`_oriented_triangles` (each triangle exactly once, all three
    corners in hand), then attributes with ``least(u, w1, w2)`` — the
    earlier raw-id node-iterator paid the sum-of-degrees-squared wedge
    blowup that degree orientation caps at O(sqrt(|E|)) per key.
    """
    tris, e, degrees, oriented = _oriented_triangles(edges, src, dst)
    out = tris.groupBy(
        F.least(F.col("u"), F.col("w1"), F.col("w2")).alias("vid")
    ).agg(F.count(F.lit(1)).alias("n_triangles"))
    return _caller_owned_cache(out, e, degrees, oriented)


def triangle_total_degree_oriented(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Global triangle count via degree orientation — the 100 TB
    variant of triangle_counts.  Returns a single row (n_triangles).

    Every edge is oriented from its lower-(degree, id) endpoint to the
    higher one; wedges are built only from each vertex's OUT-edges, so
    per-key fan-out is bounded by the max out-degree, which degree
    orientation caps at O(sqrt(|E|)) regardless of how skewed the raw
    degree distribution is (the compact-forward algorithm).  A single
    celebrity vertex with 10^8 followers contributes 10^16 wedges to
    the id-oriented join but only ~|E| to this one.  The total is
    orientation-invariant, so this is exact — it just cannot attribute
    triangles to a *specific* vertex like triangle_counts does.

    Plan: one degree aggregate (vertex-sized), shuffle-hash-joined
    back onto the edge set, one wedge self-join on the oriented
    source, one closing merge semi-join against the canonical edge
    set, one global count — all via the shared
    :func:`_oriented_triangles` enumerator.  The joins are hinted
    away from broadcast on purpose: both the vertex table and the
    edge set scale with the data (terabytes at web scale), so any
    broadcast of them is wrong by construction — and measured, not
    hypothetical: a forced F.broadcast of the degree table OOMed the
    driver at 64x replicas (1.28M vertices x two hinted builds), and
    with no hint AQE broadcast-converted the CLOSING side too (58M
    sorted long-pairs compress under the 64 MB shuffle threshold) and
    died building a >1 GB hashed relation.  The probe tool caught
    both; the only broadcast this operator should ever do is none.
    """
    tris, e, degrees, oriented = _oriented_triangles(edges, src, dst)
    out = tris.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    return _caller_owned_cache(out, e, degrees, oriented)


def triangle_total_doulion(
    edges: DataFrame,
    p_ppm: int = 250_000,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Approximate global triangle count by sparsified exact counting
    (DOULION — Tsourakakis, Kang, Miller, Faloutsos, KDD 2009): keep
    each canonical edge with probability ``p = p_ppm / 1e6``, count
    triangles EXACTLY on the sampled subgraph via the shared
    degree-oriented enumerator, and scale the count by ``1/p^3``.
    Each triangle survives iff all three of its edges do
    (probability p^3), so the estimator is unbiased; relative error
    concentrates as O(1/(p^1.5 * sqrt(T))) for T true triangles, i.e.
    tighter the more triangles the graph actually has.  Returns a
    single row (n_triangles_est long).

    This is the documented crawl-scale fallback for the exact triangle
    family: on ONE giant connected component, exact counting's wedge
    volume grows O(|E|^1.5) no matter how it is oriented — inherent to
    the problem, not to the plan (see PLANS.md).  Sampling at p cuts
    the edge set to p*|E| and the dominant wedge term by ~p^2 (expected
    oriented fan-out shrinks by p, wedges per vertex by ~p^2), so
    p = 1/4 buys a ~16x wedge reduction for a 64x variance scale —
    the standard knob when a user needs "how many triangles, roughly"
    on a web-crawl-sized graph rather than an exact census.

    Determinism: the keep decision is a pure hash of the canonical
    pair — the md5-derived 60-bit integer family every sampling
    operator here uses (``conv(substr(md5(a:b),1,15),16,10) % 1e6 <
    p_ppm``) — not an RNG, so the estimate is a reproducible function
    of the graph, independent of partitioning, and the DuckDB oracle
    replays it bit-for-bit.  ``p_ppm`` must divide 1e6 so the scale
    factor (1e6/p_ppm)^3 is integer-exact (hash-stable output).

    Cache ownership: same caller-owned ``cached_deps`` contract as the
    exact triangle ops (see :func:`_caller_owned_cache`).
    """
    if not 0 < p_ppm <= 1_000_000 or 1_000_000 % p_ppm:
        raise ValueError(
            f"p_ppm must divide 1,000,000 and lie in (0, 1e6], got {p_ppm}"
        )
    inv = 1_000_000 // p_ppm
    a = F.least(F.col(src), F.col(dst)).cast("string")
    b = F.greatest(F.col(src), F.col(dst)).cast("string")
    hv = F.conv(
        F.substring(F.md5(F.concat_ws(":", a, b)), 1, 15), 16, 10
    ).cast("long")
    sampled = edges.where(hv % 1_000_000 < F.lit(p_ppm))
    tris, e, degrees, oriented = _oriented_triangles(sampled, src, dst)
    out = tris.agg(
        (F.count(F.lit(1)) * F.lit(inv**3)).cast("long").alias(
            "n_triangles_est"
        )
    )
    return _caller_owned_cache(out, e, degrees, oriented)


def kcore_vertices(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
) -> DataFrame:
    """Vertices of the undirected graph's k-core — the maximal subgraph
    where every vertex keeps degree >= k — with their in-core degree:
    (vid long, deg long).  Peel semantics (the greatest fixpoint: drop
    everything under degree k, repeat until a round drops nothing;
    removal order cannot change the answer).  The web-graph curation
    cut: k-core membership is a cheap page-quality/connectivity signal
    at crawl scale.

    Scale shape — DELTA peeling, not edge-set rewriting.  The naive
    loop rescans and rewrites the surviving EDGE set every round (scan
    + two anti-joins + a checkpoint write of edge-sized data x rounds,
    the superlinear term SCALE_PROBE flagged at alpha_hi 1.24).  Here
    the edge set is persisted ONCE, partitioned by source, and each
    round touches only vertex-sized state plus the peel frontier:

      * `deg` — a (vertex, degree) relation, maintained incrementally:
        when a vertex drops, each surviving neighbor's degree falls by
        its edge count to the dropped set.  The decrement join scans
        edges incident to the FRONTIER (one co-partitioned join + a
        frontier-sized groupBy), so late rounds cost almost nothing.
      * edges to vertices dropped in EARLIER rounds need no masking:
        their decrements target vertices no longer present in `deg`,
        so the left join discards them — the algebra self-filters.
      * the full edge relation is COMPACTED to survivors only when the
        peel has removed >= half the vertices alive at the last
        compaction (amortized O(log V) compactions), keeping the
        frontier scans from paying for long-gone vertices without
        re-writing edges every round.

    Final `deg` at the fixpoint IS the in-core degree: every non-core
    vertex drops exactly once, decrementing each surviving neighbor
    exactly once.  Lineage is cut per round on the vertex-sized
    relation only (localCheckpoint); convergence is a driver-side
    scalar count.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    spark = edges.sparkSession
    npart = spark.sparkContext.defaultParallelism
    e = _undirected_edges(edges, src, dst, npart)
    deg = e.groupBy("s").agg(F.count(F.lit(1)).alias("deg")).localCheckpoint(
        eager=False
    )
    dropped_since_compact = 0

    try:
        for _ in range(max_iterations):
            # ONE driver action per round: alive + frontier size off the
            # checkpointed vertex relation (scalars, not data).  `drop`
            # itself is a re-filter of the same cached RDD — cheap, and
            # not worth a checkpoint of its own.
            counts = deg.agg(
                F.count(F.lit(1)).alias("__n"),
                F.sum((F.col("deg") < k).cast("long")).alias("__nd"),
            ).collect()[0]
            alive = counts["__n"] - (counts["__nd"] or 0)
            n_drop = counts["__nd"] or 0
            if n_drop == 0:
                return deg.select(
                    F.col("s").cast("long").alias("vid"),
                    F.col("deg").cast("long").alias("deg"),
                )
            drop = deg.where(F.col("deg") < k).select("s")
            # Degree decrements from the frontier's incident edges; the
            # left join onto surviving vertices drops decrements aimed
            # at already-peeled ones.
            dec = (
                e.join(drop, "s")
                .groupBy("d")
                .agg(F.count(F.lit(1)).alias("__dec"))
                .withColumnRenamed("d", "s")
            )
            deg = (
                deg.join(drop, "s", "left_anti")
                .join(dec, "s", "left")
                .select(
                    "s",
                    (
                        F.col("deg") - F.coalesce(F.col("__dec"), F.lit(0))
                    ).alias("deg"),
                )
                .localCheckpoint(eager=False)
            )
            dropped_since_compact += n_drop
            if alive and dropped_since_compact >= alive:
                survivors = deg.select("s")
                e_new = (
                    e.join(survivors, "s", "semi")
                    .join(survivors.withColumnRenamed("s", "d"), "d", "semi")
                    .repartition(npart, "s")
                    .persist(StorageLevel.MEMORY_AND_DISK)
                )
                e_new.count()
                e.unpersist()
                e = e_new
                dropped_since_compact = 0
        raise RuntimeError(
            f"kcore_vertices did not converge in {max_iterations} rounds; "
            "raise max_iterations (each round removes at least one vertex, "
            "so rounds are bounded by the vertex count)"
        )
    finally:
        e.unpersist()


def label_propagation(
    edges: DataFrame,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Synchronous label-propagation community detection: every vertex
    starts labeled with its own id and each round SIMULTANEOUSLY adopts
    the most frequent label among its neighbors (ties to the smallest
    label).  Returns (vid long, label long) after exactly ``rounds``
    rounds.

    Fixed round count, not a convergence loop, on purpose: synchronous
    LP can 2-cycle on bipartite-ish structure, so "until no change" may
    never hold; a fixed horizon is the standard formulation and makes
    the result a pure deterministic function of the graph.  Communities
    in near-dup/link graphs stabilize in 3-5 rounds.

    Scale shape: the both-orientations edge set is materialized ONCE,
    partitioned by the neighbor-reading side, and persisted; each round
    is one co-located join (labels arrive partitioned by vid from the
    previous round's aggregate) + one (dst, label) count + one per-dst
    argmax, all in the same key space — two exchanges per round of
    (vertex x avg-degree) rows, never the corpus.  The argmax is
    max(struct(cnt, -label)), a partial-aggregatable expression — no
    row_number window, so a celebrity vertex's neighbor list partial-
    aggregates map-side instead of sorting on one executor.
    """
    if rounds < 0:
        raise ValueError(f"rounds must be >= 0, got {rounds}")
    spark = edges.sparkSession
    npart = spark.sparkContext.defaultParallelism
    e = _undirected_edges(edges, src, dst, npart)
    labels = (
        e.select(F.col("s").alias("vid"))
        .distinct()
        .withColumn("label", F.col("vid"))
    )
    try:
        for _ in range(rounds):
            # One exchange per round: repartition the neighbor-label rows
            # by vid ONCE; HashPartitioning(vid) satisfies the clustering
            # of BOTH downstream aggregates (groupBy(vid,label) needs only
            # same-key co-location, groupBy(vid) matches exactly), so the
            # count and the argmax run exchange-free on top of it.
            nbr = (
                e.join(labels, e.s == labels.vid)
                .select(F.col("d").alias("vid"), "label")
                .repartition(npart, "vid")
            )
            counts = nbr.groupBy("vid", "label").agg(
                F.count(F.lit(1)).alias("__cnt")
            )
            labels = (
                counts.groupBy("vid")
                .agg(F.max(F.struct(F.col("__cnt"), (-F.col("label")).alias("__neg"))).alias("__best"))
                .select("vid", (-F.col("__best.__neg")).alias("label"))
                .localCheckpoint(eager=False)
            )
        # The intermediate rounds checkpoint lazily (one job computes the
        # whole chain, truncating lineage as it goes); the FINAL
        # checkpoint is eager so the result reads vertex-sized blocks and
        # the edge persist can be released HERE instead of leaking into
        # the session (ADVICE r09).  The caller's action would have done
        # this exact work anyway — the cost moves, it doesn't grow.
        out = labels.select(
            F.col("vid").cast("long"), F.col("label").cast("long")
        ).localCheckpoint(eager=True)
    finally:
        e.unpersist()
    return out


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "vid",
) -> DataFrame:
    """Multi-source breadth-first hop distance: (vid long, hop int) for
    every vertex reachable from ``seeds`` within ``rounds`` undirected
    hops (seeds themselves at hop 0).  The classic frontier-expansion
    formulation of iterative graph traversal (cf. the reference's
    iterative network jobs, e.g. PageRank's per-superstep scatter,
    /root/reference/src/tritonsort/mapreduce/functions/map/PageRankMapFunction.cc
    — same superstep discipline, different per-round operator).

    Scale shape: the both-orientations edge set is built ONCE,
    pre-partitioned on the frontier-matching key, and persisted, so
    each round's expansion join co-locates against it without
    re-shuffling the graph.  Per round the moving data is the frontier
    x avg-degree neighbor set (one exchange for its dedup) and the
    visited-set anti-join — both bounded by the vertex set, never the
    corpus.  ``localCheckpoint`` cuts the per-round lineage exactly as
    in :func:`label_propagation`; frontiers SHRINK as the graph
    saturates, so late rounds are cheap.
    """
    if rounds < 0:
        raise ValueError(f"rounds must be >= 0, got {rounds}")
    spark = edges.sparkSession
    npart = spark.sparkContext.defaultParallelism
    e = _undirected_edges(edges, src, dst, npart)
    dist = (
        seeds.select(F.col(seed_col).alias("vid"))
        .distinct()
        .withColumn("hop", F.lit(0))
        .localCheckpoint(eager=False)
    )
    frontier = dist.select("vid")
    try:
        for i in range(1, rounds + 1):
            reached = (
                e.join(frontier.withColumnRenamed("vid", "s"), "s")
                .select(F.col("d").alias("vid"))
                .distinct()
            )
            fresh = (
                reached.join(dist.select("vid"), "vid", "left_anti")
                .withColumn("hop", F.lit(i))
                .localCheckpoint(eager=False)
            )
            dist = dist.unionByName(fresh).localCheckpoint(eager=False)
            frontier = fresh.select("vid")
        # Eager final checkpoint (vertex-sized) so the edge persist can
        # be released here instead of leaking into the session — same
        # contract as label_propagation (ADVICE r09).
        out = dist.select(
            F.col("vid").cast("long"), F.col("hop").cast("int")
        ).localCheckpoint(eager=True)
    finally:
        e.unpersist()
    return out


def local_clustering_coefficient(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-vertex local clustering coefficient: (vid, deg, n_tri,
    lcc_ppm) for every vertex of degree >= 2, where lcc = 2 * t(v) /
    (deg * (deg - 1)) and t(v) counts the triangles INCIDENT to v
    (each triangle credited to all three corners, unlike
    :func:`triangle_counts`' smallest-corner attribution).  The
    canonical web-graph connectivity/quality signal.

    Exactness: t and deg are exact longs; the coefficient is ONE
    double division of two exactly-representable integers, rounded to
    ppm — reproducible on any IEEE engine.  Plan (r09): the shared
    degree-oriented enumerator :func:`_oriented_triangles` (each
    triangle exactly once, per-key wedge fan-out capped at
    O(sqrt(|E|)) under any skew — the earlier node-iterator paid the
    sum-of-degrees-squared blowup) + a 3-way corner explode that is
    triangle-sized, + one degree aggregate over the same persisted
    canonical edge set.
    """
    tris, e, degrees, oriented = _oriented_triangles(edges, src, dst)
    per_vertex = (
        tris.select(
            F.explode(
                F.array(F.col("u"), F.col("w1"), F.col("w2"))
            ).alias("vid")
        )
        .groupBy("vid")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    # The enumerator already built and persisted this exact relation
    # for its degree orientation — read it instead of re-aggregating
    # the edge set a third time (r11, guide §5).
    deg = degrees.select(F.col("v").alias("vid"), "deg")
    num = (F.col("n_tri") * F.lit(2_000_000)).cast("double")
    den = (F.col("deg") * (F.col("deg") - 1)).cast("double")
    out = (
        deg.where(F.col("deg") >= 2)
        .join(per_vertex, "vid", "left_outer")
        .na.fill({"n_tri": 0})
        .select(
            F.col("vid").cast("long"),
            F.col("deg").cast("long"),
            F.col("n_tri").cast("long"),
            F.round(num / den).cast("long").alias("lcc_ppm"),
        )
    )
    return _caller_owned_cache(out, e, degrees, oriented)
