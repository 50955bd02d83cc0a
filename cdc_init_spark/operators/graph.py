"""Distributed graph operators — PageRank and triangle counting (EXT).

Origin: EXT — the reference has no graph surface (its only
graph-adjacent behavior is the dependency-free table list it seeds,
/root/reference/src/cdc_init/core.clj:34-101); these are the standard
link-analysis / community-structure operators a training-data pipeline
runs over citation, hyperlink, or co-occurrence graphs (page quality
signals for corpus weighting, near-dup cluster diagnostics).

Both operators are pure DataFrame compositions — no GraphFrames/GraphX
dependency, no RDDs, no Python in the hot path — so Catalyst/AQE plan
every step (shuffle hash joins keyed on node ids, partial aggregation,
runtime skew splitting).

Scale notes (100 TB):
- ``pagerank``: each iteration is ONE shuffle join (ranks ⋈ edges on
  src) + ONE aggregation shuffle (contributions by dst) — the minimal
  data movement any edge-centric PageRank does. The edge list (with
  out-degrees attached) is computed once and persisted; iterating grows
  only the logical plan (linearly), so for deep iteration counts pass
  ``checkpoint_every`` to truncate lineage with ``localCheckpoint``.
  Skewed in-degree (hub pages) is an AQE skew-join case; the
  contribution aggregate is partial (map-side combine) so hub traffic
  is combined before the shuffle.
- ``triangles_per_node``: uses the degree-ordered orientation (each
  undirected edge directed from its lower-(degree, id) endpoint), which
  bounds the wedge join by the graph's arboricity — the classic
  MapReduce triangle-enumeration bound (Suri & Vassilvitskii, WWW'11) —
  instead of the naive join whose cost is Σ deg².  Three shuffles
  total: degree count, wedge join, closure join.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bcast_node_limit() -> int:
    """Node-count ceiling under which the iterative operators broadcast
    their per-iteration state vector instead of shuffling it (guide
    §3.1: broadcast the side that fits). A rank/label row is ~16 bytes
    of data but ~64 bytes FRAMED in a built broadcast hash relation, so
    the 1M-row default keeps each built relation around 64 MB — and an
    iteration may hold two of them live (state + contribution), so the
    worst case is ~128 MB of driver/executor memory, comfortable under
    the default 8 GB driver. At 100 TB a billion-node graph exceeds any
    sane limit and the operators keep the shuffle path — the decision is
    made from the MEASURED node count, not the deploy target.
    Env-tunable for clusters with bigger executors."""
    return int(os.environ.get("SPARK_GRAFT_GRAPH_BCAST_NODES", str(1_000_000)))


def _bcast_edge_limit() -> int:
    """Edge-count ceiling for broadcasting edge-shaped relations in the
    triangle counters (the oriented edge list / the adjacency-array
    relation). An adjacency payload carries ~2 entries per undirected
    edge at ~32 bytes framed, so the 2M default keeps the built relation
    near 128 MB. Same contract as ``_bcast_node_limit``: the decision is
    made from the measured edge count, env-tunable."""
    return int(os.environ.get("SPARK_GRAFT_GRAPH_BCAST_EDGES", str(2_000_000)))


def symmetrize(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Undirected → directed: emit each edge in both directions (the
    usual preprocessing before ``pagerank`` on an undirected graph; it
    also guarantees every node has out-degree ≥ 1, so no dangling
    mass)."""
    fwd = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    rev = edges.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
    return fwd.unionByName(rev)


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    checkpoint_every: int | None = None,
    broadcast_state: bool | None = None,
    dedupe: bool = True,
) -> DataFrame:
    """Power-iteration PageRank over a directed edge list ``(src, dst)``.

    Returns ``(node, pr)`` for every node appearing as src or dst.
    Contract: nodes with out-degree 0 (dangling) contribute no mass and
    their lost mass is NOT redistributed — callers with undirected
    graphs should ``symmetrize`` first (then no dangling nodes exist and
    Σ pr = 1 exactly, up to float rounding). Initial rank is 1/N.

    ``broadcast_state=None`` (default) decides from the MEASURED node
    count: at or under ``_bcast_node_limit()`` (env
    ``SPARK_GRAFT_GRAPH_BCAST_NODES``) the per-iteration rank and
    contribution vectors are built into broadcast relations — which
    means up to that many rows are collected to the driver EVERY
    iteration (bounded by the limit, ~64 MB framed each) in exchange for
    iterations that never shuffle the edge relation. Above the limit the
    shuffle path runs and driver traffic is one scalar (the node count
    N). Each shuffle-path iteration: edges+outdeg ⋈ ranks on src
    (shuffle hash join), then sum of contributions grouped by dst
    (partial agg → one shuffle), then a left join back onto the node
    list so nodes with no in-edges keep the teleport term (1-d)/N.
    """
    # Pin the deduped edge list: callers typically derive `edges` from an
    # expensive join pipeline, and without this persist that pipeline
    # re-executes for `nodes.count()` AND twice more (e and deg are
    # separate scans of it) when `ed` materializes. Measured at sf0.1
    # (q157): 6.2 s → 4.7 s. The other iterative operators deliberately
    # do NOT cache their edge input: caching blocks AQE coalescing /
    # broadcast planning on the cached side and measurably hurt them.
    e = edges.select("src", "dst")
    if dedupe:
        # callers that already emit a distinct edge list pass
        # dedupe=False and skip this full-width shuffle
        e = e.distinct()
    e = e.persist()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("_outdeg"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = float(nodes.count())  # one scalar to the driver, O(1)
    if broadcast_state is None:
        # auto (guide §3.1): the rank vector is n rows; when it fits the
        # broadcast bound, shuffling the (persisted) edge relation's join
        # side every iteration buys nothing — broadcast the state and
        # each iteration is map-side up to one partial-agg exchange.
        # Size-adaptive, from the measured count: a 100 TB graph with
        # billions of nodes keeps the shuffle path.
        broadcast_state = n <= _bcast_node_limit()
    ed = e.join(deg, "src").persist()
    teleport = (1.0 - damping) / n

    ranks = nodes.withColumn("pr", F.lit(1.0 / n))
    for i in range(iters):
        rstate = ranks.withColumnRenamed("node", "src")
        if broadcast_state:
            # node set fits (caller's contract or the measured auto
            # bound): the rank vector broadcasts, the edge scan never
            # shuffles, and the partial-aggregated contribution exchange
            # carries ≤ |nodes| rows per partition — each iteration
            # becomes map-side work.
            rstate = F.broadcast(rstate)
        contrib = (
            ed.join(rstate, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("pr") / F.col("_outdeg")).alias("_s"))
            .withColumnRenamed("dst", "node")
        )
        if broadcast_state:
            # contribution vector is ≤ |nodes| rows — broadcasting it
            # back onto the pinned node list removes the per-iteration
            # outer-join exchange too (BuildRight broadcast left join).
            contrib = F.broadcast(contrib)
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (F.lit(teleport) + F.lit(damping) * F.coalesce("_s", F.lit(0.0))).alias(
                "pr"
            ),
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def _undirected_canonical(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Canonicalize an undirected edge list to distinct (a, b) with
    a < b and no self-loops."""
    return (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _prec(d1: Column, n1: Column, d2: Column, n2: Column) -> Column:
    """The degree-orientation total order: (deg, id) lexicographic."""
    return (d1 < d2) | ((d1 == d2) & (n1 < n2))


def triangles_per_node(
    edges: DataFrame, src: str = "src", dst: str = "dst",
    broadcast_edges: bool | None = None,
    canonicalize: bool = True,
) -> DataFrame:
    """Exact per-node triangle counts over an undirected edge list.

    Returns ``(node, n_triangles)`` for every node with ≥ 1 triangle
    (left-join from your node dim to keep zero rows). Each triangle is
    enumerated exactly once at its minimum-(degree, id) pivot, then
    credited to all three corners. The degree orientation makes the
    wedge join output O(m^1.5) worst-case instead of Σ deg² — the
    difference between a star-node blowup and a bounded join at scale.

    ``broadcast_edges``: the wedge stream is m^1.5-sized — the
    LARGEST relation in the plan — so when the oriented edge list
    itself fits an executor (≈24 bytes/edge) broadcasting it to both
    the wedge and closure joins means the wedge stream is never
    exchanged: it pipelines map-side from generation through closure
    into the partial-aggregated corner count. ``None`` (default)
    decides from the MEASURED edge count against ``_bcast_edge_limit()``
    (the oriented list is persisted anyway, so the count is one cheap
    extra action); ``False`` forces the shuffle closure join on
    (v1, v2) — the billion-edge path where nothing fits.

    ``canonicalize=False``: caller asserts the edge list is already
    distinct ``(a, b)`` with a < b and no self-loops — skips a
    full-width dedup exchange that would otherwise be a no-op.
    """
    if canonicalize:
        e = _undirected_canonical(edges, src, dst)
    else:
        e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    deg = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("_deg"))
    )
    # attach degrees to both endpoints, then orient low → high
    withdeg = (
        e.join(deg.withColumnRenamed("node", "a").withColumnRenamed("_deg", "_da"), "a")
        .join(deg.withColumnRenamed("node", "b").withColumnRenamed("_deg", "_db"), "b")
    )
    o = withdeg.select(
        F.when(_prec(F.col("_da"), F.col("a"), F.col("_db"), F.col("b")), F.col("a"))
        .otherwise(F.col("b"))
        .alias("u"),
        F.when(_prec(F.col("_da"), F.col("a"), F.col("_db"), F.col("b")), F.col("b"))
        .otherwise(F.col("a"))
        .alias("v"),
        F.when(_prec(F.col("_da"), F.col("a"), F.col("_db"), F.col("b")), F.col("_da"))
        .otherwise(F.col("_db"))
        .alias("_du"),
        F.when(_prec(F.col("_da"), F.col("a"), F.col("_db"), F.col("b")), F.col("_db"))
        .otherwise(F.col("_da"))
        .alias("_dv"),
    ).persist()
    if broadcast_edges is None:
        # measured-count gate (guide §3.1): the count materializes the
        # persist that the wedge/closure joins need anyway
        broadcast_edges = o.count() <= _bcast_edge_limit()
    # wedges at the pivot u: (u→v, u→w) with v ≺ w in the same order
    o1 = o.select("u", F.col("v").alias("v1"), F.col("_dv").alias("_d1"))
    o2 = o.select("u", F.col("v").alias("v2"), F.col("_dv").alias("_d2"))
    close_side = o.select(F.col("u").alias("v1"), F.col("v").alias("v2"))
    if broadcast_edges:
        o2 = F.broadcast(o2)
        close_side = F.broadcast(close_side)
    wedges = o1.join(o2, "u").filter(
        _prec(F.col("_d1"), F.col("v1"), F.col("_d2"), F.col("v2"))
    )
    # close the wedge: (v1 → v2) must be an oriented edge
    closed = wedges.join(close_side, ["v1", "v2"]).select("u", "v1", "v2")
    corners = (
        closed.select(F.col("u").alias("node"))
        .unionByName(closed.select(F.col("v1").alias("node")))
        .unionByName(closed.select(F.col("v2").alias("node")))
    )
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles")
    )


def triangles_adjacency(
    edges: DataFrame, src: str = "src", dst: str = "dst",
    broadcast_adjacency: bool | None = None,
    canonicalize: bool = True,
) -> DataFrame:
    """Per-node triangle counts by sorted-adjacency intersection — the
    bounded-degree fast path to ``triangles_per_node`` (same result,
    different physical shape). For each undirected edge (a, b),
    |N(a) ∩ N(b)| is the number of triangles through that edge; node
    v's count is Σ over incident edges / 2 (each of v's triangles is
    seen via both of its other corners).

    Physical shape: ONE shuffle builds the per-node neighbor array
    (degree-sized rows — this is the method's contract: fine when max
    degree is bounded, e.g. co-purchase/knn graphs; a power-law hub
    with millions of neighbors wants ``triangles_per_node``'s
    orientation instead, which never materializes an adjacency list).
    The node→array relation is nodes-sized and broadcasts to both
    endpoint joins, so the per-edge ``array_intersect`` runs map-side
    in codegen and the final per-node sum is partial-aggregated — no
    wedge stream ever exists (the m^1.5 relation the orientation method
    must build), which is why this wins whenever the arrays fit.

    ``broadcast_adjacency=None`` (default): decided from the MEASURED
    canonical edge count against ``_bcast_edge_limit()`` (adjacency
    payload = 2 entries/edge) — one count action over the pinned edge
    list, which the three downstream references reuse. Above the limit
    the adjacency relation shuffles (and the pin is dropped).
    ``canonicalize=False``: caller asserts distinct (a, b), a < b, no
    self-loops — skips the no-op dedup exchange."""
    if canonicalize:
        e = _undirected_canonical(edges, src, dst)
    else:
        e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    if broadcast_adjacency is None:
        e = e.persist()
        broadcast_adjacency = e.count() <= _bcast_edge_limit()
        if not broadcast_adjacency:
            e.unpersist()
    sym = e.select(F.col("a").alias("x"), F.col("b").alias("y")).unionByName(
        e.select(F.col("b").alias("x"), F.col("a").alias("y"))
    )
    adj = sym.groupBy(F.col("x").alias("node")).agg(
        F.sort_array(F.collect_list("y")).alias("_nbrs")
    )
    if broadcast_adjacency:
        adj = F.broadcast(adj)
    per_edge = (
        e.join(adj.withColumnRenamed("node", "a").withColumnRenamed("_nbrs", "_na"), "a")
        .join(adj.withColumnRenamed("node", "b").withColumnRenamed("_nbrs", "_nb"), "b")
        .select(
            "a",
            "b",
            F.size(F.array_intersect("_na", "_nb")).cast("bigint").alias("_t"),
        )
    )
    corners = per_edge.select(F.col("a").alias("node"), "_t").unionByName(
        per_edge.select(F.col("b").alias("node"), "_t")
    )
    return (
        corners.groupBy("node")
        .agg((F.sum("_t") / 2).cast("bigint").alias("n_triangles"))
        .filter(F.col("n_triangles") > 0)
    )


def hits(
    edges: DataFrame,
    iters: int = 2,
    broadcast_state: bool | None = None,
    dedupe: bool = True,
) -> DataFrame:
    """HITS hub/authority scores (Kleinberg, JACM'99) over a directed
    edge list ``(src, dst)``, un-normalized power iteration — callers
    normalize once at the end (one scalar each), which avoids a 1-row
    broadcast PER iteration; with bounded ``iters`` the magnitudes stay
    far from overflow (they grow like avg-degree^iters).

    Returns ``(node, hub, auth)`` for every node. Per iteration:
    authority(v) = Σ hub(u) over u→v, then hub(u) = Σ auth(v) over
    u→v — each update is one shuffle join + one partially-aggregated
    sum, the same minimal edge-centric movement as ``pagerank``. Nodes
    with no in-edges get auth 0; no out-edges, hub 0.
    """
    e = edges.select("src", "dst")
    if dedupe:
        # same contract as pagerank: pre-deduped callers skip the shuffle
        e = e.distinct()
    e = e.persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    if broadcast_state is None:
        # auto (guide §3.1, same rule as pagerank): hub/auth vectors are
        # |nodes| rows; broadcast them when the measured count fits, so
        # each update is map-side against the pinned edge relation up to
        # one partial-agg exchange. Billions of nodes → shuffle path.
        broadcast_state = nodes.count() <= _bcast_node_limit()
    hub = nodes.withColumn("hub", F.lit(1.0))
    auth = nodes.withColumn("auth", F.lit(1.0))
    maybe_b = F.broadcast if broadcast_state else (lambda df: df)
    # Persist each round's state: hub(i) feeds auth(i+1) AND the final
    # hub ⋈ auth, so without the pin the plan tree doubles per iteration
    # (auth(i) is embedded in hub(i) and referenced again downstream).
    # State frames are |nodes| rows — cheap to cache; measured at sf0.1
    # (q163): 6.1 s → 5.0 s. Deliberately NOT caching the edge input in
    # khop/bellman_ford/label_propagation: measured clean A/B shows
    # caching there regresses them (LPA 4.3 s → 14.2 s — the cache
    # blocks AQE/broadcast planning on the cached side).
    for _ in range(iters):
        auth = (
            nodes.join(
                maybe_b(
                    e.join(maybe_b(hub.withColumnRenamed("node", "src")), "src")
                    .groupBy("dst")
                    .agg(F.sum("hub").alias("_a"))
                    .withColumnRenamed("dst", "node")
                ),
                "node",
                "left",
            )
            .select("node", F.coalesce("_a", F.lit(0.0)).alias("auth"))
            .persist()
        )
        hub = (
            nodes.join(
                maybe_b(
                    e.join(maybe_b(auth.withColumnRenamed("node", "dst")), "dst")
                    .groupBy("src")
                    .agg(F.sum("auth").alias("_h"))
                    .withColumnRenamed("src", "node")
                ),
                "node",
                "left",
            )
            .select("node", F.coalesce("_h", F.lit(0.0)).alias("hub"))
            .persist()
        )
    return hub.join(maybe_b(auth), "node")


def khop_distances(
    edges: DataFrame, seeds: DataFrame, k: int,
    broadcast_state: bool | None = None,
) -> DataFrame:
    """Minimum-hop distances from a seed set, out to ``k`` hops —
    distributed BFS by iterated frontier expansion.

    ``edges`` is directed ``(src, dst)`` (symmetrize for undirected);
    ``seeds`` has a ``node`` column. Returns ``(node, hops)`` with
    hops = min distance ≤ k. Each round expands only the NEWLY reached
    frontier (not the whole visited set) through one join, then one
    min-aggregate folds rediscoveries (duplicate discoveries collapse in
    the map-side partial min — no separate distinct pass) — k joins
    total, each sized by the frontier, the textbook scalable BFS (no
    quadratic closure).

    ``broadcast_state=None`` (default) measures the node universe
    (seeds ∪ edge destinations — every row the state vector can ever
    hold) with one count; at or under ``_bcast_node_limit()`` the edge
    relation is pinned and each round's frontier broadcasts (the
    frontier, bounded by that count, is collected to the driver per
    round), so the edge side is never shuffled. Above the limit the
    shuffle path runs unchanged and the edge input stays uncached
    (caching it measurably regresses the shuffle path — it blocks
    AQE/broadcast planning on the cached side)."""
    if broadcast_state is None:
        e = edges.persist()
        n_universe = (
            seeds.select("node")
            .unionByName(e.select(F.col("dst").alias("node")))
            .distinct()
            .count()
        )
        broadcast_state = n_universe <= _bcast_node_limit()
        if not broadcast_state:
            e.unpersist()
        edges = e
    dist = seeds.select("node").distinct().withColumn("hops", F.lit(0))
    frontier = dist
    for i in range(1, k + 1):
        fstate = frontier
        if broadcast_state:
            fstate = F.broadcast(fstate)
        reached = (
            fstate.join(edges.withColumnRenamed("src", "node"), "node")
            .select(F.col("dst").alias("node"))
            .withColumn("hops", F.lit(i))
        )
        prev = dist
        dist = (
            dist.unionByName(reached)
            .groupBy("node")
            .agg(F.min("hops").alias("hops"))
            .persist()
        )
        if prev.is_cached:
            prev.unpersist()
        frontier = dist.filter(F.col("hops") == i)
    return dist


def bellman_ford(
    edges: DataFrame,
    seeds: DataFrame,
    k: int,
    weight: str = "w",
    broadcast_state: bool | None = None,
) -> DataFrame:
    """Weighted single/multi-source shortest paths, ``k`` relaxation
    rounds — the weighted generalization of ``khop_distances``.

    ``edges`` is directed ``(src, dst, w)``; ``seeds`` has ``node``.
    Returns ``(node, dist)`` = minimum path weight reachable within k
    edges. Each round is the classic distributed Bellman-Ford step: ONE
    shuffle join (current distances ⋈ edges on src) producing tentative
    dst distances, then ONE partial-aggregated min fold — data movement
    per round is O(reached-nodes ⋈ their out-edges), never the
    transitive closure. Integer weights stay integer-exact, so the
    result is engine-portable (the oracle unrolls the same recurrence).
    ``persist`` pins each round's frontier; for deep k add
    localCheckpoint (PageRank discipline).

    ``broadcast_state=None`` (default): same measured-count auto gate as
    ``khop_distances`` — one count of the node universe decides; under
    the limit the edge relation is pinned and the distance vector
    broadcasts each round (collected to the driver, bounded by the
    limit); over it, today's shuffle path with the edge input uncached."""
    if broadcast_state is None:
        e = edges.persist()
        n_universe = (
            seeds.select("node")
            .unionByName(e.select(F.col("dst").alias("node")))
            .distinct()
            .count()
        )
        broadcast_state = n_universe <= _bcast_node_limit()
        if not broadcast_state:
            e.unpersist()
        edges = e
    dist = (
        seeds.select("node")
        .distinct()
        .withColumn("dist", F.lit(0).cast("bigint"))
    )
    for _ in range(k):
        dstate = dist
        if broadcast_state:
            dstate = F.broadcast(dstate)
        relaxed = (
            dstate.join(edges.withColumnRenamed("src", "node"), "node")
            .select(
                F.col("dst").alias("node"),
                (F.col("dist") + F.col(weight)).cast("bigint").alias("dist"),
            )
        )
        prev = dist
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .persist()
        )
        # drop the superseded round's cache marker (bpe_train discipline)
        # — otherwise k rounds pin k DataFrames in executor storage
        if prev.is_cached:
            prev.unpersist()
    return dist


def label_propagation(
    edges: DataFrame, iters: int = 2, broadcast_state: bool | None = None
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007), made deterministic: every node starts with its own id as
    label; each round it adopts the most frequent label among its
    neighbors AND itself (the self-vote variant — equivalent to a
    self-loop per node, which damps the label oscillation synchronous
    LPA exhibits on bipartite/bridge structure), ties broken by the
    SMALLEST label. Deterministic tie-breaking makes the result
    identical across engines/partitionings — and therefore
    oracle-checkable (integer labels, no randomness).

    Per round: ONE shuffle join (labels ⋈ edges on src) + ONE
    (dst, label) count aggregate + ONE per-node argmax (max_by on the
    (count, -label) pair — partial-aggregable, no window). Hub skew is
    an AQE skew-join case, counts combine map-side.

    ``broadcast_state=None`` (default): measured-count auto gate (same
    rule as ``pagerank``) — the node frame is counted once; at or under
    ``_bcast_node_limit()`` the edge relation is pinned and both the
    label vector (per-round join) and the per-node argmax result
    (join-back) broadcast, so only the (node, label) count exchange
    remains per round. Each broadcast collects ≤ limit rows to the
    driver per round. Above the limit: today's shuffle path, edge input
    uncached (caching it regressed the shuffle path — measured)."""
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    if broadcast_state is None:
        e = edges.persist()
        broadcast_state = nodes.count() <= _bcast_node_limit()
        if not broadcast_state:
            e.unpersist()
        edges = e
    maybe_b = F.broadcast if broadcast_state else (lambda df: df)
    labels = nodes.withColumn("label", F.col("node").cast("bigint"))
    for _ in range(iters):
        lstate = maybe_b(labels.withColumnRenamed("node", "src"))
        neigh = (
            lstate
            .join(edges, "src")
            .select(F.col("dst").alias("node"), "label")
            .unionByName(labels.select("node", "label"))
            .groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        best = neigh.groupBy("node").agg(
            F.max_by(
                "label", F.struct(F.col("c"), (-F.col("label")).alias("nl"))
            ).alias("new_label")
        )
        prev = labels
        labels = (
            labels.join(maybe_b(best), "node", "left")
            .select(
                "node",
                F.coalesce("new_label", "label").alias("label"),
            )
            .persist()
        )
        if prev.is_cached:
            prev.unpersist()
    return labels
