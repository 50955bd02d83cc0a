"""Graph-analytics corpus — PageRank and triangle counting (EXT).

Origin: EXT — link-analysis operators a training-data pipeline runs over
hyperlink / citation / co-occurrence graphs (PageRank-style page quality
priors for corpus weighting; triangle density as a community-structure /
spam-farm signal). The reference has no graph surface; the test graph is
derived from the driver fixtures: the customer↔supplier bipartite graph
(who bought from whom, via orders ⋈ lineitem) and the supplier co-order
graph (suppliers that fulfilled the same order).

Both queries replay EVERY stage — edge derivation, degrees, the
power-iteration recurrence / the triangle 3-join — term-for-term in
DuckDB SQL, so the driver hash-verifies the distributed algorithms
end-to-end, not just row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_init_spark.functions.compat import round_compat
from cdc_init_spark.plans import query
from cdc_init_spark.tables import load_table

_DAMP = 0.85
_PR_ITERS = 3


def _pagerank_oracle(iters: int) -> str:
    """Unrolled power-iteration PageRank in DuckDB SQL, mirroring
    operators.graph.pagerank exactly (same teleport term, same left
    join back onto the node list)."""
    head = """
    WITH e0 AS (
      SELECT DISTINCT o_custkey AS c, l_suppkey AS s
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ), edges AS (
      SELECT CAST(2 * c AS BIGINT) AS src, CAST(2 * s + 1 AS BIGINT) AS dst FROM e0
      UNION ALL
      SELECT CAST(2 * s + 1 AS BIGINT), CAST(2 * c AS BIGINT) FROM e0
    ), deg AS (
      SELECT src, CAST(COUNT(*) AS DOUBLE) AS outdeg FROM edges GROUP BY src
    ), nodes AS (
      SELECT src AS node FROM edges UNION SELECT dst FROM edges
    ), nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS pr FROM nodes)"""
    steps = []
    for i in range(1, iters + 1):
        steps.append(f"""
    c{i} AS (
      SELECT e.dst AS node, SUM(r.pr / d.outdeg) AS s
      FROM edges e JOIN deg d USING (src) JOIN r{i - 1} r ON r.node = e.src
      GROUP BY e.dst
    ), r{i} AS (
      SELECT nodes.node,
             {1.0 - _DAMP} / (SELECT n FROM nn)
             + {_DAMP} * COALESCE(c{i}.s, 0.0) AS pr
      FROM nodes LEFT JOIN c{i} USING (node)
    )""")
    tail = f"""
    SELECT node, ROUND(pr, 8) AS pr FROM r{iters} ORDER BY node"""
    return head + "," + ",".join(steps) + tail


@query("q157_pagerank", oracle=_pagerank_oracle(_PR_ITERS))
def q157(spark: SparkSession, sf: str) -> DataFrame:
    """EXT graph: 3-iteration PageRank (d=0.85) over the symmetrized
    customer↔supplier purchase graph (operators.graph.pagerank). Edge
    derivation is one orders ⋈ lineitem equi-join + distinct; node ids
    are parity-encoded (2·custkey / 2·suppkey+1) so the two key spaces
    can't collide while every join/agg stays on BIGINT keys (integer
    hashing beats string keys in the per-iteration shuffles). Per
    iteration the plan is exactly one shuffle join (ranks ⋈ edges on
    src) and one partially-aggregated contribution shuffle (by dst) —
    the minimal-movement edge-centric PageRank; symmetrization means no
    dangling mass, so Σ pr = 1. The oracle unrolls the same recurrence
    as three CTE layers in DuckDB and hash-matches all N ranks at 8
    decimals."""
    from cdc_init_spark.operators import graph

    o = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    l = (
        load_table(spark, sf, "lineitem")
        .select("l_orderkey", "l_suppkey")
        # single-row-group fixture file scans as ONE task; spread the
        # CPU-dense self-join fan-out across the machine first
        .repartition(spark.sparkContext.defaultParallelism, F.col("l_orderkey"))
    )
    cs = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    edges = graph.symmetrize(
        cs.select(
            (F.col("o_custkey") * 2).cast("bigint").alias("src"),
            (F.col("l_suppkey") * 2 + 1).cast("bigint").alias("dst"),
        )
    )
    # edge list above is already DISTINCT — skip the operator's dedup shuffle
    pr = graph.pagerank(edges, iters=_PR_ITERS, damping=_DAMP, dedupe=False)
    return pr.select("node", round_compat(F.col("pr"), 8).alias("pr")).orderBy("node")


@query(
    "q158_triangle_count",
    oracle="""
    WITH e0 AS (
      SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
      FROM lineitem l1 JOIN lineitem l2
        ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
    ), deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM (
        SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0
      ) GROUP BY node
    ), tri AS (
      SELECT e1.a, e1.b, e2.b AS c
      FROM e0 e1
      JOIN e0 e2 ON e1.b = e2.a
      JOIN e0 e3 ON e3.a = e1.a AND e3.b = e2.b
    ), pern AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
      ) GROUP BY node
    )
    SELECT p.p_partkey,
           COALESCE(deg.degree, 0) AS degree,
           COALESCE(pern.n_triangles, 0) AS n_triangles
    FROM part p
    LEFT JOIN deg ON deg.node = p.p_partkey
    LEFT JOIN pern ON pern.node = p.p_partkey
    ORDER BY p.p_partkey
    """,
)
def q158(spark: SparkSession, sf: str) -> DataFrame:
    """EXT graph: exact per-part triangle counts over the part
    co-purchase graph (operators.graph.triangles_per_node) — ~20k nodes
    / ~1.2M edges / max degree ~200 at sf0.1, a genuinely sparse graph
    (the supplier projection of the same fixtures is 91%-complete K1000
    with ~124M triangles: a degenerate clique where ANY listing
    algorithm pays output-sized cost — triangle LISTING belongs on
    sparse graphs, cliques want counting formulas). Edges come from a
    lineitem self-equi-join on l_orderkey (per-order fanout bounded by
    order size, never all-pairs). The operator enumerates each triangle
    once at its minimum-(degree, id) pivot — degree-ordered
    orientation, the arboricity-bounded join shape that survives
    power-law hubs at 100 TB — then credits all three corners. The
    oracle counts the same triangles with the naive a<b<c 3-way
    self-join (orientation-free, provably the same set), integer-exact;
    parts in no triangle are kept as zero rows via the dim left-join.
    Physical method: max degree here is ~200, so the bounded-degree
    ``triangles_adjacency`` fast path applies (broadcast adjacency
    arrays + per-edge codegen intersection — NO wedge stream, 38.9 s →
    ~4 s at sf0.1); the orientation form ``triangles_per_node`` is the
    power-law-safe twin, cross-method equality pytest-pinned."""
    from cdc_init_spark.operators import graph

    l = (
        load_table(spark, sf, "lineitem")
        .select("l_orderkey", "l_partkey")
        .repartition(spark.sparkContext.defaultParallelism, F.col("l_orderkey"))
    )
    l2 = l.withColumnRenamed("l_partkey", "p2")
    pairs = (
        l.join(l2, "l_orderkey")
        .filter(F.col("l_partkey") < F.col("p2"))
        .select(F.col("l_partkey").alias("src"), F.col("p2").alias("dst"))
        .distinct()
    )
    deg = (
        pairs.select(F.col("src").alias("node"))
        .unionByName(pairs.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    )
    # pairs is already distinct (a, b) with a < b (the filter above) —
    # skip the operator's no-op canonicalization exchange
    tri = graph.triangles_adjacency(pairs, canonicalize=False)
    p = load_table(spark, sf, "part").select("p_partkey")
    return (
        p.join(deg, p.p_partkey == deg.node, "left")
        .drop("node")
        .join(tri, p.p_partkey == tri.node, "left")
        .drop("node")
        .select(
            "p_partkey",
            F.coalesce("degree", F.lit(0)).cast("bigint").alias("degree"),
            F.coalesce("n_triangles", F.lit(0)).cast("bigint").alias("n_triangles"),
        )
        .orderBy("p_partkey")
    )


@query(
    "q163_hits",
    oracle="""
    WITH e0 AS (
      SELECT DISTINCT o_custkey AS c, l_suppkey AS s
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ), edges AS (
      SELECT CAST(2 * c AS BIGINT) AS src, CAST(2 * s + 1 AS BIGINT) AS dst FROM e0
    ), nodes AS (
      SELECT src AS node FROM edges UNION SELECT dst FROM edges
    ),
    a1 AS (
      SELECT dst AS node, CAST(COUNT(*) AS BIGINT) AS auth FROM edges GROUP BY dst
    ), h1 AS (
      SELECT e.src AS node, SUM(a1.auth) AS hub
      FROM edges e JOIN a1 ON a1.node = e.dst GROUP BY e.src
    ), a2 AS (
      SELECT e.dst AS node, SUM(h1.hub) AS auth
      FROM edges e JOIN h1 ON h1.node = e.src GROUP BY e.dst
    ), h2 AS (
      SELECT e.src AS node, SUM(a2.auth) AS hub
      FROM edges e JOIN a2 ON a2.node = e.dst GROUP BY e.src
    )
    SELECT nodes.node,
           CAST(COALESCE(h2.hub, 0) AS BIGINT) AS hub,
           CAST(COALESCE(a2.auth, 0) AS BIGINT) AS auth
    FROM nodes LEFT JOIN h2 USING (node) LEFT JOIN a2 USING (node)
    ORDER BY node
    """,
)
def q163(spark: SparkSession, sf: str) -> DataFrame:
    """EXT graph: 2-iteration HITS hubs/authorities (Kleinberg, JACM'99;
    operators.graph.hits) over the DIRECTED customer→supplier purchase
    graph — customers are pure hubs, suppliers pure authorities, the
    canonical bipartite HITS setting. Un-normalized power iteration from
    all-ones makes every intermediate an INTEGER (auth₁ = in-degree,
    then alternating integer sums), so the driver hash-check is exact
    with no float rounding anywhere; normalization is a presentation
    step (two scalars) deliberately left out of the algebra. Per update
    the plan is one shuffle join + one partially-aggregated sum — same
    minimal edge-centric movement as q157. The oracle unrolls
    a1→h1→a2→h2 as CTE layers."""
    from cdc_init_spark.operators import graph

    o = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    l = (
        load_table(spark, sf, "lineitem")
        .select("l_orderkey", "l_suppkey")
        # single-row-group fixture file scans as ONE task; spread the
        # CPU-dense self-join fan-out across the machine first
        .repartition(spark.sparkContext.defaultParallelism, F.col("l_orderkey"))
    )
    edges = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).cast("bigint").alias("src"),
            (F.col("l_suppkey") * 2 + 1).cast("bigint").alias("dst"),
        )
        .distinct()
    )
    # edge list above is already DISTINCT — skip the operator's dedup shuffle
    hs = graph.hits(edges, iters=2, dedupe=False)
    return hs.select(
        "node",
        F.col("hub").cast("bigint").alias("hub"),
        F.col("auth").cast("bigint").alias("auth"),
    ).orderBy("node")


@query(
    "q164_khop_bfs",
    oracle="""
    WITH e0 AS (
      SELECT DISTINCT l1.l_suppkey AS a, l2.l_suppkey AS b
      FROM lineitem l1 JOIN lineitem l2
        ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey < l2.l_suppkey
    ), ed AS (
      SELECT a AS src, b AS dst FROM e0 UNION ALL SELECT b, a FROM e0
    ), seeds AS (
      SELECT s_suppkey AS node FROM supplier WHERE s_nationkey = 0
    ), d1 AS (
      SELECT DISTINCT ed.dst AS node FROM ed JOIN seeds ON ed.src = seeds.node
    ), d2 AS (
      SELECT DISTINCT ed.dst AS node FROM ed JOIN d1 ON ed.src = d1.node
    ), reach AS (
      SELECT node, 0 AS hops FROM seeds
      UNION ALL SELECT node, 1 FROM d1
      UNION ALL SELECT node, 2 FROM d2
    )
    SELECT node, MIN(hops) AS hops
    FROM reach GROUP BY node ORDER BY node
    """,
)
def q164(spark: SparkSession, sf: str) -> DataFrame:
    """EXT graph: distributed BFS — minimum-hop distances out to 2 hops
    from the nation-0 supplier seed set over the (symmetrized) supplier
    co-order graph (operators.graph.khop_distances). Each round expands
    only the NEWLY-reached frontier through one shuffle join, then a
    min-aggregate folds rediscoveries — k frontier-sized joins, never a
    transitive-closure blowup; this is the reachability primitive under
    contamination-spread and link-expansion analyses. The oracle unions
    seed/1-hop/2-hop layers and takes MIN(hops); integer-exact."""
    from cdc_init_spark.operators import graph

    l = (
        load_table(spark, sf, "lineitem")
        .select("l_orderkey", "l_suppkey")
        # single-row-group fixture file scans as ONE task; spread the
        # CPU-dense self-join fan-out across the machine first
        .repartition(spark.sparkContext.defaultParallelism, F.col("l_orderkey"))
    )
    l2 = l.withColumnRenamed("l_suppkey", "s2")
    pairs = (
        l.join(l2, "l_orderkey")
        .filter(F.col("l_suppkey") < F.col("s2"))
        .select(F.col("l_suppkey").alias("src"), F.col("s2").alias("dst"))
        .distinct()
    )
    edges = graph.symmetrize(pairs)
    seeds = (
        load_table(spark, sf, "supplier")
        .filter(F.col("s_nationkey") == 0)
        .select(F.col("s_suppkey").alias("node"))
    )
    d = graph.khop_distances(edges, seeds, k=2)
    return d.select("node", F.col("hops").cast("integer").alias("hops")).orderBy(
        "node"
    )


@query(
    "q171_bellman_ford",
    oracle="""
    WITH e0 AS (
      SELECT l1.l_suppkey AS a, l2.l_suppkey AS b,
             COUNT(DISTINCT l1.l_orderkey) AS sh
      FROM lineitem l1 JOIN lineitem l2
        ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey < l2.l_suppkey
      GROUP BY 1, 2
    ), ed AS (
      SELECT a AS src, b AS dst, 6 - LEAST(5, sh) AS w FROM e0
      UNION ALL
      SELECT b, a, 6 - LEAST(5, sh) FROM e0
    ), d0 AS (
      SELECT s_suppkey AS node, CAST(0 AS BIGINT) AS dist
      FROM supplier WHERE s_nationkey = 0
    ), r1 AS (
      SELECT node, MIN(dist) AS dist FROM (
        SELECT ed.dst AS node, d0.dist + ed.w AS dist
        FROM d0 JOIN ed ON ed.src = d0.node
        UNION ALL SELECT node, dist FROM d0
      ) GROUP BY node
    ), r2 AS (
      SELECT node, MIN(dist) AS dist FROM (
        SELECT ed.dst AS node, r1.dist + ed.w AS dist
        FROM r1 JOIN ed ON ed.src = r1.node
        UNION ALL SELECT node, dist FROM r1
      ) GROUP BY node
    ), r3 AS (
      SELECT node, MIN(dist) AS dist FROM (
        SELECT ed.dst AS node, r2.dist + ed.w AS dist
        FROM r2 JOIN ed ON ed.src = r2.node
        UNION ALL SELECT node, dist FROM r2
      ) GROUP BY node
    )
    SELECT node, dist FROM r3 ORDER BY node
    """,
)
def q171(spark: SparkSession, sf: str) -> DataFrame:
    """EXT graph: weighted shortest paths, 3 Bellman-Ford rounds from
    the nation-0 supplier seed set over the supplier co-order graph
    (operators.graph.bellman_ford) — edge weight 6 − min(5, shared
    orders), so strongly-connected suppliers are 'closer'. Each round is
    one shuffle join of the reached set with its out-edges plus one
    partial-aggregated MIN fold — never a transitive closure; integer
    weights make every intermediate engine-exact, so the oracle can
    unroll the identical recurrence. The weighted sibling of q164's BFS."""
    from cdc_init_spark.operators import graph

    l = (
        load_table(spark, sf, "lineitem")
        .select("l_orderkey", "l_suppkey")
        # single-row-group fixture file scans as ONE task; spread the
        # CPU-dense self-join fan-out across the machine first
        .repartition(spark.sparkContext.defaultParallelism, F.col("l_orderkey"))
    )
    l2 = l.withColumnRenamed("l_suppkey", "s2")
    e0 = (
        l.join(l2, "l_orderkey")
        .filter(F.col("l_suppkey") < F.col("s2"))
        .groupBy(F.col("l_suppkey").alias("a"), F.col("s2").alias("b"))
        .agg(F.count_distinct("l_orderkey").alias("sh"))
        .select(
            "a",
            "b",
            (F.lit(6) - F.least(F.lit(5), F.col("sh"))).alias("w"),
        )
    )
    edges = e0.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), "w"
    ).unionByName(
        e0.select(F.col("b").alias("src"), F.col("a").alias("dst"), "w")
    )
    seeds = (
        load_table(spark, sf, "supplier")
        .filter(F.col("s_nationkey") == 0)
        .select(F.col("s_suppkey").alias("node"))
    )
    return graph.bellman_ford(edges, seeds, k=3).orderBy("node")


@query(
    "q172_label_propagation",
    oracle="""
    WITH e0 AS (
      SELECT DISTINCT l1.l_suppkey AS a, l2.l_suppkey AS b
      FROM lineitem l1 JOIN lineitem l2
        ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey < l2.l_suppkey
    ), ed AS (
      SELECT a AS src, b AS dst FROM e0 UNION ALL SELECT b, a FROM e0
    ), nodes AS (
      SELECT DISTINCT src AS node FROM ed
    ), l0 AS (
      SELECT node, CAST(node AS BIGINT) AS label FROM nodes
    ), n1 AS (
      SELECT node, label, COUNT(*) AS c FROM (
        SELECT ed.dst AS node, l0.label
        FROM l0 JOIN ed ON ed.src = l0.node
        UNION ALL SELECT node, label FROM l0
      ) GROUP BY 1, 2
    ), b1 AS (
      SELECT node, label AS new_label FROM (
        SELECT node, label,
               ROW_NUMBER() OVER (PARTITION BY node
                                  ORDER BY c DESC, label) AS rk
        FROM n1
      ) WHERE rk = 1
    ), l1 AS (
      SELECT l0.node, COALESCE(b1.new_label, l0.label) AS label
      FROM l0 LEFT JOIN b1 ON l0.node = b1.node
    ), n2 AS (
      SELECT node, label, COUNT(*) AS c FROM (
        SELECT ed.dst AS node, l1.label
        FROM l1 JOIN ed ON ed.src = l1.node
        UNION ALL SELECT node, label FROM l1
      ) GROUP BY 1, 2
    ), b2 AS (
      SELECT node, label AS new_label FROM (
        SELECT node, label,
               ROW_NUMBER() OVER (PARTITION BY node
                                  ORDER BY c DESC, label) AS rk
        FROM n2
      ) WHERE rk = 1
    ), l2_ AS (
      SELECT l1.node, COALESCE(b2.new_label, l1.label) AS label
      FROM l1 LEFT JOIN b2 ON l1.node = b2.node
    )
    SELECT node, label FROM l2_ ORDER BY node
    """,
)
def q172(spark: SparkSession, sf: str) -> DataFrame:
    """EXT graph: deterministic synchronous label-propagation community
    detection, 2 rounds over the symmetrized supplier co-order graph
    (operators.graph.label_propagation) — each node adopts the most
    frequent label among its neighbors and itself (self-vote damps
    synchronous oscillation), smallest label on ties (the determinism
    that makes LPA engine-checkable). Per round: one
    labels ⋈ edges shuffle join, one map-side-combined (node, label)
    count, one partial-aggregable max_by argmax — no window over the
    edge stream. Communities seed corpus-weighting and dedup-cluster
    diagnostics; q103's connected components are the τ→0 limit."""
    from cdc_init_spark.operators import graph

    l = (
        load_table(spark, sf, "lineitem")
        .select("l_orderkey", "l_suppkey")
        # single-row-group fixture file scans as ONE task; spread the
        # CPU-dense self-join fan-out across the machine first
        .repartition(spark.sparkContext.defaultParallelism, F.col("l_orderkey"))
    )
    l2 = l.withColumnRenamed("l_suppkey", "s2")
    pairs = (
        l.join(l2, "l_orderkey")
        .filter(F.col("l_suppkey") < F.col("s2"))
        .select(F.col("l_suppkey").alias("src"), F.col("s2").alias("dst"))
        .distinct()
    )
    edges = graph.symmetrize(pairs)
    return graph.label_propagation(edges, iters=2).orderBy("node")
