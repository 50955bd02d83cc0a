"""Relational corpus: scans, projections, filters, joins, aggregations,
sort/limit/top-k, set ops (SURVEY §2.2 B-I..B-VII, §2.3 Q01-Q41).

Scale notes apply to every query here:
- filters/projections are plain column expressions → Catalyst pushes them
  into the parquet scan (PushedFilters / ReadSchema);
- small-dimension joins are explicitly ``broadcast()``;
- fact-fact joins shuffle on their equi-keys and rely on AQE for skew;
- aggregations are partial (map-side) + final hash aggregates by default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_init_spark.functions.compat import round_compat
from cdc_init_spark.plans import query
from cdc_init_spark.tables import load_table


# --- B-I / B-II: scan, project, filter -----------------------------------

@query(
    "q01_scan_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem ORDER BY l_orderkey, l_linenumber
    """,
)
def q01(spark: SparkSession, sf: str) -> DataFrame:
    """S1+P1: parquet scan with column projection (reference A18/A17 —
    seed_store.clj:107-110 generalized). Column pruning reaches the scan."""
    li = load_table(spark, sf, "lineitem")
    # no Spark-side global sort: the compare is order-insensitive and a
    # full-output sort is pure shuffle cost at scale (oracle keeps ORDER BY
    # as the declared deterministic form)
    return li.select("l_orderkey", "l_linenumber", "l_quantity")


@query(
    "q02_computed_column",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 4) AS charge
    FROM lineitem ORDER BY l_orderkey, l_linenumber
    """,
)
def q02(spark: SparkSession, sf: str) -> DataFrame:
    """P2: derived column (reference A19/A24 — computed fields on rows)."""
    li = load_table(spark, sf, "lineitem")
    charge = round_compat(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")), 4
    ).alias("charge")
    return li.select("l_orderkey", "l_linenumber", charge)


@query(
    "q03_filter_in",
    oracle="""
    SELECT o_orderkey FROM orders
    WHERE o_orderstatus IN ('F','O') ORDER BY o_orderkey
    """,
)
def q03(spark: SparkSession, sf: str) -> DataFrame:
    """P3: IN-set filter (reference A3 status filter, initializer.clj:21-22)."""
    o = load_table(spark, sf, "orders")
    return (
        o.filter(F.col("o_orderstatus").isin("F", "O"))
        .select("o_orderkey")
        .orderBy("o_orderkey")
    )


@query(
    "q04_filter_range_like",
    oracle="""
    SELECT p_partkey FROM part
    WHERE p_size BETWEEN 5 AND 15 AND p_type LIKE '%ECO%'
    ORDER BY p_partkey
    """,
)
def q04(spark: SparkSession, sf: str) -> DataFrame:
    """P4: range + LIKE compound predicate; pushed to the parquet scan."""
    p = load_table(spark, sf, "part")
    return (
        p.filter(F.col("p_size").between(5, 15) & F.col("p_type").like("%ECO%"))
        .select("p_partkey")
        .orderBy("p_partkey")
    )


@query(
    "q05_null_predicates",
    oracle="""
    SELECT event_id FROM events
    WHERE props IS NULL OR props = '' ORDER BY event_id
    """,
)
def q05(spark: SparkSession, sf: str) -> DataFrame:
    """P5: NULL predicates (reference value domain includes nil,
    seed_store_test.clj:29)."""
    e = load_table(spark, sf, "events")
    return (
        e.filter(F.col("props").isNull() | (F.col("props") == ""))
        .select("event_id")
        .orderBy("event_id")
    )


@query(
    "q06_case_when",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 100000 THEN 'big'
                WHEN o_totalprice > 10000 THEN 'mid'
                ELSE 'small' END AS bucket
    FROM orders ORDER BY o_orderkey
    """,
)
def q06(spark: SparkSession, sf: str) -> DataFrame:
    """P6: CASE/conditional (reference A9 branch logic, core.clj:84-95)."""
    o = load_table(spark, sf, "orders")
    bucket = (
        F.when(F.col("o_totalprice") > 100000, "big")
        .when(F.col("o_totalprice") > 10000, "mid")
        .otherwise("small")
        .alias("bucket")
    )
    return o.select("o_orderkey", bucket).orderBy("o_orderkey")


# --- B-III: joins ---------------------------------------------------------

@query(
    "q10_inner_join_agg",
    oracle="""
    SELECT c.c_custkey, COUNT(*) AS n
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey ORDER BY c.c_custkey
    """,
)
def q10(spark: SparkSession, sf: str) -> DataFrame:
    """J1: shuffle equi-join + grouped count. At scale both sides shuffle on
    the key; AQE handles skew. The count is a partial agg before the final."""
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "inner")
        .groupBy(c.c_custkey)
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("c_custkey")
    )


@query(
    "q11_broadcast_join",
    oracle="""
    SELECT n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey
    ORDER BY n_name, r_name
    """,
)
def q11(spark: SparkSession, sf: str) -> DataFrame:
    """J2: broadcast hash join — region is tiny, so it ships to every
    executor and the join is shuffle-free (the 100 TB-safe dim-join shape)."""
    n = load_table(spark, sf, "nation")
    r = load_table(spark, sf, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("n_name", "r_name")
        .orderBy("n_name", "r_name")
    )


@query(
    "q12_left_join",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    ORDER BY c.c_custkey, o.o_orderkey
    """,
)
def q12(spark: SparkSession, sf: str) -> DataFrame:
    """J3: left outer join (customers with no orders survive as NULLs)."""
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .select(c.c_custkey, o.o_orderkey)
        .orderBy("c_custkey", "o_orderkey")
    )


@query(
    "q12_full_join",
    oracle="""
    SELECT s.s_suppkey, n.n_nationkey
    FROM supplier s FULL JOIN nation n ON s.s_nationkey = n.n_nationkey
    ORDER BY s.s_suppkey, n.n_nationkey
    """,
)
def q12_full(spark: SparkSession, sf: str) -> DataFrame:
    """J3 twin: full outer join."""
    s = load_table(spark, sf, "supplier")
    n = load_table(spark, sf, "nation")
    return (
        s.join(n, s.s_nationkey == n.n_nationkey, "full")
        .select(s.s_suppkey, n.n_nationkey)
        .orderBy("s_suppkey", "n_nationkey")
    )


@query(
    "q13_semi_join",
    oracle="""
    SELECT c_custkey FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY c_custkey
    """,
)
def q13(spark: SparkSession, sf: str) -> DataFrame:
    """J4: left semi join (EXISTS)."""
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


@query(
    "q13_anti_join",
    oracle="""
    SELECT c_custkey FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY c_custkey
    """,
)
def q13_anti(spark: SparkSession, sf: str) -> DataFrame:
    """J4 twin: left anti join (NOT EXISTS)."""
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


@query(
    "q14_range_self_join",
    oracle="""
    SELECT e1.event_id AS e1_id, e2.event_id AS e2_id
    FROM events e1 JOIN events e2
      ON e1.user_id = e2.user_id
     AND e2.ts > e1.ts
     AND e2.ts <= e1.ts + INTERVAL 5 MINUTE
    ORDER BY e1_id, e2_id
    """,
)
def q14(spark: SparkSession, sf: str) -> DataFrame:
    """J5/J8: range/interval join. The equi-key (user_id) carries the
    shuffle; the range predicates evaluate post-join — so this stays a
    sort-merge join, never a nested-loop cross product, at any scale."""
    e = load_table(spark, sf, "events")
    e1 = e.alias("e1")
    e2 = e.alias("e2")
    cond = (
        (F.col("e1.user_id") == F.col("e2.user_id"))
        & (F.col("e2.ts") > F.col("e1.ts"))
        & (F.col("e2.ts") <= F.col("e1.ts") + F.expr("INTERVAL 5 MINUTES"))
    )
    return (
        e1.join(e2, cond)
        .select(
            F.col("e1.event_id").alias("e1_id"), F.col("e2.event_id").alias("e2_id")
        )
        .orderBy("e1_id", "e2_id")
    )


@query(
    "q15_cross_join",
    oracle="""
    SELECT r1.r_name AS r1_name, r2.r_name AS r2_name
    FROM region r1 CROSS JOIN region r2 ORDER BY r1_name, r2_name
    """,
)
def q15(spark: SparkSession, sf: str) -> DataFrame:
    """J6: cross join (tiny dims only — guarded by design elsewhere)."""
    r = load_table(spark, sf, "region")
    r1 = r.alias("r1")
    r2 = r.alias("r2")
    return (
        r1.crossJoin(r2)
        .select(
            F.col("r1.r_name").alias("r1_name"), F.col("r2.r_name").alias("r2_name")
        )
        .orderBy("r1_name", "r2_name")
    )


@query(
    "q16_asof_join",
    oracle="""
    SELECT o.o_orderkey, max_by(e.event_id, e.ts) AS last_event_id
    FROM orders o
    LEFT JOIN events e
      ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate
    GROUP BY o.o_orderkey ORDER BY o.o_orderkey
    """,
)
def q16(spark: SparkSession, sf: str) -> DataFrame:
    """J7: as-of join — for each order, the latest event of that customer
    at-or-before the order date. Implemented as equi-join (shuffle on the
    customer key) + range filter + max_by aggregation: the 100 TB-safe
    form, since the heavy work is a keyed shuffle, not a sort across the
    whole fact table. See operators.asof for the generic operator."""
    o = load_table(spark, sf, "orders")
    e = load_table(spark, sf, "events")
    cond = (e.user_id == o.o_custkey) & (e.ts <= o.o_orderdate)
    return (
        o.join(e, cond, "left")
        .groupBy(o.o_orderkey)
        .agg(F.max_by(e.event_id, e.ts).alias("last_event_id"))
        .orderBy("o_orderkey")
    )


# --- B-IV: aggregations ---------------------------------------------------

@query("q20_count_star", oracle="SELECT COUNT(*) AS n FROM lineitem")
def q20(spark: SparkSession, sf: str) -> DataFrame:
    """G1: COUNT(*) (reference A16 record_count.sql verbatim, on fixtures)."""
    li = load_table(spark, sf, "lineitem")
    return li.agg(F.count(F.lit(1)).alias("n"))


@query(
    "q21_grouped_agg_having",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    HAVING COUNT(*) > 0
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q21(spark: SparkSession, sf: str) -> DataFrame:
    """G2+G8: TPC-H Q1 shape — partial+final hash agg, HAVING as post-agg
    filter (reference A22 running count generalized)."""
    li = load_table(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            round_compat(F.sum("l_quantity"), 2).alias("sum_qty"),
            round_compat(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            round_compat(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .filter(F.col("count_order") > 0)
        .orderBy("l_returnflag", "l_linestatus")
    )


@query("q22_count_distinct", oracle="SELECT COUNT(DISTINCT o_custkey) AS n FROM orders")
def q22(spark: SparkSession, sf: str) -> DataFrame:
    """G3: exact COUNT(DISTINCT) — expands to a two-stage agg in Spark."""
    o = load_table(spark, sf, "orders")
    return o.agg(F.count_distinct(F.col("o_custkey")).alias("n"))


@query(
    "q23_last_state_per_key",
    oracle="""
    SELECT user_id, max_by(event_type, ts) AS last_type
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def q23(spark: SparkSession, sf: str) -> DataFrame:
    """G5: last-value-per-key — the reference's log-compaction semantics
    (A2, initializer.clj:37 + topic_store.clj:15) as a batch max_by.
    Per-user ts is unique in fixtures (FIXTURES.md), so no tie ambiguity."""
    e = load_table(spark, sf, "events")
    return (
        e.groupBy("user_id")
        .agg(F.max_by("event_type", "ts").alias("last_type"))
        .orderBy("user_id")
    )


@query(
    "q24_rollup",
    oracle="""
    SELECT n_regionkey, n_nationkey, COUNT(*) AS n
    FROM nation GROUP BY ROLLUP(n_regionkey, n_nationkey)
    ORDER BY n_regionkey NULLS FIRST, n_nationkey NULLS FIRST, n
    """,
)
def q24(spark: SparkSession, sf: str) -> DataFrame:
    """G6: ROLLUP grouping sets."""
    n = load_table(spark, sf, "nation")
    return (
        n.rollup("n_regionkey", "n_nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(
            F.asc_nulls_first("n_regionkey"), F.asc_nulls_first("n_nationkey"), "n"
        )
    )


@query(
    "q24_cube",
    oracle="""
    SELECT n_regionkey, n_nationkey, COUNT(*) AS n,
           grouping(n_regionkey) AS g_r, grouping(n_nationkey) AS g_n
    FROM nation GROUP BY CUBE(n_regionkey, n_nationkey)
    ORDER BY n_regionkey NULLS FIRST, n_nationkey NULLS FIRST, n
    """,
)
def q24_cube(spark: SparkSession, sf: str) -> DataFrame:
    """G6 twin: CUBE grouping sets with grouping() indicators (disambiguate
    real NULL keys from subtotal rows)."""
    n = load_table(spark, sf, "nation")
    return (
        n.cube("n_regionkey", "n_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.grouping("n_regionkey").cast("bigint").alias("g_r"),
            F.grouping("n_nationkey").cast("bigint").alias("g_n"),
        )
        .orderBy(
            F.asc_nulls_first("n_regionkey"), F.asc_nulls_first("n_nationkey"), "n"
        )
    )


@query(
    "q144_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS revenue,
           CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority)
                AS BIGINT) AS gid
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def q144(spark: SparkSession, sf: str) -> DataFrame:
    """G6 completion: arbitrary GROUPING SETS — two *disjoint* grouping
    sets (one by status, one by priority), which neither ROLLUP (q24)
    nor CUBE (q24_cube) can express. Spark expands the sets with a
    single Expand node feeding ONE hash aggregate — the input is read
    once however many sets there are (vs. N scans + UNION ALL that a
    naive engine would run). The explicit grouping() bits disambiguate
    subtotal NULLs from data NULLs, mirrored bit-for-bit in the oracle."""
    o = load_table(spark, sf, "orders")
    g_status = F.grouping("o_orderstatus").cast("bigint")
    g_prio = F.grouping("o_orderpriority").cast("bigint")
    return (
        o.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"]],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            round_compat(F.sum("o_totalprice"), 2).alias("revenue"),
            (g_status * 2 + g_prio).alias("gid"),
        )
        .orderBy(
            "gid",
            F.asc_nulls_first("o_orderstatus"),
            F.asc_nulls_first("o_orderpriority"),
        )
    )


@query(
    "q25_collect_list_ordered",
    oracle="""
    SELECT o_custkey,
           string_agg(o_orderpriority, ',' ORDER BY o_orderpriority) AS priorities
    FROM orders GROUP BY o_custkey ORDER BY o_custkey
    """,
)
def q25(spark: SparkSession, sf: str) -> DataFrame:
    """G7: ordered collect_list — sort_array makes the aggregation result
    deterministic regardless of shuffle arrival order."""
    o = load_table(spark, sf, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.array_join(F.sort_array(F.collect_list("o_orderpriority")), ",").alias(
                "priorities"
            )
        )
        .orderBy("o_custkey")
    )


# --- B-VI: sort / limit / top-k ------------------------------------------

@query(
    "q35_multikey_sort",
    oracle="""
    SELECT o_orderkey FROM orders
    ORDER BY o_orderdate DESC, o_totalprice ASC, o_orderkey
    """,
)
def q35(spark: SparkSession, sf: str) -> DataFrame:
    """O1: global multi-key sort (reference A7, initializer.clj:97). Spark
    range-partitions on sampled bounds — scales to any size."""
    o = load_table(spark, sf, "orders")
    return o.orderBy(
        F.col("o_orderdate").desc(), F.col("o_totalprice").asc(), F.col("o_orderkey")
    ).select("o_orderkey")


@query(
    "q36_topk",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 4) AS charge
    FROM lineitem
    ORDER BY l_extendedprice * (1 - l_discount) * (1 + l_tax) DESC,
             l_orderkey, l_linenumber
    LIMIT 20
    """,
)
def q36(spark: SparkSession, sf: str) -> DataFrame:
    """O2: top-k — orderBy().limit(k) compiles to TakeOrderedAndProject:
    each partition keeps k rows, driver merges; no global sort at scale."""
    li = load_table(spark, sf, "lineitem")
    charge_raw = F.col("l_extendedprice") * (1 - F.col("l_discount")) * (
        1 + F.col("l_tax")
    )
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            round_compat(charge_raw, 4).alias("charge"),
            charge_raw.alias("_charge_raw"),
        )
        .orderBy(F.col("_charge_raw").desc(), "l_orderkey", "l_linenumber")
        .limit(20)
        .drop("_charge_raw")
    )


@query(
    "q37_per_group_topk",
    oracle="""
    SELECT o_custkey, o_orderkey, rn FROM (
      SELECT o_custkey, o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 3 ORDER BY o_custkey, rn
    """,
)
def q37(spark: SparkSession, sf: str) -> DataFrame:
    """O3: per-group top-k via window rank + filter. One shuffle on the
    group key; the rank filter is applied before any further stage."""
    from pyspark.sql.window import Window

    o = load_table(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey", "o_orderkey", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


# --- B-VII: set operations ------------------------------------------------

@query(
    "q40_union_all",
    oracle="""
    SELECT c_nationkey AS k FROM customer
    UNION ALL SELECT s_nationkey FROM supplier ORDER BY k
    """,
)
def q40(spark: SparkSession, sf: str) -> DataFrame:
    """U1: UNION ALL — a zero-shuffle concatenation of lineages."""
    c = load_table(spark, sf, "customer")
    s = load_table(spark, sf, "supplier")
    return (
        c.select(F.col("c_nationkey").alias("k"))
        .unionByName(s.select(F.col("s_nationkey").alias("k")))
        .orderBy("k")
    )


@query(
    "q40_union_distinct",
    oracle="""
    SELECT c_nationkey AS k FROM customer
    UNION SELECT s_nationkey FROM supplier ORDER BY k
    """,
)
def q40_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """U1 twin: UNION (distinct) — dedup via hash aggregate on the key."""
    c = load_table(spark, sf, "customer")
    s = load_table(spark, sf, "supplier")
    return (
        c.select(F.col("c_nationkey").alias("k"))
        .unionByName(s.select(F.col("s_nationkey").alias("k")))
        .distinct()
        .orderBy("k")
    )


@query(
    "q41_intersect",
    oracle="""
    SELECT n_nationkey AS k FROM nation
    INTERSECT SELECT c_nationkey FROM customer ORDER BY k
    """,
)
def q41(spark: SparkSession, sf: str) -> DataFrame:
    """U2: INTERSECT (distinct) — left-semi join under the hood."""
    n = load_table(spark, sf, "nation")
    c = load_table(spark, sf, "customer")
    return (
        n.select(F.col("n_nationkey").alias("k"))
        .intersect(c.select(F.col("c_nationkey").alias("k")))
        .orderBy("k")
    )


@query(
    "q41_except",
    oracle="""
    SELECT n_nationkey AS k FROM nation
    EXCEPT SELECT c_nationkey FROM customer ORDER BY k
    """,
)
def q41_except(spark: SparkSession, sf: str) -> DataFrame:
    """U2 twin: EXCEPT (distinct) — left-anti join under the hood."""
    n = load_table(spark, sf, "nation")
    c = load_table(spark, sf, "customer")
    return (
        n.select(F.col("n_nationkey").alias("k"))
        .subtract(c.select(F.col("c_nationkey").alias("k")))
        .orderBy("k")
    )
