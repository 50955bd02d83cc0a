"""Physical-plan shape assertions: the optimizations we rely on must
actually appear in the plan (pushdown reaching the scan, broadcast joins
staying broadcast, top-k compiling to TakeOrderedAndProject, partial
aggregation before the exchange). Guards against silent plan regressions.
"""

from __future__ import annotations

import pytest

from cdc_init_spark.plans import QUERIES


def plan_of(spark, sf_dir, name: str) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        QUERIES[name](spark, sf_dir).explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    """q03/q04 predicates must appear as PushedFilters on the parquet scan."""
    p = plan_of(spark, sf_dir, "q03_filter_in")
    assert "PushedFilters" in p and "In(o_orderstatus, [F,O])" in p
    p4 = plan_of(spark, sf_dir, "q04_filter_range_like")
    assert "GreaterThanOrEqual(p_size,5)" in p4
    assert "LessThanOrEqual(p_size,15)" in p4
    assert "StringContains(p_type,ECO)" in p4


def test_column_pruning(spark, sf_dir):
    """q01 projects 3 of 11 lineitem columns — ReadSchema must be pruned."""
    p = plan_of(spark, sf_dir, "q01_scan_project")
    assert "l_orderkey" in p.split("ReadSchema")[1][:200]
    assert "l_extendedprice" not in p.split("ReadSchema")[1][:300]


def test_broadcast_join_is_broadcast(spark, sf_dir):
    p = plan_of(spark, sf_dir, "q11_broadcast_join")
    assert "BroadcastHashJoin" in p or "BroadcastExchange" in p


def test_topk_is_take_ordered(spark, sf_dir):
    """q36 orderBy+limit must compile to TakeOrderedAndProject, not a
    global sort."""
    p = plan_of(spark, sf_dir, "q36_topk")
    assert "TakeOrderedAndProject" in p


def test_grouped_agg_is_partial(spark, sf_dir):
    """q21 must do map-side partial aggregation before the exchange."""
    p = plan_of(spark, sf_dir, "q21_grouped_agg_having")
    assert "partial_sum" in p or "partial_count" in p


def test_semi_anti_join_forms(spark, sf_dir):
    p = plan_of(spark, sf_dir, "q13_semi_join")
    assert "LeftSemi" in p
    p = plan_of(spark, sf_dir, "q13_anti_join")
    assert "LeftAnti" in p


def test_range_join_stays_equi(spark, sf_dir):
    """q14's equi-key must carry the join (sort-merge/shuffle-hash), with
    the range predicates as post-join conditions — never a nested-loop
    cross product."""
    p = plan_of(spark, sf_dir, "q14_range_self_join")
    # any HASH-family equi join is fine (broadcast at tiny SF, sort-merge/
    # shuffled-hash at scale) — what must never appear is a nested loop
    assert (
        "SortMergeJoin" in p
        or "ShuffledHashJoin" in p
        or "BroadcastHashJoin" in p
    )
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_whole_stage_codegen_in_hot_paths(spark, sf_dir):
    """The scan→project pipeline of q02 must compile into at least one
    WholeStageCodegen subtree (explain('codegen') reports the spans;
    the pre-execution AQE 'formatted' plan does not)."""
    import contextlib
    import io

    # AQE-wrapped plans report 0 subtrees before execution — disable it
    # for this inspection only
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            QUERIES["q02_computed_column"](spark, sf_dir).explain("codegen")
        p = buf.getvalue()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    n = int(p.split("Found ")[1].split(" WholeStageCodegen")[0])
    assert n >= 1


def test_q86_semi_join_with_non_equi_conjunct(spark, sf_dir):
    """q86's EXISTS must stay a hash-family LeftSemi (equi key carries the
    join; shipped-after-ordered is a post-join condition), never a loop."""
    p = plan_of(spark, sf_dir, "q86_order_priority_check")
    assert "LeftSemi" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_q88_dims_broadcast(spark, sf_dir):
    """q88's 8-way star join: every dimension side must broadcast — the
    fact table shuffles at most on its own join keys."""
    p = plan_of(spark, sf_dir, "q88_market_share")
    assert p.count("BroadcastHashJoin") >= 4


def test_q91_decorrelated_threshold_no_cartesian(spark, sf_dir):
    """q91's correlated-subquery decorrelation must stay equi-join-only
    with partial aggregation on the threshold side."""
    p = plan_of(spark, sf_dir, "q91_small_quantity_revenue")
    assert "CartesianProduct" not in p
    assert "partial_avg" in p or "partial_sum" in p


def test_q93_anti_join(spark, sf_dir):
    """q93's NOT EXISTS is a LeftAnti; the scalar-average side is a
    one-row broadcast (a nested-loop there is correct and O(rows))."""
    p = plan_of(spark, sf_dir, "q93_dormant_customers")
    assert "LeftAnti" in p

def test_q94_supply_agg_shared_no_cartesian(spark, sf_dir):
    """q94's decorrelated MIN-cost subquery: equi joins only (the
    (partkey, cost) join back must never degrade to a loop), with
    partial aggregation on the supply relation."""
    p = plan_of(spark, sf_dir, "q94_min_cost_supplier")
    assert "CartesianProduct" not in p
    assert "partial_min" in p


def test_q95_star_join_broadcasts_dims(spark, sf_dir):
    """q95's 5-table join: part/supplier/nation broadcast; the only
    shuffle-worthy join is lineitem-orders."""
    p = plan_of(spark, sf_dir, "q95_product_type_profit")
    assert p.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in p


def test_q98_not_in_is_broadcast_anti(spark, sf_dir):
    """q98's NOT-IN exclusion must be a broadcast LeftAnti on the tiny
    complaint list, and count-distinct must expand to a two-stage agg
    (partial on the distinct keys)."""
    p = plan_of(spark, sf_dir, "q98_supplier_part_types")
    assert "LeftAnti" in p
    assert "partial_count" in p


def test_q100_semi_anti_self_joins(spark, sf_dir):
    """q100 (Q21 shape): the EXISTS/NOT-EXISTS pair must be one LeftSemi
    + one LeftAnti on the order key — the supplier inequality rides as a
    join condition, never a cross product over lineitem x lineitem."""
    p = plan_of(spark, sf_dir, "q100_waiting_orders")
    assert "LeftSemi" in p
    assert "LeftAnti" in p
    assert "CartesianProduct" not in p


def test_q101_neighbor_block_is_equi_join(spark, sf_dir):
    """The neighbor-id candidate block must be an equi join (offset
    explode + semi join), never a BroadcastNestedLoopJoin on the range
    condition — a range join would be quadratic at scale."""
    p = plan_of(spark, sf_dir, "q101_ngram_jaccard")
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert "LeftSemi" in p


def test_q102_minhash_portable_partial_agg(spark, sf_dir):
    """The 16-way min-signature aggregate must be partial+final (map-side
    combine collapses each doc before the shuffle) and the bucket
    self-join must stay an equi SortMerge/Hash join."""
    p = plan_of(spark, sf_dir, "q102_minhash_portable")
    assert "partial_min" in p
    assert "CartesianProduct" not in p


def test_q103_clusters_edge_plan(spark, sf_dir):
    """q103's edge derivation (the part visible before the adaptive
    union-find/label-prop choice) keeps the equi-join blocking shape."""
    p = plan_of(spark, sf_dir, "q103_dedup_clusters")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_q105_simhash_portable_partial_agg(spark, sf_dir):
    """The 32-bit vote aggregate must be map-side combined; Hamming
    blocking must join on (block, slice) keys, no cross product."""
    p = plan_of(spark, sf_dir, "q105_simhash_portable")
    assert "partial_sum" in p
    assert "CartesianProduct" not in p


def test_q106_cosine_neighbors_equi_join(spark, sf_dir):
    """The embedding neighbor block must be equi-join shaped; the
    per-vector norm projection must appear below the pair join (norms
    computed |ids| times, not |pairs| times)."""
    p = plan_of(spark, sf_dir, "q106_cosine_neighbors")
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_q144_grouping_sets_single_expand(spark, sf_dir):
    """q144's two grouping sets must compile to ONE Expand feeding one
    hash aggregate — a single input scan, not N scans + union."""
    p = plan_of(spark, sf_dir, "q144_grouping_sets")
    assert p.count("Expand") >= 1
    assert "Union" not in p


def test_q145_bm25_no_cartesian_and_term_filter_early(spark, sf_dir):
    """BM25's only nested-loop is the single-row stats broadcast; the
    query-term IN filter must run before the (doc, term) aggregate so
    non-matching tokens never reach a shuffle."""
    p = plan_of(spark, sf_dir, "q145_bm25")
    assert "CartesianProduct" not in p
    assert "BroadcastExchange" in p  # dfreq + stats come back broadcast


def test_q149_sessionize_one_data_exchange(spark, sf_dir):
    """lag, running sum, and the session aggregate must all share the
    user_id hash partitioning: exactly one hashpartitioning exchange
    (the final ORDER BY adds a range exchange, nothing else)."""
    import re

    df = QUERIES["q149_sessionize"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_q147_inverted_index_caps_before_collect(spark, sf_dir):
    """The posting cap (row_number <= 32) must be computed by a Window
    BEFORE the collect_list aggregate — the plan carries a Window node
    and the aggregate consumes its output, so no unbounded list forms."""
    p = plan_of(spark, sf_dir, "q147_inverted_index")
    assert "Window" in p
    assert "CartesianProduct" not in p


def test_q150_salted_join_no_cartesian(spark, sf_dir):
    """The salt-replicated dim joins on (key, salt) as a plain equi-join."""
    p = plan_of(spark, sf_dir, "q150_salted_join")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoop" not in p


def test_triangles_adjacency_broadcasts_and_intersects(spark, sf_dir):
    """q158's fast path: the adjacency relation must broadcast (no
    shuffle of the per-edge intersect stream) and the per-edge triangle
    count must be the codegen array_intersect, not a wedge join."""
    p = plan_of(spark, sf_dir, "q158_triangle_count")
    assert "BroadcastHashJoin" in p
    assert "array_intersect" in p


def test_sliding_distinct_is_sharded_not_global_window(spark, sf_dir):
    """q179 must run as the bucket-sharded Arrow sweep — a grouped-map
    (FlatMapGroupsInPandas), with NO Window operator anywhere (the
    single-sort global RANGE window is exactly what the operator
    replaces)."""
    p = plan_of(spark, sf_dir, "q179_sliding_distinct")
    assert "FlatMapGroupsInPandas" in p
    assert "Window" not in p


def test_temperature_mix_is_narrow_broadcast(spark, sf_dir):
    """q168: membership must be a broadcast-joined filter — no
    SortMergeJoin/shuffle of the document stream."""
    p = plan_of(spark, sf_dir, "q168_temperature_mix")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_sparse_cosine_pairs_partial_aggregates(spark, sf_dir):
    """q166: the (doc_a, doc_b) dot-product aggregate must be partial
    (map-side combine before the pair exchange)."""
    p = plan_of(spark, sf_dir, "q166_tfidf_cosine_pairs")
    assert "partial_sum" in p


@pytest.mark.parametrize(
    "name",
    ["q30_rank", "q31_lag_lead", "q32_running_sum", "q34_range_frame"],
)
def test_window_family_is_hash_partitioned(spark, sf_dir, name):
    """W1-W3/W5 (first driver-checked in round 3): every window must run
    over a hash-partitioned exchange on its PARTITION BY key — a window
    with an empty partition spec forces all rows through ONE sort task
    (the q182-exact shape), which is exactly what these operators must
    not do at 100 TB. (W4 q33 is excluded: global ntile/percent_rank/
    cume_dist IS a global total order by definition — its documented
    scale path is the rank/quantile sketch, q74_approx/q182_approx.)"""
    p = plan_of(spark, sf_dir, name)
    assert "Window" in p
    assert "hashpartitioning" in p
    assert "SinglePartition" not in p, name


@pytest.mark.parametrize(
    "name",
    ["q55_tumbling_window", "q56_sliding_window", "q57_session_window"],
)
def test_temporal_windows_shuffle_on_window_key(spark, sf_dir, name):
    """T2-T4 batch twins (first driver-checked in round 3): the windowed
    aggregate must exchange on the (window/session, key) grouping — never
    a global single-partition plan; session windows may sort within the
    user partition only."""
    p = plan_of(spark, sf_dir, name)
    assert "hashpartitioning" in p
    assert "SinglePartition" not in p, name
