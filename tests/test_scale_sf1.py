"""Opt-in 10x scale step (VERDICT r3 "Next round" item 4): run the
heaviest corpus queries at sf1.0 (deterministic 10x tiling of the
driver's sf0.1 testdata — tools/gen_scale_fixtures.py) and assert each
grows no worse than ~12x over its sf0.1 time (linear data growth plus
shuffle/scheduler overhead). A quadratic term the static plan audit
cannot prove absent — a blocked pair join whose blocks merge, a window
whose blocking width scales with data — shows up here as a blown ratio.

    SPARK_GRAFT_SF1=1 python -m pytest tests/test_scale_sf1.py -x -q -s

Writes tools/scale_ratios.json (the table BASELINE.md cites).
"""

from __future__ import annotations

import json
import os
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, ".scale", "sf1.0")
WARM = "/root/testdata/sf0.001"
N_HEAVIEST = 25
MAX_RATIO = 12.0
# sub-second sf0.1 queries are scheduler-floor-bound; the ratio
# denominator gets this floor so a 0.2 s -> 1.5 s query (pure task-count
# overhead at 10x partitions) does not read as a fake 7.5x blowup
FLOOR_SEC = 1.0

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SF1") != "1",
    reason="10x scale ratios are opt-in (SPARK_GRAFT_SF1=1); last green run "
    "recorded in tools/scale_ratios.json and BASELINE.md",
)


def _heaviest(n: int) -> list[str]:
    from cdc_init_spark.plans import QUERIES

    with open(os.path.join(REPO, "BENCH.json")) as f:
        timings = json.load(f).get("queries", {})
    ranked = sorted(
        (name for name in QUERIES if timings.get(name, -1) > 0),
        key=lambda q: -timings[q],
    )
    assert len(ranked) >= n, "BENCH.json too sparse to rank the corpus"
    return ranked[:n]


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _time(spark, fn, sf_dir: str, runs: int = 1) -> float:
    best = None
    for _ in range(runs):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        _materialize(fn(spark, sf_dir))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def test_sf1_scale_ratios(spark):
    from cdc_init_spark.plans import QUERIES

    if not os.path.isdir(SF1):
        from tools.gen_scale_fixtures import main as gen

        gen()
    names = _heaviest(N_HEAVIEST)
    rows, bad = {}, []
    for name in names:
        fn = QUERIES[name]
        _materialize(fn(spark, WARM))  # steady-state: codegen compiled
        t01 = _time(spark, fn, SF01, runs=2)
        t1 = _time(spark, fn, SF1, runs=1)
        ratio = round(t1 / max(t01, FLOOR_SEC), 2)
        rows[name] = {"sf0.1_sec": t01, "sf1.0_sec": t1, "ratio": ratio}
        print(f"{name}: {t01:.2f}s -> {t1:.2f}s ({ratio}x)")
        if ratio > MAX_RATIO:
            bad.append((name, ratio))
    out = os.path.join(REPO, "tools", "scale_ratios.json")
    merged = {}
    if os.path.exists(out):
        with open(out) as f:
            merged = json.load(f)  # keep the lsh_pair_counts section
    merged.update(
        {
            "tiles": 10,
            "floor_sec": FLOOR_SEC,
            "max_ratio": MAX_RATIO,
            "queries": rows,
        }
    )
    with open(out, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    assert not bad, f"superlinear scaling (> {MAX_RATIO}x over 10x data): {bad}"


# --- LSH candidate-pair-count gate (VERDICT r4 item 2) ---------------------
# Wall time LAGS pair growth: the uncapped q105 twin grew ~98x in PAIRS at
# 10x docs but only ~5x in seconds, so the <=12x TIME gate above cannot
# catch the next quadratic. Gate the LSH family on the pair-count ratio
# itself. With linear content growth, true near-dup pairs grow ~linearly
# (~10x); the 15x bound leaves room for tile-boundary noise while any
# random-collision floor (~100x) blows through it.
MAX_PAIR_RATIO = 15.0
# below this sf0.1 pair count, ratios are small-number noise
FLOOR_PAIRS = 1_000


def _lsh_pair_relations():
    """name -> (spark, sf_dir) -> the query's candidate-PAIR relation
    (pre any downstream filter/verify, post the scale screens)."""
    from pyspark.sql import functions as F

    from cdc_init_spark.operators import dedup
    from cdc_init_spark.tables import load_table

    def docs(spark, sf):
        return load_table(spark, sf, "documents")

    def q196_rel(spark, sf):
        bk = dedup.minhash_portable_buckets(docs(spark, sf)).persist()
        is_new = F.col("doc_id") % 7 == 0
        return dedup.minhash_incremental_candidates(
            corpus_buckets=bk.filter(~is_new), batch_buckets=bk.filter(is_new)
        )

    return {
        # q65's near_dedup_minhash inlines the same banding + heavy-bucket
        # screen at k=64/16; the standalone candidate op is the gated proxy
        "q65_minhash_neardup": lambda s, sf: dedup.minhash_candidate_pairs(
            docs(s, sf)
        ),
        # hamming_max=3 matches q66's production call: the raw relation
        # carries the n²·blocks/2^(width+1) random-collision noise term
        # (measured 80x at 10x docs, all hamming > 3) that the in-join
        # filter exists to kill — the gate measures what is EMITTED
        "q66_simhash_candidates": lambda s, sf: dedup.simhash_candidate_pairs(
            docs(s, sf), hamming_max=3
        ),
        "q102_minhash_portable": lambda s, sf: dedup.minhash_portable_pairs(
            docs(s, sf)
        ),
        "q105_simhash_portable": lambda s, sf: dedup.simhash_portable_pairs(
            docs(s, sf)
        ),
        "q196_incremental_minhash_ingest": q196_rel,
        # not LSH, but the same failure class the pair gate exists for —
        # both were caught superlinear (62x/77x wall at 10x data) by the
        # r5 time gate before their screens landed:
        # q199's scored relation (fixed query budget x corpus)
        "q199_hard_negatives": _q199_scored,
        # q126's within-cluster triangle (max_cluster split)
        "q126_semdedup_keep": _q126_pairs,
    }


def _q199_scored(spark, sf):
    from pyspark.sql import functions as F

    from cdc_init_spark.tables import load_table

    e = load_table(spark, sf, "embeddings")
    q = F.broadcast(
        e.filter((F.col("vec_id") % 25 == 0) & (F.col("vec_id") < 2400)).select(
            F.col("vec_id").alias("query_id"), F.col("label").alias("qlabel")
        )
    )
    return e.crossJoin(q).filter(F.col("label") != F.col("qlabel"))


def _q126_pairs(spark, sf):
    from pyspark.sql import functions as F

    from cdc_init_spark.tables import load_table

    e = load_table(spark, sf, "embeddings")
    nsub = (
        e.groupBy("label")
        .agg(F.count(F.lit(1)).alias("_cn"))
        .select("label", F.ceil(F.col("_cn") / F.lit(256)).cast("int").alias("_ns"))
    )
    h32 = F.conv(
        F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    es = e.join(F.broadcast(nsub), on="label").select(
        "label",
        "vec_id",
        F.pmod(h32, F.col("_ns")).cast("int").alias("_sub"),
    )
    a = es.select("label", "_sub", F.col("vec_id").alias("_a"))
    b = es.select("label", "_sub", F.col("vec_id").alias("_b"))
    return a.join(b, on=["label", "_sub"]).filter(F.col("_b") > F.col("_a"))


def test_sf1_lsh_pair_count_ratios(spark):
    if not os.path.isdir(SF1):
        from tools.gen_scale_fixtures import main as gen

        gen()
    rows, bad = {}, []
    for name, rel in _lsh_pair_relations().items():
        n01 = rel(spark, SF01).count()
        n1 = rel(spark, SF1).count()
        ratio = round(n1 / max(n01, FLOOR_PAIRS), 2)
        rows[name] = {"sf0.1_pairs": n01, "sf1.0_pairs": n1, "ratio": ratio}
        print(f"{name}: {n01} -> {n1} pairs ({ratio}x)")
        if ratio > MAX_PAIR_RATIO:
            bad.append((name, ratio))
    out = os.path.join(REPO, "tools", "scale_ratios.json")
    merged = {}
    if os.path.exists(out):
        with open(out) as f:
            merged = json.load(f)
    merged["lsh_pair_counts"] = {
        "floor_pairs": FLOOR_PAIRS,
        "max_ratio": MAX_PAIR_RATIO,
        "queries": rows,
    }
    with open(out, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    assert not bad, (
        f"candidate-pair growth > {MAX_PAIR_RATIO}x over 10x data "
        f"(quadratic collision floor): {bad}"
    )


# r4 excluded q105 here: its UNCAPPED candidate set grew ~98x at 10x docs
# (20M rows -> two-engine pandas abort). r5 capped the twin (max_bucket
# heavy-slice drop + per-bucket row_number cap, replayed in the DuckDB
# oracle), bounding output at blocks * 2^width * C(cap, 2) ~ 2M rows —
# back inside pandas range, so the exclusion is retired and q105 is
# differential-checked at sf1.0 like everything else.
#
# r5 excluded q133 here (default 4096-entry theta sketches left their
# exact regime at the sf1.0 cohort sizes, n_a = 15000, so the literal
# set-arithmetic oracle stopped modeling the by-design estimate). r6
# retired the exclusion: q133 now sizes its sketches lgk=17 (131072
# nominal entries), keeping exact mode at every gated SF; the
# estimation-regime laws remain pytest-pinned in tests/test_sketches.py.
SF1_PANDAS_EXCLUDE: set[str] = set()


def test_sf1_full_differential(spark):
    """Correctness at 100x the driver's SF: the whole oracle-paired corpus
    (minus the documented quadratic-output exclusion above) must still
    hash-match DuckDB on the 10x-tiled sf1.0 fixtures — the divergence
    classes that only appear with more partitions, spills, wider
    shuffles, and int/float headroom (overflowing counts, rounding drift
    on bigger aggregates) all get one more decade of exposure — the r5
    run caught exactly those classes: double-SUM rounding drift in
    q81/q95 (fixed: DECIMAL accumulation), q133's sketch leaving its
    exact regime (documented exclusion above), and a DuckDB allocator
    abort under concurrent JVM load (fixed: spill temp_directory in
    testing.duckdb_connection)."""
    from cdc_init_spark.plans import ORACLE
    from cdc_init_spark.testing import run_differential

    if not os.path.isdir(SF1):
        from tools.gen_scale_fixtures import main as gen

        gen()
    names = [n for n in ORACLE if n not in SF1_PANDAS_EXCLUDE]
    res = run_differential(spark, SF1, only=names)
    bad = [r for r in res if not r.ok]
    assert len(res) >= 170
    assert not bad, f"{len(bad)} of {len(res)} failed at sf1.0: {bad[:3]}"


# --- graph skew-stress wall ratios (VERDICT r5 item 8, stretch) -----------
# The sf1.0 gate measures UNIFORM fixture growth; this arm measures the
# adversarial DEGREE DISTRIBUTION at fixed size: a power-law graph whose
# hub touches ~13% of all edges vs a uniform graph with identical |V|/|E|.
# The claims under test: AQE's skew-join split keeps pagerank's rank⋈edges
# join bounded, and degree orientation keeps the triangle wedge stream
# m^1.5-bounded, when one key dominates.
SKEW_MAX_RATIO = 3.0


def _skew_graphs(spark, n=100_000, m=500_000):
    from pyspark.sql import functions as F

    h = lambda k: F.pmod(F.xxhash64(F.col("id"), F.lit(k)), F.lit(n))
    uniform = spark.range(m).select(
        h(1).alias("src"), h(2).alias("dst")
    )
    # dst = floor(n * u^6): P(dst=0) = n^(-1/6) ~ 0.13 -> hub degree ~65k
    u = (F.pmod(F.xxhash64(F.col("id"), F.lit(3)), F.lit(1_000_000)) / 1_000_000.0)
    powerlaw = spark.range(m).select(
        h(4).alias("src"),
        F.floor(F.lit(n) * F.pow(u, F.lit(6.0))).cast("long").alias("dst"),
    )
    return uniform, powerlaw


def test_sf1_graph_skew_wall_ratios(spark):
    from cdc_init_spark.operators.graph import (
        pagerank,
        symmetrize,
        triangles_per_node,
    )

    uniform, powerlaw = _skew_graphs(spark)
    ops = {
        "pagerank": lambda e: pagerank(symmetrize(e), iters=3),
        "triangles": lambda e: triangles_per_node(e),
    }
    rows, bad = {}, []
    for name, op in ops.items():
        t_u = _time(spark, lambda s, _: op(uniform), SF01, runs=2)
        t_p = _time(spark, lambda s, _: op(powerlaw), SF01, runs=2)
        ratio = round(t_p / max(t_u, FLOOR_SEC), 2)
        rows[name] = {"uniform_sec": t_u, "powerlaw_sec": t_p, "ratio": ratio}
        print(f"graph_skew {name}: {t_u:.2f}s uniform -> {t_p:.2f}s powerlaw ({ratio}x)")
        if ratio > SKEW_MAX_RATIO:
            bad.append((name, ratio))
    out = os.path.join(REPO, "tools", "scale_ratios.json")
    merged = {}
    if os.path.exists(out):
        with open(out) as f:
            merged = json.load(f)
    merged["graph_skew"] = {
        "n_nodes": 100_000,
        "n_edges": 500_000,
        "hub_share": "~13% of edges on one key",
        "max_ratio": SKEW_MAX_RATIO,
        "queries": rows,
    }
    with open(out, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    assert not bad, (
        f"degree skew blows up wall time > {SKEW_MAX_RATIO}x at equal "
        f"|V|/|E| (skew-join split or orientation failed): {bad}"
    )
