"""Accuracy contract for the scale-path statistical sketches: the
rows-only corpus entries whose algorithms are engine-specific (no DuckDB
oracle possible) are pinned against their exact twins here, mirroring
q71's HLL tolerance treatment (VERDICT r1, "Next round" item 5).
"""

from __future__ import annotations

from cdc_init_spark.plans import QUERIES


def test_approx_percentiles_within_one_percent_of_exact(spark, sf_dir):
    """q74_approx_percentiles (t-digest, partial-aggregable — the 100 TB
    plan) must land within 1% relative error of q74_percentiles (exact
    per-group sort) on every group/quantile at fixture scale."""
    exact = {
        r["o_orderstatus"]: (r["p50"], r["p90"])
        for r in QUERIES["q74_percentiles"](spark, sf_dir).collect()
    }
    approx = {
        r["o_orderstatus"]: (r["p50"], r["p90"])
        for r in QUERIES["q74_approx_percentiles"](spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for status, (e50, e90) in exact.items():
        a50, a90 = approx[status]
        assert abs(a50 - e50) <= 0.01 * abs(e50), (status, e50, a50)
        assert abs(a90 - e90) <= 0.01 * abs(e90), (status, e90, a90)


def test_approx_percentiles_partial_aggregable_plan(spark, sf_dir):
    """The sketch must partial-aggregate map-side (the reason it beats
    the exact form at scale): the plan carries partial_approx_percentile
    before the exchange."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        QUERIES["q74_approx_percentiles"](spark, sf_dir).explain("formatted")
    plan = buf.getvalue()
    assert "partial_approx_percentile" in plan or "partial_percentile_approx" in plan


def test_quantile_normalize_approx_tracks_exact(spark, sf_dir):
    """q182_approx (KLL sketch + broadcast 1024-point quantile grid — the
    100 TB plan, VERDICT r2 item 3) must track q182_quantile_normalize
    (exact global order-statistic join) per document: same row set, and
    the normalized value within 2% of the global n_chars RANGE for every
    row (KLL k=800 rank error ~0.6% + 1/1024 grid resolution, with
    headroom for value-space dilation in sparse tails)."""
    exact = {
        r["doc_id"]: r["normalized"]
        for r in QUERIES["q182_quantile_normalize"](spark, sf_dir).collect()
    }
    approx = {
        r["doc_id"]: r["normalized"]
        for r in QUERIES["q182_approx"](spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    lo, hi = min(exact.values()), max(exact.values())
    span = hi - lo
    worst = max(abs(approx[k] - exact[k]) for k in exact)
    assert worst <= 0.02 * span, (worst, span)


def test_quantile_normalize_approx_has_no_global_order_statistic(spark, sf_dir):
    """The scale path's reason to exist: the exact form materializes the
    global order-statistic relation via row_number() over an
    all-rows-to-one-partition window (a corpus-sized single sort task at
    100 TB). The approx plan must carry NO row_number anywhere — its only
    single-partition exchange is the KLL merge, which moves sketch bytes,
    not rows. The per-source rank windows (hash-partitioned) remain."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        QUERIES["q182_approx"](spark, sf_dir).explain("formatted")
    plan = buf.getvalue()
    assert "row_number" not in plan, plan
    assert "kll_sketch_agg_double" in plan.lower() or "kll" in plan.lower()
