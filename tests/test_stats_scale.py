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
