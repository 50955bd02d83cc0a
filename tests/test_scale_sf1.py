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
    with open(out, "w") as f:
        json.dump(
            {
                "tiles": 10,
                "floor_sec": FLOOR_SEC,
                "max_ratio": MAX_RATIO,
                "queries": rows,
            },
            f,
            indent=1,
            sort_keys=True,
        )
    assert not bad, f"superlinear scaling (> {MAX_RATIO}x over 10x data): {bad}"


# The differential materializes BOTH engines' full results into pandas —
# fine for every linear-output query (worst is the 6M-row full-lineitem
# projections), but q105's SimHash candidate set grows ~n^2 BY DESIGN at
# fixed signature width (16-bit blocks collide at a constant random rate,
# so 10x docs -> ~98x pairs = 20M rows -> a two-engine pandas abort).
# That is a property of fixed-width SimHash banding, not a plan defect —
# production widens blocks with corpus size (operators/dedup.py) — and
# the OPERATOR itself is covered at sf1.0 by the distributed-noop ratio
# gate above (5.2x wall clock at 10x data) and by the driver oracle at
# sf0.01. Excluded here with that justification.
SF1_PANDAS_EXCLUDE = {"q105_simhash_portable"}


def test_sf1_full_differential(spark):
    """Correctness at 100x the driver's SF: the whole oracle-paired corpus
    (minus the documented quadratic-output exclusion above) must still
    hash-match DuckDB on the 10x-tiled sf1.0 fixtures — the divergence
    classes that only appear with more partitions, spills, wider
    shuffles, and int/float headroom (overflowing counts, rounding drift
    on bigger aggregates) all get one more decade of exposure.
    First green run: 175/175 on 2026-08-15."""
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
