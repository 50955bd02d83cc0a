"""Per-query profiling harness for the optimization rounds.

Usage:
    python tools/profile_queries.py q157_pagerank q158_triangle_count
    python tools/profile_queries.py --explain plans/r09 --suffix before q157_pagerank
    python tools/profile_queries.py --runs 3 --all-over 2.0

Times each named query at $SPARK_GRAFT_SF_DIR (default sf0.1) through the
noop sink (guide §1.4) after a warmup pass at sf0.001 (same discipline as
bench.py), reporting min/median of N runs.  With --explain DIR the
``explain("formatted")`` output is written to DIR/<query>_<suffix>.txt.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--explain", default=None, help="dir for explain output")
    ap.add_argument("--suffix", default="before")
    ap.add_argument(
        "--all-over",
        type=float,
        default=None,
        help="profile every query whose BENCH.json entry exceeds this",
    )
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")

    from cdc_init_spark.plans import QUERIES
    from cdc_init_spark.session import get_spark

    names = list(args.names)
    if args.all_over is not None:
        with open(os.path.join(os.path.dirname(__file__), "..", "BENCH.json")) as f:
            bench = json.load(f)["queries"]
        names += [
            n
            for n, v in sorted(bench.items(), key=lambda kv: -kv[1])
            if v >= args.all_over and n in QUERIES and n not in names
        ]
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    spark = get_spark(app_name="r09-profile")
    spark.sparkContext.setLogLevel("ERROR")
    # JVM warmup
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).write.format(
        "noop"
    ).mode("overwrite").save()

    out: dict[str, dict] = {}
    for name in names:
        fn = QUERIES[name]
        if not args.no_warm and os.path.isdir(warm_dir):
            try:
                fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
            except Exception as e:  # noqa: BLE001
                print(f"warmup {name} failed: {e}", file=sys.stderr)
            spark.catalog.clearCache()
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = fn(spark, sf_dir)
            path = os.path.join(args.explain, f"{name}_{args.suffix}.txt")
            with open(path, "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                ))
            spark.catalog.clearCache()
        ts = []
        for _ in range(args.runs):
            spark.catalog.clearCache()
            spark._jvm.System.gc()
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            try:
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                ts.append(round(time.perf_counter() - t0, 3))
            except Exception as e:  # noqa: BLE001
                print(f"{name} FAILED: {e}", file=sys.stderr)
                ts.append(-1.0)
                break
            finally:
                spark.sparkContext.setJobDescription(None)
        good = [t for t in ts if t > 0]
        rec = {
            "runs": ts,
            "min": min(good) if good else -1,
            "median": statistics.median(good) if good else -1,
        }
        out[name] = rec
        print(f"{name:40s} min={rec['min']:7.3f} median={rec['median']:7.3f} runs={ts}")
    print(json.dumps({n: r["min"] for n, r in out.items()}))


if __name__ == "__main__":
    main()
