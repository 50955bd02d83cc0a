"""Memory-pressure spill sweep (VERDICT r5 "Next round" item 1).

The 128 GiB sandbox never forces the heavy shuffles to spill, so the
100 TB design claim "everything spills, nothing collects" had no test.
This tool runs the 10 heaviest corpus queries (BENCH.json order) at
sf0.1 in ONE of two session profiles:

- ``default``:     the bench profile (8g driver, bench shuffle width)
- ``constrained``: 2g driver heap + ``spark.sql.shuffle.partitions=64``
  + ``spark.memory.fraction=0.2`` — execution memory per task shrinks
  ~40x vs default, so sorts/aggregations/joins must hit the
  UnsafeExternalSorter spill path to finish

and records per-query wall time, row count, an order-insensitive
result hash (``testing.normalize`` — the same canonicalization the
differential uses), and the spill counters
(``memoryBytesSpilled``/``diskBytesSpilled``) attributed per query via
the Spark REST status API stage deltas.

Driver memory must be fixed at JVM launch, so each profile is a fresh
Python process — ``tests/test_spill.py`` (opt-in, SPARK_GRAFT_SPILL=1)
spawns both, asserts the hashes are IDENTICAL across profiles (a spill
must never change a result) and that the constrained run actually
spilled, then writes the merged artifact to ``tools/spill_metrics.json``
(the table BASELINE.md cites).

Usage: python tools/spill_sweep.py --profile constrained --out /tmp/x.json
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# the 10 heaviest by BENCH.json (r5) — the VERDICT-prescribed set
HEAVY = [
    "q157_pagerank",
    "q158_triangle_count",
    "q123_bloom_decontaminate",
    "q101_ngram_jaccard",
    "q163_hits",
    "q201_corpus_funnel",
    "q172_label_propagation",
    "q176_quality_aware_dedup",
    "q195_bpe_apply",
    "q103_dedup_clusters",
]


def result_hash(pdf) -> str:
    """Order-insensitive sha256 of the normalized frame (same
    canonicalization as the DuckDB differential)."""
    from cdc_init_spark.testing import normalize

    n = normalize(pdf)
    payload = "\n".join(
        "\x1f".join(repr(v) for v in row)
        for row in n.itertuples(index=False, name=None)
    )
    return hashlib.sha256(
        ("\x1f".join(n.columns) + "\n" + payload).encode()
    ).hexdigest()


def _stages(ui: str) -> list[dict]:
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    return json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        )
    )


def main(profile: str, out: str, sf_dir: str) -> int:
    extra = {"spark.ui.enabled": "true", "spark.ui.port": "0"}
    shuffle = None
    if profile == "constrained":
        # driver memory is only honored at JVM launch — belt and braces:
        # PYSPARK_SUBMIT_ARGS (read by the py4j gateway launcher) plus the
        # session config (read iff the JVM is not yet up, true in a fresh
        # process)
        os.environ["PYSPARK_SUBMIT_ARGS"] = "--driver-memory 2g pyspark-shell"
        os.environ["SPARK_GRAFT_DRIVER_MEM"] = "2g"
        shuffle = 64
        extra["spark.memory.fraction"] = "0.2"

    from cdc_init_spark.plans import QUERIES
    from cdc_init_spark.session import get_spark

    spark = get_spark(
        app_name=f"spill-sweep-{profile}",
        shuffle_partitions=shuffle,
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    heap = spark.sparkContext._jvm.java.lang.Runtime.getRuntime().maxMemory()

    results: dict[str, dict] = {}
    seen_stage = -1
    for name in HEAVY:
        t0 = time.perf_counter()
        pdf = QUERIES[name](spark, sf_dir).toPandas()
        dt = round(time.perf_counter() - t0, 3)
        mem = disk = 0
        new_max = seen_stage
        for st in _stages(ui):
            sid = st["stageId"]
            new_max = max(new_max, sid)
            if sid > seen_stage:
                mem += st.get("memoryBytesSpilled", 0)
                disk += st.get("diskBytesSpilled", 0)
        seen_stage = new_max
        results[name] = {
            "wall_sec": dt,
            "rows": len(pdf),
            "hash": result_hash(pdf),
            "memoryBytesSpilled": mem,
            "diskBytesSpilled": disk,
        }
        print(
            f"[{profile}] {name}: {dt:.2f}s rows={len(pdf)} "
            f"memSpill={mem} diskSpill={disk}",
            file=sys.stderr,
        )
        spark.catalog.clearCache()

    payload = {
        "profile": profile,
        "sf_dir": sf_dir,
        "jvm_max_heap_bytes": heap,
        "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
        "memory_fraction": spark.conf.get("spark.memory.fraction", "default"),
        "queries": results,
    }
    with open(out, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", choices=["default", "constrained"], required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    a = ap.parse_args()
    raise SystemExit(main(a.profile, a.out, a.sf_dir))
