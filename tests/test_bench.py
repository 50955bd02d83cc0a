"""bench.py contract: one JSON line on stdout with the driver's schema."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_bench_json_contract():
    import tempfile

    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf0.001"
    env["SPARK_GRAFT_CPUS"] = "8"
    # keep the committed sf0.1 BENCH.json artifact out of the blast radius
    env["SPARK_GRAFT_BENCH_OUT"] = os.path.join(
        tempfile.mkdtemp(), "BENCH_test.json"
    )
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    d = json.loads(line)
    assert d["unit"] == "sec"
    assert isinstance(d["value"], (int, float)) and d["value"] > 0
    assert d["sf"] == 0.001
    assert len(d["queries"]) >= 60
    failed = {k: v for k, v in d["queries"].items() if v == -1.0}
    assert not failed, f"bench queries failed: {failed}"
