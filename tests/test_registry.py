"""Registry rotation is DERIVED from driver CORRECTNESS artifacts
(VERDICT r3 "Next round" item 2): never-verified entries must sort ahead
of the driver's ~50-query budget window without any hand-maintained list."""

from __future__ import annotations

import json
import os

from cdc_init_spark.plans import (
    ORACLE,
    QUERIES,
    _driver_verified,
    _registry_order,
)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_fake_artifact_unverified_sort_first(tmp_path):
    """Inject a fake artifact: whatever it omits must lead the order."""
    names = [f"q{i:02d}" for i in range(10)]
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({n: {"rows_match": True} for n in names[:4]})
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({n: {"rows_match": True} for n in names[2:7]})
    )
    verified = _driver_verified(root=str(tmp_path))
    assert verified == {**{n: 1 for n in names[:4]}, **{n: 2 for n in names[4:7]}}
    order = _registry_order(names, verified)
    # never-verified first, in stable insertion order
    assert order[:3] == names[7:]
    # then verified, oldest round first
    assert order[3:7] == names[:4]
    assert order[7:] == names[4:7]


def test_driver_verified_ignores_garbage(tmp_path):
    (tmp_path / "CORRECTNESS_r01.json").write_text("not json {")
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps(["a", "b"]))
    (tmp_path / "CORRECTNESS_r03.json").write_text(json.dumps({"qx": {}}))
    assert _driver_verified(root=str(tmp_path)) == {"qx": 3}


def test_live_registry_never_verified_lead():
    """Against the real artifacts on disk: every entry without a driver row
    must sit inside the driver's 50-query budget window."""
    verified = _driver_verified()
    if not verified:  # fresh checkout without artifacts: insertion order
        return
    names = list(QUERIES)
    never = [n for n in names if n not in verified]
    assert len(never) <= 50, (
        f"{len(never)} never-driver-verified entries exceed one round's "
        "budget — corpus growth must stay frozen (VERDICT r3 item 3)"
    )
    assert set(never) <= set(names[:50]), "unverified entry outside budget window"


def test_corpus_frozen_at_192():
    """VERDICT r3 item 3: registry frozen at 192 entries for round 4."""
    assert len(QUERIES) == 192
    assert len(ORACLE) >= 175


def test_corpus_md_in_sync():
    """CORPUS.md (judge-read inventory) matches the live registry order."""
    path = os.path.join(REPO_ROOT, "CORPUS.md")
    with open(path) as f:
        rows = [
            line.split("|")[1].strip()
            for line in f
            if line.startswith("| q")
        ]
    assert rows == list(QUERIES), "CORPUS.md stale — run python tools/gen_corpus.py"
