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
    # LATEST green round wins: names[2:4] were re-verified in r2
    assert verified == {**{n: 1 for n in names[:2]}, **{n: 2 for n in names[2:7]}}
    order = _registry_order(names, verified)
    # never-verified first, in stable insertion order
    assert order[:3] == names[7:]
    # then verified, stalest (oldest latest-green round) first
    assert order[3:5] == names[:2]
    assert order[5:] == names[2:7]


def test_reverification_advances_staleness_cohort(tmp_path):
    """VERDICT r4 item 4: a re-verified entry must LEAVE the stale cohort
    (latest-round key), so the spare budget cycles r2/r3/... instead of
    re-checking the r1 cohort forever."""
    names = ["qa", "qb", "qc"]
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({n: {"rows_match": True} for n in names})
    )
    order1 = _registry_order(names, _driver_verified(root=str(tmp_path)))
    assert order1 == names  # all r1, insertion order
    # driver re-verifies qa in r2: qa must now sort LAST (freshest)
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({"qa": {"rows_match": True}})
    )
    order2 = _registry_order(names, _driver_verified(root=str(tmp_path)))
    assert order2 == ["qb", "qc", "qa"]


def test_failed_row_returns_to_front_cohort(tmp_path):
    """ADVICE r4 (medium): a row with rows_match:false or a hard err is
    NOT verification — the query must rotate back into the driver's
    budget window, ahead of green entries."""
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps(
            {
                "q_green": {"rows_match": True, "hash_match": True, "err": None},
                "q_hashfail": {"rows_match": True, "hash_match": False, "err": None},
                "q_err": {"rows_match": None, "err": "Py4JJavaError: boom"},
                "q_rowsonly": {"rows_match": None, "err": "no_oracle"},
            }
        )
    )
    verified = _driver_verified(root=str(tmp_path))
    assert verified == {"q_green": 1, "q_rowsonly": 1}
    # a later FAILED row erases an older green one
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({"q_green": {"rows_match": False, "err": None}})
    )
    assert _driver_verified(root=str(tmp_path)) == {"q_rowsonly": 1}


def test_driver_verified_warns_on_garbage(tmp_path):
    import warnings as _w

    (tmp_path / "CORRECTNESS_r01.json").write_text("not json {")
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps(["a", "b"]))
    (tmp_path / "CORRECTNESS_r03.json").write_text(json.dumps({"qx": {}}))
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        assert _driver_verified(root=str(tmp_path)) == {"qx": 3}
    msgs = [str(c.message) for c in caught]
    assert any("unreadable" in m for m in msgs), msgs
    assert any("malformed" in m for m in msgs), msgs


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


def test_live_registry_stalest_cohort_inside_budget_window():
    """VERDICT r5 "Next round" item 3: the stalest latest-green cohort
    (r2 after round 5: 42 entries) must sort INSIDE the driver's
    50-query budget window so the next round's correctness pass
    re-greens it automatically. Together with the never-verified test
    above this pins the whole rotation contract against the real
    artifacts on disk: unverified first, then stalest-green, and no
    cohort starves outside the window while smaller ones recycle."""
    verified = _driver_verified()
    if not verified:
        return
    names = list(QUERIES)
    stalest_round = min(verified.values())
    stale = [n for n in names if verified.get(n) == stalest_round]
    never = [n for n in names if n not in verified]
    window = set(names[: 50])
    if len(never) + len(stale) <= 50:
        missing = [n for n in stale if n not in window]
        assert not missing, (
            f"stalest cohort (r{stalest_round}, {len(stale)} entries) not "
            f"fronted into the 50-budget window: {missing[:5]}"
        )
    else:  # oversized cohort: window must still be drawn exclusively from it
        assert window <= set(never) | set(stale)


def test_corpus_frozen_at_196():
    """VERDICT r3 item 3 froze the registry at 192; VERDICT r6 "Next
    round" item 1 granted the q203–q205 DeltaLogFormat exception (195);
    VERDICT r7 "Next round" item 4 sanctioned exactly one more — q206,
    the full snapshot-then-live lifecycle capstone (seed → change-feed
    subscription → incremental view maintenance) as a single
    driver-gated artifact. VERDICT r7 stretch item 8 (merge-on-read) is
    gated by q207 (stacked deletion-vector read) and q208 (compact as
    the dv reconciler) — "every operator you claim as done needs BOTH a
    queries() entry and an oracle_sql() entry". VERDICT r8 item 2
    (column-mapping rename/drop evolution) is gated by q209 under the
    same both-entries rule. Frozen again at 199."""
    assert len(QUERIES) == 199
    assert len(ORACLE) >= 182


def test_corpus_md_in_sync():
    """CORPUS.md (judge-read inventory) matches the live registry AS A
    SET (VERDICT r4 item 3): the rotation order changes the moment the
    driver drops a new CORRECTNESS artifact, so snapshotting the ORDER
    guaranteed a red test after every round. Membership and the
    oracle/rows-only gate per entry are rotation-independent."""
    path = os.path.join(REPO_ROOT, "CORPUS.md")
    with open(path) as f:
        rows = {
            line.split("|")[1].strip(): line.split("|")[2].strip()
            for line in f
            if line.startswith("| q")
        }
    assert set(rows) == set(QUERIES), "CORPUS.md stale — run python tools/gen_corpus.py"
    gates = {
        n: ("oracle" if n in ORACLE else "rows-only") for n in QUERIES
    }
    assert rows == gates, "CORPUS.md gate column stale — run python tools/gen_corpus.py"
