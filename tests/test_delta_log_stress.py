"""Concurrent-writer stress for DeltaLogFormat (VERDICT r6 item 4).

The single trust anchor of the whole format is CommitStore.put_if_absent
(sources/commit_store.py) — if two writers can ever both believe they
own a version, every other guarantee collapses. Three layers of proof:

1. the CommitStore contract under THREAD races (exactly one winner,
   winner's full payload, losers traceless);
2. the same contract under PROCESS races (os.link atomicity is a kernel
   property, not a GIL artifact — this is what multi-writer ingest from
   separate Spark drivers relies on);
3. a seeded multi-writer op-sequence stress over a live table
   (appends/merges/compactions interleaved with natural conflict
   injection): every committed version replays cleanly, the final state
   equals the union of per-writer models, and vacuum finds exactly zero
   leaked files (abandoned transactions cleaned up after themselves).

Default sizes keep the suite fast; set SPARK_GRAFT_STRESS_N (writers)
and SPARK_GRAFT_STRESS_OPS (ops per writer) for a big-N soak.
"""

from __future__ import annotations

import json
import multiprocessing
import os
import random
import threading
from datetime import datetime

from cdc_init_spark.sources.commit_store import LocalCommitStore
from cdc_init_spark.sources.delta_log import CommitConflictError, DeltaLogFormat

STRESS_N = int(os.environ.get("SPARK_GRAFT_STRESS_N", "3"))
STRESS_OPS = int(os.environ.get("SPARK_GRAFT_STRESS_OPS", "6"))


def _ts(minute):
    return datetime(2026, 1, 1, 12, minute % 60)


# -- layer 1: thread races on one name -------------------------------------


def test_commit_store_thread_contract(tmp_path):
    store = LocalCommitStore()
    path = str(tmp_path / "log" / "0001.json")
    results: dict[int, bool] = {}
    barrier = threading.Barrier(8)

    def worker(i):
        barrier.wait()
        results[i] = store.put_if_absent(path, f"writer-{i}".encode())

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    winners = [i for i, won in results.items() if won]
    assert len(winners) == 1
    with open(path, "rb") as f:
        assert f.read() == f"writer-{winners[0]}".encode()
    # losers leave no trace (no temp files)
    assert os.listdir(os.path.dirname(path)) == [os.path.basename(path)]


# -- layer 2: process races over many versions ------------------------------


def _proc_worker(log_dir: str, writer_id: int, n_versions: int, out_q):
    """Race for every version like a real OCC writer: bump to the next
    version on loss, claim on win."""
    store = LocalCommitStore()
    wins = []
    v = 0
    while v < n_versions:
        payload = json.dumps({"writer": writer_id, "version": v}).encode()
        if store.put_if_absent(
            os.path.join(log_dir, f"{v:020d}.json"), payload
        ):
            wins.append(v)
        v += 1
    out_q.put((writer_id, wins))


def test_commit_store_multiprocess_occ(tmp_path):
    """N processes race for M versions: every version gets exactly one
    owner, the file content names that owner, and the union of claimed
    wins is a disjoint cover of all versions — the cross-process
    atomicity merge()/append() OCC is built on."""
    log_dir = str(tmp_path / "log")
    os.makedirs(log_dir)
    n_proc, n_versions = 4, 25
    q = multiprocessing.Queue()
    procs = [
        multiprocessing.Process(
            target=_proc_worker, args=(log_dir, i, n_versions, q)
        )
        for i in range(n_proc)
    ]
    for p in procs:
        p.start()
    claims: dict[int, list[int]] = dict(q.get() for _ in procs)
    for p in procs:
        p.join()
    claimed = [v for wins in claims.values() for v in wins]
    assert sorted(claimed) == sorted(set(claimed))  # no double-claims
    assert set(claimed) == set(range(n_versions))   # every version owned
    for writer_id, wins in claims.items():
        for v in wins:
            with open(os.path.join(log_dir, f"{v:020d}.json")) as f:
                rec = json.load(f)
            assert rec == {"writer": writer_id, "version": v}
    # no stray temp files survived the races
    assert all(not n.startswith(".tmp-") for n in os.listdir(log_dir))


# -- layer 3: live-table op-sequence stress ---------------------------------


def test_multiwriter_op_stress(spark, tmp_path):
    """Seeded interleaving of append/merge/compact from N concurrent
    writers, each owning a disjoint key space (so the final state is
    order-independent: the union of per-writer models). Conflicts are
    injected naturally — every merge/compact races every other writer's
    commits and must retry through CommitConflictError. Afterwards:
    every version replays (the strict-remove check in _Snapshot.apply
    makes replay itself an integrity audit), the table equals the
    model, history is contiguous, and vacuum finds zero leaked files."""
    fmt = DeltaLogFormat(str(tmp_path / "t"), checkpoint_interval=5)
    fmt.init({"acct": spark.createDataFrame(
        [(0, 0.0)], "id long, v double")})
    models: dict[int, dict[int, float]] = {}
    errs: list = []

    def worker(wid: int):
        rng = random.Random(20260816 + wid)
        base = (wid + 1) * 100_000
        model: dict[int, float] = {}
        try:
            for step in range(STRESS_OPS):
                op = rng.choice(["append", "merge", "merge", "compact"])
                if op == "append":
                    rows = {base + len(model) + k: rng.uniform(0, 100)
                            for k in range(rng.randint(1, 3))}
                    fmt.append("acct", spark.createDataFrame(
                        sorted(rows.items()), "id long, v double"))
                    model.update(rows)
                elif op == "merge":
                    changes = []
                    if model and rng.random() < 0.5:
                        k = rng.choice(sorted(model))
                        if rng.random() < 0.3:
                            changes.append((k, _ts(step), "delete", None))
                            model.pop(k)
                        else:
                            nv = rng.uniform(0, 100)
                            changes.append((k, _ts(step), "update", nv))
                            model[k] = nv
                    k = base + 50_000 + step
                    nv = rng.uniform(0, 100)
                    changes.append((k, _ts(step), "insert", nv))
                    model[k] = nv
                    ch = spark.createDataFrame(
                        changes, "id long, ts timestamp, type string, v double")
                    while True:
                        try:
                            fmt.merge(spark, "acct", ch, ["id"])
                            break
                        except CommitConflictError:
                            continue  # another writer moved the table: retry
                else:
                    try:
                        fmt.compact(spark, "acct", target_files=4)
                    except CommitConflictError:
                        pass  # compaction is optional maintenance
        except Exception as e:  # pragma: no cover - failure reporting
            errs.append((wid, e))
        models[wid] = model

    threads = [
        threading.Thread(target=worker, args=(i,)) for i in range(STRESS_N)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs

    # final state == union of disjoint per-writer models (+ the seed row)
    want = {0: 0.0}
    for m in models.values():
        want.update(m)
    got = {r.id: r.v for r in fmt.read(spark, "acct").collect()}
    assert got.keys() == want.keys()
    assert all(abs(got[k] - want[k]) < 1e-9 for k in want)

    # every committed version replays cleanly (strict remove check runs
    # inside replay), and versions are contiguous
    latest = fmt.latest_version()
    hist = fmt.history()
    assert [h["version"] for h in hist] == list(range(latest, -1, -1))
    for v in range(latest + 1):
        fmt._snapshot(v)

    # zero leaked data files: everything on disk is referenced by some
    # version ≥ 0 (abandoned retries cleaned up after themselves)
    assert fmt.vacuum(horizon=0, retention_s=0.0) == []
    # and vacuum-to-latest keeps the head readable
    fmt.vacuum(horizon=latest, retention_s=0.0)
    got2 = {r.id: r.v for r in fmt.read(spark, "acct").collect()}
    assert got2 == got


def test_racing_clones_and_constraints_all_land_once(spark, tmp_path):
    """Metadata verbs under thread races: N threads each clone the same
    source to a DISTINCT name while another thread toggles a constraint
    — every verb retries through lost OCC rounds and lands exactly once,
    the final table set is source + all N clones, every clone equals the
    source (the clone re-plans against the winner's state after a lost
    race, so no clone carries a stale file list), and no hard link or
    data file leaks (vacuum finds nothing)."""
    fmt = DeltaLogFormat(str(tmp_path / "t"))
    fmt.init({"src": spark.createDataFrame(
        [(i, float(i)) for i in range(8)], "id long, v double")})
    want = sorted((r.id, r.v) for r in fmt.read(spark, "src").collect())

    errs: list = []
    n = 4

    def do_clone(k):
        try:
            DeltaLogFormat(str(tmp_path / "t")).clone(spark, "src", f"c{k}")
        except Exception as e:  # pragma: no cover - failure surface
            errs.append(e)

    def do_constraints():
        f = DeltaLogFormat(str(tmp_path / "t"))
        try:
            f.add_constraint(spark, "src", "ok", "v >= 0")
            f.drop_constraint("src", "ok")
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=do_clone, args=(k,)) for k in range(n)]
    threads.append(threading.Thread(target=do_constraints))
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs

    snap = fmt._snapshot()
    assert set(snap.schemas) == {"src"} | {f"c{k}" for k in range(n)}
    assert snap.constraints.get("src", {}) == {}  # add then drop both landed
    for k in range(n):
        got = sorted((r.id, r.v) for r in fmt.read(spark, f"c{k}").collect())
        assert got == want, f"clone c{k} diverged"
    # n+2 metadata commits on top of init, each exactly once
    assert fmt.latest_version() == n + 2
    assert fmt.vacuum(horizon=0, retention_s=0.0) == []
