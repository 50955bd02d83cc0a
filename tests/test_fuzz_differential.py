"""Property-based differential fuzzing: randomly composed
filter/project/aggregate/join plans over the fixtures, executed on Spark
AND DuckDB, must agree cell-for-cell. A SQLSmith-lite for the engine —
catches semantic drift the hand-written corpus never exercises.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cdc_init_spark.functions.compat import round_compat
from cdc_init_spark.tables import load_table
from cdc_init_spark.testing import compare_frames, duckdb_connection

SETTLE = settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
KEY_COLS = ["l_returnflag", "l_linestatus", "l_suppkey"]
OPS = {"<": "__lt__", "<=": "__le__", ">": "__gt__", ">=": "__ge__"}
AGGS = ["sum", "min", "max", "avg", "count"]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()


@st.composite
def filter_agg_plan(draw):
    fcol = draw(st.sampled_from(NUM_COLS))
    op = draw(st.sampled_from(sorted(OPS)))
    # literal inside each column's realistic range
    ranges = {
        "l_quantity": (1, 50),
        "l_extendedprice": (1000, 90000),
        "l_discount": (0.0, 0.1),
        "l_tax": (0.0, 0.08),
    }
    lo, hi = ranges[fcol]
    lit = draw(
        st.floats(min_value=float(lo), max_value=float(hi), allow_nan=False)
    )
    gcol = draw(st.sampled_from(KEY_COLS))
    agg = draw(st.sampled_from(AGGS))
    acol = draw(st.sampled_from(NUM_COLS))
    return fcol, op, round(float(lit), 3), gcol, agg, acol


@SETTLE
@given(plan=filter_agg_plan())
def test_fuzz_filter_group_agg(spark, sf_dir, duck, plan):
    fcol, op, lit, gcol, agg, acol = plan
    li = load_table(spark, sf_dir, "lineitem")
    cond = getattr(F.col(fcol), OPS[op])(F.lit(lit))
    if agg == "count":
        agg_expr = F.count(F.lit(1)).alias("v")
        agg_sql = "COUNT(*)"
    elif agg == "avg":
        agg_expr = round_compat(F.avg(acol), 4).alias("v")
        agg_sql = f"ROUND(AVG({acol}), 4)"
    elif agg == "sum":
        agg_expr = round_compat(F.sum(acol), 2).alias("v")
        agg_sql = f"ROUND(SUM({acol}), 2)"
    else:
        agg_expr = getattr(F, agg)(acol).alias("v")
        agg_sql = f"{agg.upper()}({acol})"
    spark_pd = li.filter(cond).groupBy(gcol).agg(agg_expr).toPandas()
    sql = (
        f"SELECT {gcol}, {agg_sql} AS v FROM lineitem "
        f"WHERE {fcol} {op} {lit!r} GROUP BY {gcol}"
    )
    duck_pd = duck.execute(sql).df()
    res = compare_frames("fuzz_agg", spark_pd, duck_pd)
    assert res.ok, f"{plan}: {res}"


@st.composite
def join_plan(draw):
    join_type = draw(st.sampled_from(["inner", "left", "left_semi", "left_anti"]))
    status = draw(st.sampled_from(["F", "O", "P"]))
    min_bal = draw(st.integers(min_value=-1000, max_value=9000))
    return join_type, status, min_bal


@SETTLE
@given(plan=join_plan())
def test_fuzz_join_shapes(spark, sf_dir, duck, plan):
    join_type, status, min_bal = plan
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > min_bal)
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == status)
    joined = c.join(o, c.c_custkey == o.o_custkey, join_type)
    if join_type in ("left_semi", "left_anti"):
        spark_df = joined.select("c_custkey")
        exists = "EXISTS" if join_type == "left_semi" else "NOT EXISTS"
        sql = f"""
          SELECT c_custkey FROM customer c
          WHERE c_acctbal > {min_bal} AND {exists} (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = '{status}')
        """
    else:
        spark_df = joined.select(c.c_custkey, o.o_orderkey)
        jt = "JOIN" if join_type == "inner" else "LEFT JOIN"
        sql = f"""
          SELECT c.c_custkey, o.o_orderkey
          FROM (SELECT * FROM customer WHERE c_acctbal > {min_bal}) c
          {jt} (SELECT * FROM orders WHERE o_orderstatus = '{status}') o
            ON c.c_custkey = o.o_custkey
        """
    res = compare_frames("fuzz_join", spark_df.toPandas(), duck.execute(sql).df())
    assert res.ok, f"{plan}: {res}"


@st.composite
def window_plan(draw):
    func = draw(st.sampled_from(["row_number", "rank", "dense_rank"]))
    direction = draw(st.sampled_from(["asc", "desc"]))
    return func, direction


@SETTLE
@given(plan=window_plan())
def test_fuzz_window_ranks(spark, sf_dir, duck, plan):
    from pyspark.sql.window import Window

    func, direction = plan
    o = load_table(spark, sf_dir, "orders")
    order_col = (
        F.col("o_totalprice").desc() if direction == "desc" else F.col("o_totalprice")
    )
    # row_number needs a total order → add the key as tiebreak
    if func == "row_number":
        w = Window.partitionBy("o_custkey").orderBy(order_col, "o_orderkey")
        sql_order = f"o_totalprice {direction.upper()}, o_orderkey"
    else:
        w = Window.partitionBy("o_custkey").orderBy(order_col)
        sql_order = f"o_totalprice {direction.upper()}"
    spark_pd = o.select(
        "o_orderkey", getattr(F, func)().over(w).alias("r")
    ).toPandas()
    duck_pd = duck.execute(
        f"SELECT o_orderkey, {func.upper()}() OVER "
        f"(PARTITION BY o_custkey ORDER BY {sql_order}) AS r FROM orders"
    ).df()
    res = compare_frames("fuzz_window", spark_pd, duck_pd)
    assert res.ok, f"{plan}: {res}"


@st.composite
def string_plan(draw):
    fn = draw(st.sampled_from(["lower", "upper", "reverse", "trim"]))
    start = draw(st.integers(min_value=1, max_value=10))
    length = draw(st.integers(min_value=1, max_value=12))
    min_len = draw(st.integers(min_value=0, max_value=30))
    return fn, start, length, min_len


@SETTLE
@given(plan=string_plan())
def test_fuzz_string_exprs(spark, sf_dir, duck, plan):
    """Composed string pipeline over part names: fn(substr(...)) plus
    length/concat, filtered on length — ASCII fixture strings keep the
    engines' collation/UTF differences out of scope by construction."""
    fn, start, length, min_len = plan
    p = load_table(spark, sf_dir, "part")
    spark_fn = {
        "lower": F.lower,
        "upper": F.upper,
        "reverse": F.reverse,
        "trim": F.trim,
    }[fn]
    spark_pd = (
        p.filter(F.length("p_name") >= min_len)
        .select(
            "p_partkey",
            spark_fn(F.substring("p_name", start, length)).alias("s"),
            F.length("p_name").alias("n"),
        )
        .toPandas()
    )
    duck_pd = duck.execute(
        f"""
        SELECT p_partkey, {fn}(substring(p_name, {start}, {length})) AS s,
               length(p_name) AS n
        FROM part WHERE length(p_name) >= {min_len}
        """
    ).df()
    res = compare_frames("fuzz_string", spark_pd, duck_pd)
    assert res.ok, f"{plan}: {res}"


@st.composite
def setop_plan(draw):
    op = draw(st.sampled_from(["union_all", "union", "intersect", "except"]))
    lo = draw(st.integers(min_value=0, max_value=12))
    hi = draw(st.integers(min_value=13, max_value=26))
    return op, lo, hi


@SETTLE
@given(plan=setop_plan())
def test_fuzz_set_ops(spark, sf_dir, duck, plan):
    """Set operations between two filtered key sets, both engines."""
    op, lo, hi = plan
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_nationkey") >= lo
    ).select(F.col("c_nationkey").alias("k"))
    s = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_nationkey") < hi
    ).select(F.col("s_nationkey").alias("k"))
    if op == "union_all":
        spark_df, sql_op = c.union(s), "UNION ALL"
    elif op == "union":
        spark_df, sql_op = c.union(s).distinct(), "UNION"
    elif op == "intersect":
        spark_df, sql_op = c.intersect(s), "INTERSECT"
    else:
        spark_df, sql_op = c.subtract(s), "EXCEPT"  # EXCEPT = distinct semantics
    sql = f"""
      SELECT c_nationkey AS k FROM customer WHERE c_nationkey >= {lo}
      {sql_op}
      SELECT s_nationkey AS k FROM supplier WHERE s_nationkey < {hi}
    """
    res = compare_frames("fuzz_setop", spark_df.toPandas(), duck.execute(sql).df())
    assert res.ok, f"{plan}: {res}"


@st.composite
def datetime_plan(draw):
    part = draw(st.sampled_from(["year", "month", "day", "hour"]))
    trunc = draw(st.sampled_from(["day", "month", "week", "hour"]))
    min_day = draw(st.integers(min_value=1, max_value=25))
    return part, trunc, min_day


@SETTLE
@given(plan=datetime_plan())
def test_fuzz_datetime_exprs(spark, sf_dir, duck, plan):
    """Composed date/time pipeline over events: extract + truncate +
    filter, grouped — both engines truncate and extract identically on
    the microsecond-timestamp fixture."""
    part, trunc, min_day = plan
    e = load_table(spark, sf_dir, "events")
    spark_pd = (
        e.filter(F.dayofmonth("ts") >= min_day)
        .groupBy(
            getattr(F, part)("ts").alias("p"),
            F.date_format(F.date_trunc(trunc, "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "t"
            ),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .toPandas()
    )
    duck_pd = duck.execute(
        f"""
        SELECT {part}(ts) AS p,
               strftime(date_trunc('{trunc}', ts), '%Y-%m-%d %H:%M:%S') AS t,
               COUNT(*) AS n
        FROM events WHERE day(ts) >= {min_day}
        GROUP BY 1, 2
        """
    ).df()
    res = compare_frames("fuzz_datetime", spark_pd, duck_pd)
    assert res.ok, f"{plan}: {res}"


@st.composite
def frame_plan(draw):
    kind = draw(st.sampled_from(["lag", "lead", "sum", "avg", "min", "max"]))
    k = draw(st.integers(min_value=1, max_value=4))
    preceding = draw(st.integers(min_value=0, max_value=5))
    following = draw(st.integers(min_value=0, max_value=5))
    return kind, k, preceding, following


@SETTLE
@given(plan=frame_plan())
def test_fuzz_window_frames(spark, sf_dir, duck, plan):
    """lag/lead at random offsets and ROWS-frame aggregates at random
    bounds over a totally-ordered per-customer window — the frame
    semantics (inclusive bounds, partial frames at partition edges,
    NULL fill for out-of-range offsets) must agree cell-for-cell."""
    from pyspark.sql.window import Window

    kind, k, preceding, following = plan
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    if kind in ("lag", "lead"):
        expr = getattr(F, kind)("o_totalprice", k).over(w)
        spark_pd = o.select(
            "o_orderkey", round_compat(expr, 2).alias("v")
        ).toPandas()
        sql = (
            f"SELECT o_orderkey, ROUND({kind.upper()}(o_totalprice, {k}) OVER "
            f"(PARTITION BY o_custkey ORDER BY o_orderkey), 2) AS v FROM orders"
        )
    else:
        wf = w.rowsBetween(-preceding, following)
        expr = getattr(F, kind)("o_totalprice").over(wf)
        spark_pd = o.select(
            "o_orderkey", round_compat(expr, 2).alias("v")
        ).toPandas()
        sql = (
            f"SELECT o_orderkey, ROUND({kind.upper()}(o_totalprice) OVER "
            f"(PARTITION BY o_custkey ORDER BY o_orderkey "
            f"ROWS BETWEEN {preceding} PRECEDING AND {following} FOLLOWING), 2)"
            f" AS v FROM orders"
        )
    duck_pd = duck.execute(sql).df()
    res = compare_frames("fuzz_frame", spark_pd, duck_pd)
    assert res.ok, f"{plan}: {res}"


@st.composite
def asof_plan(draw):
    n_left = draw(st.integers(min_value=5, max_value=40))
    n_right = draw(st.integers(min_value=0, max_value=40))
    n_keys = draw(st.integers(min_value=1, max_value=4))
    seed = draw(st.integers(min_value=0, max_value=10_000))
    return n_left, n_right, n_keys, seed


@SETTLE
@given(plan=asof_plan())
def test_fuzz_asof_join_vs_duckdb_native(spark, duck, plan):
    """BOTH as-of physical forms (join+max_by and union+window) vs
    DuckDB's NATIVE ASOF JOIN on random keyed event/quote streams —
    including duplicate timestamps, keys with no quotes, and empty
    right sides. The reference semantics here is an independent engine
    implementation, not our own SQL emulation."""
    import random

    n_left, n_right, n_keys, seed = plan
    rng = random.Random(seed)
    lrows = [
        (i, rng.randrange(n_keys), rng.randrange(0, 1000))
        for i in range(n_left)
    ]
    rrows = [
        (rng.randrange(n_keys), rng.randrange(0, 1000), rng.randrange(0, 10**6))
        for _ in range(n_right)
    ]
    # dedupe right on (key, ts): at-or-before with duplicate quote times
    # is underdetermined (max_by picks an arbitrary peer) — the operator
    # documents unique (key, ts) as its contract
    seen = {}
    for k, t, v in rrows:
        seen[(k, t)] = v
    rrows = [(k, t, v) for (k, t), v in sorted(seen.items())]

    from cdc_init_spark.operators.asof import asof_join, asof_join_union

    left = spark.createDataFrame(lrows, "event_id long, k long, ts long")
    right = spark.createDataFrame(rrows, "k long, ts long, quote long")
    got_join = {
        (r["event_id"], r["asof_quote"])
        for r in asof_join(
            left, right, "k", "k", "ts", "ts", ["quote"]
        ).collect()
    }
    got_union = {
        (r["event_id"], r["asof_quote"])
        for r in asof_join_union(
            left, right, "k", "k", "ts", "ts", ["quote"]
        ).collect()
    }

    duck.execute("CREATE OR REPLACE TABLE _al AS SELECT * FROM (VALUES (NULL::BIGINT, NULL::BIGINT, NULL::BIGINT)) t(event_id, k, ts) WHERE FALSE")
    duck.execute("CREATE OR REPLACE TABLE _ar AS SELECT * FROM (VALUES (NULL::BIGINT, NULL::BIGINT, NULL::BIGINT)) t(k, ts, quote) WHERE FALSE")
    if lrows:
        duck.executemany("INSERT INTO _al VALUES (?, ?, ?)", lrows)
    if rrows:
        duck.executemany("INSERT INTO _ar VALUES (?, ?, ?)", rrows)
    want = {
        (r[0], r[1])
        for r in duck.execute(
            """
            SELECT l.event_id, r.quote
            FROM _al l ASOF LEFT JOIN _ar r
              ON l.k = r.k AND l.ts >= r.ts
            """
        ).fetchall()
    }
    assert got_join == want, f"join+max_by diverged: {plan}"
    assert got_union == want, f"union+window diverged: {plan}"


@st.composite
def corpus_plan(draw):
    n_docs = draw(st.integers(min_value=2, max_value=25))
    vocab = draw(st.integers(min_value=2, max_value=8))
    max_len = draw(st.integers(min_value=1, max_value=30))
    dup_every = draw(st.integers(min_value=2, max_value=5))
    seed = draw(st.integers(min_value=0, max_value=10_000))
    return n_docs, vocab, max_len, dup_every, seed


def _rand_corpus(plan):
    import random

    n_docs, vocab, max_len, dup_every, seed = plan
    rng = random.Random(seed)
    words = [f"w{i}" for i in range(vocab)]
    docs = []
    for i in range(n_docs):
        if i % dup_every == 0 and docs:
            docs.append((i, docs[rng.randrange(len(docs))][1]))  # forced dup
        else:
            docs.append(
                (
                    i,
                    " ".join(
                        rng.choice(words) for _ in range(rng.randrange(1, max_len + 1))
                    ),
                )
            )
    return docs


@SETTLE
@given(plan=corpus_plan())
def test_fuzz_dedup_laws_random_corpora(spark, plan):
    """Dedup operators vs EXACT pure-Python reference implementations on
    RANDOM corpora (duplicate-heavy, tiny vocabulary — the adversarial
    regime for shingling):
    - exact_dedup keeps exactly the min-id doc per distinct normalized
      content, and is idempotent;
    - substring_dedup reproduces the ExactSubstr policy position for
      position (k-windows occurring ≥2 times keep only the
      min-(doc, pos) occurrence; covered positions drop; reassembly in
      order);
    - chunk_dedup reproduces the C4 policy (cross-document repeated
      chunks survive only in the min-id document)."""
    import re

    from cdc_init_spark.operators.dedup import (
        chunk_dedup,
        exact_dedup,
        substring_dedup,
    )

    docs = _rand_corpus(plan)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    norm = {
        did: re.sub(r"\s+", " ", txt.lower()).strip() for did, txt in docs
    }
    toks = {did: [t for t in n.split(" ") if t] for did, n in norm.items()}

    # --- exact dedup ---
    kept_rows = {r["doc_id"] for r in exact_dedup(df).collect()}
    by_content: dict = {}
    for did, n in norm.items():
        by_content.setdefault(n, []).append(did)
    assert kept_rows == {min(v) for v in by_content.values()}

    # --- ExactSubstr reference (k=3) ---
    K = 3
    occ = [
        (did, p, " ".join(ts[p : p + K]))
        for did, ts in toks.items()
        for p in range(len(ts) - K + 1)
    ]
    by_gram: dict = {}
    for did, p, g in occ:
        by_gram.setdefault(g, []).append((did, p))
    covered: set = set()
    for g, places in by_gram.items():
        if len(places) >= 2:
            first = min(places)
            for did, p in places:
                if (did, p) != first:
                    covered.update((did, q) for q in range(p, p + K))
    want_sub = {
        did: " ".join(
            t for q, t in enumerate(ts) if (did, q) not in covered
        )
        for did, ts in toks.items()
    }
    got_sub = {
        r["doc_id"]: r["clean_text"]
        for r in substring_dedup(df, k=K).collect()
    }
    assert got_sub == want_sub, f"ExactSubstr diverged: {plan}"

    # --- C4 chunk reference (m=3) ---
    M = 3
    chunks = {
        did: [
            " ".join(ts[i : i + M]) for i in range(0, len(ts), M)
        ]
        for did, ts in toks.items()
        if ts
    }
    owner: dict = {}
    docs_with: dict = {}
    for did, cs in chunks.items():
        for c in set(cs):
            owner[c] = min(owner.get(c, did), did)
            docs_with.setdefault(c, set()).add(did)
    want_chunk = {
        did: " ".join(
            c
            for c in cs
            if not (len(docs_with[c]) > 1 and owner[c] != did)
        )
        for did, cs in chunks.items()
    }
    got_chunk = {
        r["doc_id"]: r["clean_text"] for r in chunk_dedup(df, m=M).collect()
    }
    assert got_chunk == want_chunk, f"C4 chunk policy diverged: {plan}"


@st.composite
def cdc_plan(draw):
    n_base = draw(st.integers(min_value=0, max_value=15))
    n_changes = draw(st.integers(min_value=0, max_value=40))
    n_keys = draw(st.integers(min_value=1, max_value=10))
    seed = draw(st.integers(min_value=0, max_value=10_000))
    return n_base, n_changes, n_keys, seed


@SETTLE
@given(plan=cdc_plan())
def test_fuzz_cdc_apply_vs_dict_replay(spark, plan):
    """apply_changes and state_at vs a dict-based reference replay over
    RANDOM keyed insert/update/delete logs — delete-then-resurrect,
    update-without-base, empty base/log, and every horizon prefix must
    agree with sequential per-key replay (the reference's compacted
    latest-state semantics, topic_store.clj:15)."""
    import random

    from cdc_init_spark.streaming.apply import apply_changes, state_at

    n_base, n_changes, n_keys, seed = plan
    rng = random.Random(seed)
    base_rows = [(k, f"v{k}") for k in rng.sample(range(n_keys), min(n_base, n_keys))]
    log_rows = [
        (
            t + 1,
            rng.randrange(n_keys),
            rng.choice(["insert", "update", "delete"]),
            f"p{t}",
        )
        for t in range(n_changes)
    ]

    def replay(horizon):
        state = dict(base_rows)
        for ts, k, op, payload in log_rows:
            if ts > horizon:
                continue
            if op == "delete":
                state.pop(k, None)
            else:
                state[k] = payload
        return {(k, v) for k, v in state.items()}

    base = spark.createDataFrame(base_rows, "pk long, val string")
    changes = spark.createDataFrame(
        [(k, v, ts, op) for ts, k, op, v in log_rows],
        "pk long, val string, ts long, type string",
    )
    got_final = {
        (r["pk"], r["val"])
        for r in apply_changes(base, changes, ["pk"]).collect()
    }
    assert got_final == replay(n_changes + 1), f"final state: {plan}"
    # spot-check two horizons: empty prefix and a random midpoint
    for horizon in {0, rng.randrange(n_changes + 1)}:
        got = {
            (r["pk"], r["val"])
            for r in state_at(base, changes, ["pk"], horizon).collect()
        }
        assert got == replay(horizon), f"horizon {horizon}: {plan}"


# --- BPE train+apply vs the sequential reference --------------------------

_BPE_SETTLE = settings(
    max_examples=8,  # each example is two full Spark pipelines
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)


def _bpe_ref_train_apply(texts, n_merges, min_count=2):
    """Sequential Sennrich BPE: train merges, then tokenize each doc.
    Returns (merges, {doc_id: (n_words, n_tokens)})."""
    import re
    from collections import Counter

    def words_of(t):
        return [w for w in re.sub(r"\s+", " ", t.lower()).strip().split(" ") if w]

    words = Counter(w for t in texts for w in words_of(t))
    vocab = {tuple(w): c for w, c in words.items()}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        (a, b), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < min_count:
            break
        merges.append((a, b, a + b))
        nxt = {}
        for syms, cnt in vocab.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            nxt[tuple(res)] = nxt.get(tuple(res), 0) + cnt
        vocab = nxt

    def encode(w):
        syms = list(w)
        for a, b, m in merges:
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    res.append(m)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            syms = res
        return syms

    per_doc = {}
    for doc_id, t in enumerate(texts):
        ws = words_of(t)
        if ws:
            per_doc[doc_id] = (len(ws), sum(len(encode(w)) for w in ws))
    return merges, per_doc


@_BPE_SETTLE
@given(
    texts=st.lists(
        st.lists(
            st.text(alphabet="abc", min_size=1, max_size=6),
            min_size=1,
            max_size=8,
        ).map(" ".join),
        min_size=2,
        max_size=5,
    )
)
def test_fuzz_bpe_train_apply_vs_reference(spark, texts):
    """Random tiny corpora over a 3-letter alphabet maximize merge
    collisions (aa/ab/aaa chains) — the adversarial regime for greedy
    non-overlapping merge application. Distributed train + apply must
    match the sequential reference merge-for-merge and token-for-token."""
    from cdc_init_spark.operators.corpus import bpe_apply, bpe_train

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got_merges = [
        (r["left"], r["right"], r["merged"])
        for r in bpe_train(df, n_merges=5).orderBy("step").collect()
    ]
    exp_merges, exp_docs = _bpe_ref_train_apply(texts, 5)
    assert got_merges == exp_merges
    got_docs = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_apply(df, got_merges).collect()
    }
    assert got_docs == exp_docs


# --- sliding chunks vs a sequential reference -----------------------------

_CHUNK_SETTLE = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)


@_CHUNK_SETTLE
@given(
    data=st.data(),
    window=st.integers(min_value=2, max_value=9),
)
def test_fuzz_sliding_chunks_vs_reference(spark, data, window):
    """Random (window, stride, doc length) triples against a sequential
    chunker: identical chunk ids, widths, and md5s — the ceil arithmetic
    and clamped final slice have off-by-one regimes (exact fit, runt,
    sub-window doc) that fixed cases undersample."""
    import hashlib

    from cdc_init_spark.operators.corpus import sliding_chunks

    stride = data.draw(st.integers(min_value=1, max_value=window))
    lengths = data.draw(
        st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=5)
    )
    texts = {i: " ".join(f"w{j}" for j in range(n)) for i, n in enumerate(lengths)}
    df = spark.createDataFrame(list(texts.items()), "doc_id int, text string")
    got = {
        (r["doc_id"], r["chunk_id"]): (r["n_chunk_tokens"], r["chunk_md5"])
        for r in sliding_chunks(df, window=window, stride=stride).collect()
    }
    exp = {}
    for doc_id, text in texts.items():
        toks = text.split(" ")
        n = len(toks)
        n_chunks = 1 if n <= window else 1 + -(-(n - window) // stride)
        for c in range(n_chunks):
            ct = toks[c * stride : c * stride + window]
            exp[(doc_id, c)] = (
                len(ct),
                hashlib.md5(" ".join(ct).encode()).hexdigest(),
            )
    assert got == exp


def test_stateless_buckets_equal_batch_path(spark):
    """minhash_portable_buckets_stateless emits the SAME (id, band,
    bucket) rows as the codegen batch path on adversarial token shapes
    (sub-gram docs, repeated tokens, empty text) — pinning the intra-row
    gram construction (sequence/slice/concat_ws) to the
    posexplode+lead-window form it replaces in streaming."""
    from cdc_init_spark.operators.dedup import (
        minhash_portable_buckets,
        minhash_portable_buckets_stateless,
    )

    texts = [
        (0, "one"),                      # sub-gram: whole text is the gram
        (1, "two words"),                # still sub-gram for n=3
        (2, "a b c d e f g"),            # normal
        (3, "x x x x x x"),              # repeated tokens (multiset = set for min)
        (4, ""),                         # empty → [""] token
        (5, "  spaced   out\ttokens "),  # normalization path
    ]
    df = spark.createDataFrame(texts, "doc_id int, text string")
    batch = {
        (r["doc_id"], r["band"], r["bucket"])
        for r in minhash_portable_buckets(df).collect()
    }
    stateless = {
        (r["doc_id"], r["band"], r["bucket"])
        for r in minhash_portable_buckets_stateless(df).collect()
    }
    assert stateless == batch
