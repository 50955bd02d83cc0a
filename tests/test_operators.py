"""Operator semantics tests: dedup recall vs brute force, similarity
correctness vs exact computation, text heuristics, multimodal batch shape.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cdc_init_spark.operators import dedup, similarity, text
from cdc_init_spark.tables import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").cache()


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


# --- exact dedup ----------------------------------------------------------

def test_exact_dedup_matches_distinct(spark, docs):
    kept = dedup.exact_dedup(docs)
    n_distinct = docs.select("text").distinct().count()
    assert kept.count() == n_distinct
    # survivors are min-id representatives
    stats = dedup.exact_dedup_stats(docs)
    assert stats.agg(F.sum("n_dups")).first()[0] == docs.count()


def test_exact_dedup_synthetic(spark):
    df = spark.createDataFrame(
        [(1, "hello  world"), (2, "Hello world"), (3, "different")],
        ["doc_id", "text"],
    )
    kept = dedup.exact_dedup(df)
    # normalization: case + whitespace collapse → 1 and 2 are duplicates
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 3]


# --- minhash / jaccard ----------------------------------------------------

def _brute_jaccard_pairs(spark, df, threshold):
    sh = df.select("doc_id", dedup.shingle_hashes(F.col("text")).alias("s"))
    a = sh.selectExpr("doc_id as a", "s as sa")
    b = sh.selectExpr("doc_id as b", "s as sb")
    return (
        a.crossJoin(b)
        .filter(F.col("a") < F.col("b"))
        .withColumn(
            "j",
            F.size(F.array_intersect("sa", "sb"))
            / F.size(F.array_union("sa", "sb")),
        )
        .filter(F.col("j") >= threshold)
        .select("a", "b")
    )


def test_minhash_recall_vs_bruteforce(spark):
    """LSH with k=128,b=32 (r=4) must find essentially all pairs with
    Jaccard ≥ 0.8 (collision prob 1-(1-0.8^4)^32 ≈ 1.0)."""
    rows = []
    base = "the quick brown fox jumps over the lazy dog and runs far away ".split()
    for i in range(30):
        words = list(base)
        words[i % len(words)] = f"tok{i}"
        rows.append((i, " ".join(words * 3)))
    # add genuine near-dups: 100..104 share almost all text with 0
    for j in range(5):
        words = list(base) * 3
        words[j] = f"alt{j}"
        rows.append((100 + j, " ".join(words)))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    truth = {(r["a"], r["b"]) for r in _brute_jaccard_pairs(spark, df, 0.8).collect()}
    cand = {
        (r["a"], r["b"])
        for r in dedup.minhash_candidate_pairs(df).collect()
    }
    assert truth, "fixture should contain true near-dup pairs"
    missed = truth - cand
    assert len(missed) / len(truth) <= 0.05, f"missed {missed}"


def test_near_dedup_minhash_drops_duplicates(spark):
    rows = [(1, "alpha beta gamma delta epsilon zeta eta theta " * 5)]
    rows.append((2, rows[0][1]))  # exact dup
    rows.append((3, "completely different text about other things " * 5))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    kept = sorted(
        r["doc_id"] for r in dedup.near_dedup_minhash(df, threshold=0.8).collect()
    )
    assert kept == [1, 3]


def test_ngram_rows_hash_to_shingle_rows(spark, docs):
    """ngram_rows (gram strings) and shingle_hash_rows (xxhash64) are the
    same shingling: hashing the gram strings reproduces the hash rows."""
    d = docs.limit(100)
    via_strings = {
        (r["doc_id"], r["h"])
        for r in dedup.ngram_rows(d)
        .select("doc_id", F.xxhash64("_g").alias("h"))
        .collect()
    }
    via_hashes = {
        (r["doc_id"], r["_h"])
        for r in dedup.shingle_hash_rows(d, distinct=True).collect()
    }
    assert via_strings == via_hashes


def test_ngram_jaccard_neighbors(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta theta"),  # dup of 1
        (3, "totally different words about some other topic"),
        (9, "alpha beta gamma delta epsilon zeta eta theta"),  # outside gap of 1..2
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["a"], r["b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_neighbors(df, max_gap=5, threshold=0.5).collect()
    }
    assert got == {(1, 2): 1.0}  # (2,9) gap 7 > 5; 3 matches nothing


def test_minhash_portable_finds_dups(spark):
    rows = [(1, "alpha beta gamma delta epsilon zeta eta theta " * 4)]
    rows.append((2, rows[0][1]))
    rows.append((3, "completely different text about other things " * 4))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {(r["a"], r["b"]) for r in dedup.minhash_portable_pairs(df).collect()}
    assert (1, 2) in pairs
    assert not any(3 in p for p in pairs)


def test_simhash_portable_finds_dups(spark):
    rows = [(1, "alpha beta gamma delta epsilon zeta eta theta " * 4)]
    rows.append((2, rows[0][1]))  # identical → hamming 0, all blocks collide
    rows.append((3, "completely different text about other things " * 4))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {(r["a"], r["b"]): r["hamming"]
           for r in dedup.simhash_portable_pairs(df).collect()}
    assert got.get((1, 2)) == 0


def test_simhash_portable_bucket_cap_bounds_pairs(spark):
    """The per-bucket row_number cap (VERDICT r4 item 1): 30 identical
    docs land the same signature, so every shared (block, slice) bucket
    holds all 30 ids. bucket_cap=5 must keep exactly the 5 lowest ids
    per bucket — C(5,2) pairs, deterministically — while the uncapped
    run yields all C(30,2)."""
    rows = [(i, "alpha beta gamma delta epsilon zeta " * 3) for i in range(1, 31)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    capped = {
        (r["a"], r["b"])
        for r in dedup.simhash_portable_pairs(df, bucket_cap=5).collect()
    }
    assert capped == {(a, b) for a in range(1, 6) for b in range(a + 1, 6)}
    full = {
        (r["a"], r["b"])
        for r in dedup.simhash_portable_pairs(
            df, bucket_cap=None, max_bucket=None
        ).collect()
    }
    assert len(full) == 30 * 29 // 2 and capped <= full


def test_simhash_portable_max_bucket_drops_degenerate(spark):
    """The heavy-slice screen: with every bucket holding all 30
    identical docs, max_bucket=20 classifies them all as degenerate
    boilerplate and the pair set is empty."""
    rows = [(i, "alpha beta gamma delta epsilon zeta " * 3) for i in range(1, 31)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    assert dedup.simhash_portable_pairs(df, max_bucket=20).count() == 0


@pytest.mark.parametrize("driver_threshold", [5_000_000, 0])
def test_dedup_clusters_transitive(spark, driver_threshold):
    """Chains collapse to one component (the closure near_dedup's one-hop
    rule approximates); disconnected pairs stay separate. Both physical
    strategies (driver union-find / distributed label propagation) must
    produce the identical logical result."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 11)], ["a", "b"]
    )
    got = {
        r["id"]: r["cluster_id"]
        for r in dedup.dedup_clusters(
            pairs, driver_threshold=driver_threshold
        ).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 10}


def test_simhash_near_duplicates_close(spark):
    # SimHash needs a reasonable feature count: 120 distinct words, one
    # changed → ~3/118 shingles differ → few bit flips.
    words = [f"word{i}" for i in range(120)]
    near = list(words)
    near[60] = "CHANGED"
    far = [f"other{i}" for i in range(120)]
    rows = [(1, " ".join(words)), (2, " ".join(near)), (3, " ".join(far))]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {
        (r["a"], r["b"]): r["hamming"]
        for r in dedup.simhash_candidate_pairs(df).collect()
    }
    assert (1, 2) in pairs
    assert pairs[(1, 2)] <= 10
    assert pairs.get((1, 3), 64) > pairs[(1, 2)]


# --- similarity -----------------------------------------------------------

def test_cosine_topk_matches_numpy(spark, emb):
    rows = emb.collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    q = mat[ids.tolist().index(1)]
    sims = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = np.lexsort((ids, -sims))[:5]
    expected = list(ids[order])
    got = [
        r["vec_id"]
        for r in similarity.cosine_topk(emb, list(q), k=5).collect()
    ]
    assert got == expected


def test_cosine_topk_many_matches_single(spark, emb):
    queries = emb.filter(F.col("vec_id").isin(1, 2)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    many = similarity.cosine_topk_many(emb, queries, k=5)
    for qid in (1, 2):
        qvec = emb.filter(F.col("vec_id") == qid).first()["embedding"]
        single = [
            (r["vec_id"], round(r["score"], 9))
            for r in similarity.cosine_topk(emb, list(qvec), k=5).collect()
        ]
        got = [
            (r["vec_id"], round(r["score"], 9))
            for r in many.filter(F.col("query_id") == qid)
            .orderBy(F.col("score").desc(), "vec_id")
            .collect()
        ]
        assert [g[0] for g in got] == [s[0] for s in single]


def test_ivf_topk_recall(spark, emb):
    """IVF with nprobe=nlist is exhaustive → equals brute force; with
    fewer probes it still finds the true top-1 (self cluster)."""
    cent = similarity.train_centroids(emb, nlist=8, sample_size=1000)
    indexed = similarity.assign_lists(emb, cent).cache()
    q = emb.filter(F.col("vec_id") == 1).first()["embedding"]
    exact = [r["vec_id"] for r in similarity.cosine_topk(emb, list(q), 5).collect()]
    full = [
        r["vec_id"]
        for r in similarity.ivf_topk(indexed, cent, list(q), 5, nprobe=8).collect()
    ]
    assert full == exact
    probed = [
        r["vec_id"]
        for r in similarity.ivf_topk(indexed, cent, list(q), 5, nprobe=2).collect()
    ]
    assert probed[0] == exact[0]


def test_cosine_self_join_finds_identical_vectors(spark):
    import pyspark.sql.types as T

    rows = [(1, [1.0, 0.0, 0.5, 0.2]), (2, [1.0, 0.0, 0.5, 0.2]),
            (3, [-1.0, 0.3, 0.0, 0.9])]
    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ])
    df = spark.createDataFrame(rows, schema)
    pairs = similarity.cosine_self_join(df, threshold=0.99)
    got = [(r["a"], r["b"]) for r in pairs.collect()]
    assert got == [(1, 2)]


# --- text -----------------------------------------------------------------

def test_detect_language(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and it was happy for the day"),
            (2, "der hund ist nicht mit der katze und das ist gut zu sehen"),
            (3, "xyzzy plugh qwerty asdf zxcv"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r["lang"]
        for r in df.select(
            "doc_id", text.detect_language(F.col("text")).alias("lang")
        ).collect()
    }
    assert got[1] == "en"
    assert got[2] == "de"
    assert got[3] == "und"


def test_quality_features_ranges(spark, docs):
    prof = text.quality_features(docs.limit(50))
    rows = prof.collect()
    for r in rows:
        assert 0.0 <= r["quality_score"] <= 1.0
        assert 0.0 <= r["alpha_ratio"] <= 1.0
        assert r["n_tokens"] > 0


def test_token_counts(spark):
    df = spark.createDataFrame([(1, "Hello, world! 123 test")], ["doc_id", "text"])
    r = df.select(
        text.token_count_whitespace(F.col("text")).alias("ws"),
        text.token_count_bpe_like(F.col("text")).alias("bpe"),
    ).first()
    assert r["ws"] == 4
    assert r["bpe"] >= 6  # subword-ish counts exceed whitespace counts


def test_fingerprint_stability(spark, docs):
    fp1 = docs.select("doc_id", text.fingerprint(F.col("text")).alias("fp"))
    fp2 = docs.select("doc_id", text.fingerprint(F.col("text")).alias("fp"))
    assert fp1.subtract(fp2).count() == 0
    # near-identical docs share most fingerprint hashes
    r = (
        spark.createDataFrame(
            [(1, "a b c d e f g h i j k l m n o p"), (2, "a b c d e f g h i j k l m n o q")],
            ["doc_id", "text"],
        )
        .select(text.fingerprint(F.col("text"), n=3, mod=2).alias("fp"))
        .collect()
    )
    s1, s2 = set(r[0]["fp"]), set(r[1]["fp"])
    assert len(s1 & s2) / max(len(s1 | s2), 1) > 0.5


def test_text_profile_matches_per_row_forms(spark, docs):
    """The fused explode-once text_profile must produce bit-identical
    values to the per-row column-function composition it replaces."""
    d = docs.limit(200)
    old = text.quality_features(d).withColumns(
        {
            "detected_lang": text.detect_language(F.col("text")),
            "bpe_token_count": text.token_count_bpe_like(F.col("text")),
            "fingerprint": text.fingerprint(F.col("text")),
            "rolling_hash": text.rolling_hash(F.col("text")),
        }
    )
    new = text.text_profile(d)
    cols = sorted(set(old.columns) & set(new.columns))
    po = old.select(*cols).orderBy("doc_id").collect()
    pn = new.select(*cols).orderBy("doc_id").collect()
    assert po == pn


# --- multimodal -----------------------------------------------------------

def test_multimodal_feature_shape(spark):
    from cdc_init_spark.operators.multimodal import (
        extract_image_features,
        resize_images,
        sample_frames,
    )

    df = spark.createDataFrame(
        [(1, b"fake-image-bytes-1"), (2, b"fake-image-bytes-2")],
        ["media_id", "content"],
    )
    feats = extract_image_features(df).collect()
    assert {r["media_id"] for r in feats} == {1, 2}
    assert all(len(r["features"]) == 16 for r in feats)
    # determinism of the stub decoder
    feats2 = extract_image_features(df).collect()
    assert sorted(map(str, feats)) == sorted(map(str, feats2))

    resized = resize_images(df, 4, 4).collect()
    from cdc_init_spark.operators.codecs import decode_png

    assert all(
        r["width"] == 4 and decode_png(bytes(r["content"])).shape == (4, 4, 3)
        for r in resized
    )

    frames = sample_frames(df).collect()
    assert all(r["ts_ms"] == r["frame_idx"] * 1000 for r in frames)
    assert len({(r["media_id"], r["frame_idx"]) for r in frames}) == len(frames)


def test_multimodal_audio_shape(spark):
    from cdc_init_spark.operators.multimodal import (
        audio_chunks,
        extract_audio_features,
    )

    df = spark.createDataFrame(
        [(1, b"fake-audio-bytes-1"), (2, b"fake-audio-bytes-2")],
        ["media_id", "content"],
    )
    feats = extract_audio_features(df, n_windows=8).collect()
    assert {r["media_id"] for r in feats} == {1, 2}
    assert all(len(r["features"]) == 16 for r in feats)  # 8 RMS + 8 ZCR
    assert all(0.0 <= f <= 1.5 for r in feats for f in r["features"])
    # determinism of the stub decoder
    feats2 = extract_audio_features(df, n_windows=8).collect()
    assert sorted(map(str, feats)) == sorted(map(str, feats2))

    chunks = audio_chunks(df, chunk_ms=250).collect()
    assert all(r["start_ms"] == r["chunk_idx"] * 250 for r in chunks)
    # 250 ms @ 16 kHz int16 = 8000 bytes per full chunk; last may be short
    by_media = {}
    for r in chunks:
        by_media.setdefault(r["media_id"], []).append(r)
    for rows in by_media.values():
        rows.sort(key=lambda r: r["chunk_idx"])
        assert all(len(r["chunk"]) == 8000 for r in rows[:-1])
        n_feat = [f for f in feats if f["media_id"] == rows[0]["media_id"]][0]
        total = sum(len(r["chunk"]) for r in rows) // 2
        assert total == n_feat["n_samples"]


def test_approx_count_distinct_tolerance(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    exact = o.select("o_custkey").distinct().count()
    approx = o.agg(F.approx_count_distinct("o_custkey").alias("n")).first()["n"]
    assert abs(approx - exact) / exact < 0.1


def test_xxhash64_self_consistency(spark):
    df = spark.createDataFrame([("abc",), ("abc",), ("xyz",)], ["s"])
    vals = [r["h"] for r in df.select(F.xxhash64("s").alias("h")).collect()]
    assert vals[0] == vals[1] != vals[2]


# --- sampling / governance operators (operators/sampling.py) -------------

def test_hash_split_deterministic_and_partitioning_invariant(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    from cdc_init_spark.operators.sampling import hash_split

    a = {r["doc_id"]: r["split"] for r in hash_split(d, "doc_id").collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(d.repartition(13), "doc_id").collect()
    }
    assert a == b  # membership is a pure function of the key
    n = len(a)
    from collections import Counter

    frac = {k: v / n for k, v in Counter(a.values()).items()}
    assert set(frac) == {"train", "val", "test"}
    assert abs(frac["train"] - 0.8) < 0.1
    assert abs(frac["val"] - 0.1) < 0.06
    assert abs(frac["test"] - 0.1) < 0.06


def test_hash_split_is_narrow(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    from cdc_init_spark.operators.sampling import hash_split

    plan = hash_split(d, "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-only: no shuffle at any scale


def test_uniform_hash_sample_consistent_per_key(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    from cdc_init_spark.operators.sampling import uniform_hash_sample

    s30 = {r["doc_id"] for r in uniform_hash_sample(d, "doc_id", 0.3).collect()}
    s60 = {r["doc_id"] for r in uniform_hash_sample(d, "doc_id", 0.6).collect()}
    assert s30 <= s60  # nested samples: growing the rate keeps prior members
    n = d.count()
    assert abs(len(s30) / n - 0.3) < 0.08
    salted = {
        r["doc_id"]
        for r in uniform_hash_sample(d, "doc_id", 0.3, salt="v2").collect()
    }
    assert salted != s30  # a different salt draws a different sample


def test_stratified_sample_exact_counts(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    from cdc_init_spark.operators.sampling import stratified_sample

    samp = stratified_sample(d, "lang", "doc_id", 5)
    per = {
        r["lang"]: r["n"]
        for r in samp.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    avail = {
        r["lang"]: r["n"]
        for r in d.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for lang, n in per.items():
        assert n == min(5, avail[lang])
    again = stratified_sample(d, "lang", "doc_id", 5)
    assert sorted(samp.collect()) == sorted(again.collect())


def test_redact_rules(spark):
    from cdc_init_spark.operators.text import redact, redaction_count

    rows = [
        ("a@b.com called 555-123-4567 re order 42", "<EMAIL> called <PHONE> re order <NUM>", 3),
        ("no pii here", "no pii here", 0),
        ("", "", 0),
        (None, None, None),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, (t, _, _) in enumerate(rows)], ["i", "t"]
    )
    got = {
        r["i"]: (r["red"], r["n"])
        for r in df.select(
            "i",
            redact(F.col("t")).alias("red"),
            redaction_count(F.col("t")).alias("n"),
        ).collect()
    }
    for i, (_, want_red, want_n) in enumerate(rows):
        assert got[i] == (want_red, want_n), (i, got[i])


def test_winnow_fingerprint_guarantee(spark):
    """Winnowing coverage property: two docs sharing a run of
    >= n + window - 1 tokens (6 here) share at least one fingerprint;
    docs shorter than 6 tokens emit none."""
    from cdc_init_spark.operators.text import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta"
    df = spark.createDataFrame(
        [
            (1, f"intro words {shared} tail one"),
            (2, f"other prefix {shared} different ending"),
            (3, "completely unrelated content about spark engines"),
            (4, "too short"),
        ],
        ["doc_id", "text"],
    )
    fps = winnow_fingerprints(df)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2]
    assert not (by_doc[1] & by_doc[3])
    assert 4 not in by_doc


def test_quantized_cosine_topk_recall(spark, emb):
    # int8 quantization perturbs scores by ~1e-3; top-5 should still
    # overlap the exact float top-5 heavily on random embeddings.
    rows = emb.collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    q = mat[ids.tolist().index(1)]
    sims = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    sims[ids.tolist().index(1)] = -2.0  # exclude the query itself
    exact = set(ids[np.lexsort((ids, -sims))[:5]])
    got = similarity.quantized_cosine_topk(emb, query_vec_id=1, k=5).collect()
    assert len(got) == 5
    assert len({r["vec_id"] for r in got} & exact) >= 4
    # quantized scores approximate float scores to ~1e-2
    float_by_id = {int(i): float(s) for i, s in zip(ids, sims)}
    for r in got:
        assert abs(r["score"] - float_by_id[r["vec_id"]]) < 1e-2
    # exactly reproducible under repartitioning (integer sums carry no
    # float summation order)
    again = similarity.quantized_cosine_topk(
        emb.repartition(7), query_vec_id=1, k=5
    ).collect()
    assert [(r["vec_id"], r["score"]) for r in got] == [
        (r["vec_id"], r["score"]) for r in again
    ]


def test_quantize_int8_roundtrip(spark):
    from cdc_init_spark.functions import vectors

    df = spark.createDataFrame(
        [(1, [1.0, -2.0, 0.5]), (2, [0.0, 0.0, 0.0])], ["vec_id", "embedding"]
    )
    out = df.select(
        "vec_id",
        vectors.quantize_int8(F.col("embedding")).alias("q"),
        vectors.quantize_scale(F.col("embedding")).alias("s"),
    ).collect()
    by_id = {r["vec_id"]: r for r in out}
    # max|x| = 2 -> scale 63.5: [64, -127, 32]
    assert by_id[1]["q"] == [64, -127, 32]
    assert by_id[1]["s"] == pytest.approx(63.5)
    # zero vector: all-zero codes, scale 0 sentinel
    assert by_id[2]["q"] == [0, 0, 0]
    assert by_id[2]["s"] == 0.0


def test_dedup_clusters_distributed_matches_unionfind_on_q103_fixture(
    spark, sf_dir
):
    """VERDICT r1 'Next round' item 4: run the q103 edge fixture through
    BOTH physical strategies — driver union-find (default threshold) and
    forced distributed label propagation (driver_threshold=0) — and
    assert the logical results are identical."""
    from cdc_init_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    edges = dedup.ngram_jaccard_neighbors(d, max_gap=50, threshold=0.02)
    via_driver = sorted(
        (r["id"], r["cluster_id"])
        for r in dedup.dedup_clusters(edges).collect()
    )
    via_distributed = sorted(
        (r["id"], r["cluster_id"])
        for r in dedup.dedup_clusters(edges, driver_threshold=0).collect()
    )
    assert via_driver == via_distributed
    assert via_driver  # fixture produces a non-empty edge set


def test_distributed_kmeans_lloyd_invariants(spark, sf_dir):
    """kmeans_fit_distributed: inertia is monotone non-increasing across
    iterations (Lloyd's guarantee), clearly beats a degenerate 1-cluster
    solution, and the hash-based init is deterministic."""
    import numpy as np

    from cdc_init_spark.operators.similarity import (
        kmeans_fit_distributed,
        kmeans_inertia,
    )
    from cdc_init_spark.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    inertias = [
        kmeans_inertia(e, kmeans_fit_distributed(e, k=8, iters=i))
        for i in (0, 1, 3)
    ]
    assert inertias[0] >= inertias[1] >= inertias[2] - 1e-9
    # k=1 at the global mean is the degenerate ceiling
    one = kmeans_fit_distributed(e, k=1, iters=1)
    assert inertias[2] < kmeans_inertia(e, one)
    # deterministic seedless init
    a = kmeans_fit_distributed(e, k=8, iters=0)
    b = kmeans_fit_distributed(e, k=8, iters=0)
    assert np.array_equal(a, b)


def test_triangles_per_node_known_graph(spark):
    """K4 plus a pendant vertex: K4 has 4 triangles, each K4 vertex sits
    in C(3,2)=3 of them, the pendant in none; edge direction/duplication
    in the input must not matter (canonicalization)."""
    from cdc_init_spark.operators.graph import triangles_per_node

    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    edges = spark.createDataFrame(
        k4 + [(b, a) for a, b in k4] + [(4, 5)], "src int, dst int"
    )
    got = {
        r["node"]: r["n_triangles"]
        for r in triangles_per_node(edges).collect()
    }
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_pagerank_star_graph_and_mass_conservation(spark):
    """Symmetrized star S4: the hub's rank exceeds every leaf's, leaves
    are equal by symmetry, and Σ pr = 1 (no dangling mass after
    symmetrize). Closed form at any iteration keeps leaves identical."""
    from cdc_init_spark.operators.graph import pagerank, symmetrize

    star = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], "src int, dst int"
    )
    pr = {
        r["node"]: r["pr"]
        for r in pagerank(symmetrize(star), iters=5).collect()
    }
    assert abs(sum(pr.values()) - 1.0) < 1e-9
    leaves = [pr[i] for i in range(1, 5)]
    assert all(abs(x - leaves[0]) < 1e-12 for x in leaves)
    assert pr[0] > max(leaves) * 2


def test_hits_bipartite_known_graph(spark):
    """Two customers, two suppliers: c1→{s1,s2}, c2→{s1}. After one
    iteration auth = in-degree (s1:2, s2:1), hubs fold those back
    (c1:3, c2:2); second iteration alternates the same integer sums
    (auth: s1=5, s2=3; hub: c1=8, c2=5). Pure-hub customers carry
    auth 0, pure-authority suppliers hub 0."""
    from cdc_init_spark.operators.graph import hits

    edges = spark.createDataFrame(
        [("c1", "s1"), ("c1", "s2"), ("c2", "s1")], "src string, dst string"
    )
    got = {
        r["node"]: (r["hub"], r["auth"]) for r in hits(edges, iters=2).collect()
    }
    assert got == {
        "c1": (8.0, 0.0),
        "c2": (5.0, 0.0),
        "s1": (0.0, 5.0),
        "s2": (0.0, 3.0),
    }


def test_graph_broadcast_gate_paths_agree(spark, monkeypatch):
    """The measured-count auto-broadcast gate (broadcast_state=None)
    must produce identical results on BOTH physical paths, and the
    shuffle path must be retained above the limit: with the node limit
    forced to 0 every graph is 'too big', so the plan carries no
    explicit broadcast hint of the state vector; with the default limit
    a tiny graph broadcasts (hint present in the analyzed plan)."""
    from cdc_init_spark.operators.graph import (
        bellman_ford,
        khop_distances,
        label_propagation,
        symmetrize,
        triangles_adjacency,
    )

    path = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], "src long, dst long"
    )
    edges = symmetrize(path)
    seeds = spark.createDataFrame([(1,)], "node long")
    wedges = edges.withColumn("w", F.lit(2).cast("bigint"))

    def hinted(df) -> bool:
        return "ResolvedHint" in df._jdf.queryExecution().analyzed().toString()

    # auto gate ON at the default limit (6 nodes ≤ 1M): hint present
    k_auto = khop_distances(edges, seeds, k=2)
    b_auto = bellman_ford(wedges, seeds, k=2)
    l_auto = label_propagation(edges, iters=2)
    t_auto = triangles_adjacency(path)
    assert hinted(k_auto) and hinted(b_auto) and hinted(l_auto)
    assert hinted(t_auto)
    snap = [
        sorted(map(tuple, df.collect()))
        for df in (k_auto, b_auto, l_auto, t_auto)
    ]

    # limits forced to 0: every graph is over the limit → shuffle path,
    # no state-broadcast hint anywhere, same results
    monkeypatch.setenv("SPARK_GRAFT_GRAPH_BCAST_NODES", "0")
    monkeypatch.setenv("SPARK_GRAFT_GRAPH_BCAST_EDGES", "0")
    k_sh = khop_distances(edges, seeds, k=2)
    b_sh = bellman_ford(wedges, seeds, k=2)
    l_sh = label_propagation(edges, iters=2)
    t_sh = triangles_adjacency(path)
    for df in (k_sh, b_sh, l_sh, t_sh):
        assert not hinted(df)
    assert snap == [
        sorted(map(tuple, df.collect()))
        for df in (k_sh, b_sh, l_sh, t_sh)
    ]


def test_khop_distances_path_graph(spark):
    """Path 1-2-3-4-5 with seed {1}: hops are the path distances,
    truncated at k; node 5 is unreached at k=3."""
    from cdc_init_spark.operators.graph import khop_distances, symmetrize

    path = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 5)], "src int, dst int"
    )
    seeds = spark.createDataFrame([(1,)], "node int")
    got = {
        r["node"]: r["hops"]
        for r in khop_distances(symmetrize(path), seeds, k=3).collect()
    }
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}


def test_pq_adc_recall_and_determinism(spark, sf_dir):
    """Product quantization (similarity.pq_train/pq_encode/pq_topk):
    (a) codebooks are deterministic (hash-ordered sample + seeded init);
    (b) encoding is partitioning-invariant; (c) ADC top-10 recalls most
    of the exact-L2 top-10 (m=8, 32 codes over dim=64 is a 32x
    compression — recall well above chance is the contract); (d) the
    ADC distance of a vector's own code is <= its distance to any other
    single code (table-lookup sanity)."""
    import numpy as np

    from cdc_init_spark.operators.similarity import (
        pq_encode,
        pq_topk,
        pq_topk_rerank,
        pq_train,
    )
    from cdc_init_spark.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    books = pq_train(e, m=8, k_codes=32)
    assert books.shape[0] == 8 and books.shape[1] == 32
    assert np.array_equal(books, pq_train(e, m=8, k_codes=32))

    coded = pq_encode(e.select("vec_id", "embedding"), books)
    a = {r["vec_id"]: list(r["codes"]) for r in coded.collect()}
    b = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(
            e.select("vec_id", "embedding").repartition(7), books
        ).collect()
    }
    assert a == b
    assert all(len(c) == 8 for c in a.values())

    qrow = e.filter("vec_id = 7").select("embedding").first()[0]
    qvec = [float(x) for x in qrow]
    approx = [r["vec_id"] for r in pq_topk(coded, books, qvec, k=10).collect()]
    shortlist = [
        r["vec_id"] for r in pq_topk(coded, books, qvec, k=100).collect()
    ]

    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in e.select("vec_id", "embedding").collect()
    }
    q = np.array(qvec)
    exact = sorted(vecs, key=lambda i: (float(((vecs[i] - q) ** 2).sum()), i))[:10]
    # near-random embeddings are PQ's worst case; still ≫ chance (10/500)
    assert len(set(approx) & set(exact)) / 10 >= 0.3
    # the query's own id must rank first: its code cell is the nearest
    # reconstruction available to ADC
    assert approx[0] == 7
    # the real contract is the SHORTLIST: ADC top-100 must recall nearly
    # all of the exact top-10, because production PQ reranks exactly
    assert len(set(shortlist) & set(exact)) / 10 >= 0.9

    reranked = pq_topk_rerank(
        coded, e.select("vec_id", "embedding"), books, qvec, k=10,
        shortlist=100,
    ).collect()
    got = [r["vec_id"] for r in reranked]
    # rerank scores are exact L2, so within the recalled set the order is
    # the exact order (any non-recalled exact ids are simply absent and
    # later candidates fill the tail); distances must agree with numpy
    want_prefix = [i for i in exact if i in set(shortlist)]
    assert got[: len(want_prefix)] == want_prefix or got == want_prefix[: len(got)]
    for r in reranked:
        np.testing.assert_allclose(
            r["l2_dist"], float(((vecs[r["vec_id"]] - q) ** 2).sum()), rtol=1e-9
        )


def test_tfidf_cosine_pairs_laws(spark):
    """tfidf_cosine_pairs: identical documents score exactly 1.0; a term
    occurring in EVERY document is removed by the df-cut, so documents
    sharing only that term produce no pair; pairs are canonical a<b."""
    from cdc_init_spark.operators.dedup import tfidf_cosine_pairs

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma common"),
            (2, "alpha beta gamma common"),   # exact dup of 1
            (3, "delta epsilon zeta common"), # shares only 'common' with 1/2
            (4, "delta epsilon zeta common"), # exact dup of 3
        ],
        "doc_id int, text string",
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["cosine"]
        for r in tfidf_cosine_pairs(docs, max_df=3, threshold=0.1).collect()
    }
    assert set(got) == {(1, 2), (3, 4)}
    assert got[(1, 2)] == 1.0 and got[(3, 4)] == 1.0
    # with the cut relaxed the cross-group 'common'-only pairs appear,
    # but far below the dup score
    loose = {
        (r["doc_a"], r["doc_b"]): r["cosine"]
        for r in tfidf_cosine_pairs(docs, max_df=4, threshold=0.0).collect()
    }
    assert set(loose) == {(a, b) for a in range(1, 5) for b in range(1, 5) if a < b}
    assert loose[(1, 3)] < 0.5 < loose[(1, 2)]


def test_bellman_ford_weighted_path(spark):
    """Weighted path 1→2→3 (w 1,1) with a direct heavy edge 1→3 (w 5):
    the two-edge path must win once k ≥ 2; unreachable nodes absent."""
    from cdc_init_spark.operators.graph import bellman_ford

    edges = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 1), (1, 3, 5), (9, 10, 1)], "src int, dst int, w int"
    )
    seeds = spark.createDataFrame([(1,)], "node int")
    one = {r["node"]: r["dist"] for r in bellman_ford(edges, seeds, k=1).collect()}
    assert one == {1: 0, 2: 1, 3: 5}
    two = {r["node"]: r["dist"] for r in bellman_ford(edges, seeds, k=2).collect()}
    assert two == {1: 0, 2: 1, 3: 2}


def test_label_propagation_two_cliques(spark):
    """Two triangles bridged by one edge: after 2 deterministic rounds
    every node carries its clique's minimum id; the min tiebreak keeps
    the bridge from merging the communities."""
    from cdc_init_spark.operators.graph import label_propagation, symmetrize

    tri1 = [(1, 2), (2, 3), (1, 3)]
    tri2 = [(11, 12), (12, 13), (11, 13)]
    edges = symmetrize(
        spark.createDataFrame(tri1 + tri2 + [(3, 11)], "src int, dst int")
    )
    got = {r["node"]: r["label"] for r in label_propagation(edges, iters=2).collect()}
    assert got[1] == got[2] == got[3] == 1
    assert got[12] == got[13] == got[11]
    assert got[12] != got[1]


def test_pca_matches_numpy(spark, emb):
    """pca_fit's mean/eigenvalues/components must agree with numpy PCA
    on the full data (covariance partials are exact sums), up to the
    documented sign convention; projection = (X − μ)Wᵀ; reconstruction
    error at k=8 beats k=1 (monotone capture)."""
    from cdc_init_spark.operators.similarity import pca_fit, pca_project

    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)
    mu_np = x.mean(axis=0)
    cov_np = np.cov(x, rowvar=False)
    vals_np, vecs_np = np.linalg.eigh(cov_np)
    top_np = vals_np[np.argsort(vals_np)[::-1][:3]]

    mu, vals, comps = pca_fit(emb, k=3)
    np.testing.assert_allclose(mu, mu_np, rtol=1e-9)
    np.testing.assert_allclose(vals, top_np, rtol=1e-7)
    assert comps.shape == (3, x.shape[1])
    # components are the top eigenvectors up to sign
    for i in range(3):
        ref = vecs_np[:, np.argsort(vals_np)[::-1][i]]
        dot = abs(float(np.dot(comps[i], ref)))
        assert dot > 1 - 1e-7
    # projection agrees with numpy
    got = {
        r["vec_id"]: np.asarray(r["pc"])
        for r in pca_project(emb, mu, comps).collect()
    }
    want = (x - mu[None, :]) @ comps.T
    for j, i in enumerate(ids):
        np.testing.assert_allclose(got[int(i)], want[j], atol=1e-8)
    # variance captured grows with k
    _, v1, c1 = pca_fit(emb, k=1)
    _, v8, c8 = pca_fit(emb, k=8)
    assert v8.sum() > v1.sum()


def test_triangles_adjacency_matches_orientation(spark):
    """The adjacency-intersection fast path and the degree-orientation
    wedge method are the same logical operator: identical counts on K4
    plus pendant and on a random-ish co-occurrence graph."""
    from cdc_init_spark.operators.graph import (
        triangles_adjacency,
        triangles_per_node,
    )

    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    edges = spark.createDataFrame(
        k4 + [(b, a) for a, b in k4] + [(4, 5)], "src int, dst int"
    )
    adj = {(r["node"], r["n_triangles"]) for r in triangles_adjacency(edges).collect()}
    ori = {(r["node"], r["n_triangles"]) for r in triangles_per_node(edges).collect()}
    assert adj == ori == {(1, 3), (2, 3), (3, 3), (4, 3)}

    rnd = spark.createDataFrame(
        [(a, b) for a in range(12) for b in range(12) if a < b and (a + b) % 3],
        "src int, dst int",
    )
    a2 = {(r["node"], r["n_triangles"]) for r in triangles_adjacency(rnd).collect()}
    o2 = {(r["node"], r["n_triangles"]) for r in triangles_per_node(rnd).collect()}
    assert a2 == o2 and a2


def test_ivfpq_recall_and_pruning(spark, emb):
    """IVF+PQ: the coded relation carries only (id, list_id, m codes);
    probing nprobe of nlist lists still recalls most of the exact
    top-10 (residual coding + shortlist discipline), and full-probe
    IVFPQ ranks the query's own vector first."""
    import numpy as np

    from cdc_init_spark.operators.similarity import ivfpq_build, ivfpq_topk

    coded, cent, books = ivfpq_build(emb, nlist=8, m=8, k_codes=32)
    row = coded.first()
    assert set(coded.columns) == {"vec_id", "list_id", "codes"}
    assert len(row["codes"]) == 8

    rows = emb.select("vec_id", "embedding").collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    q = list(vecs[7])
    exact = sorted(
        vecs, key=lambda i: (float(((vecs[i] - np.array(q)) ** 2).sum()), i)
    )[:10]

    # full probe: pure PQ error, no pruning loss — own id must rank 1st,
    # and the 100-candidate shortlist recalls most of the exact top-10
    full = [
        r["vec_id"]
        for r in ivfpq_topk(coded, cent, books, q, k=100, nprobe=8).collect()
    ]
    assert full[0] == 7
    assert len(set(full) & set(exact)) / 10 >= 0.7
    # pruned probe scans ~half the lists and still recalls well
    pruned = [
        r["vec_id"]
        for r in ivfpq_topk(coded, cent, books, q, k=100, nprobe=4).collect()
    ]
    assert len(set(pruned) & set(exact)) / 10 >= 0.5
