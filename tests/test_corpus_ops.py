"""Law tests for the training-corpus assembly operators
(cdc_init_spark/operators/corpus.py) — the oracle hash-match side lives
in the q112-q116 corpus entries (plans/corpus_ops.py); here we pin the
algebraic contracts: repetition metric values on crafted documents,
decontaminate == corpus minus report, packing feasibility/density/
partition-invariance, shuffle determinism, TF-IDF hand-computed scores.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from cdc_init_spark.operators import corpus


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "a a a a a"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "x y x y x y x y"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_repetition_signals_crafted(spark, docs):
    out = {
        r["doc_id"]: r
        for r in corpus.repetition_signals(docs).collect()
    }
    # doc 1: trigrams = [a a a] x3 -> 3 occurrences, 1 distinct.
    assert out[1]["n_ngrams"] == 3
    assert out[1]["dup_ngram_frac"] == pytest.approx(2 / 3)
    # all 4 bigrams are "a a" -> the top one owns every occurrence.
    assert out[1]["top_bigram_frac"] == pytest.approx(1.0)
    # doc 2: no repeated trigram or bigram ("the quick"/"the lazy" differ).
    assert out[2]["dup_ngram_frac"] == pytest.approx(0.0)
    assert out[2]["top_bigram_frac"] == pytest.approx(1 / 8)
    # doc 3: alternating -> bigrams "x y" x4, "y x" x3.
    assert out[3]["top_bigram_frac"] == pytest.approx(4 / 7)


def test_decontaminate_is_report_complement(spark, docs):
    evalset = spark.createDataFrame(
        [(100, "quick brown fox jumps over")], ["doc_id", "text"]
    )
    report = corpus.contamination_report(docs, evalset, n=5)
    hit_ids = {r["doc_id"] for r in report.collect()}
    assert hit_ids == {2}  # only doc 2 shares the 5-gram
    clean = corpus.decontaminate(docs, evalset, n=5)
    clean_ids = {r["doc_id"] for r in clean.collect()}
    assert clean_ids == {1, 3}
    # clean docs share no 5-gram with the eval set
    from cdc_init_spark.operators.dedup import ngram_rows

    shared = (
        ngram_rows(clean, n=5)
        .join(ngram_rows(evalset, n=5).select("_g").distinct(), "_g")
        .count()
    )
    assert shared == 0


def test_tfidf_hand_computed(spark):
    rows = [
        (1, "apple apple banana"),
        (2, "banana cherry"),
        (3, "cherry cherry cherry durian"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = corpus.tfidf_top_terms(df, k=1).collect()
    top = {r["doc_id"]: r for r in out}
    # doc 1: apple tf=2 df=1 -> 2*(ln(4/2)+1); banana tf=1 -> apple wins.
    assert top[1]["term"] == "apple"
    expected = round(2 * (math.log(4 / 2) + 1), 4)
    assert top[1]["tfidf"] == pytest.approx(expected, abs=1e-4)
    # doc 3: cherry tf=3 beats durian tf=1 even with lower idf.
    assert top[3]["term"] == "cherry"


def test_pack_sequences_laws(spark):
    rows = [(i, 10 + (i * 7) % 50) for i in range(250)] + [(500, 999)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    budget = 64
    packed = corpus.pack_sequences(df, "n_tokens", budget=budget).collect()
    assert len(packed) == len(rows)
    by_bin: dict[tuple[int, int], list] = {}
    for r in packed:
        by_bin.setdefault((r["grp"], r["bin"]), []).append(r)
    for (grp, b), members in by_bin.items():
        total = sum(m["n_tokens"] for m in members)
        # feasible unless a single oversize doc owns the bin
        assert total <= budget or len(members) == 1
    # bins dense from 0 per group
    for grp in {g for g, _ in by_bin}:
        bins = sorted(b for g, b in by_bin if g == grp)
        assert bins == list(range(len(bins)))
    # oversize doc sits alone
    oversize = [r for r in packed if r["doc_id"] == 500]
    assert len(by_bin[(oversize[0]["grp"], oversize[0]["bin"])]) == 1
    # partition-invariance: packing is a pure function of (id, weight)
    repacked = corpus.pack_sequences(
        df.repartition(13), "n_tokens", budget=budget
    ).collect()
    assert sorted(map(tuple, packed)) == sorted(map(tuple, repacked))


def test_shuffle_rows_deterministic(spark, docs):
    a = [r["doc_id"] for r in corpus.shuffle_rows(docs, "doc_id", "e1").collect()]
    b = [r["doc_id"] for r in corpus.shuffle_rows(docs, "doc_id", "e1").collect()]
    assert a == b
    # a different salt produces a different (here: checked non-equal) order
    c = [r["doc_id"] for r in corpus.shuffle_rows(docs, "doc_id", "e2").collect()]
    assert set(c) == set(a)
