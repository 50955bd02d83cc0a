"""Corpus-wide physical-plan audit: every registered query's plan is
built (not executed) and screened for the anti-patterns that kill 100 TB
runs — cartesian products / nested-loop joins where an equi-join was
intended, and row-at-a-time Python evaluation (BatchEvalPython; all
Python in this engine must be Arrow-batched: ArrowEvalPython /
MapInPandas / FlatMapGroupsInPandas). Complements the targeted shape
tests in test_plans.py by sweeping the WHOLE registry, so a new query
can't silently regress into a driver-side or quadratic plan.
"""

from __future__ import annotations

import contextlib
import io

from cdc_init_spark.plans import QUERIES

# Deliberate exceptions, each justified at the query's own docstring:
#   q15_cross_join — the operator under test IS a cross join, on the
#     5-row region dim (tiny-dims-only by contract).
#   The rest are scalar-subquery joins: a SINGLE-ROW aggregate
#     (global avg / total count / the one query vector) broadcast-crossed
#     into the fact side — `BroadcastNestedLoopJoin Cross BuildRight` over
#     a 1-row build is the correct constant-size plan at any scale, not a
#     quadratic join (verified BuildRight side is the 1-row frame).
ALLOWED_CARTESIAN = {
    "q15_cross_join",
    "q61_cosine_topk",  # one query vector × embeddings
    "q93_dormant_customers",  # TPC-H Q22: global avg(acctbal) scalar
    "q96_important_stock",  # TPC-H Q11: fraction-of-total scalar
    "q114_tfidf_terms",  # corpus doc-count scalar for idf
    "q120_quantized_cosine_topk",  # one query vector × embeddings
    "q124_unigram_logprob",  # 1-row token-total broadcast for P(tok)
    "q133_theta_user_overlap",  # two 1-row sketch frames crossed (scalar pattern)
    "q145_bm25",  # 1-row corpus stats (N, avgdl) broadcast for idf/len-norm
    "q154_kmeans",  # 1-row cluster-size total broadcast for share
    "q156_bigram_logprob",  # 1-row token-total broadcast for P(tok)
    "q160_js_divergence",  # vocab × bounded source dim grid + 1-row |V| scalar
    "q161_pmi_collocations",  # 1-row token-total broadcast for the PMI scale
    "q166_tfidf_cosine_pairs",  # 1-row doc-count scalar broadcast for idf
    "q169_chi2_keyness",  # 1-row grand-total scalar broadcast for chi2
    "q168_temperature_mix",  # 1-row Σ n^α scalar broadcast for the share
    "q186_referential_audit",  # four 1-row audit counters crossed into one row
    "q182_approx",  # 1-row KLL quantile-grid frame broadcast-crossed in
    "q199_hard_negatives",  # bounded query SET × embeddings (ANN contract;
    #   build side is the |queries|-row broadcast matrix, one corpus pass)
    "q201_corpus_funnel",  # two 1-row stage counters crossed (scalar pattern)
    "q202_kneser_ney_ppl",  # 1-row bigram-type total crossed in (scalar pattern)
}

CARTESIAN_MARKERS = ("CartesianProduct", "BroadcastNestedLoopJoin")
ROW_PYTHON_MARKER = "BatchEvalPython"


def test_no_cartesian_or_row_python_anywhere(spark, sf_dir):
    violations: dict[str, list[str]] = {}
    for name, fn in QUERIES.items():
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            fn(spark, sf_dir).explain("formatted")
        plan = buf.getvalue()
        bad = []
        if name not in ALLOWED_CARTESIAN:
            bad += [m for m in CARTESIAN_MARKERS if m in plan]
        if ROW_PYTHON_MARKER in plan:
            bad.append(ROW_PYTHON_MARKER)
        if bad:
            violations[name] = bad
    assert not violations, f"plan anti-patterns: {violations}"
