"""The declared query corpus (SURVEY.md §2.3) — registry.

Every operator claimed in SURVEY §2.2 Part B registers here as:
  - a Spark callable ``(spark, sf_dir) -> DataFrame`` (DataFrame-first,
    built-in functions only in the hot path), and
  - where SQL-expressible, an equivalent ANSI/DuckDB oracle SQL string.

The driver runs both sides at sf0.01 and compares row-count + schema +
order-insensitive value hash. Column names are part of the contract: every
computed column is aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a corpus query. ``oracle`` is the DuckDB-runnable SQL twin;
    omit for non-SQL-expressible operators (driver then does rows-only)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query id {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# Importing the corpus modules populates the registry.
from cdc_init_spark.plans import relational as _relational  # noqa: E402,F401
from cdc_init_spark.plans import tpch as _tpch  # noqa: E402,F401
from cdc_init_spark.plans import windows as _windows  # noqa: E402,F401
from cdc_init_spark.plans import temporal as _temporal  # noqa: E402,F401
from cdc_init_spark.plans import stats as _stats  # noqa: E402,F401
from cdc_init_spark.plans import reshape as _reshape  # noqa: E402,F401
from cdc_init_spark.plans import analytics as _analytics  # noqa: E402,F401
from cdc_init_spark.plans import sketches as _sketches  # noqa: E402,F401
from cdc_init_spark.plans import functions as _functions  # noqa: E402,F401
from cdc_init_spark.plans import llm as _llm  # noqa: E402,F401
from cdc_init_spark.plans import llm_ops as _llm_ops  # noqa: E402,F401
from cdc_init_spark.plans import corpus_ops as _corpus_ops  # noqa: E402,F401
from cdc_init_spark.plans import pipeline as _pipeline  # noqa: E402,F401
from cdc_init_spark.plans import graph as _graph  # noqa: E402,F401

# REGISTRY ORDER MATTERS: the driver's correctness pass walks the registry
# in insertion order under a ~50-query/round budget. Rounds 1-2 exhausted
# that budget on relational+tpch+functions+llm (union: 96 green rows), so
# the rotation below front-loads the families with NO driver CORRECTNESS
# row in any round (VERDICT.md r2 "Next round" item 2): windows W1-W5
# (q30-q34), temporal T2-T4 (q55-q57), stats, reshape, sketches, analytics,
# graph — ~50 entries before the already-verified surface repeats.
# Relative order WITHIN a module is preserved. New queries append to the
# end of their module, keeping earlier rounds' artifacts comparable.
_MODULE_PRIORITY = [
    "windows",
    "temporal",
    "stats",
    "reshape",
    "sketches",
    "analytics",
    "graph",
    "pipeline",
    "corpus_ops",
    "llm_ops",
    "llm",
    "functions",
    "relational",
    "tpch",
]

# Queries added AFTER the round-2 artifacts go to the very END of the
# registry regardless of their module, so they never displace a
# never-driver-checked query out of the budget window (VERDICT r2 "Next
# round" item 4: additions must raise the coverage ratio, not dilute it).
_APPEND_LAST = [
    "q182_approx",
    "q195_bpe_apply",
    "q196_incremental_minhash_ingest",
    "q197_quality_classifier",
    "q198_rag_chunks",
    "q199_hard_negatives",
    "q200_char_entropy",
    "q201_corpus_funnel",
    "q202_kneser_ney_ppl",
]


def _rotate() -> None:
    rank = {m: i for i, m in enumerate(_MODULE_PRIORITY)}
    tail = {n: i for i, n in enumerate(_APPEND_LAST)}
    names = list(QUERIES)
    order = sorted(
        range(len(names)),
        key=lambda i: (
            names[i] in tail,
            tail.get(names[i], 0),
            rank.get(
                QUERIES[names[i]].__module__.rsplit(".", 1)[-1],
                len(_MODULE_PRIORITY),
            ),
        ),
    )
    rotated = {names[i]: QUERIES[names[i]] for i in order}
    QUERIES.clear()
    QUERIES.update(rotated)


_rotate()
