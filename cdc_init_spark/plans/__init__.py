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


# Importing the corpus modules populates the registry. ORDER MATTERS:
# the driver's correctness pass walks the registry in insertion order under
# a budget, so the cheap/core relational surface loads first (round-1
# coverage stopped 4 entries into relational because the LLM surface was
# imported first — VERDICT.md round 1, "Next round" item 1) and the
# expensive LSH/dedup pipelines load last.
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
