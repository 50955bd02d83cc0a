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
from cdc_init_spark.plans import delta as _delta  # noqa: E402,F401

# REGISTRY ORDER MATTERS: the driver's correctness pass walks the registry
# in insertion order under a ~50-query/round budget. The order is DERIVED
# from the CORRECTNESS_r*.json artifacts the driver leaves in the repo root
# (VERDICT r3 "Next round" item 2 — no hand-maintained name list to forget):
# entries with no driver row in ANY prior round sort first, then verified
# entries oldest-round-first so spare budget re-confirms the stalest rows.


def _row_is_green(row: object) -> bool:
    """A driver row counts as verified ONLY when it reports success:
    a declared rows-only check (``err == "no_oracle"``) or an oracle row
    with no hard error and no ``False`` in any match field. A row with
    ``rows_match: false`` (or a real err) must NOT rotate its query out
    of the re-check window — that is exactly when it needs re-checking
    (ADVICE r4, medium)."""
    if not isinstance(row, dict):
        return False
    err = row.get("err")
    if err not in (None, "no_oracle"):
        return False
    return not any(
        row.get(k) is False for k in ("rows_match", "schema_match", "hash_match")
    )


def _driver_verified(root: str | None = None) -> dict[str, int]:
    """name -> LATEST round with a green driver CORRECTNESS row, parsed
    from ``CORRECTNESS_r*.json`` in the repo root (or ``root`` for tests).
    Latest-round (not earliest) so the spare re-verify budget cycles
    through ALL cohorts instead of re-checking the r1 cohort forever
    (VERDICT r4 "What's wrong" item 3). Rounds are walked ascending and
    the most recent row wins: a later failed row erases an older green
    one, putting the query back in the unverified (front) cohort."""
    import glob
    import json
    import os
    import re
    import warnings

    if root is None:
        root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
    latest_green: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", os.path.basename(path))
        if m is None:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError) as exc:
            warnings.warn(
                f"skipping unreadable driver artifact {path}: {exc} — "
                "registry rotation will not reflect this round",
                stacklevel=2,
            )
            continue
        if not isinstance(rows, dict):
            warnings.warn(
                f"skipping malformed driver artifact {path}: expected an "
                "object of per-query rows",
                stacklevel=2,
            )
            continue
        for name, row in rows.items():
            if _row_is_green(row):
                latest_green[name] = rnd
            else:
                latest_green.pop(name, None)
    return latest_green


def _registry_order(names: list[str], verified: dict[str, int]) -> list[str]:
    """Never-driver-verified (or last-seen-failed) entries first, in
    stable insertion order among themselves, then verified entries
    stalest-first (oldest LATEST green artifact round)."""
    pos = {n: i for i, n in enumerate(names)}
    return sorted(names, key=lambda n: (n in verified, verified.get(n, 0), pos[n]))


def _rotate() -> None:
    order = _registry_order(list(QUERIES), _driver_verified())
    rotated = {n: QUERIES[n] for n in order}
    QUERIES.clear()
    QUERIES.update(rotated)


_rotate()
