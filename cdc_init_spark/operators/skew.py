"""Skew-handling utilities for 100 TB shuffles.

AQE's skew-join splitting handles most cases at runtime
(spark.sql.adaptive.skewJoin.enabled — on in session.py); these are the
explicit plan-level tools for the cases AQE can't fix:

- ``salted_agg``: two-phase aggregation for skewed GROUP BY keys — phase 1
  aggregates on (key, salt) spreading a hot key over N reducers, phase 2
  merges the N partials. Works for any algebraic aggregate (sum/count/
  min/max; avg via sum+count).
- ``salted_join``: replicate the small side N× with salt values and salt
  the skewed fact side — a hot key's rows spread across N tasks instead
  of one straggler.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, col_name: str = "_salt") -> DataFrame:
    """Deterministic per-row salt in [0, n_salts): hash of the whole row —
    stable across retries (rand() would break task re-execution)."""
    return df.withColumn(
        col_name, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation. ``aggs`` maps column → one of
    sum|count|min|max|avg. Equivalent single-phase result, but the first
    shuffle key is (keys..., salt) so a hot key fans out n_salts ways."""
    salted = with_salt(df, n_salts)

    phase1_exprs = []
    for col, how in aggs.items():
        if how == "sum":
            phase1_exprs.append(F.sum(col).alias(f"_p_{col}"))
        elif how == "count":
            phase1_exprs.append(F.count(col).alias(f"_p_{col}"))
        elif how == "min":
            phase1_exprs.append(F.min(col).alias(f"_p_{col}"))
        elif how == "max":
            phase1_exprs.append(F.max(col).alias(f"_p_{col}"))
        elif how == "avg":
            phase1_exprs.append(F.sum(col).alias(f"_ps_{col}"))
            phase1_exprs.append(F.count(col).alias(f"_pc_{col}"))
        else:
            raise ValueError(f"unsupported aggregate {how!r} for {col!r}")
    partial = salted.groupBy(*keys, "_salt").agg(*phase1_exprs)

    phase2_exprs = []
    for col, how in aggs.items():
        if how == "sum":
            phase2_exprs.append(F.sum(f"_p_{col}").alias(f"{how}_{col}"))
        elif how == "count":
            phase2_exprs.append(F.sum(f"_p_{col}").alias(f"{how}_{col}"))
        elif how == "min":
            phase2_exprs.append(F.min(f"_p_{col}").alias(f"{how}_{col}"))
        elif how == "max":
            phase2_exprs.append(F.max(f"_p_{col}").alias(f"{how}_{col}"))
        elif how == "avg":
            phase2_exprs.append(
                (F.sum(f"_ps_{col}") / F.sum(f"_pc_{col}")).alias(f"{how}_{col}")
            )
    return partial.groupBy(*keys).agg(*phase2_exprs)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: the fact side gets a deterministic salt, the
    dim side is exploded n_salts× (one replica per salt value), and the
    join key becomes (on, salt). Dim must be small enough to replicate
    (if it broadcasts anyway, just use broadcast() — this is for dims too
    big to broadcast but far smaller than the fact)."""
    salted_fact = with_salt(fact, n_salts)
    replicated = dim.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>")),
    )
    out = salted_fact.join(replicated, on=[on, "_salt"], how=how)
    return out.drop("_salt")
