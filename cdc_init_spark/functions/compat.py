"""Cross-engine determinism helpers.

Spark's ROUND(double, n) goes through Java BigDecimal HALF_UP on the exact
binary expansion of the double; DuckDB computes round(x*10^n)/10^n with
half-away-from-zero on the *scaled* double. At 1-ulp boundaries these
disagree. ``round_compat`` reproduces the scaled form with Spark built-ins
(ROUND at scale 0 == half-away-from-zero on the double's exact value, same
as std::round), so both engines see bit-identical results.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_compat(col: Column, scale: int) -> Column:
    """DuckDB-equivalent ROUND(col, scale) for DOUBLE columns."""
    factor = F.lit(float(10**scale))
    return F.round(col * factor, 0) / factor
