"""The UDF surface (SURVEY §2.2 B-X): one production-shaped example of
each extension point, with the performance contract documented.

UDFs are the slow path by design — everything in operators/ that CAN be a
built-in expression IS one. These exist for semantics Spark cannot express:
X1 scalar pandas UDF (Arrow-vectorized), X2 grouped-map applyInPandas,
X3 pandas UDAF (GROUPED_AGG), X4 UDTF (table function).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructType


@F.pandas_udf(DoubleType())
def winsorized_score(v: pd.Series) -> pd.Series:
    """X1: scalar pandas UDF — clip a metric to its batch 5th/95th
    percentile band and rescale to [0,1]. Arrow batches in, Arrow batches
    out; ~10-100× the throughput of a row-at-a-time Python UDF."""
    lo, hi = v.quantile(0.05), v.quantile(0.95)
    if hi <= lo:
        return pd.Series([0.5] * len(v), dtype="float64")
    return ((v.clip(lo, hi) - lo) / (hi - lo)).astype("float64")


def zscore_by_group(
    df: DataFrame, group_col: str, value_col: str, out_col: str = "zscore"
) -> DataFrame:
    """X2: grouped-map applyInPandas — per-group standardization where the
    whole group must be visible at once. One shuffle on the group key;
    each group materializes in a single Python worker (bound group sizes
    at scale — use salting for mega-groups)."""
    from pyspark.sql.types import StructField

    # note: StructType aliases the list it is given — build a fresh one so
    # the input DataFrame's schema object is never mutated
    schema = StructType(
        list(df.schema.fields) + [StructField(out_col, DoubleType())]
    )

    def standardize(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf[value_col].mean()
        sd = pdf[value_col].std(ddof=0) or 1.0
        pdf = pdf.copy()
        pdf[out_col] = (pdf[value_col] - mu) / sd
        return pdf

    from cdc_init_spark.functions.parallelism import widen_by

    return (
        widen_by(df, group_col)
        .groupBy(group_col)
        .applyInPandas(standardize, schema)
    )


@F.pandas_udf(DoubleType())
def geometric_mean(v: pd.Series) -> float:
    """X3: pandas UDAF (GROUPED_AGG) — an aggregate Spark lacks natively.
    Used as .agg(geometric_mean('x')); partial aggregation is NOT
    available for pandas UDAFs, so the group's values ship to one worker —
    acceptable for bounded groups only."""
    import numpy as np

    clean = v.dropna()
    pos = clean[clean > 0]
    if pos.empty:
        return float("nan")
    return float(np.exp(np.log(pos).mean()))


def ngrams_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 2
) -> DataFrame:
    """X4: UDTF-shaped row expansion — (doc) → one row per word n-gram.
    Expressed with explode over a JVM-side expression (the preferred UDTF
    form: the generator itself never leaves the JVM)."""
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    count = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(1), count),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return df.select(
        F.col(id_col), F.posexplode(grams).alias("pos", "ngram")
    )


def span_chunks_udtf():
    """X4 on the real Spark 4 Python UDTF API (not the explode form of
    ``ngrams_table``): a table function exploding a document into
    fixed-width token chunks with character offsets — the
    lateral-joinable building block of span-level processing. Returns
    the UDTF handle; register with ``spark.udtf.register("span_chunks",
    span_chunks_udtf())`` and use as
    ``SELECT d.doc_id, c.* FROM documents d,
       LATERAL span_chunks(d.text, 8) c``.

    Python UDTFs evaluate row-at-a-time in the Python worker — fine for
    lateral table expansion (output dominates input), but bulk
    hot-path chunking should keep using the codegen explode form
    (operators/dedup.chunk_rows); both are provided and tested to
    agree."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, start_char int, chunk string")
    class SpanChunks:
        def eval(self, text: str, m: int):
            if not text:
                return
            toks = text.split(" ")
            offset = 0
            for i in range(0, len(toks), m):
                window = toks[i : i + m]
                yield i // m, offset, " ".join(window)
                offset += sum(len(t) + 1 for t in window)

    return SpanChunks
