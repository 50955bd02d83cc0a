"""t2 differential gate, locally: every corpus query with a DuckDB oracle
must match on row count, column set, and every cell value."""

from __future__ import annotations

import pytest

from cdc_init_spark.plans import ORACLE, QUERIES
from cdc_init_spark.testing import compare_frames, duckdb_connection

ORACLE_NAMES = sorted(n for n in QUERIES if n in ORACLE)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    spark_pd = QUERIES[name](spark, sf_dir).toPandas()
    duck_pd = duck.execute(ORACLE[name]).df()
    res = compare_frames(name, spark_pd, duck_pd)
    assert res.ok, str(res)


def test_all_queries_have_docstrings():
    for name, fn in QUERIES.items():
        assert fn.__doc__, f"{name} missing docstring (reference citation)"
