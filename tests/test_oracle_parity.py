"""Oracle-differential smoke at sf0.001: every registered query runs on
Spark and (when an oracle exists) on DuckDB, comparing row count +
column names + order-insensitive values. The driver's gate runs the
same comparison at sf0.01 — this is the fast in-repo twin."""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_SMOKE
from tools.verify_local import compare, duck_con

import __spark_entry__ as entrymod


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck_smoke():
    return duck_con(SF_SMOKE)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.columns) == 8


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck_smoke, name):
    spark_pdf = QUERIES[name](spark, SF_SMOKE).toPandas()
    if name not in ORACLES:
        # rows-only contract: must run and produce a stable schema
        assert spark_pdf.shape[1] > 0
        return
    duck_pdf = duck_smoke.sql(ORACLES[name]).df()
    problems = compare(name, spark_pdf, duck_pdf)
    assert not problems, problems
