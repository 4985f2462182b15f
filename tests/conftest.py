from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

# Hypothesis profiles: the default ("ci") is DERANDOMIZED so gate runs
# (driver, judge) can't flap on a freshly-discovered example — every
# example that ever falsified is pinned with @example or lives in the
# tracked .hypothesis/examples database. Export HYPOTHESIS_PROFILE=hunt
# locally to keep searching for new counterexamples.
from hypothesis import settings as _hsettings

_hsettings.register_profile("ci", derandomize=True)
_hsettings.register_profile("hunt", derandomize=False)
_hsettings.load_profile(os.environ.get("HYPOTHESIS_PROFILE", "ci"))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from geo_explorer_etl_spark.session import get_spark

    s = get_spark("pytest", cpus=int(os.environ.get("PYTEST_SPARK_CPUS", "8")))
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    tables = (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split()
    for t in tables:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_CORRECT}/{t}.parquet')"
        )
    return con
