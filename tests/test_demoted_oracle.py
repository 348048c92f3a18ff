"""Oracle check for every query DEMOTED past the 50-entry PRIORITY
window. The external harness samples only the window prefix, so this
suite is the automated correctness gate for the tail — without it,
"CI covers the demoted queries" would be an unbacked claim."""

from __future__ import annotations

import duckdb
import pytest

from portfolio1_etl_spark.plans import REGISTRY
from portfolio1_etl_spark.schemas import DRIVER_TABLES
from tools.check_oracle import _compare

WINDOW = 50
SF = "/root/testdata/sf0.001"

_TAIL = list(REGISTRY)[WINDOW:]


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    for t in DRIVER_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", _TAIL)
def test_demoted_query_matches_oracle(spark, name, oracle):
    q = REGISTRY[name]
    assert q.sql is not None, f"{name} demoted without oracle SQL"
    got = q.fn(spark, SF).toPandas()
    want = oracle.sql(q.sql).df()
    ok, msg = _compare(got, want)
    assert ok, f"{name}: {msg}"
