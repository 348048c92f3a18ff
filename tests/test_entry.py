"""Driver-contract smoke tests for __spark_entry__."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) >= {"l_returnflag", "l_linestatus", "sum_qty"}


def test_queries_and_oracle_keys_align():
    qs = entry_mod.queries()
    sqls = entry_mod.oracle_sql()
    assert qs, "no queries registered"
    assert set(sqls) <= set(qs)
    for name, fn in qs.items():
        assert callable(fn), name
