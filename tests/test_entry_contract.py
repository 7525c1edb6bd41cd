"""Local replica of the driver's correctness gate: every queries() entry
runs and every oracle_sql() pair matches DuckDB (row count + columns +
order-insensitive values) at sf0.001. The full sf0.01 run is exercised
by the driver; this keeps the contract green in-repo."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from yadf_spark.testing import run_contract

SF = "/root/testdata/sf0.001"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"doc_id", "size", "group_key", "stage"}


def test_every_query_has_callable_and_oracle_keys_subset():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert qs, "queries() must not be empty"
    assert set(oracles) <= set(qs), "oracle keys must reference real queries"
    # SQL-expressible coverage: at least 25 oracle-checked operators
    assert len(oracles) >= 25


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_contract_query(spark, name):
    res = run_contract(spark, SF, only=[name])[name]
    assert res["ok"], res
