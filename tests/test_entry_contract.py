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


def test_rotation_window_covers_never_driver_checked_queries():
    """The driver's correctness sweep checks only the FIRST 50 entries
    of queries(); the round-4 rotation promises that window to queries
    with no prior green driver verdict (VERDICT r3 item 1). Pin it as
    an invariant against the committed CORRECTNESS_r0{1,2,3}.json so an
    accidental reorder can't silently re-spend the window on
    already-verified entries."""
    import json
    import os

    repo = os.path.dirname(os.path.abspath(entrymod.__file__))
    greens: set[str] = set()
    for r in (1, 2, 3):
        path = os.path.join(repo, f"CORRECTNESS_r0{r}.json")
        if not os.path.exists(path):
            pytest.skip("prior-round correctness records not present")
        with open(path) as f:
            for k, v in json.load(f).items():
                if (
                    v.get("rows_match")
                    and v.get("schema_match")
                    and v.get("hash_match") is not False
                ):
                    greens.add(k)
    window = list(entrymod.queries())[:50]
    already_green = [k for k in window if k in greens]
    assert not already_green, (
        "driver window slots spent on already-verified queries: "
        f"{already_green}"
    )
    # the 7 round-2 failures lead the window
    assert window[:7] == [
        "ann_topk_srp",
        "ivf_near_dup",
        "images_exact_dedup",
        "images_near_dup_clusters",
        "images_metadata",
        "images_resize",
        "images_embedding_ann",
    ]


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_contract_query(spark, name):
    res = run_contract(spark, SF, only=[name])[name]
    assert res["ok"], res
