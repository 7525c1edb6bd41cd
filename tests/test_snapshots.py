"""Snapshot diff: planted add/remove/change truth + the narrow-shuffle
plan shape (payload columns must not cross the exchange)."""

from __future__ import annotations

from yadf_spark.operators import snapshots


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)],
        "id long, text string, size long",
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 20), (3, "c", 31), (5, "e", 50)],
        "id long, text string, size long",
    )
    out = {r.id: r.status for r in
           snapshots.snapshot_diff(old, new, "id", ["text", "size"]).collect()}
    assert out == {2: "changed", 3: "changed", 4: "removed", 5: "added"}


def test_snapshot_diff_separator_prevents_column_bleed(spark):
    old = spark.createDataFrame([(1, "ab", "c")], "id long, x string, y string")
    new = spark.createDataFrame([(1, "a", "bc")], "id long, x string, y string")
    out = snapshots.snapshot_diff(old, new, "id", ["x", "y"]).collect()
    assert [(r.id, r.status) for r in out] == [(1, "changed")]


def test_snapshot_diff_md5_matches_xxhash_statuses(spark):
    old = spark.createDataFrame(
        [(i, f"t{i}") for i in range(30)], "id long, text string"
    )
    new = spark.createDataFrame(
        [(i, f"t{i}" if i % 3 else f"t{i}!") for i in range(2, 32)],
        "id long, text string",
    )
    a = sorted(map(tuple, snapshots.snapshot_diff(old, new, "id", ["text"]).collect()))
    b = sorted(map(tuple,
                   snapshots.snapshot_diff(old, new, "id", ["text"], algo="md5").collect()))
    assert a == b


def test_snapshot_diff_payload_never_shuffles(spark):
    old = spark.createDataFrame([(1, "a" * 100)], "id long, text string")
    new = spark.createDataFrame([(1, "b" * 100)], "id long, text string")
    plan = (
        snapshots.snapshot_diff(old, new, "id", ["text"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the exchanges carry only (id, fp): the text column is projected
    # away below every exchange
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in m.group(1), plan


def test_snapshot_diff_null_is_not_empty_and_does_not_shift(spark):
    # NULL vs '' must read as changed, and a value moving between
    # columns must not fingerprint identically (concat_ws skips NULLs,
    # so an unencoded join would collapse both cases to "unchanged")
    old = spark.createDataFrame([(1, None, ""), (2, "x", None)],
                                "id long, x string, y string")
    new = spark.createDataFrame([(1, "", None), (2, None, "x")],
                                "id long, x string, y string")
    for algo in ("xxhash64", "md5"):
        out = {r.id: r.status
               for r in snapshots.snapshot_diff(old, new, "id", ["x", "y"],
                                                algo=algo).collect()}
        assert out == {1: "changed", 2: "changed"}


def test_snapshot_diff_separator_injection_cannot_collide(spark):
    # Values containing the old separator byte, colons, or digits must
    # not let content shift between column slots (length-prefix
    # encoding is injective; a separator join was not)
    cases = [
        (("a\x1fvb", "c"), ("a", "b\x1fvc")),
        (("ab", "c"), ("a", "bc")),
        (("1:a", "b"), ("1", ":ab")),
    ]
    for i, (o_vals, n_vals) in enumerate(cases):
        old = spark.createDataFrame([(1, *o_vals)], "id long, x string, y string")
        new = spark.createDataFrame([(1, *n_vals)], "id long, x string, y string")
        for algo in ("xxhash64", "md5"):
            out = snapshots.snapshot_diff(old, new, "id", ["x", "y"], algo=algo).collect()
            assert [(r.id, r.status) for r in out] == [(1, "changed")], (i, algo, out)
