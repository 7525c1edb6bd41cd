"""Deterministic sketch semantics: accuracy bounds, mergeability, and
layout-invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

from yadf_spark.operators import sketches


def _users(spark, n=3000, distinct=300):
    rows = [(i, f"u{i % distinct}", "a" if i % 2 == 0 else "b") for i in range(n)]
    return spark.createDataFrame(rows, "i long, user string, seg string")


def test_hll_estimate_within_error_bound(spark):
    df = _users(spark)
    exact = {r.seg: r.n for r in df.groupBy("seg").agg(
        F.countDistinct("user").alias("n")).collect()}
    est = {r.seg: r.est for r in sketches.hll_distinct(df, ["seg"], "user").collect()}
    # 1.04/sqrt(256) ~ 6.5% RSE; allow 4 sigma
    bound = 4 * sketches.hll_error_bound()
    for seg, n in exact.items():
        assert abs(est[seg] - n) / n < bound, (seg, est[seg], n)


def test_hll_registers_merge_by_max(spark):
    """Shard registers max-merged == whole-corpus registers — the
    property that makes the sketch streaming/rollup-safe."""
    df = _users(spark)
    a, b = df.filter("i < 1500"), df.filter("i >= 1500")
    whole = {
        (r.seg, r.bucket): r.m
        for r in sketches.hll_registers(df, ["seg"], "user").collect()
    }
    merged: dict = {}
    for shard in (a, b):
        for r in sketches.hll_registers(shard, ["seg"], "user").collect():
            k = (r.seg, r.bucket)
            merged[k] = max(merged.get(k, 0), r.m)
    assert merged == whole


def test_hll_is_layout_invariant(spark):
    df = _users(spark)
    e1 = sorted(map(tuple, sketches.hll_distinct(df, ["seg"], "user").collect()))
    e2 = sorted(map(tuple, sketches.hll_distinct(df.repartition(13), ["seg"], "user").collect()))
    assert e1 == e2


def test_kmv_exact_below_k_and_bounded_above(spark):
    df = _users(spark)
    # k larger than the distinct count -> exact answer
    exact_mode = {r.seg: r.est for r in sketches.kmv_distinct(df, ["seg"], "user", k=1000).collect()}
    assert exact_mode == {"a": 150.0, "b": 150.0}
    est = {r.seg: r.est for r in sketches.kmv_distinct(df, ["seg"], "user", k=64).collect()}
    for seg, e in est.items():
        assert abs(e - 150) / 150 < 0.5  # loose: k=64 RSE ~ 12.5%


def test_cms_never_underestimates_and_merges_by_sum(spark):
    df = _users(spark)
    toks = df.select(F.col("user").alias("token"))
    cms = sketches.cms_counts(toks)
    probe = toks.distinct()
    est = {r.token: r.est_cnt for r in sketches.cms_estimate(cms, probe).collect()}
    exact = {r.token: r.n for r in toks.groupBy("token").agg(F.count("*").alias("n")).collect()}
    assert all(est[t] >= n for t, n in exact.items())
    # cell-sum merge of two shards == whole-corpus sketch
    a = sketches.cms_counts(df.filter("i < 1500").select(F.col("user").alias("token")))
    b = sketches.cms_counts(df.filter("i >= 1500").select(F.col("user").alias("token")))
    merged = (
        a.unionByName(b).groupBy("seed", "bucket").agg(F.sum("cnt").alias("cnt"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, cms.collect()))


def test_sketches_ignore_null_values_and_keep_null_groups(spark):
    """COUNT(DISTINCT) semantics: NULL values contribute nothing to
    either estimate; a NULL GROUP KEY is a real group in both."""
    rows = [(f"u{i}", "a") for i in range(50)] + [(None, "a")] + [
        (f"u{i}", None) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "user string, seg string")
    clean = df.filter("user IS NOT NULL AND seg = 'a'")
    hll_with = {r.seg: r.est for r in sketches.hll_distinct(df.filter("seg = 'a'"), ["seg"], "user").collect()}
    hll_wo = {r.seg: r.est for r in sketches.hll_distinct(clean, ["seg"], "user").collect()}
    assert hll_with == hll_wo  # the NULL value changed nothing
    kmv = {r.seg: r.est for r in sketches.kmv_distinct(df, ["seg"], "user", k=16).collect()}
    assert set(kmv) == {"a", None}  # null group present
    hll = {r.seg: r.est for r in sketches.hll_distinct(df, ["seg"], "user").collect()}
    assert set(hll) == {"a", None}


def test_binned_quantiles_keeps_null_group_keys(spark):
    """A NULL group KEY is a group here too (ADVICE r3: the internal
    range/rank joins were equality joins, silently dropping NULL-keyed
    groups while the sibling sketches preserved them)."""
    rows = [("a", float(i)) for i in range(1, 101)] + [
        (None, float(i)) for i in range(1, 101)
    ]
    df = spark.createDataFrame(rows, "g string, x double")
    out = sketches.binned_quantiles(df, ["g"], "x", [0.5, 0.9])
    got = {(r.g, r.q): r.est for r in out.collect()}
    assert {k[0] for k in got} == {"a", None}
    # the NULL-keyed group estimates exactly like its named twin
    for q in (0.5, 0.9):
        assert got[(None, q)] == got[("a", q)]


def test_kmv_zero_hash_guard(spark):
    """h_k == 0 must not divide by zero (greatest(h_k, 1) guard): inject
    the 2^-60 all-zero-prefix state directly — unreachable through real
    hashing, so the estimate expression is driven from a planted state
    frame. Reverting the guard makes this row Infinity."""
    import math

    state = spark.createDataFrame(
        [("z", 0, 16), ("a", 1 << 59, 16), ("small", 7, 3)],
        "seg string, h_k long, n long",
    )
    out = {r.seg: r.est for r in sketches.kmv_estimate_from_state(state, ["seg"], k=16).collect()}
    assert all(math.isfinite(v) for v in out.values()), out
    assert out["z"] == round(15.0 / (1.0 / float(1 << 60)), 4)  # guard denominator
    assert out["a"] == 30.0  # (k-1) / 0.5
    assert out["small"] == 3.0  # below-k exact count


def test_cms_absent_probe_estimates_from_empty_cells(spark):
    """A token whose cells were never touched must estimate 0 (and
    must not vanish from the output)."""
    toks = spark.createDataFrame([("a",)] * 5, "token string")
    cms = sketches.cms_counts(toks, width=65536)  # wide -> no collisions
    probe = spark.createDataFrame([("a",), ("zz_never_seen",)], "token string")
    est = {r.token: r.est_cnt for r in sketches.cms_estimate(cms, probe, width=65536).collect()}
    assert est == {"a": 5, "zz_never_seen": 0}


def test_cms_counts_scans_the_token_frame_once(spark):
    toks = spark.createDataFrame([("a",), ("b",)], "token string")
    plan = sketches.cms_counts(toks)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") + plan.count("LocalTableScan") <= 1, plan


def test_hll_incremental_index_equals_whole_corpus_and_replay_is_idempotent(spark, tmp_path):
    """Batched register layers, max-merged at read time, must estimate
    exactly what a whole-corpus pass estimates — and a crash-replayed
    batch (same batch_id) must change nothing."""
    df = _users(spark)
    idx = str(tmp_path / "hll_idx")
    sketches.hll_index_batch(df.filter("i < 1500"), 0, idx, ["seg"], "user")
    sketches.hll_index_batch(df.filter("i >= 1500"), 1, idx, ["seg"], "user")
    inc = sorted(map(tuple, sketches.hll_estimate_from_index(spark, idx, ["seg"]).collect()))
    whole = sorted(map(tuple, sketches.hll_distinct(df, ["seg"], "user").collect()))
    assert inc == whole
    # replay batch 0 -> overwrite same layer -> identical estimates
    sketches.hll_index_batch(df.filter("i < 1500"), 0, idx, ["seg"], "user")
    again = sorted(map(tuple, sketches.hll_estimate_from_index(spark, idx, ["seg"]).collect()))
    assert again == whole


def test_binned_quantiles_within_one_bin_width_of_exact(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    vals = rng.normal(100, 15, size=5000)
    df = spark.createDataFrame([(float(v), "g") for v in vals], "x double, g string")
    est = {r.q: r.est for r in sketches.binned_quantiles(df, ["g"], "x", [0.5, 0.9, 0.99]).collect()}
    width = (vals.max() - vals.min()) / 256
    for q in (0.5, 0.9, 0.99):
        assert abs(est[q] - float(np.quantile(vals, q))) <= width + 1e-9


def test_binned_quantiles_constant_group_and_validation(spark):
    import pytest

    df = spark.createDataFrame([(7.0, "c")] * 9, "x double, g string")
    out = {r.q: r.est for r in sketches.binned_quantiles(df, ["g"], "x", [0.5, 0.99]).collect()}
    assert out == {0.5: 7.0, 0.99: 7.0}
    with pytest.raises(ValueError):
        sketches.binned_quantiles(df, ["g"], "x", [])
    with pytest.raises(ValueError):
        sketches.binned_quantiles(df, ["g"], "x", [1.5])


def test_binned_quantiles_layout_invariant(spark):
    import numpy as np

    rng = np.random.default_rng(9)
    rows = [(float(v), f"g{i % 3}") for i, v in enumerate(rng.uniform(0, 50, 900))]
    df = spark.createDataFrame(rows, "x double, g string")
    a = sorted(map(tuple, sketches.binned_quantiles(df, ["g"], "x", [0.5, 0.9]).collect()))
    b = sorted(map(tuple, sketches.binned_quantiles(df.repartition(17), ["g"], "x", [0.5, 0.9]).collect()))
    assert a == b


def test_binned_quantiles_broadcasts_stats_never_sorts_the_group(spark):
    """The per-group range/rank frames must broadcast into the scans —
    a SortMergeJoin would shuffle the corpus for 5-row statistics."""
    df = spark.createDataFrame([(float(i), f"g{i % 3}") for i in range(300)], "x double, g string")
    plan = (
        sketches.binned_quantiles(df, ["g"], "x", [0.5])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
