"""Broadcast-Bloom incremental dedup: exactness vs the plain anti-join
(the bloom is a prune, never a verdict), no-false-negative property of
the numpy kernel, sizing guard, and the scale-defining plan shape (the
history is filtered map-side and the final join is broadcast — no
sort-merge shuffle of the history)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from yadf_spark.operators import bloom


def _novel_ids(df):
    return sorted(r.id for r in df.select("id").collect())


def _frames(spark):
    # history: texts t0..t19; batch: overlap (t5..t14), novel (n0..n4),
    # an intra-batch duplicate pair of one novel text, and a null key
    hist = spark.createDataFrame(
        [(i, f"t{i}") for i in range(20)], "id long, text string"
    )
    batch_rows = (
        [(100 + i, f"t{5 + i}") for i in range(10)]
        + [(200 + i, f"n{i}") for i in range(5)]
        + [(300, "n0"), (301, None)]
    )
    batch = spark.createDataFrame(batch_rows, "id long, text string")
    return hist, batch


def test_novel_rows_matches_plain_anti_join(spark):
    hist, batch = _frames(spark)
    key = F.md5(F.col("text").cast("string"))
    got = _novel_ids(bloom.novel_rows(batch, hist, key=key))
    expected = _novel_ids(
        batch.withColumn("_k", key).join(
            hist.select(key.alias("_k")).distinct(), "_k", "left_anti"
        )
    )
    assert got == expected
    # novel texts + the intra-batch dup copy + the null-text row
    assert got == [200, 201, 202, 203, 204, 300, 301]


def test_novel_rows_exact_under_heavy_false_positives(spark):
    # fpp=0.5 forces a tiny, saturated filter — many history rows leak
    # through the prune, but the exact anti-join still decides
    hist, batch = _frames(spark)
    key = F.md5(F.col("text").cast("string"))
    got = _novel_ids(bloom.novel_rows(batch, hist, key=key, fpp=0.5))
    assert got == [200, 201, 202, 203, 204, 300, 301]


def test_kernel_has_no_false_negatives():
    rng = np.random.default_rng(7)
    keys = rng.integers(np.iinfo(np.int64).min, np.iinfo(np.int64).max, 5000,
                        dtype=np.int64)
    m, k = bloom.bloom_params(len(keys), fpp=0.01)
    mask = np.zeros(m // 8, dtype=np.uint8)
    pos = bloom._positions(keys, m, k).ravel()
    np.bitwise_or.at(mask, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
    probe = bloom._positions(keys, m, k)
    bits = (mask[probe >> 3] >> (probe & 7).astype(np.uint8)) & 1
    assert bits.all()  # every inserted key probes positive


def test_bloom_params_guard():
    with pytest.raises(ValueError, match="bucketed anti-join"):
        bloom.bloom_params(10**12, fpp=0.001)
    m, k = bloom.bloom_params(0)  # empty batch degrades, not crashes
    assert m >= 64 and 1 <= k <= 16


def test_history_is_never_sort_merge_shuffled(spark):
    hist, batch = _frames(spark)
    key = F.md5(F.col("text").cast("string"))
    out = bloom.novel_rows(batch, hist, key=key)
    # no broadcast HINT by design (a mis-sized fpp must degrade, not
    # OOM) — AQE converts to broadcast at runtime from the candidate
    # side's measured size, so assert on the FINAL adaptive plan
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan, plan
    final = plan.split("== Initial Plan ==")[0]  # AQE echoes the pre-runtime plan after it
    assert "BroadcastHashJoin" in final, plan
    assert "SortMergeJoin" not in final, plan
    # the bloom probe is an Arrow-batched filter on the history scan
    assert "ArrowEvalPython" in final, plan
