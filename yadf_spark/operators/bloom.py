"""Broadcast-Bloom incremental dedup — novel-rows-vs-history without
shuffling the history.

The operational shape at 10^12 rows: a daily ingest batch (10^7-10^9
rows) must be deduped against the full historical corpus. A plain
``new LEFT ANTI JOIN history ON content_key`` shuffles BOTH sides on
the key — re-shuffling the entire 10^12-row history every day is the
single most expensive thing a pipeline can do. This operator keeps the
history scan narrow and exchange-free:

  1. build a Bloom filter over the (small) new batch's keys — one
     narrow pass over the batch, per-partition bitmasks OR-ed on the
     driver (n_partitions x m/8 bytes collected, NOT the keys),
  2. broadcast the bitmask and filter the history MAP-SIDE: a history
     row whose key is not in the filter cannot evict anything, so the
     surviving "candidate evictor" set is ~overlap + |history| x fpp —
     note the false-positive term scales with the HISTORY row count
     (every history row probes independently), so fpp must be sized
     against it: for ~10^6 broadcastable survivors from a 10^12-row
     history you need fpp ~1e-6, which the m-bits formula turns into
     ~29 bits/item of batch — still tiny next to shuffling the history,
  3. exact LEFT ANTI JOIN of the batch against the pruned candidate
     set — planned by AQE: broadcast when the surviving set is small
     (the designed regime), a shuffle of just the pruned candidates
     otherwise. Either way the RAW history never crosses an exchange.

Bloom false positives only inflate step 3's build side; step 3 is
exact, so the RESULT is bit-identical to the plain anti-join — which is
exactly what the DuckDB oracle replays (``NOT EXISTS``). False
negatives don't exist, so no novel row is ever lost and no duplicate
ever survives.

This is the explicit form of what Spark's runtime bloom-filter join
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) injects for
selective shuffle joins; doing it by hand lets the filter be (a) built
from an arbitrary expression key, (b) persisted and REUSED across daily
runs (the streaming band index's natural companion — see
``streaming/dedup.py``), and (c) applied before any exchange at all.

Reference analog: the size-prefilter idea (a file with a unique size
can never be a duplicate — /root/reference/src/fs.rs:42-47) lifted to
set membership: a history row whose key misses the batch's filter can
never be a duplicate witness.

All kernels are numpy over Arrow batches — no per-row Python. The
bloom's internal hashing is Kirsch-Mitzenmacher double hashing over an
int64 key produced JVM-side (``xxhash64``), so Python never touches
strings.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: refuse to build a filter wider than this many BITS (256 MiB of
#: broadcast) — above it, the batch side is no longer "small" and the
#: right tool is a bucketed/sorted anti-join, not a driver broadcast
MAX_BITS = 1 << 31

#: second hash multiplier for Kirsch-Mitzenmacher double hashing — any
#: odd 64-bit constant works; this is the golden-ratio mix constant
_H2_MULT = np.uint64(0x9E3779B97F4A7C15)


def bloom_params(n_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """Classic sizing: m = -n ln p / (ln 2)^2 bits, k = m/n ln 2 probes.
    m is rounded up to a multiple of 64; k clamped to [1, 16]."""
    n = max(int(n_items), 1)
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = max((m + 63) // 64 * 64, 64)
    if m > MAX_BITS:
        raise ValueError(
            f"bloom filter would need {m} bits (> {MAX_BITS}) for n={n_items}, "
            f"fpp={fpp}: the 'small' side is not small — use a bucketed "
            "anti-join (sinks/bucketed.py) instead of a broadcast filter"
        )
    k = max(1, min(16, round(m / n * math.log(2))))
    return m, k


def _positions(keys: np.ndarray, m: int, k: int) -> np.ndarray:
    """(len(keys), k) bit positions via double hashing, vectorized."""
    h1 = keys.astype(np.uint64)
    h2 = (h1 * _H2_MULT) | np.uint64(1)  # odd => full-period stepping
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m)).astype(np.int64)


def build_bloom(keys: DataFrame, m: int, k: int) -> bytes:
    """OR-reduce per-partition bitmasks of the int64 column ``key``.

    Each task accumulates ONE m-bit numpy mask across all its Arrow
    batches and emits a single binary row; the driver collects
    n_partitions masks (m/8 bytes each — the keys themselves never
    reach the driver) and ORs them."""
    n_bytes = m // 8

    def partition_mask(batches):
        mask = np.zeros(n_bytes, dtype=np.uint8)
        saw = False
        for pdf in batches:
            vals = pdf["key"].to_numpy()
            if len(vals) == 0:
                continue
            saw = True
            pos = _positions(np.asarray(vals, dtype=np.int64), m, k).ravel()
            np.bitwise_or.at(mask, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        if saw:
            yield pd.DataFrame({"mask": [mask.tobytes()]})

    rows = keys.select(F.col("key")).mapInPandas(partition_mask, "mask binary").collect()
    out = np.zeros(n_bytes, dtype=np.uint8)
    for r in rows:
        out |= np.frombuffer(r["mask"], dtype=np.uint8)
    return out.tobytes()


def might_contain(spark, bloom: bytes, m: int, k: int, key: Column) -> Column:
    """Boolean column: key possibly in the filter (no false negatives).
    The bitmask ships to executors once via a broadcast variable; the
    probe is a vectorized gather + bit-test per Arrow batch."""
    bc = spark.sparkContext.broadcast(bloom)

    @F.pandas_udf("boolean")
    def probe(vals: pd.Series) -> pd.Series:
        mask = np.frombuffer(bc.value, dtype=np.uint8)
        keys_arr = np.asarray(vals.to_numpy(), dtype=np.int64)
        if len(keys_arr) == 0:
            return pd.Series([], dtype=bool)
        pos = _positions(keys_arr, m, k)
        bits = (mask[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return pd.Series(bits.all(axis=1))

    return probe(key)


def novel_rows(
    new: DataFrame,
    history: DataFrame,
    key: Column,
    history_key: Column | None = None,
    fpp: float = 0.01,
    n_items: int | None = None,
    key_alias: str | None = None,
) -> DataFrame:
    """Rows of ``new`` whose ``key`` value does not occur in ``history``
    — bit-identical to ``new LEFT ANTI JOIN history ON key`` (nulls
    never match, so null-key rows are always novel), but the history
    side is pruned map-side by a Bloom filter built over the batch and
    never crosses a hash exchange.

    ``key`` is any expression over ``new``'s columns (``history_key``
    defaults to the same expression evaluated over ``history``). The
    bloom probes an int64 ``xxhash64`` of the key; the FINAL anti-join
    compares the key itself, so xxhash collisions cannot corrupt the
    result. ``n_items`` (estimated batch row count) skips the sizing
    count when the caller already knows it. ``key_alias`` keeps the
    evaluated key expression as an output column under that name (it
    was computed anyway — callers needing it shouldn't pay the
    expression twice).

    Sizing: the pruned candidate set is ~overlap + |history| * fpp —
    pick ``fpp`` against the HISTORY size, not the batch (module
    docstring). The final anti-join deliberately carries no broadcast
    hint: AQE broadcasts the candidate side when its runtime size is
    small and falls back to shuffling just the pruned candidates when a
    mis-sized fpp lets too many through — degraded, never OOM."""
    history_key = key if history_key is None else history_key

    batch = new.withColumn("_nk", key)
    # xxhash64 never returns null (null input hashes to the seed), so
    # the probe column is non-nullable — the Arrow batch arrives as
    # exact int64, never null-widened to float64
    batch = batch.withColumn("_nb", F.xxhash64(F.col("_nk")))
    if n_items is None:
        # lazy checkpoint: the count() computes, stores, and counts in
        # ONE job; later consumers read the stored blocks
        batch = batch.localCheckpoint(eager=False)
        n_items = batch.count()
    m, k = bloom_params(n_items, fpp)
    bloom = build_bloom(batch.select(F.col("_nb").alias("key")), m, k)

    hist = history.select(history_key.alias("_hk")).where(F.col("_hk").isNotNull())
    hist = hist.withColumn("_hb", F.xxhash64(F.col("_hk")))
    candidates = (
        hist.where(might_contain(new.sparkSession, bloom, m, k, F.col("_hb")))
        .select("_hk")
        .distinct()
    )
    out = batch.join(candidates, F.col("_nk") == F.col("_hk"), "left_anti")
    if key_alias is not None:
        out = out.withColumnRenamed("_nk", key_alias)
        return out.drop("_nb")
    return out.drop("_nk", "_nb")
