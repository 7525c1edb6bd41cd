"""Distributed cardinality / frequency sketches — HyperLogLog, KMV,
and count-min — made DETERMINISTIC so a relational oracle can replay
them bit-for-bit.

At 10^12 rows, "how many distinct users per segment" and "how often
does this token occur" are the queries that turn a narrow partial-agg
scan into an unshuffleable monster if answered exactly: COUNT(DISTINCT)
shuffles every distinct value, and per-token exact counts keep
vocabulary-sized state. Sketches bound both: a fixed-size register set
per group, built map-side and merged associatively — the shuffle
carries O(groups × registers) bytes regardless of n.

Library implementations (Spark's ``approx_count_distinct``, DuckDB's
``approx_distinct``) use incompatible internal hashes, so their
estimates can never cross-check. These sketches hash with ``md5`` —
portable, deterministic, layout-independent — so Spark and DuckDB
derive IDENTICAL register values, and the estimate is a pure function
both engines compute from the same integers:

* **HLL** buckets on the first 8 md5 bits, takes ``rho`` = leading
  zeros of the next 52 bits + 1 (an exact integer via the binary-string
  length, never float log2), and — the portability trick — accumulates
  the harmonic sum in SCALED INTEGERS: each ``2^-M`` term becomes the
  BIGINT ``2^(53-M)``, so the only floats in the whole estimate are one
  division and the small-range ``ln`` correction.
* **KMV** (k minimum values) keeps the k smallest distinct 60-bit
  hashes per group; estimate ``(k-1) / u_k`` with ``u_k`` the k-th
  value normalized — exact integers until one final division.
* **Count-min** hashes each token through ``depth`` seeded rows of
  ``width`` counters; an estimate is the MIN of its counters — all
  integer arithmetic, so the oracle matches exactly, and the
  overestimate-only guarantee is testable.

All three register sets merge associatively (max / union-top-k / sum),
which is what makes them streaming- and rollup-safe: shard sketches
combine without revisiting data.
"""

from __future__ import annotations

import functools
import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: HLL geometry: 2^8 buckets, 52-bit rho field (md5 chars 3..15)
HLL_B = 8
HLL_M = 1 << HLL_B
_RHO_BITS = 52
_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)


def _md5(col):
    return F.md5(col.cast("string"))


def hll_registers(df: DataFrame, group_cols: list[str], value_col: str) -> DataFrame:
    """Per-(group, bucket) max-rho registers —
    ``(*group_cols, bucket, m)``. One partial-agg groupBy: a shard's
    registers combine map-side and MERGE BY MAX across shards/batches,
    so incremental and rollup use never rescans. NULL values are
    ignored (COUNT(DISTINCT) semantics); NULL group keys form their
    own group (GROUP BY semantics)."""
    df = df.filter(F.col(value_col).isNotNull())
    h = _md5(F.col(value_col))
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    w = F.conv(F.substring(h, 3, 13), 16, 10).cast("long")
    # rho = leading zeros of the 52-bit field + 1; exact via the length
    # of the binary string (conv drops leading zeros), never float log2
    rho = F.when(w == 0, F.lit(_RHO_BITS + 1)).otherwise(
        F.lit(_RHO_BITS + 1) - F.length(F.conv(F.substring(h, 3, 13), 16, 2))
    )
    return (
        df.select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").cast("int").alias("m"))
    )


def hll_distinct(
    df: DataFrame, group_cols: list[str], value_col: str, round_to: int = 4
) -> DataFrame:
    """HyperLogLog distinct-count estimate per group —
    ``(*group_cols, est)``.

    The harmonic sum is computed in scaled integers: bucket ``M``
    contributes ``2^(53-M)`` (a BIGINT; max total 256·2^53 < 2^63), and
    the ``m - n_present`` empty buckets contribute ``2^53`` each — so
    the sum is EXACT and engine-order-independent; floats enter only in
    the final division and the standard small-range correction
    ``m·ln(m/zeros)``. Estimates round to ``round_to`` so the oracle's
    libm and the JVM's agree."""
    return hll_estimate_from_registers(
        hll_registers(df, group_cols, value_col), group_cols, round_to
    )


def hll_estimate_from_registers(
    regs: DataFrame, group_cols: list[str], round_to: int = 4
) -> DataFrame:
    """The estimate half of ``hll_distinct``, over an already-built
    register frame — the incremental entry point: registers from many
    batches/shards union together, max-merge here, and estimate,
    without ever revisiting the data they summarize."""
    regs = regs.groupBy(*group_cols, "bucket").agg(F.max("m").cast("int").alias("m"))
    # 2^(53-M) as BIGINT; pow's double is exact for powers of two
    scaled = F.pow(F.lit(2.0), F.lit(_RHO_BITS + 1) - F.col("m")).cast("long")
    agg = regs.groupBy(*group_cols).agg(
        F.sum(scaled).alias("s_present"),
        F.count("*").alias("n_present"),
    )
    zeros = F.lit(HLL_M) - F.col("n_present")
    total = F.col("s_present") + zeros * F.lit(1 << (_RHO_BITS + 1)).cast("long")
    raw = (
        F.lit(_ALPHA * HLL_M * HLL_M * float(1 << (_RHO_BITS + 1)))
        / total.cast("double")
    )
    est = F.when(
        (raw <= 2.5 * HLL_M) & (zeros > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(*group_cols, F.round(est, round_to).alias("est"))


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
    round_to: int = 4,
) -> DataFrame:
    """K-minimum-values distinct estimate per group —
    ``(*group_cols, est)``: the k smallest distinct 60-bit md5 values;
    ``est = (k-1) / u_k`` with ``u_k`` the k-th smallest normalized to
    (0, 1]. Groups with fewer than k distinct hashes report the exact
    count (every distinct value is in hand). The per-group state is k
    longs — mergeable by union + re-top-k.

    Scale: distinct-hash dedup runs on the narrow (group, 8-byte hash)
    projection with map-side partial dedup; the k-smallest selection is
    TWO-PHASE (the ``similarity.partial_topk`` discipline): an
    Arrow-batched per-partition prune keeps k hashes per group per
    partition, so the exact window sorts k·partitions rows per group —
    never a one-task sort of a group's every distinct value (a 10^9-
    distinct segment would otherwise be a straggler)."""
    import pandas as pd

    # NULL values are ignored (COUNT(DISTINCT) semantics) — and must
    # be: a NULL hash would sort nulls-first in the window but NaN-last
    # in the prune, making the estimate layout-dependent
    h = F.conv(F.substring(_md5(F.col(value_col)), 1, 15), 16, 10).cast("long")
    hashes = (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, h.alias("h"))
        .distinct()
    )

    def prune(batches):
        acc = None
        for b in batches:
            cur = b if acc is None else pd.concat((acc, b), ignore_index=True)
            cur = cur.sort_values([*group_cols, "h"])
            # dropna=False: a NULL group key is a group (GROUP BY
            # semantics), not a row to silently discard
            acc = cur.groupby(list(group_cols), sort=False, dropna=False).head(k)
        if acc is not None and len(acc):
            yield acc

    pruned = hashes.mapInPandas(prune, hashes.schema)
    w = Window.partitionBy(*group_cols).orderBy("h")
    ranked = pruned.withColumn("r", F.row_number().over(w)).filter(F.col("r") <= k)
    agg = ranked.groupBy(*group_cols).agg(
        F.max("h").alias("h_k"), F.count("*").alias("n")
    )
    return kmv_estimate_from_state(agg, group_cols, k, round_to)


def kmv_estimate_from_state(
    agg: DataFrame, group_cols: list[str], k: int, round_to: int = 4
) -> DataFrame:
    """The KMV estimate from its per-group state frame
    ``(*group_cols, h_k, n)`` — split out so the h_k == 0 guard is
    unit-testable with an injected state row (the 2^-60 all-zero-prefix
    case is unreachable through real hashing)."""
    scale = float(1 << 60)
    # greatest(h_k, 1): h_k == 0 (an all-zero md5 prefix, p = 2^-60) would
    # otherwise divide by zero and report Infinity
    est = F.when(F.col("n") < k, F.col("n").cast("double")).otherwise(
        F.lit(float(k - 1))
        / (F.greatest(F.col("h_k"), F.lit(1)).cast("double") / F.lit(scale))
    )
    return agg.select(*group_cols, F.round(est, round_to).alias("est"))


def _cms_bucket(token_col: str, seed: int, width: int):
    """The seeded md5 counter index — ONE definition shared by the
    cell build and the probe side, which must stay bit-identical or
    every estimate silently breaks."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{seed}:"), F.col(token_col))), 1, 6),
            16,
            10,
        ).cast("long")
        % width
    )


def cms_counts(
    tokens: DataFrame, token_col: str = "token", depth: int = 4, width: int = 256
) -> DataFrame:
    """The count-min sketch table for a token stream —
    ``(seed, bucket, cnt)``: ``depth`` seeded md5 rows of ``width``
    counters. ONE scan of the (already exploded) token frame: each row
    explodes to its ``depth`` (seed, bucket) memberships in-plan — a
    per-seed union would rescan the corpus-sized frame ``depth``
    times, since Catalyst does not share scans across union branches.
    ``depth × width`` counters total, regardless of vocabulary size —
    THE bounded-state frequency structure; merges across shards by
    summing cells."""
    memberships = F.array(
        *[
            F.struct(
                F.lit(seed).alias("seed"),
                _cms_bucket(token_col, seed, width).alias("bucket"),
            )
            for seed in range(depth)
        ]
    )
    return (
        tokens.select(F.explode(memberships).alias("p"))
        .select("p.seed", "p.bucket")
        .groupBy("seed", "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame, probe: DataFrame, token_col: str = "token",
    depth: int = 4, width: int = 256,
) -> DataFrame:
    """Estimated occurrence count for each probe token —
    ``(token, est_cnt)`` = the MIN of its ``depth`` counters, with an
    EMPTY counter counting as 0 (so a never-seen token estimates 0 and
    every probe token gets a row — the sketch table is sparse, storing
    only touched cells). Pure integer arithmetic (never underestimates;
    collisions only inflate). The d×w sketch is the broadcast side."""
    probes = None
    for seed in range(depth):
        part = probe.select(
            F.col(token_col).alias("token"),
            F.lit(seed).alias("seed"),
            _cms_bucket(token_col, seed, width).alias("bucket"),
        )
        probes = part if probes is None else probes.unionByName(part)
    return (
        probes.join(F.broadcast(cms), ["seed", "bucket"], "left")
        .groupBy("token")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias("est_cnt"))
    )


def hll_error_bound(m: int = HLL_M) -> float:
    """The standard HLL relative standard error, ``1.04 / sqrt(m)`` —
    ~6.5% at the default 256 buckets."""
    return 1.04 / math.sqrt(m)


def hll_index_batch(
    batch: DataFrame,
    batch_id: int,
    index_dir: str,
    group_cols: list[str],
    value_col: str,
) -> None:
    """One ``foreachBatch`` tick of an incremental distinct-count
    index: write this micro-batch's registers under a ``batch_id=``
    subdirectory (overwrite — a crash-replayed batch lands on the same
    path, so the index is idempotent, the streaming band index's
    discipline). The index grows by O(groups × 256) rows per batch and
    NEVER revisits data; estimates read it back and max-merge."""
    regs = hll_registers(batch, group_cols, value_col)
    regs.write.mode("overwrite").parquet(f"{index_dir}/batch_id={int(batch_id)}")


def hll_estimate_from_index(
    spark, index_dir: str, group_cols: list[str], round_to: int = 4
) -> DataFrame:
    """Distinct-count estimates from a ``hll_index_batch`` register
    index: partition-discover the batch layers, max-merge, estimate —
    identical to a whole-corpus ``hll_distinct`` by the merge-by-max
    property (pytest-pinned), at the cost of reading registers only."""
    regs = spark.read.parquet(index_dir).drop("batch_id")
    return hll_estimate_from_registers(regs, group_cols, round_to)


def binned_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    qs: list[float],
    n_bins: int = 256,
    round_to: int = 4,
) -> DataFrame:
    """Histogram-sketch quantiles per group —
    ``(*group_cols, q, est)``: an equi-width ``n_bins`` histogram over
    the group's [min, max] range, quantile ``q`` read off the covering
    bin with uniform-within-bin interpolation at rank ``ceil(q·n)``.

    The bounded-state quantile at 10^12 rows: two partial-agg passes
    (min/max, then bin counts — each a narrow ~16 B/row shuffle of
    O(groups × n_bins) aggregated cells) instead of the exact
    quantile's per-group sort. Error is bounded by one bin width of
    the VALUE range per group. Deterministic arithmetic end to end
    (no sampling, no engine-specific sketch), so a relational oracle
    replays bins, ranks, and interpolation exactly. NULL values are
    ignored, but a NULL group KEY is a group (GROUP BY semantics — the
    sibling sketches preserve NULL keys, so the internal joins here
    are null-safe to match); a constant group (min == max) reports
    that constant at every q. Bin-count cells merge by sum (given
    shared min/max), the same rollup discipline as the other
    sketches."""
    if not qs:
        raise ValueError("binned_quantiles needs at least one q")
    if any(not 0.0 < q <= 1.0 for q in qs):
        raise ValueError(f"quantiles must be in (0, 1], got {qs}")
    v = F.col(value_col).cast("double")
    src = df.filter(v.isNotNull()).select(*group_cols, v.alias("_v"))
    rng = src.groupBy(*group_cols).agg(
        F.min("_v").alias("_lo"), F.max("_v").alias("_hi"), F.count("*").alias("_n")
    )
    # null-safe join keys: NULL group keys must survive the round trip
    # through the broadcast range/rank frames, not silently vanish
    _on = functools.reduce(
        lambda a, b: a & b,
        [F.col(c).eqNullSafe(F.col(f"_g{i}")) for i, c in enumerate(group_cols)],
    )
    _gkeys = [F.col(c).alias(f"_g{i}") for i, c in enumerate(group_cols)]
    width = (F.col("_hi") - F.col("_lo")) / F.lit(float(n_bins))
    binned = (
        src.join(F.broadcast(rng.select(*_gkeys, "_lo", "_hi")), _on)
        .withColumn(
            "_bin",
            F.when(F.col("_hi") == F.col("_lo"), F.lit(0)).otherwise(
                F.least(
                    F.floor((F.col("_v") - F.col("_lo")) / width),
                    F.lit(n_bins - 1),
                )
            ).cast("int"),
        )
        .groupBy(*group_cols, "_bin")
        .agg(F.count("*").alias("_cnt"))
    )
    w = Window.partitionBy(*group_cols).orderBy("_bin")
    cum = binned.withColumn("_cum", F.sum("_cnt").over(w))
    quantiles = None
    for q in qs:
        part = rng.select(
            *group_cols, F.lit(float(q)).alias("q"),
            F.ceil(F.lit(float(q)) * F.col("_n")).cast("long").alias("_rank"),
            "_lo", "_hi",
        )
        quantiles = part if quantiles is None else quantiles.unionByName(part)
    width_q = (F.col("_hi") - F.col("_lo")) / F.lit(float(n_bins))
    est = F.when(F.col("_hi") == F.col("_lo"), F.col("_lo")).otherwise(
        F.col("_lo")
        + width_q
        * (
            F.col("_bin").cast("double")
            + (F.col("_rank") - (F.col("_cum") - F.col("_cnt"))).cast("double")
            / F.col("_cnt").cast("double")
        )
    )
    covering = (
        F.broadcast(quantiles)
        .join(cum.select(*_gkeys, "_bin", "_cnt", "_cum"), _on)
        .filter(
            (F.col("_cum") >= F.col("_rank"))
            & ((F.col("_cum") - F.col("_cnt")) < F.col("_rank"))
        )
    )
    return covering.select(
        *group_cols, "q", F.round(est, round_to).alias("est")
    )
