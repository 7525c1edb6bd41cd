"""SimHash: 64-bit locality-sensitive fingerprints.

Two inputs, one kernel:
* token/shingle hash arrays (text near-dup) — the signed per-bit vote
  over the set's element hashes;
* any existing 64-bit hash (e.g. the table's ``phash`` column) can be
  banded directly with :func:`yadf_spark.functions.hashes.band_columns`.

Near-dup candidates come from banding the simhash exactly like the
phash Hamming bands: values within Hamming distance < n_bands share at
least one band (pigeonhole), so banding + a ``bit_count(xor)`` filter is
recall-complete for radius <= n_bands - 1.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from yadf_spark.functions import hashes as H
from yadf_spark.functions import text as T


def _simhash_kernel(token_hashes: pd.Series) -> pd.Series:
    """array<long> element hashes -> 64-bit simhash.

    Vectorized per Arrow batch: flatten all rows' hashes, expand to a
    (total, 64) sign matrix (+1 where bit set, -1 where clear), sum per
    row segment with ``add.reduceat``, threshold at 0.

    A null hash array (null input text) is treated as empty — the
    caller (``add_simhash``) maps the output back to null for null
    text; the kernel itself must never raise on a None element because
    Spark may evaluate the UDF on every row regardless of any
    null-guarding ``when`` branch in the projection."""
    lengths = token_hashes.map(lambda h: 0 if h is None else len(h)).to_numpy(dtype=np.int64)
    n_rows = len(lengths)
    if n_rows == 0:
        return pd.Series([], dtype="int64")
    out = np.zeros(n_rows, dtype=np.uint64)
    nonempty = lengths > 0
    if nonempty.any():
        flat = np.concatenate(
            [np.asarray(h, dtype=np.int64) for h in token_hashes if h is not None and len(h)]
        ).astype(np.uint64)
        offsets = np.zeros(int(nonempty.sum()), dtype=np.int64)
        np.cumsum(lengths[nonempty][:-1], out=offsets[1:])
        shifts = np.arange(64, dtype=np.uint64)
        bits = ((flat[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int32)
        votes = np.add.reduceat(bits * 2 - 1, offsets, axis=0)
        vals = (votes > 0).astype(np.uint64)
        packed = (vals << shifts[None, :]).sum(axis=1, dtype=np.uint64)
        out[nonempty] = packed
    return pd.Series(out.astype(np.int64))


def simhash64():
    """The simhash pandas UDF. Created lazily — registering a pandas UDF
    parses its DDL return type, which needs an active SparkSession."""
    return F.pandas_udf(_simhash_kernel, "long")


def add_simhash(
    df: DataFrame,
    text_col: str = "caption",
    out_col: str = "simhash",
    k: int = 1,
    algo: str = "xxhash64",
) -> DataFrame:
    """k=1: token-level simhash (classic); k>1: shingle-level.

    ``algo="md5_32"`` is the oracle-portable mode: 32-bit token hashes
    from the md5 hex prefix (identical in DuckDB), so the whole simhash
    — votes, threshold, bit packing — is replayable in ANSI SQL; the
    upper 32 bits of the fingerprint are then always zero. Production
    default stays xxhash64 (full 64-bit spread, JVM-side)."""
    col = F.col(text_col)
    if k > 1:
        hashes_col = T.shingle_hashes(col, k)
    elif algo == "md5_32":
        hashes_col = F.transform(
            T.tokens(col), lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
        )
    else:
        hashes_col = F.transform(T.tokens(col), lambda t: F.xxhash64(t))
    # null text -> null simhash (null-in/null-out, the repo-wide
    # posture); the kernel still sees the null rows (pandas UDFs are
    # extracted and evaluated before the `when` projection) and treats
    # them as empty, so the guard here is purely about the OUTPUT value
    return df.withColumn(
        out_col,
        F.when(col.isNull(), F.lit(None).cast("long")).otherwise(simhash64()(hashes_col)),
    )


def hamming_band_candidates(
    df: DataFrame,
    hash_col: str,
    id_col: str,
    max_hamming: int,
    n_bands: int = 4,
    band_bits: int = 16,
    salt_bucket_above: int = 256,
    max_bucket: int = 100_000,
) -> DataFrame:
    """Candidate pairs whose 64-bit hashes differ by <= max_hamming bits.

    Recall-complete when max_hamming < n_bands (pigeonhole: some band is
    untouched). Uses the same salted bucket self-join as MinHash LSH —
    shared machinery, shared skew handling. The pair set carries the
    verified Hamming distance so downstream stages need no re-join."""
    from yadf_spark.operators.minhash import candidate_pairs_from_buckets, hash_bands

    assert max_hamming < n_bands, "banding is only recall-complete for radius < n_bands"
    src = df.select(F.col(id_col).alias("id"), F.col(hash_col).alias("_h"))
    bands = hash_bands(src, "id", "_h", n_bands, band_bits)
    # eager localCheckpoint, NOT persist: materializes before any
    # broadcast consumer (a broadcast built from an unpopulated cache
    # recomputes the whole candidate DAG on a concurrent driver thread,
    # see exact_jaccard) and its blocks are cleaner-freed — a persist
    # here would pin executor storage for the session lifetime
    pairs = candidate_pairs_from_buckets(bands, salt_bucket_above, max_bucket).localCheckpoint(
        eager=True
    )
    n_pairs = pairs.count()
    a = src.select(F.col("id").alias("id_a"), F.col("_h").alias("h_a"))
    b = src.select(F.col("id").alias("id_b"), F.col("_h").alias("h_b"))
    cand_ids = (
        pairs.select(F.col("id_a").alias("id")).unionByName(pairs.select(F.col("id_b").alias("id"))).distinct()
    )
    ca = cand_ids.select(F.col("id").alias("id_a"))
    cb = cand_ids.select(F.col("id").alias("id_b"))
    if 2 * n_pairs < 2_000_000:  # row-count bound on the broadcast side
        ca, cb = F.broadcast(ca), F.broadcast(cb)
    a = a.join(ca, "id_a", "left_semi")
    b = b.join(cb, "id_b", "left_semi")
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("hamming", H.hamming64(F.col("h_a"), F.col("h_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
