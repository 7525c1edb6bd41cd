"""Candidate-pair verification — the "trusted full hash" of the near-dup
pipeline (reference analog: the full-content hash stage, src/fs.rs:186-240;
hash inequality is exact proof of difference, so only same-looking pairs
pay the expensive comparison).

A pair is a verified duplicate iff
  * captions are equal, AND
  * decoded pixels match: identical, or PSNR >= 40 dB (lossy re-encode)
— the per-row invariant from BASELINE.json.input_hint.

The decode step runs inside a pandas UDF over Arrow batches. In this
container the codec is the deterministic fake from
``yadf_spark.fixtures.codec`` (Pillow is tried first and absent); the
Spark-side plumbing — broadcast semi-join so payload bytes never shuffle
at corpus scale, Arrow batching, null-safe fallback — is the real design.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pair_psnr_kernel(bytes_a: pd.Series, bytes_b: pd.Series) -> pd.Series:
    """PSNR in dB between two encoded images; inf -> 1e9 (identical),
    null/undecodable -> -1.0 (never verifies). Import inside the UDF so
    executors resolve the codec through their own PYTHONPATH."""
    import numpy as np

    from yadf_spark.fixtures.codec import decode_image, psnr

    out = []
    for a, b in zip(bytes_a, bytes_b):
        if a is None or b is None:
            out.append(-1.0)
            continue
        try:
            val = psnr(decode_image(bytes(a)), decode_image(bytes(b)))
        except Exception:
            # G7 analog (src/fs.rs:242-262): unreadable content degrades
            # to "not verified", never fails the job.
            val = -1.0
        out.append(1e9 if np.isinf(val) else val)
    return pd.Series(out, dtype="float64")


def pair_psnr():
    """The PSNR pandas UDF, created lazily (UDF registration parses its
    DDL return type, which needs an active SparkSession)."""
    return F.pandas_udf(_pair_psnr_kernel, "double")


def verify_pairs(
    pairs: DataFrame,
    images: DataFrame,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    caption_col: str = "caption",
    psnr_min_db: float = 40.0,
) -> DataFrame:
    """(id_a, id_b) -> verified pairs with evidence columns.

    The candidate set is assumed small vs the corpus: the image table is
    cut down by a broadcast semi-join on candidate ids before any
    shuffle, so the binary column crosses the exchange only for
    candidates (O6 design rule)."""
    pairs = pairs.persist()  # two consumers: the id set and the final join
    cand_ids = (
        pairs.select(F.col("id_a").alias("id"))
        .unionByName(pairs.select(F.col("id_b").alias("id")))
        .distinct()
    )
    feats = (
        images.select(
            F.col(id_col).alias("id"),
            F.col(bytes_col).alias("_bytes"),
            F.col(caption_col).alias("_caption"),
        )
        .join(F.broadcast(cand_ids), "id", "left_semi")
    )
    a = feats.select(
        F.col("id").alias("id_a"), F.col("_bytes").alias("bytes_a"), F.col("_caption").alias("cap_a")
    )
    b = feats.select(
        F.col("id").alias("id_b"), F.col("_bytes").alias("bytes_b"), F.col("_caption").alias("cap_b")
    )
    # Cheap predicates first (reference: src/fs/filter.rs:48-55): caption
    # equality and byte equality are JVM-side; only pairs that still need
    # pixel evidence pay the Python decode. NOTE: the decode UDF must sit
    # behind a real FILTER, not inside when(...) — Catalyst extracts
    # Python UDFs out of conditionals and evaluates them for every row,
    # shipping every payload byte to Python.
    joined = pairs.join(a, "id_a").join(b, "id_b").select(
        "id_a",
        "id_b",
        "bytes_a",
        "bytes_b",
        (F.col("cap_a") == F.col("cap_b")).alias("caption_equal"),
        (F.col("bytes_a") == F.col("bytes_b")).alias("bytes_equal"),
    )
    need_decode = F.col("caption_equal") & ~F.col("bytes_equal")
    decoded = joined.filter(need_decode).select(
        "id_a",
        "id_b",
        "caption_equal",
        pair_psnr()(F.col("bytes_a"), F.col("bytes_b")).alias("psnr_db"),
    )
    trivial = joined.filter(~need_decode).select(
        "id_a",
        "id_b",
        "caption_equal",
        F.when(F.col("bytes_equal"), F.lit(1e9)).otherwise(F.lit(-1.0)).alias("psnr_db"),
    )
    scored = decoded.unionByName(trivial)
    return scored.select(
        "id_a",
        "id_b",
        "caption_equal",
        "psnr_db",
        (F.col("caption_equal") & (F.col("psnr_db") >= psnr_min_db)).alias("verified"),
    )
