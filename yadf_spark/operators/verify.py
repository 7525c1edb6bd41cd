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


def _pair_psnr_kernel_dihedral(bytes_a: pd.Series, bytes_b: pd.Series) -> pd.Series:
    """Orientation-max PSNR: the best PSNR of ``a`` against ``b``'s
    eight dihedral-group (D4) transforms — identity, mirror, vertical
    flip, 180-rotation, transpose, 90/270-rotation, anti-transpose — so
    a mirrored OR rotated re-encode of the same shot scores as the
    re-encode it is. One decode per side; the seven extra orientations
    are numpy views, and the shape guard skips the rot90 family for
    free on non-square pairs whose dims can't match (a 90-rotated
    repost of a non-square image has swapped w/h, which the guard
    matches against ``a``'s own shape)."""
    import numpy as np

    from yadf_spark.fixtures.codec import decode_image, psnr

    out = []
    for a, b in zip(bytes_a, bytes_b):
        if a is None or b is None:
            out.append(-1.0)
            continue
        try:
            pa_ = decode_image(bytes(a))
            pb_ = decode_image(bytes(b))
            tb = pb_.transpose(1, 0, 2)
            best = -1.0
            for t in (
                pb_, pb_[:, ::-1], pb_[::-1, :], pb_[::-1, ::-1],
                tb, tb[:, ::-1], tb[::-1, :], tb[::-1, ::-1],
            ):
                if t.shape == pa_.shape:
                    v = psnr(pa_, t)
                    best = max(best, 1e9 if np.isinf(v) else float(v))
            val = best
        except Exception:
            val = -1.0
        out.append(val)
    return pd.Series(out, dtype="float64")


def pair_psnr(dihedral: bool = False):
    """The PSNR pandas UDF, created lazily (UDF registration parses its
    DDL return type, which needs an active SparkSession)."""
    return F.pandas_udf(_pair_psnr_kernel_dihedral if dihedral else _pair_psnr_kernel, "double")


def verify_pairs(
    pairs: DataFrame,
    images: DataFrame,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    caption_col: str = "caption",
    psnr_min_db: float = 40.0,
    star_caption_groups_above: int = 64,
    dihedral: bool = False,
) -> DataFrame:
    """(id_a, id_b) -> verified pairs with evidence columns.

    ``dihedral=True`` verifies mirrored/rotated re-encodes too: the
    decode tier scores orientation-max PSNR, and the viral-caption star
    subgroups key on the CANONICAL dihedral phash (so a mirrored copy
    inside a mega caption group lands in its original's subgroup
    instead of being dropped as cross-phash).

    Two-tier evaluation so payload bytes NEVER cross a shuffle (O6):

    1. narrow tier — every candidate pair joins only ``(caption_hash,
       content_hash)`` per side (~16 bytes/row). Caption equality and
       byte equality are decided on hashes (hash equality is trusted,
       exactly like the reference's full-content hash verdict,
       src/fs.rs:186-240).
    2. decode tier — only pairs with equal captions but unequal bytes
       (the lossy re-encode candidates, typically a tiny fraction) are
       re-joined to the actual payloads behind a broadcast semi-join on
       their id set, then scored by the PSNR pandas UDF.

    The previous single-tier design shuffled every candidate's binary
    payload through two sort-merge joins; at 100k fixture images that
    shuffle dominated the stage and halved its core-scaling efficiency.
    """
    # consumers: narrow join + decode-id set. Eager localCheckpoint, not
    # persist: blocks are freed by the context cleaner when the frame is
    # collected — no unpersist() obligation a library caller never gets
    # to honor (a persisted frame would pin executor storage for the
    # session's lifetime; same rationale as exact.exact_assignments).
    # Durability trade, deliberately: checkpoint blocks die with their
    # executor and lineage is truncated, so an executor loss mid-job
    # fails the JOB instead of recomputing — on clusters with executor
    # churn the pipeline Checkpointer's durable workdir stages bound the
    # blast radius to one stage re-run (see SCALE.md stage 6).
    pairs = pairs.localCheckpoint(eager=True)
    # a NULL payload must never hash-compare equal: xxhash64 leaves the
    # seed untouched for null input, so xxhash64(NULL) == xxhash64(NULL)
    # would claim two fetch-failed rows are byte-identical. Null hash →
    # null equality → coalesced to "not equal" below, routing the pair
    # to the decode tier, whose kernel already returns -1.0 (never
    # verifies) for null payloads — the G7 degrade posture end to end.
    feats = images.select(
        F.col(id_col).alias("id"),
        F.xxhash64(F.col(caption_col)).alias("_cap_h"),
        F.when(F.col(bytes_col).isNotNull(), F.xxhash64(F.col(bytes_col))).alias("_byte_h"),
    )
    a = feats.select(F.col("id").alias("id_a"), F.col("_cap_h").alias("cap_a"), F.col("_byte_h").alias("bh_a"))
    b = feats.select(F.col("id").alias("id_b"), F.col("_cap_h").alias("cap_b"), F.col("_byte_h").alias("bh_b"))
    narrow = (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("cap_a") == F.col("cap_b")).alias("caption_equal"),
            F.coalesce(F.col("bh_a") == F.col("bh_b"), F.lit(False)).alias("bytes_equal"),
        )
        # materialize NOW (eager checkpoint): the broadcast build below
        # runs on a driver thread concurrently with the main job, and an
        # unmaterialized frame would make it recompute the candidate DAG
        # in parallel with the main branches computing it again; blocks
        # are context-cleaner-freed, unlike a leaked persist()
        .localCheckpoint(eager=True)
    )
    need_decode = F.col("caption_equal") & ~F.col("bytes_equal")
    raw_decode = narrow.filter(need_decode).select("id_a", "id_b", "caption_equal")

    # Viral-caption guard: a caption shared by n images yields O(n^2)
    # caption-equal/bytes-different pairs, each demanding a pixel decode
    # — the one cost salting can't cap (it parallelizes the join, not
    # the decode count). Caption groups above the threshold switch to
    # STAR verification per (caption, phash) subgroup: phash is designed
    # to survive lossy re-encoding, so a visual family inside the mega
    # group shares a phash and its members decode once each against the
    # subgroup's min-id representative (n decodes, not n^2); star edges
    # are exactly what connected components needs. Cross-phash pairs
    # inside a mega caption group are dropped — phash inequality is
    # itself strong not-a-re-encode evidence, the same documented recall
    # trade as the LSH max_bucket cap. Requires a ``phash`` column;
    # corpora without one keep exact pairwise verification throughout.
    if "phash" in images.columns:
        caps = images.select(
            F.col(id_col).alias("id"),
            F.xxhash64(F.col(caption_col)).alias("cap_h"),
            F.col("phash").alias("_ph"),
        )
        if dihedral:
            from yadf_spark.operators.multimodal import with_canonical_phash

            caps = (
                with_canonical_phash(caps, "_ph", out_col="_cph")
                .drop("_ph")
                .withColumnRenamed("_cph", "_ph")
            )
        decode_ids_all = (
            raw_decode.select(F.col("id_a").alias("id"))
            .unionByName(raw_decode.select(F.col("id_b").alias("id")))
            .distinct()
        )
        # three consumers (big_caps, sub_reps, star_pairs) over a small
        # id-bounded frame — eager checkpoint for the same no-leak reason
        id_caps = caps.join(F.broadcast(decode_ids_all), "id", "left_semi").localCheckpoint(
            eager=True
        )
        big_caps = (
            id_caps.groupBy("cap_h")
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") > star_caption_groups_above)
            .select("cap_h")
        )
        sub_reps = (
            id_caps.join(F.broadcast(big_caps), "cap_h")
            .groupBy("cap_h", "_ph")
            .agg(F.min("id").alias("rep"))
        )
        star_pairs = (
            id_caps.join(F.broadcast(big_caps), "cap_h")
            .join(sub_reps, ["cap_h", "_ph"])
            .filter(F.col("id") != F.col("rep"))
            .select(
                F.least("id", "rep").alias("id_a"),
                F.greatest("id", "rep").alias("id_b"),
                F.lit(True).alias("caption_equal"),
            )
        )
        big_ids = id_caps.join(F.broadcast(big_caps), "cap_h", "left_semi").select("id")
        small_pairs = raw_decode.join(
            F.broadcast(big_ids.withColumnRenamed("id", "id_a")), "id_a", "left_anti"
        )
        # a star pair can coincide with a bytes-equal CANDIDATE pair
        # (x<y<z, same caption, bytes(x)==bytes(y)!=bytes(z), x the
        # subgroup rep): the trivial branch below already emits it, so
        # re-decoding it here would duplicate the output row — anti-join
        # the (small) star frame against bytes-equal candidates whose
        # ends are both in the mega groups
        dup_risk = (
            narrow.filter(F.col("bytes_equal") & F.col("caption_equal"))
            .join(F.broadcast(big_ids.withColumnRenamed("id", "id_a")), "id_a", "left_semi")
            .join(F.broadcast(big_ids.withColumnRenamed("id", "id_b")), "id_b", "left_semi")
            .select("id_a", "id_b")
        )
        star_pairs = star_pairs.join(dup_risk, ["id_a", "id_b"], "left_anti")
        decode_pairs = small_pairs.unionByName(star_pairs)
    else:
        decode_pairs = raw_decode
    decode_ids = (
        decode_pairs.select(F.col("id_a").alias("id"))
        .unionByName(decode_pairs.select(F.col("id_b").alias("id")))
        .distinct()
    )
    payloads = images.select(F.col(id_col).alias("id"), F.col(bytes_col).alias("_bytes")).join(
        F.broadcast(decode_ids), "id", "left_semi"
    )
    pa = payloads.select(F.col("id").alias("id_a"), F.col("_bytes").alias("bytes_a"))
    pb = payloads.select(F.col("id").alias("id_b"), F.col("_bytes").alias("bytes_b"))
    # NOTE: the decode UDF must sit behind a real FILTER/join, not inside
    # when(...) — Catalyst extracts Python UDFs out of conditionals and
    # would evaluate them for every row.
    decoded = (
        decode_pairs.join(pa, "id_a")
        .join(pb, "id_b")
        .select(
            "id_a",
            "id_b",
            "caption_equal",
            pair_psnr(dihedral)(F.col("bytes_a"), F.col("bytes_b")).alias("psnr_db"),
        )
    )
    trivial = narrow.filter(~need_decode).select(
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
