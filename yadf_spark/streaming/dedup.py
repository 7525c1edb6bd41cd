"""Streaming dedup — the engine's operators over Structured Streaming.

The reference is strictly batch (SURVEY.md §2.8); a web-scale ingest
pipeline is not: new images arrive continuously and each must be checked
against everything already ingested. Two surfaces:

* ``dedup_stream`` — exact dedup *within* the stream:
  ``dropDuplicatesWithinWatermark`` on the content hash, state bounded
  by the event-time watermark (the Spark-native replacement for a
  driver-held seen-set).

* ``streaming_near_dup`` — incremental near-dup vs the full history:
  a ``foreachBatch`` loop that keeps a compact persistent *band index*
  (id, band_idx, band_hash — the same bucket table the batch pipeline
  self-joins, operators/pipeline.py) and joins each micro-batch's bands
  against it. Per batch of size b against history of size N the join
  touches O(b) index partitions, not O(N) — the index is written
  partitioned by band hash so the band join prunes partitions.

Exactly-once posture: ``foreachBatch`` output uses batch-id-suffixed
directories + the checkpointed batch offset, so a replayed batch
overwrites its own output idempotently (Spark's documented idempotent-
sink recipe).
"""

from __future__ import annotations

import logging
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_log = logging.getLogger(__name__).warning

from yadf_spark.config import LshConfig, NearDupConfig
from yadf_spark.functions import hashes


def with_content_hash(df: DataFrame, payload_col: str = "bytes", algo: str = "xxhash64") -> DataFrame:
    """Add the trusted full-content hash column (JVM-side, codegen)."""
    return df.withColumn("content_hash", hashes.full_hash(F.col(payload_col), algo))


def dedup_stream(
    stream: DataFrame,
    event_time_col: str = "ingest_ts",
    watermark_delay: str = "10 minutes",
    payload_col: str = "bytes",
    algo: str = "xxhash64",
) -> DataFrame:
    """Exact streaming dedup: first occurrence of each content hash
    passes through; re-uploads arriving within the watermark are
    dropped. State size is bounded by (distinct hashes seen within the
    watermark window) — the knob that keeps this viable at ingest rates
    where an unbounded ``dropDuplicates`` state would OOM."""
    hashed = with_content_hash(stream, payload_col, algo)
    return hashed.withWatermark(event_time_col, watermark_delay).dropDuplicatesWithinWatermark(
        ["content_hash"]
    )


def _band_table(images: DataFrame, cfg: NearDupConfig) -> DataFrame:
    """The bucket-membership table for a (micro)batch — same shape the
    batch pipeline self-joins (operators/pipeline.py candidate_buckets),
    computed here without the MinHash leg when captions are absent."""
    from yadf_spark.operators.pipeline import candidate_buckets

    return candidate_buckets(images, cfg)


def incremental_near_dup_batch(
    batch: DataFrame,
    batch_id: int,
    index_dir: str,
    pairs_dir: str,
    cfg: NearDupConfig | None = None,
    band_fn=None,
) -> None:
    """One ``foreachBatch`` tick: join the new batch's bands against the
    persistent index, verify candidates, emit pairs, write the batch's
    bands into its own ``batch_id=`` index subdir.

    ``band_fn`` maps the batch to its ``(id, band_idx, band_hash)``
    bucket-membership table; the default is the image pipeline's
    phash+MinHash bands. Any modality banding into that shape reuses the
    whole incremental index unchanged — e.g.
    ``operators.audio.audio_band_table`` for audio clips.

    Replay safety: if the previous attempt wrote the index but lost the
    checkpoint commit, the replayed batch (a) sees its own ids in the
    history join — the ``id_a != id_b`` filter plus the final
    ``distinct`` make the pair output identical — and (b) OVERWRITES its
    ``batch_id=`` subdir rather than appending duplicate index rows."""
    cfg = cfg or NearDupConfig()
    spark = batch.sparkSession
    batch = batch.persist()
    tag = _band_fn_tag(band_fn)
    new_bands = (band_fn(batch) if band_fn else _band_table(batch, cfg)).persist()

    pair_frames = []
    if _index_exists(spark, index_dir):
        _reject_legacy_layout(spark, index_dir)
        _check_band_fn_tag(spark, index_dir, tag)
        index = spark.read.parquet(index_dir)
        old = index.select(
            F.col("id").alias("id_old"), "band_idx", "band_hash"
        )
        new = new_bands.select(F.col("id").alias("id_new"), "band_idx", "band_hash")
        # band equi-join: new rows vs history, with the batch path's
        # guards. The micro-batch's distinct band keys broadcast to
        # prune the index down to touched buckets, and history buckets
        # above the cap are dropped with a log line (the same recall
        # trade as candidate_pairs_from_buckets — a viral bucket in the
        # accumulated index would otherwise fan each new member out
        # unboundedly); residual per-key skew is bounded by the cap and
        # split by AQE's skew join.
        new_keys = new.select("band_idx", "band_hash").distinct()
        touched = old.join(F.broadcast(new_keys), ["band_idx", "band_hash"], "left_semi")
        sizes = touched.groupBy("band_idx", "band_hash").agg(F.count("*").alias("_hn"))
        max_bucket = cfg.lsh.max_bucket
        n_dropped = sizes.filter(F.col("_hn") > max_bucket).count()
        if n_dropped:
            _log(
                f"incremental-near-dup: dropped {n_dropped} history buckets "
                f"larger than {max_bucket} rows"
            )
        ok_keys = sizes.filter(F.col("_hn") <= max_bucket).select("band_idx", "band_hash")
        pruned = touched.join(F.broadcast(ok_keys), ["band_idx", "band_hash"], "left_semi")
        nv_old = (
            new.join(pruned, ["band_idx", "band_hash"])
            .select(
                F.least("id_new", "id_old").alias("id_a"),
                F.greatest("id_new", "id_old").alias("id_b"),
            )
            # a replayed batch's own ids may already be in the index
            # (batch written, checkpoint commit lost) — least/greatest of
            # equal ids would emit a self-pair
            .filter(F.col("id_a") != F.col("id_b"))
            .distinct()
        )
        pair_frames.append(nv_old)

    # within-batch pairs through the SAME salted, capped expansion the
    # batch pipeline uses — a viral bucket in one micro-batch (e.g. a
    # replayed backfill) must not pin a single reducer or emit O(n^2)
    # rows uncapped (it previously did: plain unsalted self-join)
    from yadf_spark.operators.minhash import candidate_pairs_from_buckets

    nv_new = candidate_pairs_from_buckets(
        new_bands, cfg.lsh.salt_bucket_above, cfg.lsh.max_bucket
    )
    pair_frames.append(nv_new)

    pairs = pair_frames[0]
    for extra in pair_frames[1:]:
        pairs = pairs.unionByName(extra)
    pairs = pairs.distinct()

    out_path = os.path.join(pairs_dir, f"batch_id={batch_id}")
    pairs.write.mode("overwrite").parquet(out_path)

    # The index write is keyed by batch_id (overwrite of a batch_id=
    # subdir, like the pairs sink) so a batch replayed after a failure
    # between index write and checkpoint commit REPLACES its own rows
    # instead of appending duplicates — true idempotent replay. The
    # subdir name doubles as a partition column on read; band_idx
    # partitioning within each batch dir keeps the band-join pruning.
    new_bands.select("id", "band_idx", "band_hash").write.mode("overwrite").partitionBy(
        "band_idx"
    ).parquet(os.path.join(index_dir, f"batch_id={batch_id}"))
    _write_band_fn_tag(spark, index_dir, tag)
    new_bands.unpersist()
    batch.unpersist()


def compact_band_index(spark, index_dir: str, out_dir: str) -> None:
    """Fold a batch_id-partitioned band index into one compact layer.

    Each micro-batch writes its own ``batch_id=`` subdir (replay
    idempotency); after many batches the directory listing is O(batches)
    small files. This maintenance job (run it OFFLINE — with the stream
    stopped or against a snapshot) rewrites the whole index as a single
    ``batch_id=0`` layer partitioned by ``band_idx``, ``distinct``-ed so
    any residue collapses. Write goes to a NEW directory — object stores
    have no atomic rename, so the caller switches ``index_dir`` to
    ``out_dir`` (and may resume appending batch subdirs beside it)."""
    idx = spark.read.parquet(index_dir).select("id", "band_idx", "band_hash").distinct()
    idx.write.mode("overwrite").partitionBy("band_idx").parquet(
        os.path.join(out_dir, "batch_id=0")
    )


#: marker file at the index root recording WHICH band function (and
#: version) wrote the index — band values from different functions or
#: versions are mutually meaningless, and a silent mix would make the
#: history join miss duplicates without any error (e.g. the round-3
#: canonical-phash widening from the Klein 4-orbit to full D4 changed
#: every flip-invariant band value; an old index consulted by the new
#: code would simply stop matching mirrored reposts)
_BAND_FN_META = "_band_fn_tag"

#: default (image phash + MinHash caption bands) tag
_DEFAULT_BAND_TAG = "image-phash-minhash-v1"


def _band_fn_tag(band_fn) -> str:
    if band_fn is None:
        return _DEFAULT_BAND_TAG
    return getattr(band_fn, "band_fn_tag", getattr(band_fn, "__name__", "custom"))


def _tag_path(spark, path: str):
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(os.path.join(path, _BAND_FN_META))
    return p, p.getFileSystem(conf), jvm


def _check_band_fn_tag(spark, index_dir: str, tag: str) -> None:
    """Fail fast when the running band function (or its version) is not
    the one that wrote the existing index. Indexes written before this
    guard carry no marker; they are accepted as-is (the marker is added
    on their next batch) — the guard protects every index written from
    now on, including across the D4 orbit widening."""
    p, fs, jvm = _tag_path(spark, index_dir)
    if not fs.exists(p):
        return
    existing = jvm.org.apache.commons.io.IOUtils.toString(
        fs.open(p), "UTF-8"
    ).strip()
    if existing != tag:
        raise RuntimeError(
            f"band index at {index_dir!r} was written by band function "
            f"{existing!r} but this stream bands with {tag!r} — the band "
            "values are mutually meaningless and history matches would be "
            "silently missed. Rebuild the index with the current band "
            "function (re-band the history corpus into a fresh index_dir, "
            "or replay the stream from scratch), or run the old function."
        )


def _write_band_fn_tag(spark, index_dir: str, tag: str) -> None:
    """Record (idempotently) which band function owns this index."""
    p, fs, _ = _tag_path(spark, index_dir)
    if fs.exists(p):
        return
    out = fs.create(p, True)
    try:
        out.write(bytearray(tag, "utf-8"))
    finally:
        out.close()


def _reject_legacy_layout(spark, path: str) -> None:
    """Fail fast on a pre-round-2 FLAT band index (top-level ``band_idx=``
    dirs, no ``batch_id=`` layer). Appending a new-format batch beside it
    would mix partition depths in one directory and
    ``spark.read.parquet`` would fail partition discovery with an
    opaque "conflicting directory structures" error mid-stream — raise a
    clear migration message instead (ADVICE r2)."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    for st in fs.listStatus(p):
        if st.isDirectory() and st.getPath().getName().startswith("band_idx="):
            raise RuntimeError(
                f"band index at {path!r} uses the legacy flat band_idx= layout; "
                "migrate it first: compact_band_index(spark, old_dir, new_dir) "
                "folds it into a batch_id=0 layer, then point the stream at "
                "new_dir"
            )


def _index_exists(spark, path: str) -> bool:
    """Non-empty band index at ``path``? Hadoop-FS check so the index
    can live on any scheme Spark reads (local, hdfs, s3a)."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    if not fs.exists(p):
        return False
    it = fs.listFiles(p, True)
    while it.hasNext():
        name = it.next().getPath().getName()
        if name.startswith("part-"):
            return True
    return False


def streaming_near_dup(
    stream: DataFrame,
    index_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    cfg: NearDupConfig | None = None,
    band_fn=None,
    trigger: dict | None = None,
):
    """Wire the incremental near-dup loop onto a streaming DataFrame.
    Returns the started ``StreamingQuery``; callers own its lifecycle
    (``processAllAvailable``/``stop`` in tests, run-forever in prod).
    ``band_fn`` selects the modality's banding (see
    ``incremental_near_dup_batch``). ``trigger`` passes through to
    ``writeStream.trigger`` — the default ``availableNow=True`` drains
    what exists and STOPS (batch-catchup semantics); a run-forever
    deployment over a continuous source passes e.g.
    ``{"processingTime": "30 seconds"}``."""
    return (
        stream.writeStream.foreachBatch(
            lambda df, bid: incremental_near_dup_batch(df, bid, index_dir, pairs_dir, cfg, band_fn)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
