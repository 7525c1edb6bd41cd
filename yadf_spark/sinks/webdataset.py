"""WebDataset-style tar shard export — the hand-off from the curation
engine to a training loader: each shard is a tar archive of
``{id}.{ext}`` payload members (plus ``{id}.txt`` captions when given),
the layout streaming dataloaders (WebDataset and its readers) consume
sequentially.

Scale posture — this is the ONE operator where payload bytes crossing a
shuffle is the job itself (the export must physically move each blob to
its shard): exactly one hash shuffle on a content-addressed shard id
(md5 of the row id, the same stability trick as ``curation.hash_split``
— a row keeps its shard across reruns, cluster sizes, and incremental
re-exports), then each task streams its rows straight into tar members
with ``tarfile`` (stdlib) — no per-task buffering of more than one
payload, no driver involvement, O(shard) memory. Shard count scales
with the corpus; member order inside a shard is sorted by id so a
re-export is byte-stable.

Paths are written with plain ``open`` — the sandbox's filesystem sink.
On a real cluster the same iterator body targets the Hadoop FS API
(``FileSystem.create``) for s3a/hdfs destinations; the seam is the
single ``_open_shard`` function.
"""

from __future__ import annotations

import io
import os
import tarfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from yadf_spark.operators.curation import md5_bucket


def _open_shard(out_dir: str, shard: int):
    os.makedirs(out_dir, exist_ok=True)
    return open(os.path.join(out_dir, f"shard-{shard:05d}.tar"), "wb")


def write_webdataset_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    caption_col: str | None = None,
    ext: str = "jpg",
) -> None:
    """Export ``(id, bytes[, caption])`` rows as ``n_shards`` tar files.

    Member names are ``{id}.{ext}`` (path separators in ids become
    ``_`` so every member stays a flat file) and, when ``caption_col``
    is given, a sibling ``{id}.txt`` — the WebDataset pairing
    convention (same basename = same sample)."""
    # overwrite semantics: a re-export with fewer shards must not leave
    # stale archives behind (driver-side, same local-fs seam as
    # _open_shard — object-store targets delete by prefix instead)
    if os.path.isdir(out_dir):
        for name in os.listdir(out_dir):
            if name.startswith("shard-") and name.endswith(".tar"):
                os.remove(os.path.join(out_dir, name))
    cols = [
        F.col(id_col).alias("_id"),
        F.col(bytes_col).alias("_payload"),
        md5_bucket(F.col(id_col).cast("string"), n_shards, salt="wds").alias("_shard"),
    ]
    if caption_col is not None:
        cols.append(F.col(caption_col).alias("_caption"))
    src = df.select(*cols).repartition(n_shards, F.col("_shard")).sortWithinPartitions(
        "_shard", "_id"
    )
    has_caption = caption_col is not None

    def write_partition(rows) -> None:
        tars: dict[int, tarfile.TarFile] = {}
        handles = []
        try:
            for row in rows:
                shard = row["_shard"]
                tf = tars.get(shard)
                if tf is None:
                    fh = _open_shard(out_dir, shard)
                    handles.append(fh)
                    tf = tarfile.open(fileobj=fh, mode="w")
                    tars[shard] = tf
                safe = str(row["_id"]).replace(os.sep, "_").replace("/", "_")
                payload = bytes(row["_payload"]) if row["_payload"] is not None else b""
                info = tarfile.TarInfo(name=f"{safe}.{ext}")
                info.size = len(payload)
                info.mtime = 0  # deterministic archives
                tf.addfile(info, io.BytesIO(payload))
                if has_caption:
                    cap = (row["_caption"] or "").encode("utf-8")
                    cinfo = tarfile.TarInfo(name=f"{safe}.txt")
                    cinfo.size = len(cap)
                    cinfo.mtime = 0
                    tf.addfile(cinfo, io.BytesIO(cap))
        finally:
            for tf in tars.values():
                tf.close()
            for fh in handles:
                fh.close()

    src.foreachPartition(write_partition)
