"""Corpus sources — the scan side of the engine.

The reference walks real directory trees (S1, parallel recursive walk,
reference: src/fs.rs:98-130). The Spark-native scan is the ``binaryFile``
datasource with ``recursiveFileLookup``: a distributed, partitioned file
listing + content read whose listing parallelism replaces the walker's
thread pool, with Catalyst pushing the path-glob and length filters into
the file index.

Both sources normalize to ONE corpus schema the whole engine consumes::

    (image_id string, bytes binary, size long)

plus any passthrough columns (``mtime``, ``caption``, ``phash``, ...).
``image_id`` is the path for filesystem corpora and the table's id column
for table corpora — everything downstream keys on it.

Scale note: ``binaryFile`` materializes file *content* into rows; the
exact-dup ladder immediately projects it down to (id, size, prefix/suffix
hash) so the bytes never cross a shuffle (see operators/exact.py). For a
100 TB corpus the scan cost is the unavoidable one read per file; the
ladder's stage routing guarantees no file is read twice (the full-hash
stage re-scans only surviving collider candidates).
"""

from __future__ import annotations

import os
import sys

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def default_paths(argv_paths: list[str] | None = None) -> list[str]:
    """S4 (reference: src/args.rs:55-71): explicit paths win; otherwise
    read one path per line from a non-tty stdin; otherwise the cwd."""
    if argv_paths:
        return list(argv_paths)
    if not sys.stdin.isatty():
        lines = [ln.strip() for ln in sys.stdin.read().splitlines()]
        paths = [ln for ln in lines if ln]
        if paths:
            return paths
    return [os.getcwd()]


def _canonical_roots(paths: list[str]) -> list[str]:
    """S3 (reference: src/fs.rs:106-108): distinct roots by canonicalized
    path so ``yadf a a`` doesn't double-count. Driver-side — the root
    list is tiny."""
    seen: dict[str, str] = {}
    for p in paths:
        # realpath only makes sense for plain local paths — applied to a
        # scheme-qualified root (s3a://, hdfs://, file:) it would mangle
        # the URI into a bogus cwd-relative local path and the non-local
        # branch downstream would never see the real scheme
        canon = os.path.realpath(p) if _local_path(p) == p else p
        seen.setdefault(canon, p)
    return list(seen.keys())


def _depth_filter(df: DataFrame, roots: list[str], max_depth: int) -> DataFrame:
    """S2 (reference: src/fs.rs:113): keep entries at most ``max_depth``
    directory levels below their root; ``--depth 0`` keeps only the named
    files themselves. ``binaryFile`` has no depth knob, so this is a
    post-listing predicate on the path — it still prunes before any
    downstream shuffle."""
    path = F.regexp_replace(F.col("image_id"), "^file:", "")
    cond = F.lit(False)
    for root in roots:
        prefix = root.rstrip("/") + "/"
        # walkdir depth semantics: the root is depth 0, its immediate
        # children depth 1 (reference: src/fs.rs:113 + walkdir docs)
        rel = F.substring(path, len(prefix) + 1, 1_000_000)
        depth = F.size(F.split(rel, "/"))
        under = path.startswith(prefix) & (depth <= max_depth)
        cond = cond | under | (path == root)  # depth 0: the named file itself
    return df.filter(cond)


def _drop_hardlinks(df: DataFrame) -> DataFrame:
    """F6 (reference: src/fs/filter.rs:90-149): one path per (device,
    inode) pair — later hard links to the same file are dropped. Inode
    numbers are only unique per device, so the key is the pair.

    stat(2) runs executor-side in an Arrow-batched pandas UDF (the
    reference does it inside the walk); the dedup itself is a
    first-row-per-key aggregate — min path for determinism."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<dev: long, ino: long>")
    def dev_ino(paths: pd.Series) -> pd.DataFrame:
        devs, inos = [], []
        for p in paths:
            try:
                st = os.stat(p.removeprefix("file:"))
                devs.append(st.st_dev)
                inos.append(st.st_ino)
            except OSError:
                devs.append(-1)
                inos.append(-1)
        return pd.DataFrame({"dev": devs, "ino": inos})

    keyed = df.withColumn("_di", dev_ino("image_id"))
    # split the stat-error rows (dev = -1) out BEFORE the window: they
    # all share one (-1, -1) key, and at corpus scale that is a single
    # straggler window partition for rows the filter keeps wholesale
    ok = keyed.filter(F.col("_di.dev") >= 0)
    err = keyed.filter(F.col("_di.dev") < 0)
    w = Window.partitionBy("_di.dev", "_di.ino").orderBy("image_id")
    kept = ok.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    return kept.unionByName(err).drop("_di")


_EMPTY_SCHEMA = "image_id string, bytes binary, size long, _mtime_ms long"


def _local_path(root: str) -> str | None:
    """The filesystem path when ``root`` is a local-scheme root, else None."""
    if root.startswith("file:"):
        return root[len("file:"):]
    if "://" in root or root.split(":", 1)[0] in ("hdfs", "s3", "s3a", "s3n", "abfs", "gs"):
        return None
    return root


def _lossy_utf8(path: str) -> str | None:
    """When ``path`` (as produced by ``os.fsdecode``) contains bytes that
    are not valid UTF-8 (surrogate escapes), return its lossy decoding
    (U+FFFD replacement) — the id Spark can carry; else None. Mirrors
    the reference's lossy path serialization (src/path.rs:7-14)."""
    try:
        path.encode("utf-8", "strict")
        return None
    except UnicodeEncodeError:
        return os.fsencode(path).decode("utf-8", "replace")


def _recovery_files_local(
    spark: SparkSession,
    roots: list[str],
    glob: str | None,
    include_empty: bool,
    recover_non_utf8: bool = True,
    max_read_bytes: int | None = None,
) -> DataFrame:
    """Distributed recovery listing for local-scheme roots: the two file
    classes the ``binaryFile`` datasource silently drops —

    * zero-length files (no split to read; only when ``include_empty``),
    * files whose names are not valid UTF-8 (the JVM path layer skips
      them; the reference processes them and serializes the path
      lossily, src/path.rs:7-14, tests/integration.rs:152-169) — their
      content is read executor-side and the id is the replacement-char
      decoding.

    The driver does ONE ``scandir`` per root (to enumerate its immediate
    subtrees — bounded work); executors walk each subtree in parallel.
    This replaces the previous driver-serial recursive ``listFiles``,
    whose O(total files) single-threaded walk would dominate the job at
    10^8-file corpora."""
    units: list[tuple[str, str]] = []  # (kind, path): F=file, D0=root's own files, D=subtree
    for root in roots:
        local = _local_path(root)
        if local is None:  # non-local scheme — caller routes to the JVM fallback
            raise ValueError(f"not a local root: {root}")
        if not os.path.exists(local):
            continue
        if os.path.isfile(local):
            units.append(("F", local))
            continue
        units.append(("D0", local))
        try:
            with os.scandir(local) as it:
                units.extend(
                    ("D", e.path) for e in it if e.is_dir(follow_symlinks=False)
                )
        except OSError:
            continue
    emit = _make_recovery_emit(glob, include_empty, recover_non_utf8, max_read_bytes)
    if not units:
        recovered = spark.createDataFrame([], _EMPTY_SCHEMA)
    else:
        # small trees (the interactive / test case): walk on the driver —
        # a Spark job + Python-worker spawn costs seconds, the walk costs
        # milliseconds. The cap bounds driver work; past it, bail to the
        # distributed walk (one executor task per subtree).
        rows = _driver_walk(
            units,
            emit,
            limit=_DRIVER_WALK_LIMIT,
            recover_non_utf8=recover_non_utf8,
            max_read_bytes=max_read_bytes,
        )
        if rows is not None:
            if rows:
                # via pandas so the Arrow path is used — a plain list of
                # tuples becomes a pickled RDD that re-runs Python
                # workers on every downstream action
                recovered = spark.createDataFrame(
                    pd.DataFrame(rows, columns=["image_id", "bytes", "size", "_mtime_ms"]),
                    schema=_EMPTY_SCHEMA,
                )
            else:
                recovered = spark.createDataFrame([], _EMPTY_SCHEMA)
        else:

            def kernel(batches):
                for pdf in batches:
                    out = []
                    for kind, p in zip(pdf["kind"], pdf["path"]):
                        try:
                            for path, st in _iter_unit_files(kind, p):
                                r = emit(path, st)
                                if r:
                                    out.append(r)
                        except OSError:
                            pass
                    yield pd.DataFrame(
                        out, columns=["image_id", "bytes", "size", "_mtime_ms"]
                    )

            unit_df = spark.createDataFrame(pd.DataFrame(units, columns=["kind", "path"]))
            recovered = unit_df.repartition(min(len(units), 64)).mapInPandas(
                kernel, _EMPTY_SCHEMA
            )
    return recovered.select(
        "image_id", "bytes", "size", F.timestamp_millis("_mtime_ms").alias("mtime")
    )


#: driver-side walk cap — beyond this many directory entries the listing
#: moves to executors (the 10^8-file case the distributed path exists for)
_DRIVER_WALK_LIMIT = 10_000


#: a non-UTF-8-named file larger than this is never read on the DRIVER —
#: the walk bails to the distributed path so the payload materializes in
#: an executor task (one row, same shape binaryFile gives normal files)
_DRIVER_READ_LIMIT = 64 * 1024 * 1024


def _make_recovery_emit(
    glob: str | None,
    include_empty: bool,
    recover_non_utf8: bool,
    max_read_bytes: int | None = None,
):
    import fnmatch

    def keep(name: str) -> bool:
        return not glob or fnmatch.fnmatch(name, glob)

    def emit(path: str, st) -> tuple | None:
        lossy = _lossy_utf8(path)
        if lossy is not None:
            if not recover_non_utf8 or not keep(os.path.basename(lossy)):
                return None
            # files above the scan filter's max size are dropped by F3
            # downstream anyway — never materialize their payload at all
            # (one multi-GB non-UTF-8-named file must not OOM a worker)
            if max_read_bytes is not None and st.st_size > max_read_bytes:
                return None
            with open(os.fsencode(path), "rb") as fh:
                payload = fh.read()
            return (lossy, payload, len(payload), int(st.st_mtime * 1000))
        if include_empty and st.st_size == 0 and keep(os.path.basename(path)):
            return (path, b"", 0, int(st.st_mtime * 1000))
        return None

    return emit


def _iter_unit_files(kind: str, p: str):
    """Yield ``(path, stat)`` for every file a walk unit covers."""
    if kind == "F":
        yield p, os.stat(p)
    elif kind == "D0":
        with os.scandir(p) as it:
            for e in it:
                if e.is_file(follow_symlinks=True):
                    yield e.path, e.stat()
    else:
        for dirpath, _dirs, files in os.walk(p):
            for f in files:
                fp = os.path.join(dirpath, f)
                try:
                    yield fp, os.stat(fp)
                except OSError:
                    pass


def _driver_walk(
    units,
    emit,
    limit: int,
    recover_non_utf8: bool = True,
    max_read_bytes: int | None = None,
) -> list | None:
    """Walk all units on the driver, or None once ``limit`` entries are
    seen OR a non-UTF-8-named file above ``_DRIVER_READ_LIMIT`` appears
    whose payload ``emit`` would actually read (either way the caller
    falls back to the distributed walk — the driver never materializes
    a large recovered payload). When recovery is off, or the scan
    filter's ``max_read_bytes`` already excludes the file, ``emit``
    drops it without opening it, so a big badly-named file is no reason
    to abandon the cheap walk and pay a Spark listing job."""
    rows: list = []
    seen = 0
    for kind, p in units:
        try:
            for path, st in _iter_unit_files(kind, p):
                seen += 1
                if seen > limit:
                    return None
                if (
                    recover_non_utf8
                    and st.st_size > _DRIVER_READ_LIMIT
                    and (max_read_bytes is None or st.st_size <= max_read_bytes)
                    and _lossy_utf8(path) is not None
                ):
                    return None
                r = emit(path, st)
                if r:
                    rows.append(r)
        except OSError:
            continue
    return rows


def _empty_files_df(spark: SparkSession, roots: list[str], glob: str | None) -> DataFrame:
    """JVM-listing fallback for non-local schemes: recover zero-length
    files (``binaryFile`` silently skips them; the reference groups
    empty files by default — min size 0, src/args.rs:16-22). Local roots
    take :func:`_recovery_files_local` instead (distributed, and also
    recovers non-UTF-8-named files). Metadata only, no content reads."""
    import fnmatch

    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    conf = jsc.hadoopConfiguration()
    rows = []
    for root in roots:
        p = jvm.org.apache.hadoop.fs.Path(root)
        fs = p.getFileSystem(conf)
        if not fs.exists(p):
            continue
        it = fs.listFiles(p, True)
        while it.hasNext():
            st = it.next()
            if st.getLen() == 0:
                uri = st.getPath().toUri()
                # keep the scheme+authority for non-local roots: a bare
                # getPath() would strip "s3a://bucket", colliding ids
                # across buckets and escaping the depth filter's
                # root-prefix predicate; local roots stay plain paths so
                # ids line up with the binaryFile rows' file: handling
                path = uri.getPath() if uri.getScheme() in (None, "file") else str(uri)
                if glob and not fnmatch.fnmatch(os.path.basename(path), glob):
                    continue
                rows.append((path, b"", 0, st.getModificationTime()))
    empties = spark.createDataFrame(rows, _EMPTY_SCHEMA)
    return empties.select(
        "image_id", "bytes", "size", F.timestamp_millis("_mtime_ms").alias("mtime")
    )


def filesystem_corpus(
    spark: SparkSession,
    paths: list[str],
    max_depth: int | None = None,
    keep_hardlinks: bool = True,
    glob: str | None = None,
    include_empty: bool = True,
    recover_non_utf8: bool = True,
    max_read_bytes: int | None = None,
) -> DataFrame:
    """S1: distributed scan of real directory trees via ``binaryFile``.

    Returns ``(image_id, bytes, size, mtime)`` — one row per regular
    file (F1 is implicit: the datasource lists files only). ``glob``
    pushes a name pattern into the file *index* (``pathGlobFilter``),
    i.e. true scan pushdown — cheaper than the post-hoc F5 filter.
    ``include_empty=False`` (set it when a min-size filter >= 1 will
    drop empties anyway) skips the zero-length recovery; local roots
    still get the distributed non-UTF-8-name recovery walk (those files
    are silently dropped by the JVM path layer at any size).
    """
    roots = _canonical_roots(paths)
    reader = spark.read.format("binaryFile").option("recursiveFileLookup", "true")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(roots).select(
        F.regexp_replace(F.col("path"), "^file:", "").alias("image_id"),
        F.col("content").alias("bytes"),
        F.col("length").cast("long").alias("size"),
        F.col("modificationTime").alias("mtime"),
    )
    local = all(_local_path(r) is not None for r in roots)
    if local and (include_empty or recover_non_utf8):
        df = df.unionByName(
            _recovery_files_local(
                spark, roots, glob, include_empty, recover_non_utf8, max_read_bytes
            )
        )
    elif include_empty:
        df = df.unionByName(_empty_files_df(spark, roots, glob))
    if max_depth is not None:
        df = _depth_filter(df, roots, max_depth)
    if not keep_hardlinks:
        df = _drop_hardlinks(df)
    return df


def table_corpus(
    spark: SparkSession,
    source: str,
    id_col: str = "image_id",
    payload_col: str = "bytes",
) -> DataFrame:
    """Table source: an Iceberg table name (``catalog.db.table``) when a
    catalog is configured, else a parquet path/directory. Normalizes the
    id/payload column names so downstream operators are source-agnostic."""
    # a storage path is anything that exists locally, carries a URI
    # scheme (file:, s3:, s3a:, gs:, abfs:, hdfs:, ...), or contains a
    # path separator; only bare dotted identifiers go to the catalog
    scheme = source.split(":", 1)[0] if ":" in source else ""
    is_path = (
        os.path.exists(source)
        or "/" in source
        or os.sep in source
        or scheme.lower() in ("file", "s3", "s3a", "s3n", "hdfs", "abfs", "abfss", "gs", "wasb", "wasbs")
    )
    if is_path:
        df = spark.read.parquet(source)
    else:
        df = spark.read.table(source)
    out = df
    if id_col != "image_id":
        out = out.withColumnRenamed(id_col, "image_id")
    if payload_col != "bytes":
        out = out.withColumnRenamed(payload_col, "bytes")
    return out
