"""Command-line entry point — the reference's CLI surface, Spark-native.

Mirrors ``yadf [OPTIONS] [PATHS]...`` (reference: src/main.rs:135-191,
src/args.rs) over either real directory trees (``binaryFile`` scan) or a
parquet/Iceberg table (``--table``). Runs under plain ``python -m
yadf_spark.cli`` for local mode, or ``spark-submit --py-files
yadf_spark.zip yadf_spark/cli.py ...`` on a cluster (the north_rule's
launch mode — ``get_spark`` is a no-op when spark-submit already created
the session).

Examples::

    python -m yadf_spark.cli ~/Documents ~/Downloads
    python -m yadf_spark.cli -f ld-json -a sha256 --min 100K /data
    python -m yadf_spark.cli --table /data/images.parquet --mode near-dup \
        --checkpoint-dir /tmp/ck --cluster-table /tmp/clusters
"""

from __future__ import annotations

import argparse
import logging
import os
import re
import sys

from yadf_spark.config import Factor, LadderConfig, NearDupConfig, ScanFilter

log = logging.getLogger("yadf_spark")

_BYTE_RE = re.compile(r"^\s*(\d+(?:\.\d+)?)\s*([a-zA-Z]*)\s*$")
_UNITS = {"": 1, "b": 1}
for _i, _p in enumerate("kmgtpe", start=1):
    _UNITS[_p] = 1000**_i  # K / KB = decimal (byte_unit crate semantics)
    _UNITS[_p + "b"] = 1000**_i
    _UNITS[_p + "ib"] = 1024**_i  # KiB = binary


def parse_bytes(s: str) -> int:
    """X2 (reference: src/main.rs:216-226): ``100M``, ``4K``, ``1GiB``,
    case-insensitive."""
    m = _BYTE_RE.match(s)
    if not m:
        raise argparse.ArgumentTypeError(f"invalid byte size {s!r}")
    num, unit = m.groups()
    mult = _UNITS.get(unit.lower())
    if mult is None:
        raise argparse.ArgumentTypeError(f"invalid byte unit {unit!r} in {s!r}")
    return int(float(num) * mult)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="yadf-spark",
        description="Spark-native duplicate / near-duplicate finder "
        "(capabilities of jRimbault/yadf, rebuilt on PySpark)",
    )
    p.add_argument("paths", nargs="*", help="directories/files to scan (default: stdin or cwd)")
    p.add_argument(
        "-f", "--format", default="fdupes",
        choices=["fdupes", "machine", "json", "json-pretty", "ld-json", "csv"],
        help="output format (reference: src/main.rs:105-132)",
    )
    p.add_argument(
        "-a", "--algorithm", default="xxhash64",
        choices=["xxhash64", "md5", "sha256", "sha512", "blake2b128", "blake2b256"],
        help="content hash: xxhash64 (fast JVM-side, ~ the reference's xxh3 "
        "class), md5/sha256/sha512 (portable/crypto), blake2b128/256 "
        "(wide+fast, ~ its highway-256 default width class)",
    )
    p.add_argument("-n", "--no-empty", action="store_true", help="exclude empty files (min=1)")
    p.add_argument("--min", type=parse_bytes, default=None, help="minimum file size (e.g. 100M)")
    p.add_argument("--max", type=parse_bytes, default=None, help="maximum file size")
    p.add_argument("-d", "--depth", type=int, default=None, help="maximum recursion depth")
    p.add_argument(
        "-H", "--hard-links", action="store_true",
        help="treat hard links to the same file as duplicates",
    )
    p.add_argument("-p", "--pattern", default=None, help="regex the file name must match")
    p.add_argument("-g", "--glob", default=None, help="glob the file name must match")
    p.add_argument(
        "-r", "--rfactor", type=Factor.parse, default=Factor.over(1),
        help="replication factor filter: under:N | equal:N | over:N (default over:1)",
    )
    p.add_argument("-o", "--output", default=None, help="write output to this file (driver-side)")
    p.add_argument(
        "--output-dir", default=None,
        help="distributed write of the formatted output (directory of text parts)",
    )
    p.add_argument("-v", "--verbose", action="count", default=0)
    # Spark-native extensions
    p.add_argument("--table", default=None, help="read a parquet path / Iceberg table instead of walking paths")
    p.add_argument("--id-col", default="image_id")
    p.add_argument("--payload-col", default="bytes")
    p.add_argument(
        "--mode", default="exact",
        choices=[
            "exact", "near-dup", "audio-near-dup", "text-near-dup", "curate",
            "cluster-quality",
        ],
        help="exact: the reference's dup-group scan; audio-near-dup: energy-"
        "fingerprint Hamming bands over audio payloads; near-dup: phash bands + "
        "MinHash LSH + PSNR verify + connected components (north_rule); "
        "text-near-dup: MinHash LSH over shingles of --text-col (or UTF-8 "
        "decoded payloads) verified at exact Jaccard >= --jaccard; "
        "curate: the composed C4-clean -> exact-dedup -> split -> pack text "
        "recipe, written to --curated-table partitioned by split; "
        "cluster-quality: pair-confusion + Rand/ARI plus purity/B-cubed/"
        "V-measure of --eval-clusters against --eval-truth (one JSON "
        "line on stdout)",
    )
    p.add_argument(
        "--eval-clusters", default=None,
        help="(--mode cluster-quality) parquet of the predicted assignment "
        "(--id-col, cluster_id) — e.g. a --cluster-table from a prior run",
    )
    p.add_argument(
        "--eval-truth", default=None,
        help="(--mode cluster-quality) parquet of the ground-truth labeling "
        "(--id-col, true_cluster)",
    )
    p.add_argument(
        "--text-col", default="caption",
        help="text column for --mode text-near-dup (table sources); filesystem "
        "sources decode the file payload as UTF-8 instead",
    )
    p.add_argument(
        "--jaccard", type=float, default=0.8,
        help="exact-Jaccard verification threshold for text-near-dup",
    )
    p.add_argument(
        "--strip-spans",
        default=None,
        metavar="DIR",
        help="(--mode text-near-dup, without --against) also run "
        "corpus-level exact substring dedup (ExactSubstr, Lee et al. "
        "2022): cut every character span covered by a window of "
        "--span-min-len chars that repeats across >= 2 documents, and "
        "write (id, clean_text, n_spans, chars_removed) parquet to DIR "
        "— all occurrences are removed, the paper's policy; use "
        "--survivors for keep-one whole-document semantics",
    )
    p.add_argument(
        "--span-min-len", type=int, default=50,
        help="(--strip-spans) minimum repeated-window length in chars",
    )
    p.add_argument(
        "--against",
        default=None,
        help="(--mode text-near-dup / near-dup) fuzzy ingest gate: match "
        "the input batch against this HISTORY corpus (parquet path / "
        "Iceberg table with the same columns) instead of self-clustering "
        "— the history is never self-joined. Text mode matches on "
        "shingle MinHash; image mode on phash + caption bands + a "
        "full-content-hash band, verified by the pipeline's two-tier "
        "caption/PSNR pass. Groups pair each matched batch row with its "
        "history near-dups; --novel-table receives the batch rows that "
        "matched nothing",
    )
    p.add_argument(
        "--novel-table",
        default=None,
        help="(--against) write the surviving batch rows (all input "
        "columns) to this parquet path — the deduped ingest hand-off",
    )
    p.add_argument("--checkpoint-dir", default=None, help="stage checkpoint/resume directory")
    p.add_argument(
        "--cluster-table",
        default=None,
        help="write (image_id, cluster_id) here: a path -> parquet; a dotted "
        "catalog name (e.g. yadf.db.clusters) -> Iceberg writeTo when the "
        "runtime jar is on the classpath",
    )
    p.add_argument(
        "--flip-invariant",
        action="store_true",
        help="(--mode near-dup) also catch mirrored / vertically-flipped / "
        "180-rotated reposts: canonical dihedral phash bands + "
        "orientation-max PSNR verification",
    )
    p.add_argument(
        "--no-collapse-exact",
        action="store_true",
        help="(--mode near-dup) band/verify every row instead of one "
        "representative per exact-dup class (clusters are identical "
        "except where the LSH bucket cap binds, where collapse strictly "
        "improves recall; this is the A/B / debug escape hatch)",
    )
    p.add_argument(
        "--collapse-history",
        action="store_true",
        help="(--against, image mode) run the exact ladder over the history "
        "table (inside a checkpointed stage; honors --algorithm) and "
        "band/verify one representative per exact-dup class — verdicts "
        "unchanged except over-cap viral buckets, which collapse "
        "RESCUES from the bucket-cap drop",
    )
    p.add_argument(
        "--drop-format-mismatch",
        action="store_true",
        help="(--mode near-dup) drop rows whose payload magic bytes "
        "contradict the declared fmt column (or sniff as unknown) "
        "before any decode stage — the web-corpus lying-Content-Type "
        "gate, evaluated as a pure JVM scan-speed expression; sources "
        "without a fmt column drop only unknown-magic payloads",
    )
    p.add_argument(
        "--survivors",
        default=None,
        help="write one keep-best row per cluster (cluster_id, rep_id, "
        "rep_quality, n_members) to this parquet path — quality is w*h "
        "for image tables, text length in text mode, payload byte "
        "length otherwise; ties keep the smallest id (the reference "
        "cleaner's keep-first policy, examples/clean.rs, re-ranked on "
        "a quality axis)",
    )
    p.add_argument(
        "--base-clusters",
        default=None,
        help="incremental ingest: a prior run's cluster-assignment "
        "parquet (image_id, cluster_id). Today's verified duplicate "
        "edges fold into it via a quotient-graph merge (components run "
        "on a batch-sized reduced graph, never the corpus); rows only "
        "the base knows about carry through unchanged",
    )
    p.add_argument(
        "--split-table",
        default=None,
        help="write a leakage-guarded train/val/test assignment "
        "(image_id, split_key, bucket, split) to this parquet path: the "
        "md5 bucket is keyed on the near-dup cluster id (own id for "
        "unclustered rows), so no cluster ever straddles two splits",
    )
    p.add_argument(
        "--split-weights",
        default="train=90,val=5,test=5",
        help="label=percent list for --split-table; percents must sum "
        "to 100 (e.g. train=80,val=10,test=10)",
    )
    p.add_argument(
        "--curated-table",
        default=None,
        help="(--mode curate) destination parquet path for the curated "
        "corpus (doc, clean_text, n_tokens, split, pack_id), partitioned "
        "by split",
    )
    p.add_argument(
        "--pack-budget",
        type=int,
        default=500,
        help="(--mode curate) token budget per training pack",
    )
    p.add_argument(
        "--export-dir",
        default=None,
        help="write the DEDUPED corpus (the keep-best survivor of every "
        "cluster plus all unclustered rows) as WebDataset-style tar "
        "shards of {id}.{ext} [+ {id}.txt caption] members — the "
        "training-loader hand-off",
    )
    p.add_argument(
        "--export-shards", type=int, default=8,
        help="number of tar shards for --export-dir (content-addressed: "
        "a row keeps its shard across reruns and cluster sizes)",
    )
    p.add_argument("--cores", type=int, default=None, help="local[N] parallelism (ignored under spark-submit)")
    p.add_argument("--report", action="store_true", help="print per-stage metrics to stderr")
    return p


def _as_table_ident(dest: str) -> str | None:
    """``--cluster-table`` accepts either a filesystem path (parquet
    stand-in) or a dotted catalog identifier like ``yadf.db.clusters``
    (Iceberg ``writeTo`` when the runtime jar is present). Only a full
    ``catalog.namespace.table`` shape (>= 3 non-empty dot segments, no
    path separator, no data-file extension) is a table ident — a mere
    dotted filename like ``clusters.v2`` or ``out.data`` is a path, not
    a request to resolve a catalog."""
    if os.sep in dest or "/" in dest:
        return None
    if dest.endswith((".parquet", ".pq")):
        return None
    parts = dest.split(".")
    if len(parts) < 3 or not all(parts):
        return None
    return dest


def _survivor_quality(source_df, payload_col: str):
    """Quality axis for --survivors, inferred from the corpus shape:
    pixel count for image tables, text length for text corpora, payload
    byte length otherwise, constant 0 (pure keep-min-id) as the last
    resort."""
    from pyspark.sql import functions as F

    cols = set(source_df.columns)
    if {"w", "h"} <= cols:
        return F.col("w").cast("long") * F.col("h")
    if "text" in cols:
        return F.length("text").cast("long")
    if payload_col in cols:
        return F.length(F.col(payload_col)).cast("long")
    if "size" in cols:
        return F.col("size").cast("long")
    return F.lit(0).cast("long")


def _export_deduped(clusters, reps, source_df, args: argparse.Namespace) -> None:
    """The engine's terminal output: the corpus AFTER dedup — every
    cluster contributes its keep-best survivor, rows that never
    clustered pass through — exported as WebDataset tar shards. Keep-set
    construction is id-only (anti-join for the unclustered, semi-join
    for the survivors); payload bytes move exactly once, into their
    shard."""
    from pyspark.sql import functions as F

    from yadf_spark.sinks.webdataset import write_webdataset_shards

    unclustered = source_df.join(
        clusters.select(F.col("image_id")), "image_id", "left_anti"
    )
    survivors = source_df.join(
        reps.select(F.col("rep_id").alias("image_id")), "image_id", "left_semi"
    )
    keep = unclustered.unionByName(survivors)
    caption_col = next((c for c in ("caption", "text") if c in keep.columns), None)
    # member extension drives the loader's decoder dispatch: only the
    # image mode may claim an image extension; audio clips and
    # arbitrary exact-mode files stay content-opaque .bin
    ext = "jpg" if args.mode == "near-dup" else "bin"
    if args.payload_col in keep.columns:
        bytes_col = args.payload_col
    elif "bytes" in keep.columns:
        bytes_col = "bytes"
    else:
        # text corpora carry no binary payload — the document itself is
        # the sample: export it as the .txt member
        keep = keep.withColumn("_payload", F.encode(F.col(caption_col), "UTF-8"))
        bytes_col, ext, caption_col = "_payload", "txt", None
    write_webdataset_shards(
        keep,
        args.export_dir,
        n_shards=args.export_shards,
        bytes_col=bytes_col,
        caption_col=caption_col,
        ext=ext,
    )


def _write_survivor_outputs(clusters, source_df, args: argparse.Namespace) -> None:
    """The --survivors / --export-dir tail shared by every mode: elect
    the keep-best representative per cluster, persist the survivor
    table, and/or export the deduped corpus as tar shards."""
    if not (args.survivors or args.export_dir) or source_df is None:
        return
    from yadf_spark.operators import curation

    reps = curation.cluster_representatives(
        source_df,
        clusters,
        id_col="image_id",
        quality_col=_survivor_quality(source_df, args.payload_col),
        cluster_member_col="image_id",
    )
    if args.survivors:
        reps.write.mode("overwrite").parquet(args.survivors)
    if args.export_dir:
        _export_deduped(clusters, reps, source_df, args)


def _assign_or_merge(pairs, base):
    """Shared clustering tail for the text/audio modes: from-scratch
    components, or — under --base-clusters — the quotient-graph merge
    into the prior assignment (which then carries ALL base rows through,
    making the output cumulative)."""
    from pyspark.sql import functions as F

    from yadf_spark.operators import components

    out = (
        components.connected_components(pairs)
        if base is None
        else components.merge_assignments(base, pairs)
    )
    return out.select(F.col("id").alias("image_id"), "cluster_id")


def _parse_split_weights(args: argparse.Namespace) -> dict[str, int]:
    """label=percent list shared by --split-table and --mode curate."""
    return {
        k.strip(): int(v)
        for k, v in (part.split("=", 1) for part in args.split_weights.split(","))
    }


def _write_split_table(clusters, source_df, args: argparse.Namespace) -> None:
    """The --split-table tail shared by every clustering mode: write a
    leakage-guarded (image_id, split_key, bucket, split) assignment for
    EVERY corpus row — clustered rows keyed on their cluster id,
    singletons on their own id."""
    if not args.split_table or source_df is None:
        return
    from pyspark.sql import functions as F

    from yadf_spark.operators import curation

    weights = _parse_split_weights(args)
    curation.cluster_safe_split(
        source_df.select("image_id"),
        clusters.select(F.col("image_id").alias("id"), "cluster_id"),
        "image_id",
        weights,
    ).write.mode("overwrite").parquet(args.split_table)


def _clusters_to_groups(clusters, args: argparse.Namespace, source_df=None):
    """Shared tail of every clustering mode: optionally persist the
    ``(image_id, cluster_id)`` assignment to ``--cluster-table`` and the
    per-cluster keep-best rows to ``--survivors``, then aggregate a
    groups view (sorted members + rfactor filter) for the text output
    formats."""
    from pyspark.sql import functions as F

    from yadf_spark.operators import exact
    from yadf_spark.sinks import formats as fmts

    if args.cluster_table:
        fmts.write_cluster_assignments(
            clusters, args.cluster_table, table=_as_table_ident(args.cluster_table)
        )
    _write_survivor_outputs(clusters, source_df, args)
    _write_split_table(clusters, source_df, args)
    return (
        clusters.groupBy(F.col("cluster_id").alias("group_key"))
        .agg(F.sort_array(F.collect_list("image_id")).alias("members"), F.count("*").alias("n"))
        .filter(exact.factor_predicate(F.col("n"), args.rfactor))
    )


def run(args: argparse.Namespace, spark=None) -> int:
    from pyspark.sql import functions as F

    from yadf_spark.operators import exact
    from yadf_spark.plans.checkpoint import Checkpointer
    from yadf_spark.session import get_spark
    from yadf_spark.sinks import formats as fmts
    from yadf_spark.sources import corpus as src

    logging.basicConfig(
        level=[logging.WARNING, logging.INFO, logging.DEBUG][min(args.verbose, 2)],
        stream=sys.stderr,
        format="%(levelname)s %(name)s: %(message)s",
    )
    if args.against and args.mode not in ("text-near-dup", "near-dup"):
        raise SystemExit("--against requires --mode text-near-dup or near-dup")
    if args.strip_spans and args.mode != "text-near-dup":
        raise SystemExit("--strip-spans requires --mode text-near-dup")
    if args.strip_spans and args.against:
        # under --against the docs view is the BATCH only — spans would
        # be computed against the batch, not the history the user
        # pointed the run at, silently passing history boilerplate
        # through uncut; reject rather than surprise
        raise SystemExit(
            "--strip-spans does not apply under --against (spans would be "
            "computed within the batch only, ignoring the history corpus); "
            "run it as a separate pass over the combined corpus"
        )
    if args.novel_table and not args.against:
        raise SystemExit("--novel-table requires --against")
    if args.mode == "cluster-quality" and not (args.eval_clusters and args.eval_truth):
        # fail before the JVM spins up — the mode needs both tables
        raise SystemExit(
            "--mode cluster-quality requires --eval-clusters and --eval-truth"
        )
    if args.collapse_history and not (args.against and args.mode == "near-dup"):
        # the text gate keys on document content directly and has no
        # image-class collapse; silently ignoring the flag would let
        # the user believe the viral-history mitigation is active
        raise SystemExit("--collapse-history requires --against with --mode near-dup")
    if args.no_collapse_exact and args.against:
        raise SystemExit(
            "--no-collapse-exact does not apply under --against (the gate "
            "never collapses the batch side; history collapse is opt-in "
            "via --collapse-history)"
        )
    if args.against and (args.survivors or args.export_dir or args.split_table):
        # the gate's clusters are batch-keyed MATCH groups whose history
        # members are absent from the source frame — the survivor
        # election would silently crown every duplicate batch row its
        # own cluster's keep-best and export it
        raise SystemExit(
            "--survivors/--export-dir/--split-table do not apply under "
            "--against (an ingest gate, not a clustering run); the "
            "deduped hand-off is --novel-table"
        )
    spark = spark or get_spark(app_name="yadf-spark-cli", cores=args.cores)

    if args.mode == "cluster-quality":
        # evaluation of two existing assignment tables — no corpus scan
        import decimal as _dec
        import json as _json

        from yadf_spark.operators import evaluation

        clusters = spark.read.parquet(args.eval_clusters).withColumnRenamed(
            args.id_col, "id"
        )
        truth = spark.read.parquet(args.eval_truth).withColumnRenamed(
            args.id_col, "id"
        )
        # one report line, one action: pair view (tp/fp/fn/tn, Rand/ARI)
        # and the element/entropy view (purity, B-cubed, V-measure) in a
        # single plan, whose shared id-join + contingency-cell subplan
        # AQE computes once (ReusedExchange)
        rep = {
            k: (int(v) if isinstance(v, _dec.Decimal) else v)
            for k, v in evaluation.cluster_quality_report(clusters, truth)
            .collect()[0]
            .asDict()
            .items()
        }
        print(_json.dumps(rep))
        return 0

    min_size = 1 if (args.no_empty and args.min is None) else args.min
    if args.table:
        df = src.table_corpus(spark, args.table, args.id_col, args.payload_col)
    else:
        paths = src.default_paths(args.paths)
        df = src.filesystem_corpus(
            spark,
            paths,
            max_depth=args.depth,
            keep_hardlinks=args.hard_links,
            # a min-size >= 1 drops empties anyway — skip the recovery listing
            include_empty=not (min_size and min_size >= 1),
            # F3 drops oversize rows downstream — the recovery walk must
            # not materialize their payload at all
            max_read_bytes=args.max,
        )
    flt = ScanFilter(min_size=min_size, max_size=args.max, regex=args.pattern, glob=args.glob)
    ladder = LadderConfig(algo=args.algorithm)

    # Without a checkpoint dir or a metrics request there is nothing the
    # eager per-stage materialization buys — lazy mode fuses the whole
    # run into the single output action (fewer driver round trips)
    eager = bool(args.checkpoint_dir or args.report or args.verbose)

    base = None
    if args.base_clusters:
        base = spark.read.parquet(args.base_clusters).select(
            F.col("image_id").alias("id"), "cluster_id"
        )

    if args.mode == "curate":
        from yadf_spark.operators import curation

        if not args.curated_table:
            raise SystemExit("--mode curate requires --curated-table")
        filtered = exact.apply_scan_filters(df, flt)
        if args.text_col in filtered.columns:
            docs = filtered.select("image_id", F.col(args.text_col).alias("text"))
        else:
            docs = filtered.select(
                "image_id", F.decode(F.col("bytes"), "UTF-8").alias("text")
            )
        weights = _parse_split_weights(args)
        out = curation.curate_text_corpus(
            docs, "image_id", "text",
            split_weights=weights, pack_budget=args.pack_budget,
        )
        out.write.mode("overwrite").partitionBy("split").parquet(args.curated_table)
        if args.report:
            stats = (
                spark.read.parquet(args.curated_table)
                .groupBy("split")
                .agg(F.count("*").alias("docs"), F.sum("n_tokens").alias("tokens"))
                .orderBy("split")
                .collect()
            )
            for r in stats:
                print(f"curate: {r.split}: {r.docs} docs, {r.tokens} tokens", file=sys.stderr)
        return 0

    if args.mode == "near-dup":
        from yadf_spark.operators import pipeline as pl

        ck = Checkpointer(spark=spark, workdir=args.checkpoint_dir, eager=eager)
        filtered = exact.apply_scan_filters(df, flt)
        if args.drop_format_mismatch:
            from yadf_spark.operators import multimodal as mm

            sniffed = mm.sniffed_format_col(F.col("bytes"))
            keep = sniffed != F.lit("unknown")
            if "fmt" in filtered.columns:
                keep = keep & (F.col("fmt") == sniffed)
            filtered = filtered.filter(keep)
        images = pl.prepare_images(filtered)
        if args.against:
            # fuzzy image ingest gate: batch-vs-history band join only,
            # never a history self-join (pipeline.near_dup_gate)
            hist = pl.prepare_images(
                src.table_corpus(spark, args.against, args.id_col, args.payload_col)
            )
            gate = pl.near_dup_gate(
                images,
                hist,
                NearDupConfig(flip_invariant=args.flip_invariant),
                checkpointer=ck,
                history_fingerprint=args.against,
                collapse_history=args.collapse_history,
                ladder_cfg=ladder if args.collapse_history else None,
            )
            if args.novel_table:
                # anti-join the PRE-prepare frame: the hand-off keeps the
                # input columns, not the synthesized caption/phash
                filtered.join(gate["matched_ids"], "image_id", "left_anti").write.mode(
                    "overwrite"
                ).parquet(args.novel_table)
            if base is not None:
                log.warning(
                    "--base-clusters does not apply under --against — flag ignored"
                )
            vpairs = gate["verified_pairs"].filter(F.col("verified")).select("id_a", "id_b")
            clusters = vpairs.select(
                F.col("id_a").alias("cluster_id"), F.col("id_b").alias("image_id")
            ).unionByName(
                vpairs.select(
                    F.col("id_a").alias("cluster_id"), F.col("id_a").alias("image_id")
                ).distinct()
            )
            groups = _clusters_to_groups(clusters, args, source_df=images)
            if args.report or args.verbose:
                metrics = (ck.metrics() if eager else []) + [
                    {"stage": "gate_batch", "rows": images.count(), "seconds": -1.0,
                     "resumed": False},
                    {"stage": "gate_matched", "rows": gate["matched_ids"].count(),
                     "seconds": -1.0, "resumed": False},
                ]
            else:
                metrics = None
        else:
            out = pl.near_dup_pipeline(
                images,
                NearDupConfig(
                    flip_invariant=args.flip_invariant,
                    collapse_exact=not args.no_collapse_exact,
                ),
                checkpointer=ck,
                base_assignment=base,
                base_fingerprint=args.base_clusters,
            )
            groups = _clusters_to_groups(out["clusters"], args, source_df=images)
            metrics = out["metrics"] if "metrics" in out else None
    elif args.mode == "text-near-dup":
        from yadf_spark.config import LshConfig
        from yadf_spark.operators import components
        from yadf_spark.operators import minhash as mh

        ck = Checkpointer(spark=spark, workdir=args.checkpoint_dir, eager=eager)
        batch_full = exact.apply_scan_filters(df, flt)

        def _text_view(frame):
            if args.text_col in frame.columns:
                return frame.select("image_id", F.col(args.text_col).alias("text"))
            # filesystem corpora carry raw payloads — treat them as
            # UTF-8 text files (the narrow-map decode never shuffles)
            return frame.select("image_id", F.decode(F.col("bytes"), "UTF-8").alias("text"))

        docs = _text_view(batch_full)
        cfg = LshConfig()
        if args.against:
            # fuzzy ingest gate: batch-vs-history only, never a history
            # self-join (minhash.cross_candidate_pairs_from_buckets)
            hist = _text_view(
                src.table_corpus(spark, args.against, args.id_col, args.payload_col)
            )
            pairs = ck.stage(
                "cross_pairs",
                {"lsh": cfg, "jaccard": args.jaccard, "filter": flt, "against": args.against},
                lambda: mh.exact_jaccard_between(
                    mh.minhash_candidates_between(docs, hist, cfg, "image_id", "text"),
                    docs,
                    hist,
                    "image_id",
                    "text",
                    k=cfg.shingle_k,
                )
                .filter(F.col("jaccard") >= args.jaccard)
                .select("id_a", "id_b"),
            )
            if args.novel_table:
                matched = pairs.select(F.col("id_a").alias("image_id")).distinct()
                batch_full.join(matched, "image_id", "left_anti").write.mode(
                    "overwrite"
                ).parquet(args.novel_table)
            if base is not None:
                log.warning(
                    "--base-clusters does not apply under --against (the gate "
                    "emits batch-keyed match groups, not a cumulative "
                    "assignment) — flag ignored"
                )
            # each matched batch row IS its group: members are the row
            # plus its history near-dups, keyed on the batch id
            clusters = (
                pairs.select(F.col("id_a").alias("cluster_id"), F.col("id_b").alias("image_id"))
                .unionByName(
                    pairs.select(
                        F.col("id_a").alias("cluster_id"), F.col("id_a").alias("image_id")
                    ).distinct()
                )
            )
            groups = _clusters_to_groups(clusters, args, source_df=docs)
        else:
            pairs = ck.stage(
                "text_pairs",
                {"lsh": cfg, "jaccard": args.jaccard, "filter": flt},
                lambda: mh.exact_jaccard(
                    mh.minhash_candidates(docs, cfg, id_col="image_id", text_col="text"),
                    docs,
                    "image_id",
                    "text",
                    k=cfg.shingle_k,
                )
                .filter(F.col("jaccard") >= args.jaccard)
                .select("id_a", "id_b"),
            )
            clusters = _assign_or_merge(pairs, base)
            groups = _clusters_to_groups(clusters, args, source_df=docs)
        if args.strip_spans:
            from yadf_spark.operators import curation

            ck.stage(
                "strip_spans",
                {"min_len": args.span_min_len, "filter": flt},
                lambda: curation.strip_repeated_spans(
                    docs, "image_id", "text", min_len=args.span_min_len
                ),
            ).write.mode("overwrite").parquet(args.strip_spans)
        metrics = ck.metrics() if eager else None
    elif args.mode == "audio-near-dup":
        from yadf_spark.operators import audio as au
        from yadf_spark.operators import components

        ck = Checkpointer(spark=spark, workdir=args.checkpoint_dir, eager=eager)
        clips = exact.apply_scan_filters(df, flt)
        pairs = ck.stage(
            "audio_pairs",
            {"filter": flt},
            lambda: au.audio_near_dup_pairs(clips, id_col="image_id").select("id_a", "id_b"),
        )
        # singleton clips never form a group, so the components output
        # (edge-bearing nodes only) is the complete cluster assignment
        # for display purposes
        clusters = _assign_or_merge(pairs, base)
        groups = _clusters_to_groups(clusters, args, source_df=clips)
        metrics = ck.metrics() if eager else None
    else:
        if base is not None:
            log.warning(
                "--base-clusters applies to the clustering modes "
                "(near-dup / text-near-dup / audio-near-dup); the exact "
                "ladder recomputes groups from content hashes each run "
                "— flag ignored"
            )
        ck = Checkpointer(spark=spark, workdir=args.checkpoint_dir, eager=eager)
        assignments = ck.stage(
            "exact_ladder",
            {"ladder": ladder, "filter": flt},
            lambda: exact.exact_assignments(df, cfg=ladder, scan_filter=flt),
        )
        groups = exact.groups_from_assignments(assignments, args.rfactor)
        # lazy-mode metrics would trigger extra count jobs — only
        # materialize them when they will actually be printed
        metrics = ck.metrics() if eager else None
        if args.cluster_table:
            fmts.write_cluster_assignments(
                groups.select(
                    F.explode("members").alias("image_id"), F.col("group_key").alias("cluster_id")
                ),
                args.cluster_table,
                table=_as_table_ident(args.cluster_table),
            )
        if args.survivors or args.export_dir or args.split_table:
            # exact groups hold byte-identical payloads, so quality is
            # a constant within each group and the policy degrades to
            # keep-min-id — the deterministic analog of the reference
            # cleaner's keep-first. Clusters come from ALL dup groups
            # (over:1), NOT the rfactor-filtered display groups — -r is
            # a VIEW filter; letting it leak here would silently export
            # every copy of any group it hides
            clusters_ex = exact.groups_from_assignments(assignments, Factor.over(1)).select(
                F.explode("members").alias("image_id"), F.col("group_key").alias("cluster_id")
            )
            _write_survivor_outputs(clusters_ex, df, args)
            _write_split_table(clusters_ex, df, args)

    if args.output_dir:
        liners = {
            "fdupes": fmts.fdupes_lines,
            "machine": fmts.machine_lines,
            "ld-json": fmts.ldjson_lines,
            "csv": fmts.csv_lines,
        }
        if args.format not in liners:
            raise SystemExit(
                f"--output-dir needs a line-oriented format "
                f"({', '.join(liners)}); got -f {args.format} "
                f"(whole-document json cannot be written as distributed parts)"
            )
        fmts.write_lines(liners[args.format](groups), args.output_dir)
    else:
        rendered = fmts.render(groups, args.format)
        if args.output:
            with open(args.output, "w") as fh:
                fh.write(rendered + ("\n" if rendered else ""))
        else:
            print(rendered)

    if (args.report or args.verbose) and metrics:
        for m in metrics:
            print(f"stage {m['stage']}: rows={m['rows']} sec={m['seconds']} resumed={m['resumed']}", file=sys.stderr)
    return 0


def main(argv: list[str] | None = None) -> int:
    return run(build_parser().parse_args(argv))


if __name__ == "__main__":
    sys.exit(main())
