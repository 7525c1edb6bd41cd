"""CLI + filesystem-source tests — the reference's end-to-end surface
(reference: tests/integration.rs:22-182, tests/particular_cases.rs).

Each test builds a planted directory tree (the reference's TestDir
pattern, tests/common/mod.rs:51-97), runs the CLI in-process against the
session-scoped SparkSession, and asserts on the formatted output."""

from __future__ import annotations

import json
import os

import pytest

from yadf_spark.cli import build_parser, parse_bytes, run
from yadf_spark.sources import corpus as src


@pytest.fixture()
def tree(tmp_path):
    """The reference's static fixture tree (tests/static): foo/bar/qix
    identical, qux different, qax small."""
    d = tmp_path / "corpus"
    d.mkdir()
    for name in ("foo", "bar", "qix"):
        (d / name).write_bytes(b"aa\n")
    (d / "qux").write_bytes(b"bb\n")
    (d / "qax").write_bytes(b"i\n")
    sub = d / "sub"
    sub.mkdir()
    (sub / "deep_foo").write_bytes(b"aa\n")
    return d


def _cli(spark, argv) -> str:
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = run(build_parser().parse_args(argv), spark=spark)
    assert rc == 0
    return buf.getvalue()


def test_json_groups(spark, tree):
    out = _cli(spark, ["-f", "json", str(tree)])
    groups = json.loads(out)
    assert len(groups) == 1
    assert sorted(os.path.basename(p) for p in groups[0]) == ["bar", "deep_foo", "foo", "qix"]


def test_fdupes_format_blank_line_between_groups(spark, tmp_path):
    d = tmp_path / "c"
    d.mkdir()
    for name in ("a1", "a2"):
        (d / name).write_bytes(b"groupA")
    for name in ("b1", "b2"):
        (d / name).write_bytes(b"groupB")
    (d / "solo").write_bytes(b"unique")
    out = _cli(spark, ["-f", "fdupes", str(d)])
    blocks = [b.splitlines() for b in out.strip().split("\n\n")]
    assert len(blocks) == 2
    names = sorted(sorted(os.path.basename(p) for p in b) for b in blocks)
    assert names == [["a1", "a2"], ["b1", "b2"]]


def test_machine_and_csv_and_ldjson(spark, tree):
    machine = _cli(spark, ["-f", "machine", str(tree)])
    assert machine.count('"') == 8  # 4 quoted paths on one line
    csv = _cli(spark, ["-f", "csv", str(tree)])
    lines = csv.strip().splitlines()
    assert lines[0] == "count,files"
    assert lines[1].startswith("4,")
    ld = _cli(spark, ["-f", "ld-json", str(tree)])
    assert len(json.loads(ld.strip().splitlines()[0])) == 4


def test_min_max_filters(spark, tree):
    # min 3 bytes excludes qax ("i\n"); the aa-group (3 bytes) survives
    out = json.loads(_cli(spark, ["-f", "json", "--min", "3", str(tree)]))
    assert len(out) == 1
    # max 1 byte excludes everything
    out = json.loads(_cli(spark, ["-f", "json", "--max", "1", str(tree)]))
    assert out == []


def test_regex_and_glob_filters(spark, tree):
    # regex ^q keeps qix/qux/qax only -> no group of >=2 identical
    out = json.loads(_cli(spark, ["-f", "json", "-p", "^q", str(tree)]))
    assert out == []
    # glob matching f*/b* keeps foo/bar (identical); deep_foo does NOT
    # match [fb]* as a whole name (fnmatch semantics — the unanchored
    # regex used to keep it via the 'foo' substring)
    out = json.loads(_cli(spark, ["-f", "json", "-g", "[fb]*", str(tree)]))
    assert len(out) == 1 and len(out[0]) == 2
    names = sorted(os.path.basename(p) for p in out[0])
    assert names == ["bar", "foo"]


def test_depth_bound(spark, tree):
    # depth 1 = direct children only: sub/deep_foo excluded
    out = json.loads(_cli(spark, ["-f", "json", "-d", "1", str(tree)]))
    assert sorted(os.path.basename(p) for p in out[0]) == ["bar", "foo", "qix"]


def test_rfactor_variants(spark, tree):
    # equal:1 = uniques view (qux, qax as 1-member groups)
    out = json.loads(_cli(spark, ["-f", "json", "-r", "equal:1", str(tree)]))
    singles = sorted(os.path.basename(p) for g in out for p in g)
    assert singles == ["qax", "qux"]
    out = json.loads(_cli(spark, ["-f", "json", "-r", "under:5", str(tree)]))
    assert len(out) == 3  # every bucket has < 5 members


def test_no_empty(spark, tmp_path):
    d = tmp_path / "c"
    d.mkdir()
    (d / "e1").write_bytes(b"")
    (d / "e2").write_bytes(b"")
    (d / "f1").write_bytes(b"x")
    (d / "f2").write_bytes(b"x")
    out = json.loads(_cli(spark, ["-f", "json", str(d)]))
    assert len(out) == 2  # empty files group together by default
    out = json.loads(_cli(spark, ["-f", "json", "-n", str(d)]))
    assert len(out) == 1  # --no-empty drops them


def test_machine_format_debug_quoting(spark, tmp_path):
    """A path containing '"' or '\\' must be escaped Rust-{:?}-style in
    the machine format (reference: src/bag/display.rs:28-47) — bare
    wrapping quotes would emit a malformed line."""
    d = tmp_path / "c"
    d.mkdir()
    (d / 'we"ird').write_bytes(b"dup-bytes")
    (d / "plain").write_bytes(b"dup-bytes")
    out = _cli(spark, ["-f", "machine", str(d)])
    line = out.strip()
    assert '\\"' in line  # the embedded quote is escaped
    # both members present, each wrapped in quotes
    assert f'"{d}/plain"' in line
    assert f'"{d}/we\\"ird"' in line


def test_non_utf8_path_scan(spark, tmp_path):
    """Files with non-UTF-8 names must be scanned and grouped, with the
    id serialized lossily (reference: src/path.rs:7-14 + its dedicated
    test tests/integration.rs:152-169). Spark's binaryFile silently
    drops such files — the recovery walk reads them executor-side."""
    d = tmp_path / "c"
    d.mkdir()
    for raw in (b"caf\xe9_1", b"caf\xe9_2"):  # latin-1 e-acute: invalid UTF-8
        with open(os.path.join(os.fsencode(str(d)), raw), "wb") as fh:
            fh.write(b"same-bytes")
    out = json.loads(_cli(spark, ["-f", "json", str(d)]))
    assert len(out) == 1 and len(out[0]) == 2
    names = sorted(os.path.basename(p) for p in out[0])
    assert names == ["caf�_1", "caf�_2"]  # U+FFFD replacement


def test_recovery_read_gated_on_max_size(spark, tmp_path):
    """A non-UTF-8-named file above the scan filter's max size must not
    have its payload materialized by the recovery walk at all (it would
    be dropped by F3 downstream anyway) — ADVICE r2: one multi-GB such
    file must not OOM the driver or a worker."""
    d = tmp_path / "c"
    d.mkdir()
    (d / "small_a").write_bytes(b"x" * 10)
    (d / "small_b").write_bytes(b"x" * 10)
    with open(os.path.join(os.fsencode(str(d)), b"big_\xe9"), "wb") as fh:
        fh.write(b"y" * 4096)
    # no cap: the big non-UTF-8-named file is recovered (baseline)
    df = src.filesystem_corpus(spark, [str(d)])
    names = sorted(os.path.basename(r["image_id"]) for r in df.collect())
    assert names == ["big_�", "small_a", "small_b"]
    # cap below its size: the payload is never read, the row never emitted
    df = src.filesystem_corpus(spark, [str(d)], max_read_bytes=100)
    names = sorted(os.path.basename(r["image_id"]) for r in df.collect())
    assert names == ["small_a", "small_b"]


def test_no_empty_skips_empty_recovery(spark, tree, monkeypatch):
    """-n / min>=1 must skip the zero-length recovery (the empties would
    be filtered out anyway) — the seam asserts include_empty=False
    reaches the source layer."""
    calls = []
    real = src._recovery_files_local

    def spy(spark_, roots, glob, include_empty, *a, **k):
        calls.append(include_empty)
        return real(spark_, roots, glob, include_empty, *a, **k)

    monkeypatch.setattr(src, "_recovery_files_local", spy)
    _cli(spark, ["-f", "json", "-n", str(tree)])
    assert calls == [False]
    _cli(spark, ["-f", "json", str(tree)])
    assert calls == [False, True]


def test_output_dir_rejects_whole_document_formats(spark, tree, tmp_path):
    """--output-dir with json/json-pretty must error, not silently write
    ld-json parts."""
    with pytest.raises(SystemExit, match="line-oriented"):
        run(
            build_parser().parse_args(
                ["-f", "json", "--output-dir", str(tmp_path / "o"), str(tree)]
            ),
            spark=spark,
        )


@pytest.mark.skipif(os.name != "posix", reason="hard links are POSIX")
def test_hardlink_suppression(spark, tmp_path):
    d = tmp_path / "c"
    d.mkdir()
    (d / "orig").write_bytes(b"same-bytes")
    os.link(d / "orig", d / "link")
    (d / "copy").write_bytes(b"same-bytes")
    # default: hard link suppressed — exactly one of {orig, link} remains
    # (deterministic min-path winner; the reference keeps first-seen,
    # which its parallel walk makes nondeterministic, src/fs/filter.rs:99)
    out = json.loads(_cli(spark, ["-f", "json", str(d)]))
    assert sorted(os.path.basename(p) for p in out[0]) == ["copy", "link"]
    # -H: hard links count as duplicates -> all three
    out = json.loads(_cli(spark, ["-f", "json", "-H", str(d)]))
    assert len(out[0]) == 3


def test_input_path_dedup(spark, tree):
    """S3: passing the same root twice must not double-count."""
    out = json.loads(_cli(spark, ["-f", "json", str(tree), str(tree)]))
    assert len(out) == 1 and len(out[0]) == 4


def test_output_file_and_algorithms(spark, tree, tmp_path):
    # one algo per implementation class (JVM-hash / JVM-digest /
    # pandas-UDF); sha256/sha512 share md5's code path and blake2b256
    # shares blake2b128's — covered by the hashes unit tests
    for algo in ("xxhash64", "md5", "blake2b128"):
        target = tmp_path / f"out-{algo}.json"
        _cli(spark, ["-f", "json", "-a", algo, "-o", str(target), str(tree)])
        assert len(json.loads(target.read_text())) == 1


def test_cluster_table_sink(spark, tree, tmp_path):
    ct = tmp_path / "clusters"
    _cli(spark, ["-f", "json", "--cluster-table", str(ct), str(tree)])
    df = spark.read.parquet(str(ct))
    assert set(df.columns) == {"image_id", "cluster_id"}
    assert df.count() == 4  # only the dup-group members (rfactor over:1)


def test_table_ident_heuristic():
    """Dotted catalog names route to the Iceberg writeTo seam; paths and
    file names stay on the parquet stand-in."""
    from yadf_spark.cli import _as_table_ident

    assert _as_table_ident("yadf.db.clusters") == "yadf.db.clusters"
    assert _as_table_ident("/tmp/clusters") is None
    assert _as_table_ident("out.parquet") is None
    assert _as_table_ident("clusters") is None
    # dotted FILENAMES are paths, not catalog idents: only the full
    # catalog.namespace.table shape routes to writeTo
    assert _as_table_ident("clusters.v2") is None
    assert _as_table_ident("out.data") is None
    assert _as_table_ident("a..b") is None


def test_cluster_table_unregistered_catalog_raises(spark, tmp_path):
    """A table ident whose catalog is not registered on the frame's own
    session must fail up front with a clear message — not after the
    pipeline ran (CATALOG_NOT_FOUND), and never by silently writing a
    parquet directory literally named like the ident."""
    import pytest as _pytest

    from yadf_spark.sinks import formats as fmts

    df = spark.createDataFrame([("a", 1)], "image_id string, cluster_id long")
    with _pytest.raises(ValueError, match="not\\s+registered"):
        fmts.write_cluster_assignments(df, path=str(tmp_path / "x"), table="nope.db.t")


@pytest.mark.skipif(
    not __import__("yadf_spark.session", fromlist=["iceberg_jar_present"]).iceberg_jar_present(),
    reason="Iceberg runtime jar not on the classpath in this container",
)
def test_iceberg_cluster_table_write(spark, tmp_path):
    """When the runtime jar exists, write_cluster_assignments(table=...)
    must go through writeTo(...).createOrReplace() on the configured
    hadoop catalog and be replayable (replace, not append)."""
    from yadf_spark.session import ICEBERG_CATALOG
    from yadf_spark.sinks import formats as fmts

    df = spark.createDataFrame(
        [("img-1", "c1"), ("img-2", "c1")], "image_id string, cluster_id string"
    )
    tbl = f"{ICEBERG_CATALOG}.db.test_clusters"
    fmts.write_cluster_assignments(df, path="", table=tbl)
    fmts.write_cluster_assignments(df, path="", table=tbl)  # replace, not append
    assert spark.table(tbl).count() == 2


def test_checkpoint_resume(spark, tree, tmp_path):
    ck = tmp_path / "ck"
    _cli(spark, ["-f", "json", "--checkpoint-dir", str(ck), str(tree)])
    assert (ck / "exact_ladder" / "manifest.json").exists()
    # second run resumes (manifest fingerprint matches)
    import io
    from contextlib import redirect_stderr

    buf = io.StringIO()
    with redirect_stderr(buf):
        _cli(spark, ["-f", "json", "--checkpoint-dir", str(ck), "--report", str(tree)])
    assert "resumed=True" in buf.getvalue()


def test_table_source_mode(spark, tmp_path):
    import pyspark.sql.functions as F

    rows = [("a", b"xx"), ("b", b"xx"), ("c", b"yy")]
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    path = str(tmp_path / "tbl")
    df.write.parquet(path)
    out = json.loads(_cli(spark, ["-f", "json", "--table", path]))
    assert out == [["a", "b"]]


def test_parse_bytes_units():
    assert parse_bytes("100") == 100
    assert parse_bytes("4K") == 4000
    assert parse_bytes("4KiB") == 4096
    assert parse_bytes("100M") == 100_000_000
    assert parse_bytes("1GiB") == 1024**3
    assert parse_bytes("1.5k") == 1500
    with pytest.raises(Exception):
        parse_bytes("12parsecs")


def test_default_paths_explicit():
    assert src.default_paths(["/a", "/b"]) == ["/a", "/b"]


def test_filesystem_corpus_schema(spark, tree):
    df = src.filesystem_corpus(spark, [str(tree)])
    assert [f.name for f in df.schema.fields[:3]] == ["image_id", "bytes", "size"]
    assert df.count() == 6


def test_near_dup_mode_on_filesystem_images(spark, tmp_path):
    """CLI near-dup over a directory of image files: no caption/phash
    columns exist — prepare_images synthesizes them; exact dups and a
    lossy re-encode cluster together, unrelated images stay apart."""
    import numpy as np

    from yadf_spark.fixtures import codec

    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8).astype(np.uint8)
    (d / "a_orig.img").write_bytes(codec.encode_png(px))
    (d / "a_copy.img").write_bytes(codec.encode_png(px))
    (d / "a_lossy.img").write_bytes(codec.encode_jpeg(px, step=2))  # PSNR ~53dB
    other = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8).astype(np.uint8)
    (d / "b.img").write_bytes(codec.encode_png(other))
    (d / "not_an_image.txt").write_bytes(b"plain text payload")

    out = json.loads(_cli(spark, ["-f", "json", "--mode", "near-dup", str(d)]))
    groups = [sorted(os.path.basename(p) for p in g) for g in out]
    assert ["a_copy.img", "a_lossy.img", "a_orig.img"] in groups
    flat = {n for g in groups for n in g}
    assert "b.img" not in flat and "not_an_image.txt" not in flat


def test_audio_near_dup_mode_on_filesystem_clips(spark, tmp_path):
    """CLI audio-near-dup over a directory of audio files: a clip and its
    small-noise variant cluster together; an unrelated amplitude profile
    and a non-audio file stay out."""
    import numpy as np

    from yadf_spark.operators import audio as au

    d = tmp_path / "clips"
    d.mkdir()

    def amp_clip(seed):
        rng = np.random.RandomState(seed)
        n = 16_000
        amps = rng.uniform(500.0, 12_000.0, size=64)
        amp = np.empty(n)
        for w, ix in enumerate(np.array_split(np.arange(n), 64)):
            amp[ix] = amps[w]
        sig = amp * np.sin(2.0 * np.pi * 440.0 * np.arange(n) / 16_000)
        return np.clip(sig, -32768, 32767).astype(np.int16)[:, None]

    base = amp_clip(21)
    noisy = np.clip(
        base[:, 0].astype(np.int32)
        + np.random.RandomState(22).randint(-100, 101, size=base.shape[0]),
        -32768, 32767,
    ).astype(np.int16)[:, None]
    (d / "a_orig.aud").write_bytes(au.encode_fake_audio(base, 16_000))
    (d / "a_noise.aud").write_bytes(au.encode_fake_audio(noisy, 16_000))
    (d / "b.aud").write_bytes(au.encode_fake_audio(amp_clip(23), 16_000))
    (d / "not_audio.txt").write_bytes(b"plain text payload xxxxxxxxxxxx")

    out = json.loads(_cli(spark, ["-f", "json", "--mode", "audio-near-dup", str(d)]))
    groups = [sorted(os.path.basename(p) for p in g) for g in out]
    assert groups == [["a_noise.aud", "a_orig.aud"]]


def test_output_dir_distributed_write(spark, tree, tmp_path):
    """--output-dir writes the formatted groups as a text dataset
    (distributed sink) instead of a driver-side file."""
    out_dir = tmp_path / "out_lines"
    _cli(spark, ["-f", "ld-json", "--output-dir", str(out_dir), str(tree)])
    lines = [r["value"] for r in spark.read.text(str(out_dir)).collect()]
    groups = [json.loads(ln) for ln in lines if ln.strip()]
    assert len(groups) == 1 and len(groups[0]) == 4


def test_text_near_dup_mode_over_files(spark, tmp_path):
    """--mode text-near-dup clusters UTF-8 files whose shingle sets are
    near-identical, without requiring byte equality."""
    d = tmp_path / "texts"
    d.mkdir()
    base = "the quick brown fox jumps over the lazy dog and runs far away today " * 4
    (d / "a.txt").write_text(base)
    (d / "b.txt").write_text(base + "extra tail word")  # near-dup of a
    (d / "c.txt").write_text(
        "completely different content about spark shuffles and partitions "
        "with nothing shared at all between these two documents whatsoever " * 4
    )
    out = _cli(spark, ["-f", "json", "--mode", "text-near-dup", str(d)])
    groups = json.loads(out)
    assert len(groups) == 1
    assert sorted(os.path.basename(p) for p in groups[0]) == ["a.txt", "b.txt"]


def test_text_near_dup_mode_over_table(spark, tmp_path):
    tbl = str(tmp_path / "docs.parquet")
    rows = [
        ("d1", "alpha beta gamma delta epsilon zeta eta theta " * 6),
        ("d2", "alpha beta gamma delta epsilon zeta eta theta " * 6 + "iota"),
        ("d3", "unrelated words entirely separate vocabulary here now " * 6),
    ]
    spark.createDataFrame(rows, "doc_id string, caption string").write.parquet(tbl)
    out = _cli(
        spark,
        ["-f", "json", "--mode", "text-near-dup", "--table", tbl, "--id-col", "doc_id"],
    )
    groups = json.loads(out)
    assert len(groups) == 1
    assert sorted(groups[0]) == ["d1", "d2"]


def test_survivors_sink_text_mode(spark, tmp_path):
    """--survivors writes one keep-best row per cluster: the longer of
    two near-dup texts wins (quality = text length)."""
    tbl = str(tmp_path / "docs.parquet")
    rows = [
        ("d1", "alpha beta gamma delta epsilon zeta eta theta " * 6),
        ("d2", "alpha beta gamma delta epsilon zeta eta theta " * 6 + "iota"),
        ("d3", "unrelated words entirely separate vocabulary here now " * 6),
    ]
    spark.createDataFrame(rows, "doc_id string, caption string").write.parquet(tbl)
    sv = tmp_path / "survivors"
    _cli(
        spark,
        [
            "-f", "json", "--mode", "text-near-dup", "--table", tbl,
            "--id-col", "doc_id", "--survivors", str(sv),
        ],
    )
    reps = spark.read.parquet(str(sv)).collect()
    assert len(reps) == 1  # components emit edge-bearing nodes only
    r = reps[0]
    assert r.rep_id == "d2" and r.n_members == 2  # d2 is longer


def test_split_table_sink_is_leakage_free(spark, tmp_path):
    """--split-table writes a cluster-safe split: both members of a
    near-dup cluster land in the SAME split, every corpus row gets one."""
    tbl = str(tmp_path / "docs.parquet")
    rows = [
        ("d1", "alpha beta gamma delta epsilon zeta eta theta " * 6),
        ("d2", "alpha beta gamma delta epsilon zeta eta theta " * 6 + "iota"),
        ("d3", "unrelated words entirely separate vocabulary here now " * 6),
    ]
    spark.createDataFrame(rows, "doc_id string, caption string").write.parquet(tbl)
    sp = tmp_path / "splits"
    _cli(
        spark,
        [
            "-f", "json", "--mode", "text-near-dup", "--table", tbl,
            "--id-col", "doc_id", "--split-table", str(sp),
            "--split-weights", "train=80,val=10,test=10",
        ],
    )
    got = {r.image_id: r for r in spark.read.parquet(str(sp)).collect()}
    assert set(got) == {"d1", "d2", "d3"}
    # the near-dup pair shares a split key (the cluster id = min member)
    assert got["d1"].split_key == got["d2"].split_key == "d1"
    assert got["d1"].split == got["d2"].split
    assert got["d3"].split_key == "d3"
    assert all(r.split in {"train", "val", "test"} for r in got.values())


def test_survivors_sink_exact_mode_keeps_min_id(spark, tree, tmp_path):
    """Exact groups hold identical payloads — the survivor is the
    smallest id (deterministic keep-first)."""
    sv = tmp_path / "survivors"
    _cli(spark, ["-f", "json", "--survivors", str(sv), str(tree)])
    reps = spark.read.parquet(str(sv)).collect()
    assert len(reps) == 1
    r = reps[0]
    assert r.n_members == 4
    assert os.path.basename(r.rep_id) in {"bar", "deep_foo", "foo", "qix"}
    # identical payloads -> quality ties -> the lexicographically
    # smallest full path must win
    members = json.loads(_cli(spark, ["-f", "json", str(tree)]))[0]
    assert r.rep_id == min(members)


def test_flip_invariant_cli_mode(spark, tmp_path):
    """--mode near-dup --flip-invariant clusters a mirrored re-encode
    that the default mode keeps separate."""
    import numpy as np

    from yadf_spark.fixtures import codec

    rng = np.random.default_rng(31)
    rows = []
    for i in range(8):
        px = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        cap = f"cli flip caption {i} with words " * 3
        rows.append((f"im-{i}", codec.encode_png(px), cap))
        if i == 2:
            rows.append((f"im-{i}-m", codec.encode_png(px[:, ::-1].copy()), cap))
    tbl = str(tmp_path / "imgs.parquet")
    spark.createDataFrame(rows, "image_id string, bytes binary, caption string").write.parquet(tbl)

    base = json.loads(_cli(spark, ["-f", "json", "--mode", "near-dup", "--table", tbl]))
    assert not any({"im-2", "im-2-m"} <= set(g) for g in base)
    flip = json.loads(
        _cli(spark, ["-f", "json", "--mode", "near-dup", "--table", tbl, "--flip-invariant"])
    )
    assert any(sorted(g) == ["im-2", "im-2-m"] for g in flip)


def test_export_deduped_corpus_text_mode(spark, tmp_path):
    """--export-dir writes the DEDUPED corpus: the longer near-dup
    survivor + the unique doc, as .txt tar members; the dropped dup is
    absent."""
    import tarfile

    tbl = str(tmp_path / "docs.parquet")
    rows = [
        ("d1", "alpha beta gamma delta epsilon zeta eta theta " * 6),
        ("d2", "alpha beta gamma delta epsilon zeta eta theta " * 6 + "iota"),
        ("d3", "unrelated words entirely separate vocabulary here now " * 6),
    ]
    spark.createDataFrame(rows, "doc_id string, caption string").write.parquet(tbl)
    out = str(tmp_path / "wds")
    _cli(
        spark,
        ["-f", "json", "--mode", "text-near-dup", "--table", tbl,
         "--id-col", "doc_id", "--export-dir", out, "--export-shards", "2"],
    )
    members = {}
    for name in os.listdir(out):
        with tarfile.open(os.path.join(out, name)) as tf:
            for m in tf.getnames():
                members[m] = tf.extractfile(m).read().decode()
    assert set(members) == {"d2.txt", "d3.txt"}  # d1 dropped (shorter dup)
    assert members["d2.txt"].endswith("iota")


def test_export_deduped_corpus_exact_mode(spark, tree, tmp_path):
    """Exact mode: 4 identical files collapse to their min-id survivor;
    uniques pass through."""
    import tarfile

    out = str(tmp_path / "wds")
    _cli(spark, ["-f", "json", "--export-dir", out, "--export-shards", "2", str(tree)])
    names = []
    for name in os.listdir(out):
        with tarfile.open(os.path.join(out, name)) as tf:
            names.extend(tf.getnames())
    bases = sorted(os.path.basename(n) for n in names)
    # 6 files -> 4-dup group keeps 1, qux + qax pass through = 3 members;
    # non-image modes export content-opaque .bin members
    assert len(bases) == 3
    assert any(b.endswith("qux.bin") for b in bases) and any(b.endswith("qax.bin") for b in bases)


def test_export_deduped_corpus_near_dup_mode(spark, tmp_path):
    """near-dup mode export: singleton-backfilled clusters pass every
    unique image through; the exact-dup pair collapses to its min-id
    survivor with payload + caption members."""
    import tarfile

    import numpy as np

    from yadf_spark.fixtures import codec

    rng = np.random.default_rng(51)
    rows = []
    for i in range(4):
        px = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        payload = codec.encode_png(px)
        rows.append((f"im-{i}", payload, f"near dup caption {i} words " * 3))
        if i == 0:
            rows.append((f"im-{i}-copy", payload, rows[-1][2]))
    tbl = str(tmp_path / "imgs.parquet")
    spark.createDataFrame(rows, "image_id string, bytes binary, caption string").write.parquet(tbl)
    out = str(tmp_path / "wds")
    _cli(
        spark,
        ["-f", "json", "--mode", "near-dup", "--table", tbl,
         "--export-dir", out, "--export-shards", "2"],
    )
    members = set()
    for name in os.listdir(out):
        with tarfile.open(os.path.join(out, name)) as tf:
            members.update(tf.getnames())
    assert members == {
        "im-0.jpg", "im-0.txt", "im-1.jpg", "im-1.txt",
        "im-2.jpg", "im-2.txt", "im-3.jpg", "im-3.txt",
    }


def test_export_ignores_rfactor_view_filter(spark, tree, tmp_path):
    """Regression: -r is a VIEW filter — an rfactor that hides the
    4-member group from the printed output must not leak into the
    export, which would otherwise ship every copy undeduped."""
    import tarfile

    out = str(tmp_path / "wds")
    res = json.loads(
        _cli(spark, ["-f", "json", "-r", "under:3", "--export-dir", out,
                     "--export-shards", "2", str(tree)])
    )
    assert all(len(g) < 3 for g in res)  # the display filter hid the group...
    names = []
    for name in os.listdir(out):
        with tarfile.open(os.path.join(out, name)) as tf:
            names.extend(tf.getnames())
    assert len(names) == 3  # ...but the export still deduped it


def test_glob_filter_is_whole_name_not_substring(spark, tmp_path):
    """Regression: the glob regex fed to rlike (a SEARCH) was
    unanchored, so -g 'a.txt' also kept 'data.txt'. Globs must match
    the whole basename, like fnmatch and the reference."""
    d = tmp_path / "c"
    d.mkdir()
    (d / "a.txt").write_bytes(b"dup")
    (d / "data.txt").write_bytes(b"dup")
    (d / "a2.txt").write_bytes(b"dup")
    out = json.loads(_cli(spark, ["-f", "json", "-r", "over:0", "-g", "a.txt", str(d)]))
    names = sorted(os.path.basename(p) for g in out for p in g)
    assert names == ["a.txt"]


def test_split_table_sink_exact_mode(spark, tree, tmp_path):
    """--split-table in the exact (ladder) mode: all four identical
    payloads share one split; every walked file gets a row."""
    sp = tmp_path / "splits"
    all_files = json.loads(_cli(spark, ["-f", "json", "-r", "over:0", str(tree)]))
    n_files = sum(len(g) for g in all_files)
    _cli(spark, ["-f", "json", "--split-table", str(sp), str(tree)])
    rows = spark.read.parquet(str(sp)).collect()
    assert len(rows) == n_files
    dup_splits = {r.split for r in rows if os.path.basename(r.image_id) in
                  {"bar", "deep_foo", "foo", "qix"}}
    assert len(dup_splits) == 1


def test_base_clusters_incremental_equals_full_batch(spark, tmp_path):
    """Day 1 clusters half the corpus to --cluster-table; day 2 runs the
    full corpus with --base-clusters. The merged assignment must equal a
    from-scratch full-corpus run (edges replayed into the merge are
    absorbed; new edges extend/merge clusters)."""
    base_text = "alpha beta gamma delta epsilon zeta eta theta " * 6
    other = "unrelated words entirely separate vocabulary here now " * 6
    day1_rows = [("d1", base_text), ("d2", base_text + "iota"), ("d5", other)]
    day2_rows = day1_rows + [("d3", base_text + "kappa"), ("d6", other + "mu")]
    t1, t2 = str(tmp_path / "day1.parquet"), str(tmp_path / "day2.parquet")
    spark.createDataFrame(day1_rows, "doc_id string, caption string").write.parquet(t1)
    spark.createDataFrame(day2_rows, "doc_id string, caption string").write.parquet(t2)
    ct1 = str(tmp_path / "clusters1")
    _cli(spark, ["-f", "json", "--mode", "text-near-dup", "--table", t1,
                 "--id-col", "doc_id", "--cluster-table", ct1])
    ct2 = str(tmp_path / "clusters2")
    _cli(spark, ["-f", "json", "--mode", "text-near-dup", "--table", t2,
                 "--id-col", "doc_id", "--base-clusters", ct1,
                 "--cluster-table", ct2])
    ctf = str(tmp_path / "clusters_full")
    _cli(spark, ["-f", "json", "--mode", "text-near-dup", "--table", t2,
                 "--id-col", "doc_id", "--cluster-table", ctf])
    merged = {(r.image_id, r.cluster_id)
              for r in spark.read.parquet(ct2).collect()}
    full = {(r.image_id, r.cluster_id)
            for r in spark.read.parquet(ctf).collect()}
    assert merged == full
    assert ("d3", "d1") in merged  # the new doc joined the old cluster


def test_drop_format_mismatch_gates_near_dup_input(spark, tmp_path):
    """--drop-format-mismatch removes rows whose payload magic
    contradicts the declared fmt (and unknown-magic payloads) BEFORE the
    pipeline: the lying row and the garbage row disappear from the
    singleton-backfilled cluster output; without the flag they survive
    as singletons (garbage quarantines through prepare_images)."""
    import numpy as np

    from yadf_spark.fixtures import codec

    rng = np.random.default_rng(77)
    rows = []
    for i in range(3):
        px = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
        rows.append((f"ok-{i}", codec.encode_png(px), f"caption {i} words here", "png"))
    px = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    rows.append(("liar", codec.encode_png(px), "caption liar words here", "jpeg"))
    rows.append(("junk", b"\x00garbage-not-an-image", "caption junk words here", "png"))
    tbl = str(tmp_path / "mix.parquet")
    spark.createDataFrame(
        rows, "image_id string, bytes binary, caption string, fmt string"
    ).write.parquet(tbl)

    def ids(flags, dest):
        ct = str(tmp_path / dest)
        _cli(spark, ["-f", "json", "--mode", "near-dup", "--table", tbl,
                     "--cluster-table", ct, *flags])
        return sorted(
            r["image_id"] for r in spark.read.parquet(ct).select("image_id").collect()
        )

    assert ids(["--drop-format-mismatch"], "ct_gated") == ["ok-0", "ok-1", "ok-2"]
    assert ids([], "ct_all") == ["junk", "liar", "ok-0", "ok-1", "ok-2"]


def test_against_ingest_gate_text_mode(spark, tmp_path):
    """--against matches the batch against a history corpus (never a
    history self-join): groups pair each matched batch row with its
    history near-dups, and --novel-table receives the unmatched batch
    rows with all input columns."""
    batch_tbl = str(tmp_path / "batch.parquet")
    hist_tbl = str(tmp_path / "hist.parquet")
    novel_tbl = str(tmp_path / "novel.parquet")
    base = "alpha beta gamma delta epsilon zeta eta theta " * 6
    spark.createDataFrame(
        [("n1", base + "iota"), ("n2", "entirely novel vocabulary nothing shared here " * 6)],
        "doc_id string, caption string",
    ).write.parquet(batch_tbl)
    spark.createDataFrame(
        # h1/h2 are identical — an internal history dup that must NOT
        # appear as a group on its own
        [("h1", base), ("h2", base), ("h3", "other unrelated history words " * 6)],
        "doc_id string, caption string",
    ).write.parquet(hist_tbl)
    out = _cli(
        spark,
        [
            "-f", "json", "--mode", "text-near-dup",
            "--table", batch_tbl, "--id-col", "doc_id",
            "--against", hist_tbl, "--novel-table", novel_tbl,
        ],
    )
    groups = json.loads(out)
    assert len(groups) == 1
    assert sorted(groups[0]) == ["h1", "h2", "n1"]
    novel = spark.read.parquet(novel_tbl)
    assert set(novel.columns) == {"image_id", "caption"}
    assert [r["image_id"] for r in novel.collect()] == ["n2"]


def test_against_flag_validation(spark):
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        run(build_parser().parse_args(["--against", "x", "--mode", "exact", "."]), spark=spark)
    with _pytest.raises(SystemExit):
        run(build_parser().parse_args(["--novel-table", "y", "."]), spark=spark)
    # --collapse-history only applies to the image gate; --no-collapse-exact
    # never applies under --against (the gate never collapses the batch)
    with _pytest.raises(SystemExit, match="collapse-history"):
        run(build_parser().parse_args(["--collapse-history", "."]), spark=spark)
    with _pytest.raises(SystemExit, match="collapse-history"):
        run(
            build_parser().parse_args(
                ["--mode", "text-near-dup", "--against", "x", "--collapse-history", "."]
            ),
            spark=spark,
        )
    with _pytest.raises(SystemExit, match="no-collapse-exact"):
        run(
            build_parser().parse_args(
                ["--mode", "near-dup", "--against", "x", "--no-collapse-exact", "."]
            ),
            spark=spark,
        )


def test_against_ingest_gate_image_mode(spark, tmp_path):
    """--against in image mode: an exact byte dup and a lossy re-encode
    of history images are matched (and gated out of --novel-table); a
    novel image survives. The history's internal dup pair (h_orig /
    h_copy share bytes) must not form a group of its own."""
    import numpy as np

    from yadf_spark.fixtures import codec

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8).astype(np.uint8)
    other = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8).astype(np.uint8)
    third = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8).astype(np.uint8)
    batch_tbl = str(tmp_path / "batch_imgs.parquet")
    hist_tbl = str(tmp_path / "hist_imgs.parquet")
    novel_tbl = str(tmp_path / "novel_imgs.parquet")
    spark.createDataFrame(
        [
            ("n_exact", bytearray(codec.encode_png(px)), "a caption"),
            ("n_lossy", bytearray(codec.encode_jpeg(other, step=2)), "same words here"),
            ("n_novel", bytearray(codec.encode_png(third)), "novel caption"),
        ],
        "image_id string, bytes binary, caption string",
    ).write.parquet(batch_tbl)
    spark.createDataFrame(
        [
            ("h_orig", bytearray(codec.encode_png(px)), "a caption"),
            ("h_copy", bytearray(codec.encode_png(px)), "a caption"),
            ("h_other", bytearray(codec.encode_png(other)), "same words here"),
        ],
        "image_id string, bytes binary, caption string",
    ).write.parquet(hist_tbl)
    out = json.loads(
        _cli(
            spark,
            [
                "-f", "json", "--mode", "near-dup",
                "--table", batch_tbl, "--against", hist_tbl,
                "--novel-table", novel_tbl,
            ],
        )
    )
    groups = {tuple(sorted(g)) for g in out}
    assert ("h_copy", "h_orig", "n_exact") in groups
    assert ("h_other", "n_lossy") in groups
    assert len(groups) == 2
    novel = spark.read.parquet(novel_tbl)
    assert [r["image_id"] for r in novel.collect()] == ["n_novel"]
    assert set(novel.columns) == {"image_id", "bytes", "caption"}

    # --collapse-history: same gate VERDICTS (novel table identical),
    # but displayed matches name the exact-class representative
    # (h_copy, the min id of the byte-identical pair) instead of every
    # member — the documented trade of banding one rep per class
    novel2_tbl = str(tmp_path / "novel_imgs2.parquet")
    out2 = json.loads(
        _cli(
            spark,
            [
                "-f", "json", "--mode", "near-dup",
                "--table", batch_tbl, "--against", hist_tbl,
                "--novel-table", novel2_tbl, "--collapse-history",
            ],
        )
    )
    groups2 = {tuple(sorted(g)) for g in out2}
    assert ("h_copy", "n_exact") in groups2
    assert ("h_other", "n_lossy") in groups2
    assert len(groups2) == 2
    novel2 = spark.read.parquet(novel2_tbl)
    assert [r["image_id"] for r in novel2.collect()] == ["n_novel"]


def test_strip_spans_cli_text_mode(spark, tmp_path):
    """--strip-spans writes the ExactSubstr-cleaned corpus: the shared
    block is cut from both host docs, the unrelated doc passes whole,
    and the flag is rejected outside text mode."""
    import pytest

    tbl = str(tmp_path / "docs.parquet")
    # flanks share NO substring at all — the only cross-doc repeat is the
    # block plus its two flanking spaces (a shared tail prefix would
    # legitimately extend the span: ExactSubstr takes MAXIMAL repeats)
    shared = "Q" * 60
    rows = [
        ("d1", f"alpha-head-one {shared} tail-one-xyz"),
        ("d2", f"beta-start-two {shared} end-two-abc"),
        ("d3", "entirely unrelated content with no repeated block inside it at all"),
    ]
    spark.createDataFrame(rows, "doc_id string, caption string").write.parquet(tbl)
    out_dir = tmp_path / "clean"
    _cli(
        spark,
        [
            "-f", "json", "--mode", "text-near-dup", "--table", tbl,
            "--id-col", "doc_id", "--strip-spans", str(out_dir),
            "--span-min-len", "50",
        ],
    )
    got = {r.image_id: r for r in spark.read.parquet(str(out_dir)).collect()}
    assert got["d1"].clean_text == "alpha-head-onetail-one-xyz"
    assert got["d2"].clean_text == "beta-start-twoend-two-abc"
    assert got["d1"].chars_removed == 62  # block + both flanking spaces
    assert got["d3"].n_spans == 0 and got["d3"].clean_text.startswith("entirely")

    with pytest.raises(SystemExit):
        run(
            build_parser().parse_args(
                ["--mode", "exact", "--table", tbl, "--strip-spans", str(out_dir)]
            ),
            spark=spark,
        )


def test_strip_spans_rejected_under_against(spark, tmp_path):
    """--strip-spans under --against would compute spans within the
    batch only (history ignored) — the CLI must reject the combination
    instead of silently under-deduping."""
    import pytest

    tbl = str(tmp_path / "b.parquet")
    spark.createDataFrame(
        [("d1", "some caption words here")], "doc_id string, caption string"
    ).write.parquet(tbl)
    with pytest.raises(SystemExit, match="strip-spans"):
        run(
            build_parser().parse_args(
                [
                    "--mode", "text-near-dup", "--table", tbl, "--id-col", "doc_id",
                    "--against", tbl, "--strip-spans", str(tmp_path / "out"),
                ]
            ),
            spark=spark,
        )


def test_curate_cli_mode_writes_split_partitioned_corpus(spark, tmp_path):
    """--mode curate runs the composed clean/dedup/split/pack recipe
    over a table corpus and writes a split-partitioned parquet; the
    mode refuses to run without a destination."""
    import pytest

    tbl = str(tmp_path / "docs.parquet")
    rows = [
        ("d1", "junk line without punct\nA shared clean sentence here.\nAnother good one right there."),
        ("d2", "other raw junk\nA shared clean sentence here.\nAnother good one right there."),
        ("d3", "Unique sentence number three stands alone.\nAnother good one right there."),
        ("d4", "A fine sentence here indeed.\nAlso good line here.\nlorem ipsum dolor."),
    ]
    spark.createDataFrame(rows, "doc_id string, caption string").write.parquet(tbl)
    out_dir = tmp_path / "curated"
    rc = run(
        build_parser().parse_args(
            [
                "--mode", "curate", "--table", tbl, "--id-col", "doc_id",
                "--text-col", "caption", "--curated-table", str(out_dir),
                "--pack-budget", "10",
            ]
        ),
        spark=spark,
    )
    assert rc == 0
    got = spark.read.parquet(str(out_dir))
    ids = sorted(r.doc for r in got.collect())
    assert ids == ["d1", "d3"]  # d2 deduped into d1, d4 lorem-gated
    assert {"doc", "clean_text", "n_tokens", "split", "pack_id"} <= set(got.columns)
    # split-partitioned layout on disk
    import os as _os
    assert any(p.startswith("split=") for p in _os.listdir(out_dir))

    with pytest.raises(SystemExit, match="curated-table"):
        run(
            build_parser().parse_args(
                ["--mode", "curate", "--table", tbl, "--id-col", "doc_id",
                 "--text-col", "caption"]
            ),
            spark=spark,
        )


def test_cli_cluster_quality_mode(spark, tmp_path):
    """--mode cluster-quality: one JSON report line from two parquet
    assignment tables, no corpus scan; missing inputs exit early."""
    clusters = spark.createDataFrame(
        [("a", "c1"), ("b", "c1"), ("c", "c2"), ("d", "c2"), ("e", "c3")],
        "image_id string, cluster_id string",
    )
    truth = spark.createDataFrame(
        [("a", "t1"), ("b", "t1"), ("c", "t2"), ("d", "t3"), ("e", "t2")],
        "image_id string, true_cluster string",
    )
    cpath, tpath = str(tmp_path / "cl"), str(tmp_path / "tr")
    clusters.write.parquet(cpath)
    truth.write.parquet(tpath)
    out = _cli(
        spark,
        ["--mode", "cluster-quality", "--eval-clusters", cpath, "--eval-truth", tpath],
    )
    rep = json.loads(out)
    # the hand-computed case from test_evaluation.py — pair view plus
    # the element/entropy view in one report line
    pair_part = {k: rep[k] for k in (
        "n_items", "tp", "fp", "fn", "tn", "rand_index", "ari",
        "fowlkes_mallows",
    )}
    assert pair_part == {
        "n_items": 5, "tp": 1, "fp": 1, "fn": 1, "tn": 7,
        "rand_index": 0.8, "ari": 0.375, "fowlkes_mallows": 0.5,
    }
    assert rep["purity"] == rep["bcubed_precision"] == rep["bcubed_recall"] == 0.8
    assert rep["homogeneity"] == rep["completeness"] == rep["v_measure"]

    with pytest.raises(SystemExit, match="eval-clusters"):
        run(
            build_parser().parse_args(["--mode", "cluster-quality"]),
            spark=spark,
        )
