"""Fixture generator + fake codec invariants (reference model:
scripts/gen-corpus.py — content must be a pure function of (seed, key))."""

from __future__ import annotations

import importlib.util

import numpy as np
import pytest

from yadf_spark.fixtures import codec, images


def test_codec_roundtrip_lossless():
    px = np.random.default_rng(0).integers(0, 256, (20, 30, 3), dtype=np.uint8)
    assert np.array_equal(codec.decode_fake(codec.encode_png(px)), px)


def test_codec_lossy_psnr_above_40db():
    px = np.random.default_rng(1).integers(0, 256, (32, 32, 3), dtype=np.uint8)
    out = codec.decode_fake(codec.encode_jpeg(px, step=2))
    assert not np.array_equal(out, px)
    assert codec.psnr(px, out) >= 40.0


@pytest.mark.skipif(
    importlib.util.find_spec("PIL") is None,
    reason="Pillow not installed in this container",
)
def test_real_codec_via_pillow():
    """Where Pillow exists, decode_image must handle REAL PNG/JPEG:
    lossless round-trip for PNG, PSNR >= 40 dB for high-quality JPEG,
    and sniff_format classifying by real magic bytes — proving the
    verification path end-to-end on real formats (VERDICT r2 item 9)."""
    import io

    from PIL import Image

    px = np.random.default_rng(2).integers(0, 256, (48, 64, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(px).save(buf, format="PNG")
    png_bytes = buf.getvalue()
    assert codec.sniff_format(png_bytes) == "png"
    assert np.array_equal(codec.decode_image(png_bytes), px)

    # smooth gradient image: high-quality JPEG stays above the 40 dB bar
    grad = np.linspace(0, 255, 64, dtype=np.uint8)
    smooth = np.stack([np.tile(grad, (48, 1))] * 3, axis=2)
    buf = io.BytesIO()
    Image.fromarray(smooth).save(buf, format="JPEG", quality=95)
    jpg_bytes = buf.getvalue()
    assert codec.sniff_format(jpg_bytes) == "jpeg"
    decoded = codec.decode_image(jpg_bytes)
    assert decoded.shape == smooth.shape
    assert codec.psnr(smooth, decoded) >= 40.0


def test_codec_padding_shares_lengths():
    a = codec.encode_png(np.zeros((16, 16, 3), dtype=np.uint8))
    assert len(a) % codec.PAD_TO == 0


def test_phash_stability_and_locality():
    px = np.random.default_rng(2).integers(0, 256, (48, 48, 3), dtype=np.uint8)
    h1 = codec.perceptual_hash(px)
    assert h1 == codec.perceptual_hash(px.copy())
    # lossy re-encode barely moves the phash
    h2 = codec.perceptual_hash(codec.decode_fake(codec.encode_jpeg(px, step=2)))
    assert bin((h1 ^ h2) & ((1 << 64) - 1)).count("1") <= 3
    assert -(1 << 63) <= h1 < (1 << 63)


def test_generator_deterministic():
    a = images.images_pdf(40, seed=7)
    b = images.images_pdf(40, seed=7)
    assert a.equals(b)
    c = images.images_pdf(40, seed=8)
    assert not a["bytes"].equals(c["bytes"])


def test_planted_populations():
    n = 400
    pdf = images.images_pdf(n)
    m = images.manifest(n)
    assert m["rows"] == n
    assert m["dup_group_count"] > 0
    assert m["near_dup_group_count"] > 0
    # exact-dup rows share identical payloads within their block group
    truth = images.truth_pdf(n)
    merged = pdf.merge(truth, on="image_id")
    for cluster, grp in merged.groupby("true_cluster"):
        if cluster.startswith("dup-") and len(grp) > 1:
            assert grp["bytes"].map(bytes).nunique() == 1
            assert grp["caption"].nunique() == 1
        if cluster.startswith("near-") and len(grp) > 1:
            assert grp["bytes"].map(bytes).nunique() == 2  # png + jpeg differ
            assert grp["caption"].nunique() == 1
            assert set(grp["fmt"]) == {"png", "jpeg"}


def test_decoy_band_collision_planted():
    n = 480  # covers several kind==5 blocks
    pdf = images.images_pdf(n).set_index("image_id")
    found = 0
    for i in range(n):
        p = images.plan_row(i)
        if p.kind == "decoy_b":
            a = pdf.loc[f"img-{i - 1:09d}", "phash"]
            b = pdf.loc[f"img-{i:09d}", "phash"]
            assert (a & 0xFFFF) == (b & 0xFFFF)
            assert a != b
            found += 1
    assert found > 0


def test_distributed_generation_matches_driver_side(spark):
    n = 64
    df = images.images_df(spark, n, seed=42).orderBy("image_id").toPandas()
    pdf = images.images_pdf(n, seed=42)
    assert list(df["image_id"]) == list(pdf["image_id"])
    assert [bytes(x) for x in df["bytes"]] == [bytes(x) for x in pdf["bytes"]]
    assert list(df["phash"]) == list(pdf["phash"])
