"""Deterministic synthetic ``images`` table with planted ground truth.

Schema (BASELINE.json ``input_hint``, exact shape):
    (image_id string, bytes binary, w int, h int, fmt string,
     caption string, phash long)

Design follows the reference's corpus generator — content is a pure
function of ``(seed, row_index)``, and the planted populations come with
a computable truth manifest (reference: scripts/gen-corpus.py:146-218,
manifest :102-119). Rows are laid out in blocks of 8; the block index
residue selects the population:

    block % 10 in {0,1,2} -> exact-dup group of 2-5 identical rows
                             (gen-corpus.py dup groups, :180-197)
    block % 10 == 3      -> near-dup pair: png original + lossy jpeg
                             re-encode of the same pixels (PSNR ~53 dB),
                             identical caption   [north_rule extension]
    block % 10 == 4      -> caption-containment pair: one caption is a
                             strict substring-extension of the other,
                             pixels differ  [suffix-array pass target]
    block % 10 == 5      -> band-collision decoy pair: phash band 0
                             forced equal, pixels+captions differ — the
                             analog of the reference's collide-prefix
                             pairs (gen-corpus.py:199-217); candidates
                             must be generated then REJECTED by verify
    block % 10 >= 6      -> unique rows

Generation is distributed: ``spark.range(n).mapInPandas`` so a bench
table of any size is produced executor-side with no driver bottleneck.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np
import pandas as pd

from yadf_spark.fixtures import codec

BLOCK = 8

SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long"
)

_VOCAB = [f"word{i:03d}" for i in range(200)]


def _rng(seed: int, *tags) -> np.random.Generator:
    key = ":".join(str(t) for t in (seed, *tags)).encode()
    return np.random.default_rng(
        int.from_bytes(hashlib.blake2b(key, digest_size=8).digest(), "big")
    )


def _caption(seed: int, tag, n_words: int | None = None) -> str:
    r = _rng(seed, "cap", tag)
    n = n_words if n_words is not None else int(r.integers(5, 31))
    return " ".join(_VOCAB[i] for i in r.integers(0, len(_VOCAB), n))


def _pixels(seed: int, tag, hw_source) -> np.ndarray:
    r = _rng(seed, "px", tag)
    h = int(_rng(seed, "h", hw_source).integers(16, 65))
    w = int(_rng(seed, "w", hw_source).integers(16, 65))
    return r.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@dataclass(frozen=True)
class RowPlan:
    kind: str  # unique | dup | near_png | near_jpg | contain_a | contain_b | decoy_a | decoy_b
    content_tag: str  # pixel-content key (rows sharing it share pixels)
    caption_tag: str
    cluster: str  # ground-truth cluster id


def plan_row(i: int) -> RowPlan:
    """Pure function row index -> planted population (no RNG needed)."""
    block, r = divmod(i, BLOCK)
    kind = block % 10
    if kind in (0, 1, 2):
        g = 2 + block % 4  # group sizes 2-5, like gen-corpus.py:180-197
        if r < g:
            return RowPlan("dup", f"dup-{block}", f"dup-{block}", f"dup-{block}")
    elif kind == 3:
        if r == 0:
            return RowPlan("near_png", f"near-{block}", f"near-{block}", f"near-{block}")
        if r == 1:
            return RowPlan("near_jpg", f"near-{block}", f"near-{block}", f"near-{block}")
    elif kind == 4:
        if r == 0:
            return RowPlan("contain_a", f"u-{i}", f"cont-{block}", f"row-{i}")
        if r == 1:
            return RowPlan("contain_b", f"u-{i}", f"cont-{block}", f"row-{i}")
    elif kind == 5:
        if r == 0:
            return RowPlan("decoy_a", f"u-{i}", f"u-{i}", f"row-{i}")
        if r == 1:
            return RowPlan("decoy_b", f"u-{i}", f"u-{i}", f"row-{i}")
    return RowPlan("unique", f"u-{i}", f"u-{i}", f"row-{i}")


def make_row(i: int, seed: int) -> dict:
    p = plan_row(i)
    pixels = _pixels(seed, p.content_tag, p.content_tag)
    if p.kind == "near_jpg":
        payload = codec.encode_jpeg(pixels, step=2)
        pixels_stored = codec.decode_fake(payload)  # phash of what's stored
    else:
        payload = codec.encode_png(pixels)
        pixels_stored = pixels
    phash = codec.perceptual_hash(pixels_stored)

    if p.kind == "contain_a":
        caption = _caption(seed, p.caption_tag, n_words=8)
    elif p.kind == "contain_b":
        extra = _caption(seed, p.caption_tag + ":extra", n_words=4)
        caption = _caption(seed, p.caption_tag, n_words=8) + " " + extra
    else:
        caption = _caption(seed, p.caption_tag)

    if p.kind == "decoy_b":
        # Surgery: copy band 0 (low 16 bits) from decoy_a's phash so the
        # pair collides in the band prefilter but nowhere else.
        block = i // BLOCK
        a_plan = plan_row(block * BLOCK)
        a_pixels = _pixels(seed, a_plan.content_tag, a_plan.content_tag)
        a_phash = codec.perceptual_hash(a_pixels)
        phash = (phash & ~0xFFFF) | (a_phash & 0xFFFF)

    h, w, _ = pixels.shape
    return {
        "image_id": f"img-{i:09d}",
        "bytes": payload,
        "w": int(w),
        "h": int(h),
        "fmt": "jpeg" if p.kind == "near_jpg" else "png",
        "caption": caption,
        "phash": int(phash),  # already signed-int64 range (codec.perceptual_hash)
    }


def images_pdf(n: int, seed: int = 42, offset: int = 0) -> pd.DataFrame:
    rows = [make_row(i, seed) for i in range(offset, offset + n)]
    pdf = pd.DataFrame(rows)
    pdf["w"] = pdf["w"].astype("int32")
    pdf["h"] = pdf["h"].astype("int32")
    pdf["phash"] = pdf["phash"].astype("int64")
    return pdf


def _batch_offset(ids) -> int:
    """Validate that an Arrow batch from ``spark.range`` is a slice of
    the contiguous id range and return its start. Both fixture
    generators fabricate rows for ``offset..offset+len-1`` from the
    batch LENGTH alone, so a repartitioned/reordered/filtered feed
    would silently emit rows for the wrong ids — corrupting the planted
    corpus or its truth labels with no error (ADVICE r4 item 4). The
    min/max span check is exact: ``spark.range`` ids are distinct, so
    span == len implies the batch is exactly the contiguous range
    (within-batch order is irrelevant — rows are derived per-id)."""
    lo, hi = int(ids.min()), int(ids.max())
    if hi - lo + 1 != len(ids):
        raise ValueError(
            f"fixture batch is not a contiguous id range [{lo}, {hi}] "
            f"with {len(ids)} rows — feed it an unrepartitioned "
            "spark.range"
        )
    return lo


def images_df(spark, n: int, seed: int = 42, partitions: int | None = None):
    """Distributed generation: ``spark.range`` hands each task a
    perfectly balanced contiguous id range (an earlier round-robin
    repartition of slice bounds gave some tasks 4 slices and others 0)
    and each executor materializes its rows locally."""
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            if len(ids):
                yield images_pdf(len(ids), seed=seed, offset=_batch_offset(ids))

    return spark.range(0, n, 1, parts).mapInPandas(gen, schema=SCHEMA)


def truth_pdf(n: int, offset: int = 0) -> pd.DataFrame:
    """Ground-truth cluster assignment (the manifest's full
    image_id -> cluster_id mapping, gen-corpus.py:102-119). ``offset``
    is the images_pdf slicing contract, so the distributed ``truth_df``
    reuses this one row construction."""
    rows = [
        {"image_id": f"img-{i:09d}", "true_cluster": plan_row(i).cluster}
        for i in range(offset, offset + n)
    ]
    return pd.DataFrame(rows)


def truth_df(spark, n: int, partitions: int | None = None):
    """Distributed ground-truth labels ``(image_id, true_cluster)`` —
    the O(n) transitive-closure encoding of :func:`truth_dup_pairs`
    (two ids are a truth pair iff they share ``true_cluster``),
    generated the ``images_df`` way so the recall/precision gates can
    run join-side without ever materializing a driver-side pair set."""
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            if len(ids):
                yield truth_pdf(len(ids), offset=_batch_offset(ids))

    return spark.range(0, n, 1, parts).mapInPandas(
        gen, schema="image_id string, true_cluster string"
    )


def truth_dup_pairs(n: int) -> set[tuple[str, str]]:
    """All ground-truth duplicate pairs (canonical order) — the
    denominator of the dup-pair recall >= 0.99 gate."""
    by_cluster: dict[str, list[str]] = {}
    for i in range(n):
        p = plan_row(i)
        by_cluster.setdefault(p.cluster, []).append(f"img-{i:09d}")
    pairs = set()
    for members in by_cluster.values():
        for a_idx in range(len(members)):
            for b_idx in range(a_idx + 1, len(members)):
                pairs.add((members[a_idx], members[b_idx]))
    return pairs


def manifest(n: int) -> dict:
    """Planted-population counts for assertions."""
    counts: dict[str, int] = {}
    clusters: dict[str, int] = {}
    for i in range(n):
        p = plan_row(i)
        counts[p.kind] = counts.get(p.kind, 0) + 1
        clusters[p.cluster] = clusters.get(p.cluster, 0) + 1
    dup_groups = sum(1 for c, k in clusters.items() if c.startswith("dup-") and k > 1)
    near_groups = sum(1 for c, k in clusters.items() if c.startswith("near-") and k > 1)
    return {
        "rows": n,
        "kind_counts": counts,
        "dup_group_count": dup_groups,
        "near_dup_group_count": near_groups,
        "dup_pair_count": len(truth_dup_pairs(n)),
    }
