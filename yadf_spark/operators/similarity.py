"""Similarity search over an embedding column (``array<float>``).

Two rungs, mirroring the engine's cheap-key->expensive-verify ladder:

* brute-force cosine top-k — the exactness baseline: the (small) query
  set is broadcast against the corpus, the dot product runs JVM-side via
  ``zip_with``/``aggregate`` (whole-stage codegen, no Python), and top-k
  is a per-query window. Scales linearly in corpus size with zero
  shuffles of the embedding column beyond the final (tiny) top-k rows.
* SRP-LSH (signed-random-projection) bucketing — the scale path: a
  64-bit hyperplane signature per vector, banded like MinHash/phash;
  candidates from salted bucket self-joins get exact cosine re-ranking.
  Sub-linear candidate generation; recall tunable by bands/bits.

Also: embedding near-dup pairs (cosine >= threshold) for the
training-data dedup use case.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from yadf_spark.operators.minhash import candidate_pairs_from_buckets


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))


def _side(df: DataFrame, id_col: str, emb_col: str, id_alias: str, suffix: str) -> DataFrame:
    """Project one join side to (id, double embedding, precomputed norm).
    Precomputing the norm per ROW (instead of per pair inside the join
    condition) cuts the pairwise work to a single dot product; the
    division ``dot / (norm_a * norm_b)`` keeps the exact arithmetic shape
    of the DuckDB oracle, so values stay bit-identical."""
    e = _as_double(F.col(emb_col))
    return df.select(
        F.col(id_col).alias(id_alias),
        e.alias(f"emb_{suffix}"),
        _norm(e).alias(f"norm_{suffix}"),
    )


def with_cosine(pairs: DataFrame, a_col: str = "emb_a", b_col: str = "emb_b") -> DataFrame:
    """Cosine from raw (float) arrays — norms computed in place. Prefer
    the precomputed-norm path (``_side`` + ``_cosine_from_norms``) in
    joins; this variant serves ad-hoc pair frames."""
    a, b = _as_double(F.col(a_col)), _as_double(F.col(b_col))
    denom = _norm(a) * _norm(b)
    return pairs.withColumn(
        "cosine",
        F.round(F.when(denom > 0, _dot(a, b) / denom).otherwise(F.lit(0.0)), 6),
    )


def _cosine_from_norms(pairs: DataFrame, dim: int | None = None) -> DataFrame:
    # NOTE: the HOF aggregate/zip_with dot product is CodegenFallback
    # (interpreted per element) but still the best option measured: a
    # 64-term unrolled getItem chain pushed the generated method past
    # JIT limits and ran 3x SLOWER (66 s vs 22 s on the 2M-pair bench
    # query). ``dim`` is accepted for signature stability.
    denom = F.col("norm_a") * F.col("norm_b")
    return pairs.withColumn(
        "cosine",
        F.round(
            F.when(denom > 0, _dot(F.col("emb_a"), F.col("emb_b")) / denom).otherwise(
                F.lit(0.0)
            ),
            6,
        ),
    )


def _partial_topk(
    scored: DataFrame, k: int, metric: str = "cosine", ascending: bool = False
) -> DataFrame:
    """Per-partition top-k per query (two-phase top-k, phase 1).

    Without this, ``row_number() OVER (PARTITION BY query_id)`` shuffles
    every (query x corpus-row) scored pair onto one task per query — an
    n-row straggler per query at corpus scale. The partial pass keeps at
    most k rows per query per partition (running top-k across Arrow
    batches, memory O(q*k + batch)), so the final exact window sees
    q * k * partitions rows instead of q * n. Selection only — metric
    values pass through untouched, so oracle bit-identity holds.
    ``ascending=True`` selects the SMALLEST values (distance metrics,
    e.g. PQ's asymmetric distance) instead of the largest (cosine)."""

    def kernel(batches):
        acc = None
        for b in batches:
            cur = b if acc is None else pd.concat((acc, b), ignore_index=True)
            cur = cur.sort_values(
                ["query_id", metric, "neighbor_id"], ascending=[True, ascending, True]
            )
            acc = cur.groupby("query_id", sort=False).head(k)
        if acc is not None and len(acc):
            yield acc

    pruned = scored.select("query_id", "neighbor_id", metric)
    return pruned.mapInPandas(kernel, pruned.schema)


#: public alias — the two-phase top-k is shared by the retrieval tier
partial_topk = _partial_topk


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """For each query vector: the k nearest corpus vectors by cosine.
    Result: (query_id, neighbor_id, cosine, rank); self-matches excluded.
    Deterministic tie-break on neighbor id. Two-phase top-k: partial
    per-partition selection, then the exact global window over the
    (tiny) survivor set."""
    q = _side(queries, id_col, emb_col, "query_id", "a")
    c = _side(corpus, id_col, emb_col, "neighbor_id", "b")
    scored = _cosine_from_norms(c.crossJoin(F.broadcast(q))).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        _partial_topk(scored, k)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


# exact_near_dup_candidates materializes the (n x dim) corpus matrix on
# the driver and broadcasts it whole — sound for the oracle-baseline
# scale it exists for, a driver OOM if pointed at a production corpus.
# Above this row bound the function refuses and names the scale paths.
EXACT_MAX_ROWS = 2_000_000


def exact_near_dup_candidates(
    df: DataFrame,
    min_cosine: float,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    margin: float = 1e-6,
    max_rows: int = EXACT_MAX_ROWS,
) -> DataFrame:
    """Exact-recall candidate pairs WITHOUT a crossJoin: one vectorized
    matmul per Arrow batch against the broadcast corpus matrix, keeping
    pairs with approximate cosine >= ``min_cosine - margin``.

    The margin covers the float-summation-order gap between BLAS and the
    sequential-sum verifier (relative error ~ dim * 1e-16, so 1e-6 is
    orders of magnitude of headroom) — every true pair survives, and the
    tiny overshoot is removed by the exact cosine downstream. No O(n^2)
    row set is ever materialized; per-partition work is a dense matmul.

    The corpus matrix (n x dim float64) is broadcast to executors, so
    this is the ORACLE-BASELINE path for verification-scale corpora; the
    production paths at 10^12 rows are srp_candidates / ivf_near_dup_pairs.
    Corpora above ``max_rows`` are refused BEFORE any driver
    materialization (the count is a column-pruned scan, cheap next to
    the toPandas it protects). Requires ``min_cosine - margin > 0``
    (zero-norm rows never match)."""
    spark = df.sparkSession
    src = df.select(F.col(id_col).alias("id"), F.col(emb_col).alias("e"))
    n_rows = src.count()
    if n_rows > max_rows:
        raise ValueError(
            f"exact_near_dup_candidates: corpus has {n_rows} rows, above the "
            f"driver-materialization bound max_rows={max_rows}; use the scale "
            "paths srp_candidates / ivf_near_dup_pairs (or raise max_rows if "
            "you have measured driver headroom for an (n x dim) float64 matrix)"
        )
    pdf = src.toPandas()
    ids = pdf["id"].to_numpy()
    if len(pdf):
        mat = np.vstack([np.asarray(e, dtype=np.float64) for e in pdf["e"]])
    else:
        mat = np.zeros((0, 1), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((ids, mat / np.maximum(norms, 1e-300)))
    thr = min_cosine - margin
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"id_a {id_type}, id_b {id_type}"

    def kernel(batches):
        all_ids, all_normed = bc.value
        for b in batches:
            if not len(b):
                continue
            m = np.vstack([np.asarray(e, dtype=np.float64) for e in b["e"]])
            n = np.linalg.norm(m, axis=1, keepdims=True)
            sims = (m / np.maximum(n, 1e-300)) @ all_normed.T
            out_a: list = []
            out_b: list = []
            for i, rid in enumerate(b["id"].to_numpy()):
                js = np.flatnonzero((sims[i] >= thr) & (all_ids > rid))
                out_a.extend([rid] * len(js))
                out_b.extend(all_ids[js])
            yield pd.DataFrame({"id_a": out_a, "id_b": out_b})

    return src.mapInPandas(kernel, out_schema)


def srp_planes(n_bits: int, dim: int, seed: int) -> np.ndarray:
    """The seeded hyperplane matrix (dim x n_bits). Module-level pure
    kernel so the distributed UDF and single-process truth replays (the
    contract oracle for ann_topk_srp) draw bit-identical planes."""
    return np.random.default_rng(seed).standard_normal((dim, n_bits))


def srp_signatures(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """(rows x dim) float64 -> unsigned 64-bit SRP signatures. Pure
    kernel shared by ``make_srp_udf`` and the oracle truth replay; the
    sign of a matmul is batching-invariant, so distributed and
    single-process signatures agree exactly."""
    bits = (mat @ planes) > 0  # (rows, n_bits)
    shifts = np.arange(planes.shape[1], dtype=np.uint64)
    return (bits.astype(np.uint64) << shifts[None, :]).sum(axis=1, dtype=np.uint64)


def srp_probe_keys(
    mat: np.ndarray, planes: np.ndarray, n_bands: int, probes: int
) -> list[list[int]]:
    """Multi-probe LSH (Lv et al., VLDB 2007) membership kernel: for
    each row, the ``probes`` encoded bucket keys obtained by flipping
    the row's lowest-margin SRP bits — the hyperplanes the point sits
    closest to, i.e. the bits most likely to disagree between true
    near-neighbors. Key encoding is ``(band_idx << band_bits) |
    flipped_band_hash`` so the JVM side can split it with two bit ops.

    Pure kernel (no Spark): shared verbatim by the distributed pandas
    UDF and the single-process stored-truth oracle replay, so both
    sides pick identical probe buckets. ``kind='stable'`` argsort makes
    margin ties deterministic."""
    n_bits = planes.shape[1]
    band_bits = n_bits // n_bands
    mask = np.uint64((1 << band_bits) - 1)
    proj = mat @ planes  # (rows, n_bits)
    sigs = srp_signatures(mat, planes)
    margins = np.abs(proj) / np.linalg.norm(planes, axis=0)[None, :]
    order = np.argsort(margins, axis=1, kind="stable")[:, :probes].astype(np.uint64)
    bands = order // np.uint64(band_bits)
    base_h = (sigs[:, None] >> (bands * np.uint64(band_bits))) & mask
    flipped = base_h ^ (np.uint64(1) << (order % np.uint64(band_bits)))
    keys = ((bands << np.uint64(band_bits)) | flipped).astype(np.int64)
    return [row.tolist() for row in keys]


def make_srp_probe_udf(n_bits: int, dim: int, seed: int, n_bands: int, probes: int):
    """pandas UDF: embedding -> array of encoded multi-probe bucket
    keys. One matmul + one argsort per Arrow batch."""
    planes = srp_planes(n_bits, dim, seed)

    @F.pandas_udf("array<long>")
    def srp_probe(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype=object)
        mat = np.vstack([np.asarray(e, dtype=np.float64) for e in emb])
        return pd.Series(srp_probe_keys(mat, planes, n_bands, probes))

    return srp_probe


def make_srp_udf(n_bits: int, dim: int, seed: int):
    """pandas UDF: embedding -> 64-bit signed-random-projection signature.
    One matmul per Arrow batch — fully vectorized."""
    planes = srp_planes(n_bits, dim, seed)

    @F.pandas_udf("long")
    def srp_sig(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype="int64")
        mat = np.vstack([np.asarray(e, dtype=np.float64) for e in emb])
        return pd.Series(srp_signatures(mat, planes).astype(np.int64))

    return srp_sig


def srp_candidates(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_bits: int = 64,
    n_bands: int = 8,
    seed: int = 42,
    salt_bucket_above: int = 256,
    max_bucket: int = 100_000,
    probes: int = 0,
) -> DataFrame:
    """Candidate pairs from SRP signature bands (salted self-join —
    shared machinery with MinHash LSH).

    ``probes > 0`` enables multi-probe LSH: each row additionally joins
    the ``probes`` buckets reached by flipping its lowest-margin bits
    (``srp_probe_keys``). The recall knob this buys is the scale
    argument: the classical alternative — more band tables — multiplies
    the WHOLE bucket-membership shuffle, while multi-probe adds a
    constant ``probes`` rows per record to the same shuffle and reuses
    the same signatures. Probe memberships are exact supersets of the
    base memberships' candidate space, so recall is monotone in
    ``probes`` at fixed bands (pytest-gated)."""
    buckets = srp_band_table(df, dim, id_col, emb_col, n_bits, n_bands, seed, probes)
    return candidate_pairs_from_buckets(buckets, salt_bucket_above, max_bucket)


def srp_band_table(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_bits: int = 64,
    n_bands: int = 8,
    seed: int = 42,
    probes: int = 0,
) -> DataFrame:
    """The SRP bucket-membership table ``(id, band_idx, band_hash)`` —
    the band-construction half of ``srp_candidates``, exposed so the
    incremental streaming index can band embedding batches through the
    same seeded kernels the batch path self-joins (the
    ``audio_band_table`` pattern)."""
    from yadf_spark.functions.hashes import band_columns

    band_bits = n_bits // n_bands
    sig = df.select(F.col(id_col).alias("id"), F.col(emb_col).alias("_e")).withColumn(
        "_sig", make_srp_udf(n_bits, dim, seed)(F.col("_e"))
    )
    buckets = sig.select(
        "id", F.posexplode(F.array(*band_columns(F.col("_sig"), n_bands, band_bits)))
    ).select("id", F.col("pos").alias("band_idx"), F.col("col").alias("band_hash"))
    if probes > 0:
        probe_udf = make_srp_probe_udf(n_bits, dim, seed, n_bands, probes)
        probe_buckets = (
            df.select(F.col(id_col).alias("id"), F.col(emb_col).alias("_e"))
            .withColumn("_pk", probe_udf(F.col("_e")))
            .select("id", F.explode("_pk").alias("_k"))
            .select(
                "id",
                F.shiftrightunsigned("_k", band_bits).cast("int").alias("band_idx"),
                F.col("_k").bitwiseAND(F.lit((1 << band_bits) - 1)).alias("band_hash"),
            )
        )
        buckets = buckets.unionByName(probe_buckets)
    return buckets


def make_embedding_band_fn(
    dim: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_bits: int = 64,
    n_bands: int = 8,
    seed: int = 42,
    probes: int = 0,
):
    """An embedding-modality ``band_fn`` for the incremental streaming
    near-dup index (streaming/dedup.py): each micro-batch of vectors
    bands by seeded SRP signatures into the same persistent
    ``(id, band_idx, band_hash)`` index the image/audio/video
    modalities use, so an embedding stream dedups against everything
    already indexed without rescanning it. The returned function
    carries the index-ownership tag (parameterized by every knob that
    changes bucket membership) so a config change fails fast instead
    of silently matching nothing against an old index."""

    def embedding_band_table(batch: DataFrame) -> DataFrame:
        return srp_band_table(batch, dim, id_col, emb_col, n_bits, n_bands, seed, probes)

    embedding_band_table.band_fn_tag = (
        f"srp-emb-v1-{dim}-{n_bits}-{n_bands}-{seed}-{probes}"
    )
    return embedding_band_table


def topk_from_candidates(
    corpus: DataFrame,
    pairs: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Re-rank a candidate pair frame ``(id_a, id_b)`` to per-query
    top-k by exact cosine — the shared tail of every bucketed ANN path
    (SRP, multi-probe SRP, IVF). Candidates symmetrize (each endpoint
    sees the other), embeddings re-attach by id, and the rounded-cosine
    window (ties broken by neighbor id) picks k — the same deterministic
    contract as ``brute_force_topk``, so recall measurements compare
    like with like."""
    # symmetrize: each endpoint sees the other as a neighbor candidate
    sym = pairs.select(
        F.col("id_a").alias("query_id"), F.col("id_b").alias("neighbor_id")
    ).unionByName(
        pairs.select(F.col("id_b").alias("query_id"), F.col("id_a").alias("neighbor_id"))
    )
    joined = sym.join(_side(corpus, id_col, emb_col, "query_id", "a"), "query_id").join(
        _side(corpus, id_col, emb_col, "neighbor_id", "b"), "neighbor_id"
    )
    scored = _cosine_from_norms(joined, dim)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ann_topk_srp(
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    **srp_kwargs,
) -> DataFrame:
    """Approximate all-pairs top-k: SRP candidates -> exact cosine
    re-rank. Returns (query_id, neighbor_id, cosine, rank) for every
    vector that had at least one candidate."""
    pairs = srp_candidates(corpus, dim, id_col, emb_col, **srp_kwargs)
    return topk_from_candidates(corpus, pairs, k, id_col, emb_col, dim)


def embedding_near_dup_pairs(
    df: DataFrame,
    dim: int,
    min_cosine: float,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    exact: bool = False,
    **srp_kwargs,
) -> DataFrame:
    """Pairs with cosine >= min_cosine. ``exact=True`` runs the blocked
    matmul prefilter (full recall, no crossJoin — the oracle-checkable
    baseline); otherwise SRP candidates bound the work at scale. Either
    way the emitted cosine comes from the sequential-sum verifier, so
    exact-mode output is bit-identical to an all-pairs oracle."""
    a = _side(df, id_col, emb_col, "id_a", "a")
    b = _side(df, id_col, emb_col, "id_b", "b")
    if exact:
        cand = exact_near_dup_candidates(df, min_cosine, id_col, emb_col)
    else:
        cand = srp_candidates(df, dim, id_col, emb_col, **srp_kwargs)
    pairs = cand.join(a, "id_a").join(b, "id_b")
    return (
        _cosine_from_norms(pairs, dim)
        .filter(F.col("cosine") >= min_cosine)
        .select("id_a", "id_b", "cosine")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path
# ---------------------------------------------------------------------------

def train_ivf_centroids(
    df: DataFrame,
    dim: int,
    n_centroids: int = 64,
    emb_col: str = "embedding",
    sample_rows: int = 20_000,
    iterations: int = 10,
    seed: int = 42,
    id_col: str | None = None,
) -> np.ndarray:
    """Coarse k-means centroids from a bounded sample.

    Training is deliberately DRIVER-side numpy over <= ``sample_rows``
    vectors: at 10^12 rows the sample is a fixed-size sketch (the
    standard IVF recipe — train on a sample, assign distributed), so the
    driver cost is O(sample * k * iters) regardless of corpus size.

    Determinism: the Lloyd iterations are seeded, but WHICH rows a bare
    ``limit`` picks depends on partition layout/AQE. Pass ``id_col`` to
    make the sample itself layout-invariant — the hash-smallest
    ``sample_rows`` ids (per-partition top-k + driver merge, the
    TakeOrderedAndProject plan, uniform because the order key is a
    hash); without it the caller must impose an ordering upstream (the
    contract query orders by vec_id) or accept run-to-run variation."""
    src = df
    if id_col is not None:
        src = df.orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
    sample = src.select(emb_col).limit(sample_rows).toPandas()[emb_col]
    mat = np.vstack([np.asarray(e, dtype=np.float64) for e in sample])
    return kmeans_cosine_centroids(mat, n_centroids, iterations, seed)


def kmeans_cosine_centroids(
    mat: np.ndarray, n_centroids: int, iterations: int = 10, seed: int = 42
) -> np.ndarray:
    """Seeded spherical Lloyd iterations over a (rows x dim) float64
    matrix. Module-level pure kernel so ``train_ivf_centroids`` (Spark
    sample) and the single-process oracle truth replay for ivf_near_dup
    compute bit-identical centroids from the same sample rows."""
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    mat = mat / np.maximum(norms, 1e-12)  # cosine IVF: cluster on the sphere
    rng = np.random.default_rng(seed)
    k = min(n_centroids, len(mat))
    centroids = mat[rng.choice(len(mat), size=k, replace=False)]
    for _ in range(iterations):
        assign = np.argmax(mat @ centroids.T, axis=1)
        for c in range(k):
            members = mat[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        cn = np.linalg.norm(centroids, axis=1, keepdims=True)
        centroids = centroids / np.maximum(cn, 1e-12)
    return centroids


def probe_top_cells(mat: np.ndarray, centroids: np.ndarray, n_probe: int) -> np.ndarray:
    """(rows x dim) -> (rows x n_probe) nearest-centroid cell ids. Pure
    kernel shared by ``make_ivf_assign_udf`` and the oracle truth
    replay; per-row argsort is batching-invariant."""
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    sims = (mat / np.maximum(norms, 1e-12)) @ centroids.T
    return np.argsort(-sims, axis=1)[:, :n_probe].astype(np.int32)


def make_ivf_assign_udf(centroids: np.ndarray, n_probe: int):
    """pandas UDF: embedding -> the ids of its ``n_probe`` nearest
    centroid cells (one matmul per Arrow batch)."""

    @F.pandas_udf("array<int>")
    def assign(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype=object)
        mat = np.vstack([np.asarray(e, dtype=np.float64) for e in emb])
        return pd.Series(list(probe_top_cells(mat, centroids, n_probe)))

    return assign


def ivf_near_dup_pairs(
    df: DataFrame,
    dim: int,
    min_cosine: float,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_centroids: int = 64,
    n_probe: int = 4,
    salt_bucket_above: int = 256,
    max_bucket: int = 100_000,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF-bucketed near-dup pairs: vectors probing a common centroid
    cell become candidates (salted self-join — the same skew machinery
    as MinHash LSH); exact cosine confirms. Recall grows with
    ``n_probe``; cost is bounded by cell sizes instead of n^2.

    A precomputed ``centroids`` array makes the operator deterministic
    across restarts (persist it next to the stage checkpoint)."""
    cand = ivf_candidates(
        df, dim, id_col, emb_col, n_centroids, n_probe,
        salt_bucket_above, max_bucket, centroids,
    )
    a = _side(df, id_col, emb_col, "id_a", "a")
    b = _side(df, id_col, emb_col, "id_b", "b")
    return (
        _cosine_from_norms(cand.join(a, "id_a").join(b, "id_b"), dim)
        .filter(F.col("cosine") >= min_cosine)
        .select("id_a", "id_b", "cosine")
    )


def ivf_candidates(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_centroids: int = 64,
    n_probe: int = 4,
    salt_bucket_above: int = 256,
    max_bucket: int = 100_000,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """Raw IVF candidate pairs ``(id_a, id_b)`` — the cell-bucketed
    front half of ``ivf_near_dup_pairs``, exposed so top-k re-ranking
    (``topk_from_candidates``) and recall measurement can consume the
    same candidate stream the threshold path verifies."""
    if centroids is None:
        centroids = train_ivf_centroids(df, dim, n_centroids, emb_col, id_col=id_col)
    assign = make_ivf_assign_udf(centroids, n_probe)
    cells = df.select(
        F.col(id_col).alias("id"), F.explode(assign(F.col(emb_col))).alias("band_hash")
    ).withColumn("band_idx", F.lit(0).cast("int"))
    return candidate_pairs_from_buckets(
        cells.select("id", "band_idx", "band_hash"), salt_bucket_above, max_bucket
    )


def label_centroids(
    df: DataFrame, label_col: str, emb_col: str, dim: int, round_to: int = 6
) -> DataFrame:
    """Exact per-label centroid of an embedding column —
    ``(label, pos, mean_x, n)``, one row per (label, dimension).

    The obvious ``posexplode → groupBy(label, pos)`` amplifies the
    shuffle by ``dim`` (at 10^12 rows x 64 dims that is 6.4x10^13
    shuffled rows). Instead each dimension becomes its own ``sum``
    aggregate over ``element_at``: Catalyst runs all ``dim`` sums in
    ONE map-side partial aggregation, so what crosses the exchange is
    ``dim`` doubles per (partition, label) — executor count x label
    count rows, independent of corpus size. The tiny aggregated frame
    is then unpivoted driver-free with posexplode.

    Means are rounded (default 6 dp) because float summation order
    differs between any two engines; the oracle rounds identically.
    """
    sums = [
        F.sum(F.element_at(_as_double(F.col(emb_col)), i + 1)).alias(f"s{i}")
        for i in range(dim)
    ]
    agg = df.groupBy(F.col(label_col).alias("label")).agg(F.count("*").alias("n"), *sums)
    means = F.array(*[F.round(F.col(f"s{i}") / F.col("n"), round_to) for i in range(dim)])
    return agg.select(
        "label", "n", F.posexplode(means).alias("pos", "mean_x")
    ).select("label", "pos", "mean_x", "n")


def label_outliers(
    df: DataFrame,
    id_col: str,
    label_col: str,
    emb_col: str,
    dim: int,
    max_cosine: float,
    round_to: int = 6,
) -> DataFrame:
    """Rows whose embedding points AWAY from their own label's exact
    centroid (``cosine < max_cosine``) — the mislabeled/noisy-pair sweep
    an image+caption corpus runs before training: a row whose embedding
    disagrees with everything sharing its label is evidence the label
    (or the pairing) is wrong. Returns ``(id, label, cosine)``.

    Scale shape: the centroid aggregate is the ``label_centroids``
    partial-agg trick — ``dim`` parallel sums in ONE map-side combine,
    so the exchange carries (partitions x labels) rows of dim doubles,
    independent of corpus size; the (labels x dim) centroid frame then
    broadcasts, making the scoring pass a zero-shuffle narrow map in
    whole-stage codegen (``zip_with``/``aggregate`` dot product, no
    Python). Centroid means and the final cosine round to ``round_to``
    so any engine (the DuckDB oracle replays this bit-for-bit) agrees
    despite float summation order. A row's own embedding is included in
    its centroid — at curation corpus sizes the self-term is noise, and
    excluding it would need a second per-row pass for no extra signal.
    """
    sums = [
        F.sum(F.element_at(_as_double(F.col(emb_col)), i + 1)).alias(f"s{i}")
        for i in range(dim)
    ]
    cent = df.groupBy(F.col(label_col).alias("_lbl")).agg(F.count("*").alias("_n"), *sums)
    centroid = F.array(*[F.round(F.col(f"s{i}") / F.col("_n"), round_to) for i in range(dim)])
    cent = cent.select("_lbl", centroid.alias("_c"))
    e = _as_double(F.col(emb_col))
    cos = F.round(_dot(e, F.col("_c")) / (_norm(e) * _norm(F.col("_c"))), round_to)
    return (
        df.join(F.broadcast(cent), F.col(label_col) == F.col("_lbl"))
        .select(F.col(id_col), F.col(label_col), cos.alias("cosine"))
        .filter(F.col("cosine") < max_cosine)
    )


# --- SemDeDup-style semantic dedup (portable SRP cells) ----------------

#: weight-formula moduli for the portable hyperplanes (exact integer
#: arithmetic -> exact rational -> identical IEEE doubles in any engine)
_PLANE_MULT = 2654435761
_PLANE_PRIME = 10007


def portable_plane_w(band: int, bit: int, d: int) -> int:
    """Integer weight numerator for one plane component — the single
    source of truth for the portable-plane formula; the SQL oracle's
    cell builder embeds exactly these integers."""
    return ((band * 131 + bit) * 131071 + d + 1) * _PLANE_MULT % _PLANE_PRIME


def portable_plane(band: int, bit: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane as exact rationals: every
    component is ``w / 10007 - 0.5`` with ``w`` from an integer-only
    formula (``portable_plane_w``), so any engine (Spark, DuckDB, plain
    Python) rebuilds the identical float64 vector — the portability
    trick that lets the semantic cells be replayed by the SQL oracle,
    where the seeded numpy planes of ``srp_planes`` cannot be."""
    return [
        portable_plane_w(band, bit, d) / float(_PLANE_PRIME) - 0.5 for d in range(dim)
    ]


def portable_srp_cells(emb_col, dim: int, n_bands: int = 4, n_bits: int = 4) -> list:
    """One cell id per band: ``n_bits`` sign tests against portable
    hyperplanes, bit-packed. The sign reads ``round(dot, 4) >= 0`` so a
    cross-engine last-ulp difference in the dot sum cannot flip a bit
    (a flip would need the true dot within ~1e-15 of a 5e-5 rounding
    boundary). Dots run JVM-side via zip_with/aggregate in array order
    — the same left-fold shape the oracle's list_dot_product walks."""
    e = _as_double(emb_col)
    cells = []
    for band in range(n_bands):
        cell = F.lit(0)
        for bit in range(n_bits):
            plane = F.array(*[F.lit(c) for c in portable_plane(band, bit, dim)])
            test = F.round(_dot(e, plane), 4) >= 0
            cell = cell + F.when(test, F.lit(1 << bit)).otherwise(F.lit(0))
        cells.append(cell)
    return cells


def semantic_dedup(
    df: DataFrame,
    dim: int,
    threshold: float,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_bands: int = 4,
    n_bits: int = 4,
    salt_bucket_above: int = 256,
    max_bucket: int = 100_000,
) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023): embeddings
    bucket into semantic cells, only within-cell pairs pay an exact
    cosine, and each cell keeps earliest-id survivors — a row is
    dropped iff some SMALLER id shares a band cell with it at cosine >=
    ``threshold``. (The paper's sequential greedy differs on chains —
    A~B, B~C, A!~C greedily re-keeps C; the dominated-by-any-earlier
    rule is order-free, one shuffle cheaper, and strictly more
    aggressive, which is the safe direction for dedup.)

    Scale shape: the pair expansion IS ``candidate_pairs_from_buckets``
    (salted, capped, mega-bucket logged), embeddings re-attach to
    candidate ids only, and the survivor flag is one broadcast-sized
    anti-join of distinct dropped ids. CAPACITY IS n_bits' JOB: a band
    has exactly ``2**n_bits`` cells, so expected bucket size is
    ``N / 2**n_bits`` — size ``n_bits ≈ log2(N / target_bucket)`` or
    every bucket blows past ``max_bucket`` and gets culled (loudly —
    the expansion logs dropped buckets — but culled). The 4-bit default
    fits ~10^6 rows; 10^9 wants ~24 bits, 10^12 wants ~34 (dots per
    row = n_bands x n_bits — still cheap, and recall is n_bands' knob,
    independent of capacity). Unlike MinHash band hashes the cell space
    does NOT grow with the data on its own.

    Returns ``(id, kept)`` — every input row, flagged.
    """
    base = df.select(F.col(id_col).alias("id"), F.col(emb_col).alias("_e"))
    cells = portable_srp_cells(F.col("_e"), dim, n_bands, n_bits)
    buckets = base.select("id", F.posexplode(F.array(*[c for c in cells]))).select(
        "id", F.col("pos").alias("band_idx"), F.col("col").alias("band_hash")
    )
    # posexplode re-evaluates the cell expressions per row once — the
    # embedding itself never enters the bucket shuffle (ids + cell ints)
    cand = candidate_pairs_from_buckets(buckets, salt_bucket_above, max_bucket)
    a = _side(df, id_col, emb_col, "id_a", "a")
    b = _side(df, id_col, emb_col, "id_b", "b")
    scored = _cosine_from_norms(cand.join(a, "id_a").join(b, "id_b"), dim)
    dropped = (
        scored.where(F.col("cosine") >= threshold)
        .select(F.col("id_b").alias("id"))  # machinery guarantees id_a < id_b
        .distinct()
    )
    return (
        base.select("id")
        .join(dropped.withColumn("_dup", F.lit(True)), "id", "left")
        .select("id", F.coalesce(~F.col("_dup"), F.lit(True)).alias("kept"))
    )


def kmeans_lloyd(
    df: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 8,
    iterations: int = 2,
) -> DataFrame:
    """Distributed Lloyd k-means over an embedding column, built to be
    engine-replayable: deterministic init (the ``k`` id-smallest
    vectors), cosine assignment rounded to 6 decimals, per-coordinate
    centroid means rounded to 6 decimals between passes — every
    arithmetic step an exact contract the DuckDB oracle unrolls in SQL.
    Semantic clustering is what SemDeDup/cluster-balanced-mixing
    pipelines run between dedup and sampling; the reference has no
    analog (SURVEY.md §2.8).

    Scale posture: the corpus **never shuffles for assignment** —
    centroids ride into the plan as ``k x dim`` literals, so each
    assignment pass is a narrow map inside the scan's codegen stage
    (plan-pinned: zero Exchange in the returned frame). The centroid
    update is posexplode -> groupBy(cluster, pos) mean with map-side
    partial aggregation: shuffle volume is ``partitions * k * dim``
    rows regardless of corpus size, and only ``k * dim`` rounded means
    reach the driver per pass. The driver loop runs ``iterations``
    bounded passes (2-10 in practice). Ties in the argmax break to the
    smallest cluster id; empty clusters drop out (identically in both
    engines). Output: ``(id_col, cluster, cosine)`` from the final pass.
    """
    src = (
        df.where(F.col(emb_col).isNotNull())
        .select(F.col(id_col).alias("_vec"), _as_double(F.col(emb_col)).alias("_e"))
        .withColumn("_nrm", _norm(F.col("_e")))
    )
    # Lloyd is multi-pass: the init collect, one means-collect per extra
    # iteration, and the caller's final action would each rescan (and
    # re-project) the source otherwise. Materialize the narrow
    # (id, emb, norm) projection once — the same move as MLlib KMeans'
    # input .cache(); checkpoint blocks are freed by the context
    # cleaner, so callers owe no unpersist.
    src = src.localCheckpoint(eager=True)
    init = src.orderBy("_vec").limit(k).select("_e").collect()
    cents: list[tuple[int, list[float]]] = [(j, list(r["_e"])) for j, r in enumerate(init)]

    def assign(cents):
        cos_cols = []
        for _, coords in cents:
            carr = F.array(*[F.lit(float(x)) for x in coords])
            # centroid norm stays an in-plan fold so the arithmetic
            # shape (sequential multiply-add, like list_dot_product)
            # matches the oracle's exactly — O(k*dim) per row, same
            # order as the dot products themselves
            denom = F.col("_nrm") * _norm(carr)
            cos_cols.append(
                F.round(
                    F.when(denom > 0, _dot(F.col("_e"), carr) / denom).otherwise(F.lit(0.0)),
                    6,
                )
            )
        arr = F.array(*cos_cols)
        best = F.array_max(arr)
        pos = F.array_position(arr, best).cast("int")
        label = F.element_at(F.array(*[F.lit(int(cid)) for cid, _ in cents]), pos)
        return src.select(
            F.col("_vec"),
            F.col("_e"),
            label.alias("cluster"),
            best.alias("cosine"),
        )

    assigned = assign(cents)
    for _ in range(iterations - 1):
        means = (
            assigned.select("cluster", F.posexplode("_e").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.round(F.avg("x"), 6).alias("m"))
            .collect()
        )
        byc: dict[int, dict[int, float]] = {}
        for r in means:
            byc.setdefault(r["cluster"], {})[r["pos"]] = r["m"]
        cents = [(cid, [coords[p] for p in sorted(coords)]) for cid, coords in sorted(byc.items())]
        assigned = assign(cents)
    return assigned.select(
        F.col("_vec").alias(id_col),
        F.col("cluster").cast("int").alias("cluster"),
        F.col("cosine"),
    )


def cluster_prune(
    df: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 8,
    iterations: int = 2,
    drop_frac: float = 0.3,
    exact: bool = True,
) -> DataFrame:
    """Prototypicality-based data pruning (the SSL-prototypes recipe
    from "Beyond neural scaling laws": in the abundant-data regime,
    dropping the EASIEST — most prototypical — examples beats random
    pruning): cluster with ``kmeans_lloyd``, then drop each cluster's
    top ``drop_frac`` fraction by cosine-to-centroid, keeping rows at
    or below the per-cluster ``(1 - drop_frac)``-quantile threshold.

    Scale posture: assignment never shuffles the corpus (see
    ``kmeans_lloyd``); the threshold needs one groupBy over
    ``(cluster, cosine)`` — two narrow columns, payload and embedding
    pruned before the exchange — producing a k-row frame that
    broadcasts back onto a map-side join, so the corpus itself crosses
    no exchange for the filter. ``exact=True`` (the oracle contract)
    uses Spark's exact ``percentile``, whose per-cluster buffers hold
    n/k values on k reducers — fine to ~10^8 rows/cluster; beyond that
    pass ``exact=False`` for ``percentile_approx`` (bounded-memory
    sketch, true partial agg) at the cost of quantile accuracy ~1e-4.

    Output: kept rows ``(id_col, cluster, cosine, thr)`` with the
    threshold rounded for display; the comparison uses the raw double
    identically in both engines.
    """
    from yadf_spark.operators.curation import quantile_threshold_filter

    assigned = kmeans_lloyd(df, id_col, emb_col, k=k, iterations=iterations)
    kept = quantile_threshold_filter(
        assigned, "cosine", "cluster", q=float(1.0 - drop_frac), keep="below", exact=exact
    )
    return kept.select(id_col, "cluster", "cosine", F.round("thr", 6).alias("thr"))


# ---------------------------------------------------------------------------
# Product quantization (Jégou et al. 2011) — the memory-scale ANN path.
#
# At 10^12 rows a float32 embedding column is the dominant byte cost of
# any similarity scan (a 64-dim float32 vector is 256 B; its 8-subspace
# PQ code is 8 small ints ≈ 8-32 B — a 8-32× working-set cut, 100-400×
# at production dims). PQ splits each vector into M subvectors, k-means
# quantizes each subspace independently (a codebook of K codewords per
# subspace, trained driver-side on a bounded sample exactly like IVF),
# and stores only the M argmin code indices per vector. Queries never
# decompress: asymmetric distance (ADC) precomputes, per query, the
# M × K table of squared distances to every codeword, and a corpus
# row's approximate distance is M table lookups over its code — the
# corpus scan touches CODES ONLY, embeddings never shuffle.


def pq_lloyd(
    mat: np.ndarray, m: int, k: int, iterations: int = 10, seed: int = 42
) -> np.ndarray:
    """Seeded per-subspace L2 Lloyd over a (rows × dim) float64 matrix
    → (m, k, dim/m) codebooks. Module-level pure kernel (the
    ``kmeans_cosine_centroids`` pattern) so the Spark training path and
    the single-process oracle replay compute bit-identical codebooks
    from the same sample rows."""
    rows, dim = mat.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    rng = np.random.default_rng(seed)
    k_eff = min(k, rows)
    books = np.empty((m, k_eff, dsub), dtype=np.float64)
    for s in range(m):
        sub = mat[:, s * dsub : (s + 1) * dsub]
        cents = sub[rng.choice(rows, size=k_eff, replace=False)].copy()
        for _ in range(iterations):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
            assign = np.argmin(d2, axis=1)
            for c in range(k_eff):
                members = sub[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books[s] = cents
    return books


def pq_assign_codes(mat: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(rows × dim) → (rows × m) int32 codes: per-subspace argmin
    codeword (first-index tie-break, numpy argmin semantics — the
    oracle mirrors it by ranking on (distance, code))."""
    m, _, dsub = books.shape
    codes = np.empty((len(mat), m), dtype=np.int32)
    for s in range(m):
        sub = mat[:, s * dsub : (s + 1) * dsub]
        d2 = ((sub[:, None, :] - books[s][None, :, :]) ** 2).sum(-1)
        codes[:, s] = np.argmin(d2, axis=1)
    return codes


def pq_adc_lut(qmat: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n_q × dim) queries → (n_q × m × k) table of SQUARED L2
    distances from each query subvector to each codeword — the ADC
    lookup table a corpus scan sums over its codes."""
    m, k, dsub = books.shape
    lut = np.empty((len(qmat), m, k), dtype=np.float64)
    for s in range(m):
        qs = qmat[:, s * dsub : (s + 1) * dsub]
        lut[:, s, :] = ((qs[:, None, :] - books[s][None, :, :]) ** 2).sum(-1)
    return lut


def pq_train_codebooks(
    df: DataFrame,
    dim: int,
    m: int = 8,
    k: int = 16,
    emb_col: str = "embedding",
    sample_rows: int = 20_000,
    iterations: int = 10,
    seed: int = 42,
    id_col: str | None = None,
) -> np.ndarray:
    """PQ codebooks from a bounded driver-side sample — the IVF
    training posture (``train_ivf_centroids``): O(sample · m · k ·
    iters) on the driver regardless of corpus size; assignment runs
    distributed. Pass ``id_col`` for a layout-invariant hash-ordered
    sample, or pre-order the frame upstream (the contract query orders
    by vec_id) for run-to-run determinism."""
    src = df
    if id_col is not None:
        src = df.orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
    sample = src.select(emb_col).limit(sample_rows).toPandas()[emb_col]
    mat = np.vstack([np.asarray(e, dtype=np.float64) for e in sample])
    return pq_lloyd(mat, m, k, iterations, seed)


def pq_encode(
    df: DataFrame,
    books: np.ndarray,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Compress the embedding column to PQ codes: ``(id, code)`` where
    ``code`` is the m-element array of codeword indices. THE
    working-set cut of the PQ path — a pure Arrow-batched narrow map
    (one matmul-shaped argmin per subspace per batch), zero shuffles;
    downstream similarity scans read this frame instead of the
    embeddings."""

    @F.pandas_udf("array<int>")
    def enc(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype=object)
        mat = np.vstack([np.asarray(e, dtype=np.float64) for e in emb])
        return pd.Series(list(pq_assign_codes(mat, books)))

    return df.select(F.col(id_col).alias("id"), enc(F.col(emb_col)).alias("code"))


#: pq_topk collects the QUERY side to the driver to build ADC tables —
#: ADC is a few-queries-vs-huge-corpus scan by design; above this bound
#: the caller should batch queries or use the symmetric (code-vs-code)
#: path instead.
PQ_MAX_QUERIES = 10_000

#: Row bound per yielded score frame in ``pq_topk``'s kernel. The score
#: is a queries × batch-rows cross product; without a cap the worst case
#: is PQ_MAX_QUERIES × arrow-batch-rows ≈ 10^8 rows (~2.4 GB) in ONE
#: pandas frame — an executor OOM far below the advertised query bound.
#: Chunking the query axis keeps every materialized frame ≤ this many
#: rows (~48 MB at 24 B/row) regardless of query count or batch size.
PQ_SCORE_YIELD_ROWS = 2_000_000


def _collect_queries(queries, id_col: str, emb_col: str, caller: str):
    """Driver-side query collection shared by the ADC paths, bounded by
    ``PQ_MAX_QUERIES`` — ADC is a few-queries-vs-huge-corpus scan by
    design; larger query sets should batch."""
    qpd = (
        queries.select(F.col(id_col).alias("query_id"), F.col(emb_col).alias("emb"))
        .limit(PQ_MAX_QUERIES + 1)
        .toPandas()
    )
    if len(qpd) > PQ_MAX_QUERIES:
        raise ValueError(
            f"{caller} collects the query side to the driver; got > "
            f"{PQ_MAX_QUERIES} queries — batch them"
        )
    return qpd


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    books: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Approximate top-k by PQ asymmetric distance:
    ``(query_id, neighbor_id, adist, rank)``, self-matches excluded,
    ``adist`` the codes-vs-query squared-L2 estimate rounded to
    ``round_to`` (rounded BEFORE selection so the partial top-k, the
    final window, and the oracle rank identically; ties break on
    neighbor id).

    Scale shape: queries (bounded by ``PQ_MAX_QUERIES``) collect to the
    driver once and ship as an (n_q × m × k) LUT inside the kernel
    closure; the corpus scan reads the m-int code column ONLY — the
    embedding column is never scanned, never shuffled. Scoring is a
    narrow ``mapInPandas`` (n_q lookups+adds per row, vectorized across
    the Arrow batch); selection is the shared two-phase top-k
    (per-partition prune to q·k rows, then the exact window)."""
    qpd = _collect_queries(queries, id_col, emb_col, "pq_topk")
    qids = qpd["query_id"].to_numpy()
    qmat = np.vstack([np.asarray(e, dtype=np.float64) for e in qpd["emb"]])
    lut = pq_adc_lut(qmat, books)
    m = books.shape[0]
    codes = pq_encode(corpus, books, id_col, emb_col)

    def score(batches):
        sub = np.arange(m)[None, :]
        for b in batches:
            if not len(b):
                continue
            cmat = np.vstack(b["code"].to_numpy())
            n_rows = len(b)
            ids = b["id"].to_numpy()
            # chunk the query axis so each yielded cross-product frame
            # stays ≤ PQ_SCORE_YIELD_ROWS rows (see constant above)
            q_step = max(1, PQ_SCORE_YIELD_ROWS // n_rows)
            for q0 in range(0, len(qids), q_step):
                qs = qids[q0 : q0 + q_step]
                # lut[q, s, code[r, s]] summed over s → (len(qs), rows)
                d = np.round(lut[q0 : q0 + q_step, sub, cmat].sum(axis=2), round_to)
                yield pd.DataFrame(
                    {
                        "query_id": np.repeat(qs, n_rows),
                        "neighbor_id": np.tile(ids, len(qs)),
                        "adist": d.reshape(-1),
                    }
                )

    scored = codes.mapInPandas(
        score, "query_id long, neighbor_id long, adist double"
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(F.asc("adist"), F.asc("neighbor_id"))
    return (
        _partial_topk(scored, k, metric="adist", ascending=True)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adist", "rank")
    )


def pq_cells_codes(
    df: DataFrame,
    centroids: np.ndarray,
    books: np.ndarray,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """The IVF-PQ index frame: ``(id, cell, code)`` — each vector's
    nearest coarse-centroid cell plus its PQ code, computed in ONE
    Arrow-batched narrow map (one scan of the embedding column, zero
    shuffles). This is the frame a production deployment materializes
    once (partitioned/bucketed by ``cell``) and serves every query
    from; the embedding column is never read again."""
    m = books.shape[0]

    def kernel(batches):
        for b in batches:
            if not len(b):
                continue
            mat = np.vstack([np.asarray(e, dtype=np.float64) for e in b[emb_col]])
            cells = probe_top_cells(mat, centroids, 1)[:, 0]
            codes = pq_assign_codes(mat, books)
            yield pd.DataFrame(
                {
                    "id": b[id_col].to_numpy(),
                    "cell": cells.astype(np.int32),
                    "code": list(codes),
                }
            )

    pruned = df.select(id_col, emb_col)
    return pruned.mapInPandas(kernel, "id long, cell int, code array<int>")


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    books: np.ndarray,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """IVF-PQ approximate top-k (the FAISS IVFPQ layout): queries probe
    their ``n_probe`` nearest coarse cells and ADC-score ONLY the
    corpus rows assigned to those cells —
    ``(query_id, neighbor_id, adist, rank)``, self-matches excluded,
    ties on neighbor id, ``adist`` rounded before selection (the
    ``pq_topk`` contract).

    Scale shape, piece by piece: the index frame (``pq_cells_codes``)
    is a one-scan narrow map; the query side (bounded by
    ``PQ_MAX_QUERIES``) collects once and re-enters the plan as a tiny
    broadcast (query_id, cell) routing table, so candidate selection
    is a BroadcastHashJoin on ``cell`` touching ~n_probe/n_cells of
    the corpus — never a full scan, never a SortMergeJoin; with the
    index table bucketed by ``cell`` the join is also partition-pruned
    at the scan. Scoring is m table lookups per candidate against the
    closure-shipped LUT; selection is the shared two-phase top-k."""
    qpd = _collect_queries(queries, id_col, emb_col, "ivf_pq_topk")
    index = pq_cells_codes(corpus, centroids, books, id_col, emb_col)
    return _adc_topk_over_index(index, qpd, centroids, books, k, n_probe, round_to)


def write_pq_index(index: DataFrame, path: str) -> None:
    """Persist the IVF-PQ index frame partitioned by ``cell`` — one
    directory per coarse cell, so a query's ``cell IN (probed...)``
    predicate partition-prunes the serving scan to ~n_probe/n_cells of
    the files. The layout a production deployment builds once (the
    encode cost) and serves every subsequent query batch from without
    ever touching the embedding column again. Plain parquet: cell
    cardinality is the (small) coarse-centroid count, so the directory
    fan-out is bounded by construction."""
    index.write.mode("overwrite").partitionBy("cell").parquet(path)


def read_pq_index(spark, path: str) -> DataFrame:
    """Read a persisted IVF-PQ index (``write_pq_index`` layout)."""
    return spark.read.parquet(path)


def ivf_pq_topk_over_index(
    index: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    books: np.ndarray,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """``ivf_pq_topk`` served from a prebuilt ``(id, cell, code)``
    index frame (``pq_cells_codes`` / ``read_pq_index``): the corpus is
    not rescanned or re-encoded — the probed-cell ``isin`` predicate
    pushes into the index scan (partition pruning under the
    ``write_pq_index`` layout), the broadcast routing join narrows it
    to exact (query, cell) matches, and ADC scoring + two-phase top-k
    proceed as in the inline path. ``centroids``/``books`` must be the
    arrays the index was built with (persist them beside it)."""
    qpd = _collect_queries(queries, id_col, emb_col, "ivf_pq_topk_over_index")
    return _adc_topk_over_index(index, qpd, centroids, books, k, n_probe, round_to)


def _adc_topk_over_index(
    index: DataFrame,
    qpd: pd.DataFrame,
    centroids: np.ndarray,
    books: np.ndarray,
    k: int,
    n_probe: int,
    round_to: int,
) -> DataFrame:
    """Shared back half of the IVF-PQ paths: routing join + ADC scoring
    + two-phase top-k over an ``(id, cell, code)`` index frame and a
    driver-collected query frame."""
    qids = qpd["query_id"].to_numpy()
    qmat = np.vstack([np.asarray(e, dtype=np.float64) for e in qpd["emb"]])
    lut = pq_adc_lut(qmat, books)
    qcells = probe_top_cells(qmat, centroids, n_probe)
    spark = index.sparkSession
    routes = spark.createDataFrame(
        [
            (int(q), int(c))
            for q, row in zip(qids.tolist(), qcells)
            for c in row.tolist()
        ],
        "query_id long, cell int",
    )
    # the isin predicate is redundant with the join but PUSHES DOWN: it
    # partition-prunes a cell-partitioned index scan and row-group-skips
    # a cell-sorted one before any join runs
    probed = sorted({int(c) for row in qcells for c in row.tolist()})
    cand = (
        index.where(F.col("cell").isin(probed))
        .join(F.broadcast(routes), "cell")
        .filter(F.col("query_id") != F.col("id"))
    )
    qidx = {int(q): i for i, q in enumerate(qids.tolist())}
    m = books.shape[0]

    def score(batches):
        sub = np.arange(m)
        for b in batches:
            if not len(b):
                continue
            cmat = np.vstack(b["code"].to_numpy())
            qi = b["query_id"].map(qidx).to_numpy()
            d = np.round(lut[qi[:, None], sub[None, :], cmat].sum(axis=1), round_to)
            yield pd.DataFrame(
                {
                    "query_id": b["query_id"].to_numpy(),
                    "neighbor_id": b["id"].to_numpy(),
                    "adist": d,
                }
            )

    scored = cand.select("query_id", "id", "code").mapInPandas(
        score, "query_id long, neighbor_id long, adist double"
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adist"), F.asc("neighbor_id"))
    return (
        _partial_topk(scored, k, metric="adist", ascending=True)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adist", "rank")
    )


def embedding_candidates_between(
    batch: DataFrame,
    history: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_bits: int = 64,
    n_bands: int = 8,
    seed: int = 42,
    probes: int = 0,
    salt_bucket_above: int = 256,
    max_bucket: int = 100_000,
) -> DataFrame:
    """SRP candidate pairs BETWEEN two vector corpora —
    ``(id_a from batch, id_b from history)`` for every band bucket
    populated on both sides. The embedding leg of the cross-corpus
    ingest gate (text: ``minhash.minhash_candidates_between``; images:
    ``pipeline.near_dup_gate``): the history is never self-joined, a
    bucket costs n_a·n_b pairs, and both sides band through the SAME
    seeded kernels as the self-join path, so an index built by one is
    probe-compatible with the other."""
    from yadf_spark.operators.minhash import cross_candidate_pairs_from_buckets

    a = srp_band_table(batch, dim, id_col, emb_col, n_bits, n_bands, seed, probes)
    b = srp_band_table(history, dim, id_col, emb_col, n_bits, n_bands, seed, probes)
    return cross_candidate_pairs_from_buckets(a, b, salt_bucket_above, max_bucket)


def embedding_near_dup_anti_join(
    batch: DataFrame,
    history: DataFrame,
    dim: int,
    min_cosine: float = 0.9,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_bits: int = 64,
    n_bands: int = 8,
    seed: int = 42,
    probes: int = 0,
    salt_bucket_above: int = 256,
    max_bucket: int = 100_000,
) -> DataFrame:
    """Rows of ``batch`` with NO embedding near-duplicate (cosine >=
    ``min_cosine``) in ``history`` — the vector-modality fuzzy ingest
    gate beside the text (``minhash.near_dup_anti_join``) and image
    (``pipeline.near_dup_gate``) flavors. All batch columns pass
    through untouched. Overlapping id spaces are safe: a row's
    self-pair never gates it out, only a DIFFERENT row may.

    Scale shape: bands only through the bucket shuffle (~20 B/row);
    the exact-cosine verify re-attaches embeddings per side by id join
    over the (tiny) candidate set; the batch anti-join is on ids. The
    history payload never moves, and recomputing its bands per batch
    amortizes away via the persisted streaming band index
    (``make_embedding_band_fn``) exactly as in the other modalities."""
    cand = embedding_candidates_between(
        batch, history, dim, id_col, emb_col, n_bits, n_bands, seed, probes,
        salt_bucket_above, max_bucket,
    ).filter(F.col("id_a") != F.col("id_b"))
    a = _side(batch, id_col, emb_col, "id_a", "a")
    b = _side(history, id_col, emb_col, "id_b", "b")
    scored = _cosine_from_norms(cand.join(a, "id_a").join(b, "id_b"), dim)
    matched = (
        scored.filter(F.col("cosine") >= min_cosine)
        .select(F.col("id_a").alias(id_col))
        .distinct()
    )
    return batch.join(matched, id_col, "left_anti")
