"""Exact caption-containment pass (north_rule: "a suffix-array substring
pass for exact caption containment").

Two stages, cheap-key-then-verify like everything else in this engine:

1. **Candidates — shared-shingle join.** If caption A (with >= k words)
   is a substring of caption B, then *every* word k-shingle of A is a
   shingle of B; so any one shared shingle suffices to co-bucket the
   pair. We explode distinct shingles, drop shingles whose document
   frequency exceeds a cap (a contained pair survives unless ALL of A's
   shingles are ultra-common — logged, never silent), and self-join.
   Captions shorter than k words fall back to a whole-text shingle and
   still join with equal short captions.

2. **Verify — per-bucket substring check** via ``applyInPandas``: inside
   each candidate group, strings are sorted by length and checked with
   exact substring search (CPython's find — a C implementation of
   two-way string matching; a shared generalized suffix array is the
   documented upgrade for mega-buckets, which the df-cap already bounds).

Output: (inner_id, outer_id) where inner's caption is a substring of
outer's and the rows differ.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from yadf_spark.functions import text as T


def _word_candidates(
    base: DataFrame,
    k: int,
    max_shingle_df: int,
    log=None,
    symmetric: bool = False,
) -> DataFrame:
    """Candidate (id_a, id_b) pairs from the word-shingle join.
    ``symmetric=True`` keeps the pre-round-3 all-shingles x all-shingles
    join — exposed only so tests can assert the probe's candidate cut."""
    # ids + lengths only through the shingle join (see
    # containment_pairs_char: shuffling full texts per shingle row was
    # the dominant cost); texts re-attach to the distinct candidates.
    # array_distinct: repeated shingles inside one caption add no
    # recall, only join fan-out.
    sh = base.select(
        "id",
        F.length("text").alias("len"),
        F.explode(F.array_distinct(T.word_shingles(F.col("text"), k))).alias("shingle"),
    )
    freq = sh.groupBy("shingle").agg(F.count("*").alias("df_"))
    hot = freq.filter(F.col("df_") > max_shingle_df)
    if log is not None:
        n_hot = hot.count()
        if n_hot:
            log(f"containment: dropped {n_hot} shingles with df > {max_shingle_df}")
    sh = sh.join(F.broadcast(hot.select("shingle")), "shingle", "left_anti")

    # Asymmetric join, same trick the char path proved (rarest-gram
    # probe, 400x candidate cut): if A is contained in B then EVERY
    # shingle of A appears in B, so A probing with its single RAREST
    # non-hot shingle is recall-complete. The survivor condition is
    # IDENTICAL to the symmetric join under the df-cap — a contained
    # pair lives iff the inner caption has >= 1 non-hot shingle — so
    # the oracle SQL is unchanged while the probe side shrinks from
    # sum(|shingles|) rows to one row per caption.
    if symmetric:
        probe = sh
    else:
        probe = (
            sh.join(freq, "shingle")
            .groupBy("id", "len")
            .agg(F.expr("min_by(shingle, struct(df_, shingle))").alias("shingle"))
        )
    a = probe.select(F.col("shingle"), F.col("id").alias("id_a"), F.col("len").alias("len_a"))
    b = sh.select(F.col("shingle"), F.col("id").alias("id_b"), F.col("len").alias("len_b"))
    return (
        a.join(b, "shingle")
        .filter(F.col("id_a") != F.col("id_b"))
        # only check "shorter inside longer"; equal-length containment is
        # equality, covered with the deterministic id tie-break
        .filter(
            (F.col("len_a") < F.col("len_b"))
            | ((F.col("len_a") == F.col("len_b")) & (F.col("id_a") < F.col("id_b")))
        )
        .select("id_a", "id_b")
        .distinct()
    )


def containment_pairs(
    df: DataFrame,
    id_col: str = "image_id",
    text_col: str = "caption",
    k: int = 3,
    max_shingle_df: int = 1000,
    log=None,
) -> DataFrame:
    """Word-aligned containment pairs: ``(inner_id, outer_id)`` where
    inner's caption appears inside outer's AND the containment starts
    and ends on word boundaries — candidates come from shared word
    k-shingles, so 'b c d' inside 'a b c d' is found but 'b c d' inside
    'ab c d' (mid-word splice) is NOT a candidate and is dropped even
    though ``contains()`` would accept it. That alignment assumption is
    what makes the candidate join linear in shared shingles; for
    arbitrary character-level substrings use ``containment_pairs_char``
    (rarest-char-n-gram probe, no boundary assumption)."""
    # Two-step select: aliasing a column to its own name while another
    # expression in the same select references it trips Spark's lateral
    # column alias resolution (INTERNAL_ERROR LateralColumnAliasReference).
    base = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
    cand = _word_candidates(base, k, max_shingle_df, log=log)
    ta = base.select(F.col("id").alias("id_a"), F.col("text").alias("text_a"))
    tb = base.select(F.col("id").alias("id_b"), F.col("text").alias("text_b"))
    verified = (
        cand.join(ta, "id_a").join(tb, "id_b").filter(F.expr("contains(text_b, text_a)"))
    )
    return verified.select(
        F.col("id_a").alias("inner_id"), F.col("id_b").alias("outer_id")
    )


def containment_pairs_char(
    df: DataFrame,
    id_col: str = "image_id",
    text_col: str = "caption",
    n: int = 12,
    log=None,
) -> DataFrame:
    """Character-level containment (no word-boundary assumption): inner's
    text appears *anywhere* in outer's text. Asymmetric candidate join:

    * inner side contributes ONE key per row — its RAREST n-gram by
      corpus document frequency (any container of inner contains every
      one of inner's grams, so any single gram is a recall-complete
      probe; the rarest one minimizes join fan-out — on low-entropy
      corpora a first-chars probe collides massively: measured 594k
      candidate rows from 5k synthetic docs vs 1.5k with the rarest
      gram, a 400x reduction that grows quadratically worse at scale);
    * outer side contributes a key per character offset (all n-grams);
    * recall-complete for inner texts of length >= n (shorter inner
      texts are excluded by contract — the oracle SQL carries the same
      ``length >= n`` bound).

    This keeps the exploded side linear in total characters and the
    probe side at one row per document — the cheap-key shape again."""
    base = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text")).filter(
        F.length("text") >= n
    )
    # The candidate join carries ONLY (id, length, gram-hash) — never
    # text: the exploded side has one row per gram, and dragging each
    # row's full document through the shuffle multiplied the join's
    # bytes by the text length (measured: the dominant cost of this
    # operator). The gram itself is folded to xxhash64 BEFORE the first
    # exchange — the gram table shuffles three times (document
    # frequency, probe pick, candidate join) and an 8-byte key beats a
    # 12+-char string on every pass; a hash collision can only ADD a
    # candidate pair, which the exact contains() verification below
    # removes, so recall is untouched. Texts re-attach to the (tiny)
    # distinct candidate set afterwards. array_distinct first: repeated
    # grams within one document add no recall, only join fan-out.
    grams = base.select(
        F.col("id").alias("id_b"),
        F.length("text").alias("len_b"),
        F.explode(F.array_distinct(T.char_ngrams(F.col("text"), n))).alias("_g"),
    ).select("id_b", "len_b", F.xxhash64("_g").alias("gram"))
    # NOT checkpointed despite three consumers: re-running the explode
    # is pure map-side CPU over the cached base, and an interleaved A/B
    # measured materializing the ~char-count-sized table SLOWER (8.2 s
    # vs 7.1 s at sf0.1) than recomputing it — the opposite trade from
    # minhash's bucket agg, whose subtree contains a shuffle + UDF.
    # per-document rarest gram: one pass over the (already narrow) gram
    # table for corpus document frequencies, joined back and min_by-ed.
    # Ties pick an arbitrary gram — any gram is recall-complete, so the
    # verified output is deterministic regardless.
    dfreq = grams.groupBy("gram").agg(F.count("*").alias("_gdf"))
    probes = (
        grams.join(dfreq, "gram")
        .groupBy(F.col("id_b").alias("id_a"))
        .agg(
            F.first("len_b").alias("len_a"),
            F.min_by("gram", "_gdf").alias("gram"),
        )
    )
    cand = (
        grams.join(probes, "gram")
        .filter(F.col("id_a") != F.col("id_b"))
        .filter(
            (F.col("len_a") < F.col("len_b"))
            | ((F.col("len_a") == F.col("len_b")) & (F.col("id_a") < F.col("id_b")))
        )
        .select("id_a", "id_b")
        .distinct()
    )
    ta = base.select(F.col("id").alias("id_a"), F.col("text").alias("text_a"))
    tb = base.select(F.col("id").alias("id_b"), F.col("text").alias("text_b"))
    return (
        cand.join(ta, "id_a")
        .join(tb, "id_b")
        .filter(F.expr("contains(text_b, text_a)"))
        .select(F.col("id_a").alias("inner_id"), F.col("id_b").alias("outer_id"))
    )


#: buckets whose concatenated text exceeds this many chars use the
#: generalized-suffix-array path; smaller buckets use the nested
#: C-implemented substring scan (faster below the crossover)
SA_THRESHOLD_CHARS = 20_000


def _containment_nested(items: list[tuple[str, str]]) -> list[tuple[str, str]]:
    """O(b^2) pairwise scan with CPython's two-way find — fastest for
    small buckets."""
    out = []
    for i, (ida, ta) in enumerate(items):
        for idb, tb in items[i + 1 :]:
            if ida != idb and ta in tb:
                out.append((ida, idb))
    return out


def _build_suffix_array(s: str):
    """Suffix array by prefix doubling (Manber-Myers) — O(n log n) time,
    O(n) memory, fully vectorized in numpy. Returns int64 positions of
    lexicographically sorted suffixes."""
    import numpy as np

    n = len(s)
    rank = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    idx = np.arange(n, dtype=np.int64)
    k = 1
    while True:
        key2 = np.full(n, -1, dtype=np.int64)
        has2 = idx + k < n
        key2[has2] = rank[idx[has2] + k]
        order = np.lexsort((key2, rank))
        r1, r2 = rank[order], key2[order]
        changed = np.ones(n, dtype=bool)
        changed[1:] = (r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])
        new_rank = np.empty(n, dtype=np.int64)
        new_rank[order] = np.cumsum(changed) - 1
        rank = new_rank
        if rank[order[-1]] == n - 1:
            return order
        k *= 2


def _containment_suffix_array(items: list[tuple[str, str]]) -> list[tuple[str, str]]:
    """Generalized suffix array over the bucket's concatenated texts
    (north_star: "a suffix-array substring pass for exact caption
    containment").

    Build S = t_0 $ t_1 $ ... $ (separator below every text char), sort
    suffixes with prefix doubling, then for each inner text binary-search
    the suffix-array interval of suffixes it prefixes; every hit's offset
    maps back to the owning document. O(N log N) build +
    O(|t| log N + occ) per query — subquadratic in bucket size, which
    the nested scan can't give mega-buckets."""
    import numpy as np

    sep = "\x00"
    texts = [t for _, t in items]
    concat = sep.join(texts) + sep
    n = len(concat)
    # owner[i] = document index covering concat position i
    owner = np.empty(n, dtype=np.int64)
    pos = 0
    for di, t in enumerate(texts):
        owner[pos : pos + len(t) + 1] = di
        pos += len(t) + 1
    sa = _build_suffix_array(concat)

    def lower_bound(pattern: str, strict_prefix_gt: bool) -> int:
        """First sa index whose suffix's |pattern|-prefix is >= pattern
        (or > pattern when strict_prefix_gt)."""
        m = len(pattern)
        lo, hi = 0, n
        while lo < hi:
            mid = (lo + hi) // 2
            start = int(sa[mid])
            pref = concat[start : start + m]
            if pref < pattern or (strict_prefix_gt and pref == pattern):
                lo = mid + 1
            else:
                hi = mid
        return lo

    out = set()
    seen_texts: set[str] = set()
    for ii, (ida, ta) in enumerate(items):
        if ta in seen_texts:
            # identical inner texts share one interval scan; their pairs
            # are reconstructed by the canonical filter below
            continue
        seen_texts.add(ta)
        if not ta:
            # the empty string is a substring of every text
            hit_docs = set(range(len(items)))
        else:
            lo = lower_bound(ta, strict_prefix_gt=False)
            hi = lower_bound(ta, strict_prefix_gt=True)
            hit_docs = set(int(owner[int(sa[r])]) for r in range(lo, hi))
        for di in hit_docs:
            out.add((ta, di))

    # canonicalize to the nested path's output: inner strictly shorter
    # than outer, or equal text with inner id < outer id
    by_text: dict[str, list[tuple[str, str]]] = {}
    for ida, ta in items:
        by_text.setdefault(ta, []).append((ida, ta))
    pairs = set()
    for ta, di in out:
        idb, tb = items[di]
        for ida, _ in by_text[ta]:
            if ida == idb:
                continue
            if len(ta) < len(tb) or (ta == tb and ida < idb):
                pairs.add((ida, idb))
    return sorted(pairs)


def bucket_containment_pairs(
    df: DataFrame,
    bucket_col: str,
    id_col: str = "image_id",
    text_col: str = "caption",
    sa_threshold_chars: int = SA_THRESHOLD_CHARS,
) -> DataFrame:
    """The per-bucket grouped variant: within each prefilter bucket (an
    LSH band, a phash band, a language partition ...), find all
    containment pairs with an ``applyInPandas`` pass. Small buckets use
    the nested C substring scan; buckets past ``sa_threshold_chars`` use
    the generalized suffix array (subquadratic in bucket size)."""

    def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        # null captions carry no substring evidence and would crash the
        # len() sort key — degrade them out of the bucket (G7 posture)
        # rather than failing the whole job
        items = sorted(
            ((i, t) for i, t in zip(pdf[id_col], pdf[text_col]) if t is not None),
            key=lambda t: (len(t[1]), t[0]),
        )
        total_chars = sum(len(t) for _, t in items)
        # NUL can't be the SA separator if a text contains it — rare
        # (binary-ish captions); those buckets take the nested scan
        if total_chars > sa_threshold_chars and not any("\x00" in t for _, t in items):
            out = _containment_suffix_array(items)
        else:
            out = _containment_nested(items)
        return pd.DataFrame(out, columns=["inner_id", "outer_id"])

    return (
        df.select(F.col(bucket_col).alias("_b"), id_col, text_col)
        .groupBy("_b")
        .applyInPandas(per_bucket, schema="inner_id string, outer_id string")
        .distinct()
    )
