"""BM25 + RRF retrieval semantics on planted corpora."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from yadf_spark.operators import retrieval

DOCS = {
    1: "the quick brown fox jumps over the lazy dog",
    2: "a quick brown cat sleeps",
    3: "dogs and cats living together",
    4: "completely unrelated text about spark shuffles",
    5: "fox fox fox den",
}


def _corpus(spark):
    return spark.createDataFrame(list(DOCS.items()), "doc_id long, text string")


def _bm25_hand(q: str, k: int = 3):
    toks = {d: t.lower().split() for d, t in DOCS.items()}
    n, avgdl = len(DOCS), sum(map(len, toks.values())) / len(DOCS)
    res: dict[int, float] = {}
    for term in set(q.lower().split()):
        df = sum(1 for v in toks.values() if term in v)
        if not df:
            continue
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for d, v in toks.items():
            tf = v.count(term)
            if tf:
                res[d] = res.get(d, 0.0) + idf * tf * 2.2 / (
                    tf + 1.2 * (0.25 + 0.75 * len(v) / avgdl)
                )
    ranked = sorted(((round(s, 6), d) for d, s in res.items()), key=lambda x: (-x[0], x[1]))
    return [(d, s) for s, d in ranked[:k]]


def test_bm25_matches_hand_formula(spark):
    queries = spark.createDataFrame(
        [(100, "quick fox"), (101, "spark shuffles")], "query_id long, qtext string"
    )
    out = retrieval.bm25_topk(_corpus(spark), queries, k=3)
    got = {}
    for r in out.collect():
        got.setdefault(r.query_id, []).append((r.rank, r.neighbor_id, r.score))
    for qid, q in ((100, "quick fox"), (101, "spark shuffles")):
        want = _bm25_hand(q)
        have = [(nid, s) for _, nid, s in sorted(got[qid])]
        assert have == want, (qid, have, want)


def test_bm25_no_shared_terms_scores_nothing(spark):
    queries = spark.createDataFrame([(7, "zebra xylophone")], "query_id long, qtext string")
    assert retrieval.bm25_topk(_corpus(spark), queries, k=3).count() == 0


def test_bm25_scoring_join_broadcasts_the_query_side(spark):
    queries = spark.createDataFrame([(1, "quick fox")], "query_id long, qtext string")
    plan = (
        retrieval.bm25_topk(_corpus(spark), queries, k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_rrf_fuse_hand_case(spark):
    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)], "query_id long, neighbor_id long, rank int"
    )
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2)], "query_id long, neighbor_id long, rank int"
    )
    out = {r.neighbor_id: (r.rrf_score, r.rank) for r in retrieval.rrf_fuse([a, b], k=4).collect()}
    # 11 appears in both: 1/62 + 1/61 — must win
    assert out[11][1] == 1
    assert abs(out[11][0] - round(1 / 62 + 1 / 61, 6)) < 1e-9
    assert out[10][1] == 2  # 1/61 beats 1/62 and 1/63
    assert set(out) == {10, 11, 12, 13}


def test_rrf_requires_rankings():
    import pytest

    with pytest.raises(ValueError):
        retrieval.rrf_fuse([])
