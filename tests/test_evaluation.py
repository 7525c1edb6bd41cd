"""Clustering-evaluation metrics (pair confusion, Rand, ARI) — exact
hand-computed cases plus agreement with the driver-side
recall/precision reference on the planted corpus."""

from __future__ import annotations

from yadf_spark.operators import evaluation


def _one(df):
    import decimal

    rows = df.collect()
    assert len(rows) == 1
    return {
        k: (int(v) if isinstance(v, decimal.Decimal) else v)
        for k, v in rows[0].asDict().items()
    }


def test_cluster_quality_hand_computed(spark):
    """5 items, contingency {(c1,t1):2, (c2,t2):1, (c2,t3):1, (c3,t2):1}:
    tp=1, fp=1, fn=1, tn=7, RI=0.8, ARI=2(1*7-1*1)/((2)(8)+(2)(8))=0.375
    (cross-checked against the expected-index ARI form:
    (1-0.4)/(2-0.4) = 0.375)."""
    clusters = spark.createDataFrame(
        [("a", "c1"), ("b", "c1"), ("c", "c2"), ("d", "c2"), ("e", "c3")],
        "id string, cluster_id string",
    )
    truth = spark.createDataFrame(
        [("a", "t1"), ("b", "t1"), ("c", "t2"), ("d", "t3"), ("e", "t2")],
        "id string, true_cluster string",
    )
    got = _one(evaluation.cluster_quality(clusters, truth))
    assert got == {
        "n_items": 5,
        "tp": 1,
        "fp": 1,
        "fn": 1,
        "tn": 7,
        "rand_index": 0.8,
        "ari": 0.375,
    }


def test_cluster_quality_perfect_and_degenerate(spark):
    clusters = spark.createDataFrame(
        [("a", "x"), ("b", "x"), ("c", "y")], "id string, cluster_id string"
    )
    same = spark.createDataFrame(
        [("a", "g1"), ("b", "g1"), ("c", "g2")], "id string, true_cluster string"
    )
    got = _one(evaluation.cluster_quality(clusters, same))
    assert (got["tp"], got["fp"], got["fn"], got["tn"]) == (1, 0, 0, 2)
    assert got["rand_index"] == 1.0 and got["ari"] == 1.0

    # all-singletons on both sides: zero denominator -> trivial agreement
    singles = spark.createDataFrame(
        [("a", "s1"), ("b", "s2")], "id string, cluster_id string"
    )
    strue = spark.createDataFrame(
        [("a", "u1"), ("b", "u2")], "id string, true_cluster string"
    )
    got = _one(evaluation.cluster_quality(singles, strue))
    assert (got["tp"], got["fp"], got["fn"], got["tn"]) == (0, 0, 0, 1)
    assert got["ari"] == 1.0

    # empty intersection: all-zero counts, indices report 1.0
    other = spark.createDataFrame(
        [("zz", "u1")], "id string, true_cluster string"
    )
    got = _one(evaluation.cluster_quality(singles, other))
    assert got == {
        "n_items": 0,
        "tp": 0,
        "fp": 0,
        "fn": 0,
        "tn": 0,
        "rand_index": 1.0,
        "ari": 1.0,
    }


def test_cluster_quality_excludes_null_labels(spark):
    """NULL on either side means 'unassigned', not a cluster — the
    gates' isNotNull discipline. Without the filter, two NULL-assigned
    ids would count as a co-clustered pair (a phantom mega-cluster)."""
    clusters = spark.createDataFrame(
        [("a", "c1"), ("b", "c1"), ("x", None), ("y", None)],
        "id string, cluster_id string",
    )
    truth = spark.createDataFrame(
        [("a", "t1"), ("b", "t1"), ("x", "t2"), ("y", None)],
        "id string, true_cluster string",
    )
    got = _one(evaluation.cluster_quality(clusters, truth))
    # only a and b survive both filters: one true co-clustered pair
    assert got == {
        "n_items": 2, "tp": 1, "fp": 0, "fn": 0, "tn": 0,
        "rand_index": 1.0, "ari": 1.0,
    }


def test_cluster_quality_consistent_with_pair_gates(spark):
    """tp/(tp+fn) must equal the distributed recall and tp/(tp+fp) the
    distributed precision when the truth frame covers every evaluated
    id (both reduce to the same contingency arithmetic)."""
    from yadf_spark.operators import pipeline

    clusters = spark.createDataFrame(
        [("a", "c1"), ("b", "c1"), ("c", "c1"), ("d", "c2"), ("e", "c2")],
        "id string, cluster_id string",
    )
    truth = spark.createDataFrame(
        [("a", "t1"), ("b", "t1"), ("c", "t2"), ("d", "t2"), ("e", "t3")],
        "id string, true_cluster string",
    )
    got = _one(evaluation.cluster_quality(clusters, truth))
    recall = pipeline.dup_pair_recall_distributed(
        clusters.withColumnRenamed("id", "image_id"),
        truth.withColumnRenamed("id", "image_id"),
    )
    precision = pipeline.dup_pair_precision_distributed(
        clusters.withColumnRenamed("id", "image_id"),
        truth.withColumnRenamed("id", "image_id"),
    )
    assert got["tp"] / (got["tp"] + got["fn"]) == recall
    assert got["tp"] / (got["tp"] + got["fp"]) == precision


# --- property: agreement with an independent pair-counting reference --------

def _ref_quality(assign: dict[str, str], truth: dict[str, str]):
    """Pure-python pair counting over the id intersection — an
    independent implementation (no contingency cells) to property-check
    the distributed one against."""
    ids = sorted(set(assign) & set(truth))
    tp = fp = fn = tn = 0
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            same_pred = assign[a] == assign[b]
            same_true = truth[a] == truth[b]
            tp += same_pred and same_true
            fp += same_pred and not same_true
            fn += (not same_pred) and same_true
            tn += (not same_pred) and (not same_true)
    denom = (tp + fp) * (fp + tn) + (tp + fn) * (fn + tn)
    ari = 1.0 if denom == 0 else 2.0 * (tp * tn - fn * fp) / denom
    total = tp + fp + fn + tn
    ri = 1.0 if total == 0 else (tp + tn) / total
    return len(ids), tp, fp, fn, tn, round(ri, 6), round(ari, 6)


def test_cluster_quality_matches_pair_counting_reference(spark):
    """Deterministic sweep of labelings (all pairs of partition shapes
    over 6 items, plus partial overlap) against the brute-force pair
    counter."""
    import itertools

    shapes = [
        [0, 0, 0, 1, 1, 2],
        [0, 1, 2, 3, 4, 5],
        [0, 0, 0, 0, 0, 0],
        [0, 0, 1, 1, 2, 2],
        [0, 1, 0, 1, 0, 1],
    ]
    ids = [f"i{k}" for k in range(6)]
    for pred, true in itertools.product(shapes, repeat=2):
        assign = {i: f"c{v}" for i, v in zip(ids, pred)}
        truth = {i: f"t{v}" for i, v in zip(ids, true)}
        cdf = spark.createDataFrame(
            list(assign.items()), "id string, cluster_id string"
        )
        tdf = spark.createDataFrame(
            list(truth.items()), "id string, true_cluster string"
        )
        got = _one(evaluation.cluster_quality(cdf, tdf))
        want = _ref_quality(assign, truth)
        assert (
            got["n_items"], got["tp"], got["fp"], got["fn"], got["tn"],
            got["rand_index"], got["ari"],
        ) == want, (pred, true)
