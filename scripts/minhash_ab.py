"""Interleaved A/B of the candidate-pair job: the round-2 plan (shared
aggregated subtree via exchange reuse + higher-order-function pair
expansion) vs the round-3 plan (eager localCheckpoint of the bucket agg
+ numpy mapInPandas pair expansion). One session, round-robin, best-of-N
— the sandbox's degraded-host windows make anything else meaningless.

Usage: python scripts/minhash_ab.py [n_images] [cores] [rounds]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
CORES = int(sys.argv[2]) if len(sys.argv) > 2 else 12
ROUNDS = int(sys.argv[3]) if len(sys.argv) > 3 else 3


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    from pyspark.sql import functions as F

    import bench
    from yadf_spark.config import NearDupConfig
    from yadf_spark.operators import minhash
    from yadf_spark.operators.pipeline import candidate_buckets

    cfg = NearDupConfig()
    spark = bench and __import__("yadf_spark.session", fromlist=["restart_spark"]).restart_spark(
        CORES, app_name="minhash-ab"
    )
    bench._warm_python_workers(spark)
    df = bench._images_cached(spark, N)
    salt_above, max_bucket = cfg.lsh.salt_bucket_above, cfg.lsh.max_bucket

    def new_path():
        cand = minhash.candidate_pairs_from_buckets(
            candidate_buckets(df, cfg), salt_above, max_bucket
        )
        _force(cand)

    def old_path():
        # round-2 shape: no checkpoint, both branches re-read the agg
        # subtree (exchange reuse), HOF expression expands small buckets
        buckets = candidate_buckets(df, cfg)
        grouped = (
            buckets.groupBy("band_idx", "band_hash")
            .agg(F.sort_array(F.collect_list("id")).alias("ids"), F.count("*").alias("n"))
            .filter(F.col("n") > 1)
        )
        small = (
            grouped.filter(F.col("n") <= min(salt_above, max_bucket))
            .select(F.explode(minhash._pairs_from_sorted_ids(F.col("ids"))).alias("p"))
            .select("p.id_a", "p.id_b")
            .filter(F.col("id_a") != F.col("id_b"))
        )
        big = grouped.filter(
            (F.col("n") > salt_above) & (F.col("n") <= max_bucket)
        ).select("band_idx", "band_hash", "n")
        if big.take(1):
            raise RuntimeError("unexpected mega-bucket at this scale")
        _force(small.distinct())

    # warmup both
    new_path()
    old_path()

    walls = {"old": [], "new": []}
    for r in range(ROUNDS):
        for name, fn in (("old", old_path), ("new", new_path)):
            t0 = time.monotonic()
            fn()
            walls[name].append(round(time.monotonic() - t0, 2))
    print(f"n={N} cores={CORES} rounds={ROUNDS}")
    for name in ("old", "new"):
        print(f"  {name}: best {min(walls[name]):.2f}s  raw {walls[name]}")
    spark.stop()


if __name__ == "__main__":
    main()
