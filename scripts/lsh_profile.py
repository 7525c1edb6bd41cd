"""Per-substage profile of the MinHash+LSH candidate job (the bench's
headline throughput metric) — answers "where does the wall go?" before
any optimization is attempted. One session, warm runs, best-of-N.

Usage: python scripts/lsh_profile.py [n_images] [cores] [repeats]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
CORES = int(sys.argv[2]) if len(sys.argv) > 2 else 12
REPEATS = int(sys.argv[3]) if len(sys.argv) > 3 else 3


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def best_of(fn, repeats=REPEATS):
    fn()  # warmup
    best = float("inf")
    walls = []
    for _ in range(repeats):
        t0 = time.monotonic()
        fn()
        walls.append(round(time.monotonic() - t0, 2))
        best = min(best, walls[-1])
    return best, walls


def main():
    from pyspark.sql import functions as F

    import bench
    from yadf_spark.config import NearDupConfig
    from yadf_spark.operators import minhash
    from yadf_spark.operators.pipeline import candidate_buckets
    from yadf_spark.session import restart_spark

    cfg = NearDupConfig()
    spark = restart_spark(CORES, app_name="lsh-profile")
    bench._warm_python_workers(spark)
    df = bench._images_cached(spark, N)

    phash_src = df.filter(F.col("phash").isNotNull())
    caption_src = df.filter(F.length(F.trim(F.col("caption"))) > 0)

    stages = {}

    # A: signature UDF alone (shingle + minhash kernel + Arrow)
    sig = minhash.add_signature(caption_src.select("image_id", "caption"), cfg.lsh)
    stages["A_signature"], wa = best_of(lambda: _force(sig))

    # B: signature + band explode + band hash (no shuffle yet)
    mh_b = minhash.explode_bands(sig, cfg.lsh, id_col="image_id")
    stages["B_sig_bands"], wb = best_of(lambda: _force(mh_b))

    # C: all buckets (phash + minhash) — still no shuffle
    buckets = candidate_buckets(df, cfg)
    stages["C_buckets"], wc = best_of(lambda: _force(buckets))

    # D: full candidate job (groupBy shuffle + pair expansion + distinct)
    cand = minhash.candidate_pairs_from_buckets(
        buckets, cfg.lsh.salt_bucket_above, cfg.lsh.max_bucket
    )
    stages["D_full"], wd = best_of(lambda: _force(cand))

    # E: groupBy only (no pair expansion) to split shuffle from expansion
    grouped = (
        buckets.groupBy("band_idx", "band_hash")
        .agg(F.sort_array(F.collect_list("id")).alias("ids"), F.count("*").alias("n"))
        .filter(F.col("n") > 1)
    )
    stages["E_groupby"], we = best_of(lambda: _force(grouped))

    print(f"n={N} cores={CORES} repeats={REPEATS}")
    for k, v in stages.items():
        print(f"  {k:14s} best {v:6.2f}s")
    print("raw walls:", {"A": wa, "B": wb, "C": wc, "D": wd, "E": we})
    print(f"  derived: shuffle+agg = E-C = {stages['E_groupby']-stages['C_buckets']:.2f}s; "
          f"pairs+distinct = D-E = {stages['D_full']-stages['E_groupby']:.2f}s; "
          f"band-hash = B-A = {stages['B_sig_bands']-stages['A_signature']:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
