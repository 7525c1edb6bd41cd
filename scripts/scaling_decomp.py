"""Decompose the MinHash+LSH candidate job's wall at two parallelism
levels to locate serial/fixed cost (Amdahl diagnosis for the scaling
gate). Substages, each forced separately in its own fresh constructions:

  agg        groupBy(band).collect_list  (pre-checkpoint, forced to noop)
  ckpt       construction incl. the eager localCheckpoint
  down       downstream of the checkpoint (kernel + distinct + big join)
  full       the whole bench closure (construction + force)

Usage: python scripts/scaling_decomp.py [n_images] [repeats]
Runs each level in its own JVM, small first, interleaved per repeat.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
REPEATS = int(sys.argv[2]) if len(sys.argv) > 2 else 2


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def run_level(cores: int) -> dict:
    from pyspark.sql import functions as F

    import bench
    from yadf_spark.config import NearDupConfig
    from yadf_spark.operators import minhash
    from yadf_spark.operators.pipeline import candidate_buckets
    from yadf_spark.session import restart_spark

    cfg = NearDupConfig()
    spark = restart_spark(cores, app_name=f"decomp-{cores}")
    bench._warm_python_workers(spark)
    df = bench._images_cached(spark, N)
    salt_above, max_bucket = cfg.lsh.salt_bucket_above, cfg.lsh.max_bucket

    def t_agg():
        buckets = candidate_buckets(df, cfg)
        grouped = (
            buckets.groupBy("band_idx", "band_hash")
            .agg(F.sort_array(F.collect_list("id")).alias("ids"), F.count("*").alias("n"))
            .filter(F.col("n") > 1)
        )
        _force(grouped)

    state = {}

    def t_ckpt():
        state["cand"] = minhash.candidate_pairs_from_buckets(
            candidate_buckets(df, cfg), salt_above, max_bucket
        )

    def t_down():
        _force(state["cand"])

    def t_full():
        cand = minhash.candidate_pairs_from_buckets(
            candidate_buckets(df, cfg), salt_above, max_bucket
        )
        _force(cand)

    stages = {"agg": t_agg, "ckpt": t_ckpt, "down": t_down, "full": t_full}
    t_full()  # warm codegen/workers
    walls = {k: [] for k in stages}
    for _ in range(REPEATS):
        for k, fn in stages.items():
            t0 = time.monotonic()
            fn()
            walls[k].append(round(time.monotonic() - t0, 2))
    spark.stop()
    return walls


def main():
    out = {}
    for cores in (3, 12):
        out[cores] = run_level(cores)
    print(f"n={N} repeats={REPEATS}")
    for cores, walls in out.items():
        print(f"cores={cores}")
        for k, w in walls.items():
            print(f"  {k:5s} best {min(w):6.2f}s raw {w}")
    for k in ("agg", "ckpt", "down", "full"):
        b3, b12 = min(out[3][k]), min(out[12][k])
        eff = (b3 * 3) / (b12 * 12) if b12 else float("nan")
        print(f"{k:5s} eff(3->12) = {eff:.2f}  ({b3:.2f}s -> {b12:.2f}s)")


if __name__ == "__main__":
    main()
