"""A/B: driver-serial-time knobs for the MinHash+LSH candidate job.

scaling_partitions_ab.py localized the sub-0.8 efficiency to ~2 s/run
of driver-serial time (executorCpuTime is flat across levels, GC is
negligible, wall*cores - executorRunTime gives ~24 core-s of idle at 12
cores vs ~5 at 3). The serial candidates: AQE's per-stage re-planning
rounds, and Python-worker pipeline latency from the 4096-row Arrow
batch cap. This script measures the job at both levels under
{AQE on/off} x {arrow batch 4096/20000}.

Usage: python scripts/scaling_conf_ab.py [n_images] [repeats]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
REPEATS = int(sys.argv[2]) if len(sys.argv) > 2 else 2


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def run_level(cores: int, aqe: bool, arrow_batch: int) -> dict:
    import bench
    from yadf_spark.config import NearDupConfig
    from yadf_spark.operators import minhash
    from yadf_spark.operators.pipeline import candidate_buckets
    from yadf_spark.session import restart_spark

    cfg = NearDupConfig()
    spark = restart_spark(
        cores,
        app_name=f"conf-ab-{cores}-{aqe}-{arrow_batch}",
        extra_conf={
            "spark.sql.adaptive.enabled": str(aqe).lower(),
            "spark.sql.execution.arrow.maxRecordsPerBatch": str(arrow_batch),
        },
    )
    bench._warm_python_workers(spark)
    df = bench._images_cached(spark, N)

    def run():
        cand = minhash.candidate_pairs_from_buckets(
            candidate_buckets(df, cfg), cfg.lsh.salt_bucket_above, cfg.lsh.max_bucket
        )
        _force(cand)

    run()  # warm
    walls = []
    for _ in range(REPEATS):
        t0 = time.monotonic()
        run()
        walls.append(round(time.monotonic() - t0, 2))
    spark.stop()
    return {"walls": walls, "best": min(walls)}


def main():
    combos = [
        (True, 4096),
        (False, 4096),
        (True, 20000),
        (False, 20000),
    ]
    out = {}
    # interleave levels within a combo so a host window hits both
    for aqe, ab in combos:
        r3 = run_level(3, aqe, ab)
        r12 = run_level(12, aqe, ab)
        out[(aqe, ab)] = (r3, r12)
        eff = (r3["best"] * 3) / (r12["best"] * 12)
        print(
            f"aqe={aqe!s:5s} batch={ab:5d}: 3c {r3['best']:6.2f}s {r3['walls']} | "
            f"12c {r12['best']:5.2f}s {r12['walls']} | eff={eff:.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
