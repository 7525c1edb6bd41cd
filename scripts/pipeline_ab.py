"""Interleaved A/B for the 5-stage near-dup pipeline (VERDICT r2 item 1).

Round-2 measured the full pipeline at 2,590 img/s vs round-1's 9,042 —
but across sessions, core counts (16 vs 12) and input sizes (200k vs
150k), in a sandbox whose host noise arrives in minutes-long windows.
This script answers the question properly: ONE session, identical input,
variants interleaved round-robin so a degraded-host window hits every
variant equally, best-of-N per variant.

Variants:
  lazy_s1   current bench path — localCheckpoint(eager=False) at every
            stage boundary (the plan-blowup protection)
  lazy_s2   truncate every 2nd boundary only
  lazy_s3   truncate every 3rd boundary only
  eager     localCheckpoint(eager=True)+count per stage — gives true
            per-stage wall attribution (printed from the best round)

Usage: python scripts/pipeline_ab.py [rounds] [n_images] [cores]
Prints one JSON line: per-variant times + per-stage seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
N_IMAGES = int(sys.argv[2]) if len(sys.argv) > 2 else 150_000
CORES = int(sys.argv[3]) if len(sys.argv) > 3 else 12


def main() -> None:
    import bench
    from yadf_spark.operators import pipeline as pl
    from yadf_spark.plans.checkpoint import Checkpointer
    from yadf_spark.session import restart_spark

    spark = restart_spark(CORES, app_name="pipeline-ab")
    bench._warm_python_workers(spark)
    df = bench._images_cached(spark, N_IMAGES)

    def run(ck: Checkpointer):
        out = pl.near_dup_pipeline(df, checkpointer=ck)
        bench._force(out["clusters"])
        return out

    variants = {
        "lazy_s1": lambda: Checkpointer(spark=spark, workdir=None, eager=False),
        "lazy_s2": lambda: Checkpointer(spark=spark, workdir=None, eager=False, stride=2),
        "lazy_s3": lambda: Checkpointer(spark=spark, workdir=None, eager=False, stride=3),
        "eager": lambda: Checkpointer(spark=spark, workdir=None, eager=True),
    }

    # one untimed warmup (codegen + python workers), shared by all
    run(variants["lazy_s1"]())

    times: dict[str, list[float]] = {k: [] for k in variants}
    stage_walls: list[list[dict]] = []
    for r in range(ROUNDS):
        for name, mk in variants.items():
            spark.catalog.clearCache()
            df = bench._images_cached(spark, N_IMAGES)
            ck = mk()
            t0 = time.monotonic()
            out = run(ck)
            dt = time.monotonic() - t0
            times[name].append(round(dt, 3))
            if name == "eager":
                stage_walls.append(out["metrics"])
            print(f"round {r} {name}: {dt:.2f}s", file=sys.stderr, flush=True)

    best = {k: min(v) for k, v in times.items()}
    best_eager_round = min(range(len(stage_walls)), key=lambda i: times["eager"][i])
    result = {
        "n_images": N_IMAGES,
        "cores": CORES,
        "rounds": ROUNDS,
        "times": times,
        "best": best,
        "images_per_sec_best": {k: round(N_IMAGES / v, 1) for k, v in best.items()},
        "eager_stage_walls_best_round": stage_walls[best_eager_round],
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
