"""A/B: does pinning spark.sql.shuffle.partitions to the SAME value at
both scaling levels change the measured efficiency?

The session default sizes shuffle partitions to the core count, so the
3-core level runs the whole reduce side in 3 fat partitions while the
12-core level runs 12 — the levels measure different job decompositions,
not just different parallelism. A real N -> 4N executor scaling run
keeps the job config fixed and varies ONLY the executor count. This
script measures the MinHash+LSH candidate job at (cores, partitions) in
{3, 12} x {cores, 24} plus per-stage executor metrics (cpuTime, gcTime,
runTime) scraped from the UI REST API, to separate three explanations
of sub-0.8 efficiency: task-decomposition bias, GC pressure, and
per-core throughput loss under concurrency (bandwidth/steal).

Usage: python scripts/scaling_partitions_ab.py [n_images] [repeats]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
REPEATS = int(sys.argv[2]) if len(sys.argv) > 2 else 2


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def _ui_stage_totals(port: int = 4040) -> dict:
    base = f"http://localhost:{port}/api/v1/applications"
    apps = json.load(urllib.request.urlopen(base, timeout=5))
    app_id = apps[0]["id"]
    stages = json.load(urllib.request.urlopen(f"{base}/{app_id}/stages?status=complete", timeout=5))
    tot = {"executorRunTime": 0, "executorCpuTime": 0, "jvmGcTime": 0}
    for st in stages:
        tot["executorRunTime"] += st.get("executorRunTime", 0)
        tot["executorCpuTime"] += st.get("executorCpuTime", 0) // 1_000_000  # ns -> ms
        tot["jvmGcTime"] += st.get("jvmGcTime", 0)
    return tot


def run_level(cores: int, parts: int) -> dict:
    import bench
    from yadf_spark.config import NearDupConfig
    from yadf_spark.operators import minhash
    from yadf_spark.operators.pipeline import candidate_buckets
    from yadf_spark.session import restart_spark

    cfg = NearDupConfig()
    spark = restart_spark(
        cores,
        app_name=f"parts-ab-{cores}-{parts}",
        shuffle_partitions=parts,
        extra_conf={"spark.ui.enabled": "true"},
    )
    bench._warm_python_workers(spark)
    df = bench._images_cached(spark, N)

    def run():
        cand = minhash.candidate_pairs_from_buckets(
            candidate_buckets(df, cfg), cfg.lsh.salt_bucket_above, cfg.lsh.max_bucket
        )
        _force(cand)

    run()  # warm
    m0 = _ui_stage_totals()
    walls = []
    for _ in range(REPEATS):
        t0 = time.monotonic()
        run()
        walls.append(round(time.monotonic() - t0, 2))
    m1 = _ui_stage_totals()
    metrics = {k: m1[k] - m0[k] for k in m0}
    spark.stop()
    return {"walls": walls, "best": min(walls), "metrics": metrics}


def main():
    combos = [(3, 3), (3, 24), (12, 12), (12, 24)]
    out = {}
    for cores, parts in combos:
        out[(cores, parts)] = run_level(cores, parts)
        r = out[(cores, parts)]
        print(
            f"cores={cores:2d} parts={parts:2d} best={r['best']:6.2f}s walls={r['walls']} "
            f"run={r['metrics']['executorRunTime']/1000:.1f}s "
            f"cpu={r['metrics']['executorCpuTime']/1000:.1f}s "
            f"gc={r['metrics']['jvmGcTime']/1000:.1f}s",
            flush=True,
        )
    for parts_label, small_key, large_key in [("cores", (3, 3), (12, 12)), ("=24", (3, 24), (12, 24))]:
        b3, b12 = out[small_key]["best"], out[large_key]["best"]
        print(f"parts={parts_label}: eff(3->12) = {(b3 * 3) / (b12 * 12):.3f} ({b3:.2f}s -> {b12:.2f}s)")


if __name__ == "__main__":
    main()
