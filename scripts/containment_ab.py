"""Interleaved A/B: word-containment probe join vs the symmetric join
(VERDICT r2 item 5) on the sf0.1 documents table, one session.

Usage: python scripts/containment_ab.py [rounds] [sf_dir] [cores]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
CORES = int(sys.argv[3]) if len(sys.argv) > 3 else 12


def main() -> None:
    from pyspark.sql import functions as F

    from yadf_spark.operators import containment
    from yadf_spark.session import restart_spark

    spark = restart_spark(CORES, app_name="containment-ab")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    base = docs.select(F.col("doc_id").alias("id"), F.col("text").alias("text"))

    def run(symmetric: bool) -> int:
        cand = containment._word_candidates(base, 3, 100, symmetric=symmetric)
        ta = base.select(F.col("id").alias("id_a"), F.col("text").alias("text_a"))
        tb = base.select(F.col("id").alias("id_b"), F.col("text").alias("text_b"))
        out = (
            cand.join(ta, "id_a").join(tb, "id_b")
            .filter(F.expr("contains(text_b, text_a)"))
            .select("id_a", "id_b")
        )
        out.write.format("noop").mode("overwrite").save()
        return 0

    run(False)  # warmup (codegen, workers)
    times = {"probe": [], "symmetric": []}
    for r in range(ROUNDS):
        for name, sym in (("probe", False), ("symmetric", True)):
            t0 = time.monotonic()
            run(sym)
            times[name].append(round(time.monotonic() - t0, 3))
            print(f"round {r} {name}: {times[name][-1]}s", file=sys.stderr, flush=True)

    n_probe = containment._word_candidates(base, 3, 100).count()
    n_sym = containment._word_candidates(base, 3, 100, symmetric=True).count()
    print(
        json.dumps(
            {
                "sf": SF_DIR,
                "times": times,
                "best": {k: min(v) for k, v in times.items()},
                "candidates": {"probe": n_probe, "symmetric": n_sym},
            }
        )
    )


if __name__ == "__main__":
    main()
