"""Interleaved A/B for the simhash_docs bench number (VERDICT r3
"what's wrong" 1: r2 1.33 s -> r3 3.07 s looked like a 2.3x
regression). One session, round-robin, best-of-N — the sandbox's
degraded-host windows make anything else meaningless.

Variants:
  md5_32   - the oracle-portable headline as benched in r2/r3
  xxhash64 - the production-default token hash (JVM xxhash64)

Round-4 result (local[12], sf0.1, 5 rounds): best 1.444 s (md5_32) vs
1.427 s (xxhash64) — identical within noise, both matching the r2
figure; the r3 sample rode a degraded window. See BASELINE.md round 4.

Usage: python scripts/simhash_ab.py [cores] [rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CORES = int(sys.argv[1]) if len(sys.argv) > 1 else 12
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    from yadf_spark.operators import simhash
    from yadf_spark.session import get_spark

    spark = get_spark(cores=CORES, driver_memory="16g", app_name="simhash-ab")
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    def run(algo: str) -> float:
        df = (
            simhash.add_simhash(d, text_col="text", algo=algo)
            .select("doc_id", "simhash")
            .orderBy("doc_id")
        )
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        return round(time.monotonic() - t0, 3)

    # untimed warmups (codegen + python workers + parquet footers)
    run("md5_32")
    run("xxhash64")
    times: dict[str, list[float]] = {"md5_32": [], "xxhash64": []}
    for _ in range(ROUNDS):
        times["md5_32"].append(run("md5_32"))
        times["xxhash64"].append(run("xxhash64"))
    print(
        json.dumps(
            {
                "rounds": times,
                "best": {k: min(v) for k, v in times.items()},
                "median": {k: sorted(v)[len(v) // 2] for k, v in times.items()},
            }
        )
    )


if __name__ == "__main__":
    main()
