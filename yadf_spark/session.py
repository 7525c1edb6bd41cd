"""SparkSession factory tuned for the dedup workload.

Local-mode defaults mirror what we'd set on a real cluster:

* ``spark.sql.shuffle.partitions`` sized to cores (not the 200 default) —
  on a 1000-executor cluster this becomes ~2-3x total cores, or is left
  to AQE coalescing;
* AQE on (runtime partition coalescing + skew-join splitting);
* Arrow on (every pandas UDF crosses the JVM/Python boundary in
  columnar batches);
* UTC session timezone so results compare bit-for-bit against the
  DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

#: repo root (parent of the yadf_spark package) — exported to executor
#: Python workers so pandas UDFs can unpickle module references no matter
#: where the driver script lives. On a real cluster the equivalent is
#: ``spark-submit --py-files yadf_spark.zip``.
_PKG_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _export_pythonpath() -> None:
    parts = os.environ.get("PYTHONPATH", "").split(os.pathsep)
    if _PKG_ROOT not in parts:
        os.environ["PYTHONPATH"] = os.pathsep.join(p for p in [_PKG_ROOT, *parts] if p)


def get_spark(
    app_name: str = "yadf-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str = "48g",
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) a SparkSession with dedup-workload defaults.

    ``cores`` controls local-mode parallelism (``local[cores]``); the
    bench harness uses this to measure scaling efficiency between two
    parallelism levels on identical input.
    """
    cores = cores or DEFAULT_CPUS
    _export_pythonpath()
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.driver.memory", driver_memory)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.executorEnv.PYTHONPATH", os.environ.get("PYTHONPATH", _PKG_ROOT))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def restart_spark(cores: int, **kwargs) -> SparkSession:
    """Stop any active session and start a fresh one at a new parallelism
    level (used by the scaling-efficiency bench)."""
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    # Clear the cached builder state so the new master takes effect.
    SparkSession.builder._options = {}
    return get_spark(cores=cores, **kwargs)
