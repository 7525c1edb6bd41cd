"""Stage checkpoint / resume manager.

The north_rule requires the job to "resume from per-partition
checkpoints with lineage + per-stage metrics". Spark's parquet writer is
already per-partition atomic (task outputs commit individually, the job
commit publishes a ``_SUCCESS`` marker), so a stage checkpoint is a
parquet dataset plus a manifest recording the stage's config
fingerprint, row count, and wall time. On restart:

* manifest present + fingerprint matches  -> read the parquet, skip the
  compute (lineage is truncated to a fresh scan — the iterative-job
  equivalent of ``localCheckpoint``);
* fingerprint differs (config changed)    -> recompute and overwrite;
* no manifest (crashed mid-write)         -> recompute; the partial
  directory is overwritten atomically by mode("overwrite").
"""

from __future__ import annotations

import hashlib
import json
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


def fingerprint(obj) -> str:
    """Stable fingerprint of a config-ish object (dataclass/dict/str)."""
    try:
        import dataclasses

        if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
            obj = dataclasses.asdict(obj)
    except Exception:
        pass
    blob = json.dumps(obj, sort_keys=True, default=str).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


@dataclass
class StageRun:
    name: str
    rows: int
    seconds: float
    resumed: bool


@dataclass
class Checkpointer:
    """``stage(name, config, fn)`` runs ``fn`` or resumes its parquet
    checkpoint; ``workdir=None`` disables checkpointing entirely (pure
    pass-through) so pipelines run identically with or without it.

    ``eager=False`` (only meaningful with ``workdir=None``) defers all
    materialization to the caller's final action: stages are persisted
    lazily and per-stage row counts come from ``Observation`` nodes
    riding the plan instead of one count job per stage. Each count job
    costs a driver-side scheduling round trip, and with five stages the
    round trips were a measurable slice of the whole pipeline at high
    core counts — serial time no amount of executors removes. Eager
    remains the default because lazily-persisted stages that feed
    multiple concurrent AQE query stages can be recomputed before the
    cache populates (observed: the MinHash UDF running 4x); the
    near-dup pipeline's DAG is single-consumer per stage, so its bench
    path opts in to lazy."""

    spark: SparkSession
    workdir: str | None = None
    eager: bool = True
    runs: list[StageRun] = field(default_factory=list)
    _observations: list = field(default_factory=list)

    def stage(self, name: str, config, fn: Callable[[], DataFrame]) -> DataFrame:
        t0 = time.monotonic()
        if self.workdir is None and not self.eager:
            from pyspark.sql import Observation
            from pyspark.sql import functions as F

            obs = Observation(f"stage:{name}")
            df = fn().observe(obs, F.count(F.lit(1)).alias("rows")).persist()
            self._observations.append((name, obs))
            return df
        if self.workdir is None:
            # no durable checkpoint requested: persist AND materialize.
            # The eager count yields true per-stage row counts + wall
            # time (the reference's per-stage metrics, src/lib.rs:120-139)
            # and guards lazily-cached stages against concurrent AQE
            # recompute (see class docstring).
            df = fn().persist()
            rows = df.count()
            self.runs.append(StageRun(name, rows, time.monotonic() - t0, False))
            return df

        stage_dir = Path(self.workdir) / name
        data_dir = stage_dir / "data"
        manifest_path = stage_dir / "manifest.json"
        fp = fingerprint(config)

        if manifest_path.exists():
            manifest = json.loads(manifest_path.read_text())
            if manifest.get("fingerprint") == fp:
                df = self.spark.read.parquet(str(data_dir))
                self.runs.append(
                    StageRun(name, manifest.get("rows", -1), time.monotonic() - t0, True)
                )
                return df

        df = fn()
        df.write.mode("overwrite").parquet(str(data_dir))
        out = self.spark.read.parquet(str(data_dir))
        rows = out.count()
        stage_dir.mkdir(parents=True, exist_ok=True)
        manifest_path.write_text(
            json.dumps(
                {
                    "stage": name,
                    "fingerprint": fp,
                    "rows": rows,
                    "completed_at": time.time(),
                },
                indent=2,
            )
        )
        self.runs.append(StageRun(name, rows, time.monotonic() - t0, False))
        return out

    def metrics(self) -> list[dict]:
        """Per-stage metrics. In lazy mode, call only AFTER the final
        action — ``Observation.get`` blocks until its node has executed;
        wall seconds are not attributable per stage (one fused job) and
        are reported as -1."""
        out = [
            {"stage": r.name, "rows": r.rows, "seconds": round(r.seconds, 3), "resumed": r.resumed}
            for r in self.runs
        ]
        for name, obs in self._observations:
            out.append(
                {"stage": name, "rows": obs.get["rows"], "seconds": -1.0, "resumed": False}
            )
        return out
