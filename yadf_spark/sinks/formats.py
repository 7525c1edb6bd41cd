"""Output sinks — the reference's five formats plus the cluster
assignment table (reference: Format::display dispatch src/main.rs:105-132,
fdupes/machine renderers src/bag/display.rs:5-47, JSON serializers
src/bag/serialize.rs:4-27, csv/ldjson src/main.rs:236-266).

Each renderer maps a *groups* DataFrame ``(group_key, members, n)`` —
sorted by key, the BTreeMap determinism property — to a DataFrame of
output lines (distributed write via ``df.write.text``) and, for tests
and small outputs, a driver-side string.

The cluster-assignment table sink is the north_rule's required output:
``(image_id, cluster_id)`` written as parquet, partitionable and
overwrite-atomic. (An Iceberg ``writeTo(...).createOrReplace()`` needs
the runtime jar, absent in this container — the parquet writer is the
drop-in stand-in and the write API is isolated here.)
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FORMATS = ("fdupes", "machine", "json", "json-pretty", "ld-json", "csv")


def _ordered(groups: DataFrame) -> DataFrame:
    return groups.orderBy("group_key")


def fdupes_lines(groups: DataFrame) -> DataFrame:
    """Paths newline-separated, blank line between groups (golden:
    src/bag/display.rs:77-88). Rendered as one multi-line string per
    group; join with a blank line driver-side or via write.text."""
    return _ordered(groups).select(F.array_join("members", "\n").alias("value"))


def _debug_quote(m):
    """Rust ``{:?}``-style string quoting (reference: src/bag/display.rs:28-47):
    backslashes, double quotes, and \\n/\\r/\\t are escaped inside the
    wrapping quotes, so a path containing ``"`` round-trips instead of
    producing a malformed line. (Other control chars — which Rust would
    render as ``\\u{..}`` — are left as-is; they are valid text output.)"""
    e = F.regexp_replace(m, r"\\", r"\\\\")
    e = F.regexp_replace(e, '"', r'\\"')
    e = F.regexp_replace(e, "\n", r"\\n")
    e = F.regexp_replace(e, "\r", r"\\r")
    e = F.regexp_replace(e, "\t", r"\\t")
    return F.concat(F.lit('"'), e, F.lit('"'))


def machine_lines(groups: DataFrame) -> DataFrame:
    """One group per line, quoted paths space-separated (golden:
    src/bag/display.rs:67-75)."""
    quoted = F.transform("members", _debug_quote)
    return _ordered(groups).select(F.array_join(quoted, " ").alias("value"))


def ldjson_lines(groups: DataFrame) -> DataFrame:
    """One JSON array (group) per line (src/main.rs:253-266)."""
    return _ordered(groups).select(F.to_json("members").alias("value"))


def csv_lines(groups: DataFrame, header: bool = True) -> DataFrame:
    """Header ``count,files``; flexible rows ``n,path,path,...``
    (src/main.rs:236-250)."""
    body = _ordered(groups).select(
        F.concat_ws(",", F.col("n").cast("string"), F.array_join("members", ",")).alias(
            "value"
        )
    )
    if not header:
        return body
    spark = groups.sparkSession
    head = spark.createDataFrame([("count,files",)], "value string")
    return head.unionByName(body)


def render(groups: DataFrame, fmt: str) -> str:
    """Driver-side full render (small outputs / golden tests)."""
    if fmt == "fdupes":
        return "\n\n".join(r["value"] for r in fdupes_lines(groups).collect())
    if fmt == "machine":
        return "\n".join(r["value"] for r in machine_lines(groups).collect())
    if fmt in ("json", "json-pretty"):
        data = [list(r["members"]) for r in _ordered(groups).collect()]
        return json.dumps(data, indent=2 if fmt == "json-pretty" else None)
    if fmt == "ld-json":
        return "\n".join(r["value"] for r in ldjson_lines(groups).collect())
    if fmt == "csv":
        return "\n".join(r["value"] for r in csv_lines(groups).collect())
    raise ValueError(f"unknown format {fmt!r}; expected one of {FORMATS}")


def write_lines(lines: DataFrame, path: str) -> None:
    lines.coalesce(1).write.mode("overwrite").text(path)


def write_cluster_assignments(clusters: DataFrame, path: str, partitions: int | None = None) -> None:
    """The K6 sink: full id -> cluster assignment as parquet."""
    out = clusters
    if partitions:
        out = out.repartition(partitions, "cluster_id")
    out.write.mode("overwrite").parquet(path)
