"""Corpus snapshot diffing — what changed between two versions.

A training-data pipeline re-crawls and re-ingests continuously; the
operational question is "what did this refresh add, remove, or rewrite",
both for audit and to drive INCREMENTAL downstream work (only re-embed
the changed rows, only re-run near-dup against the added slice — the
same delta the streaming band index consumes).

Reference analog: the dup-group diff a ``yadf`` user runs between two
scans of the same tree (SURVEY §2 U1's keep-oldest cleaner consumes
exactly this added/changed view).

Scale shape: each side collapses to ``(id, fingerprint)`` map-side —
the payload never crosses an exchange — then one full-outer hash join
on the id. At 10^12 rows that is two narrow ~24 B/row shuffles; with
both snapshots bucketed by id (``sinks/bucketed.py``) it is
zero-exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def _fingerprint(df: DataFrame, id_col: str, cols: list[str], algo: str) -> DataFrame:
    # Injective row encoding: each column slot becomes "<len>:<value>"
    # (null -> "n"), then plain concat. Length-prefixing makes the
    # encoding parseable without any separator, so no value content —
    # including control characters a crawled corpus absolutely contains
    # — can shift bytes between slots; a separator-join scheme collides
    # whenever a value embeds the separator. Null is distinct from
    # every real slot (those always start with a digit), and distinct
    # from "" (encoded "0:").
    def enc(c: str) -> F.Column:
        s = F.col(c).cast("string")
        return F.coalesce(F.concat(F.length(s).cast("string"), F.lit(":"), s), F.lit("n"))

    joined = F.concat(*[enc(c) for c in cols])
    fp = F.md5(joined) if algo == "md5" else F.xxhash64(joined).cast("string")
    return df.select(F.col(id_col).alias("id"), fp.alias("fp"))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    cols: list[str],
    algo: str = "xxhash64",
) -> DataFrame:
    """Rows that differ between snapshots: ``(id, status)`` with status
    in {added, removed, changed}; unchanged rows are dropped.

    ``cols`` lists the content columns the fingerprint covers (ids are
    compared by key, not hashed). ``algo="md5"`` is the oracle-portable
    mode (DuckDB computes the identical fingerprint); the default
    ``xxhash64`` stays JVM-side and 8 bytes wide.
    """
    o = _fingerprint(old, id_col, cols, algo).withColumnRenamed("fp", "fp_old")
    n = _fingerprint(new, id_col, cols, algo).withColumnRenamed("fp", "fp_new")
    j = o.join(n, "id", "full_outer")
    status = (
        F.when(F.col("fp_old").isNull(), F.lit("added"))
        .when(F.col("fp_new").isNull(), F.lit("removed"))
        .when(F.col("fp_old") != F.col("fp_new"), F.lit("changed"))
    )
    return j.select("id", status.alias("status")).where(F.col("status").isNotNull())
