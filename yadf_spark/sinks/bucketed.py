"""Bucketed corpus tables — co-located joins with no shuffle.

Every verification / payload-re-join stage keys on the corpus id
(``operators/verify.py``, ``operators/similarity.py``); at 100 TB each
such join shuffles the corpus unless the data is already hash-distributed
on that key. Spark's bucketed tables persist exactly that distribution:
``bucketBy(N, id)`` + ``sortBy(id)`` writes each bucket pre-hashed and
pre-sorted, so a join between two tables bucketed the same way needs
neither an Exchange nor (with sortBy) a Sort — the scan itself satisfies
the join's distribution requirement. This is the Spark-native analog of
the Iceberg ``bucket(N, id)`` partition transform the north rule's table
layout would use (the Iceberg runtime jar is absent in this container;
the table-format seam stays isolated here like the parquet stand-in in
``formats.write_cluster_assignments``).

Operational notes for the 1000-executor case:

* pick ``num_buckets`` near the job's target parallelism (buckets are
  the max useful join parallelism without AQE splitting);
* bucketed tables require ``saveAsTable`` (a metastore entry) — plain
  ``parquet(path)`` silently drops bucket metadata;
* both sides of a co-located join must agree on bucket count or one
  side gets coalesced/shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str = "image_id",
    num_buckets: int = 64,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a parquet-backed bucketed table."""
    writer = (
        df.write.format("parquet").mode("overwrite").bucketBy(num_buckets, bucket_col)
    )
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (bucket metadata rides along — joins on the
    bucket column skip the exchange)."""
    return spark.table(table)
