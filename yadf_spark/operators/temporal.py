"""Temporal operators — as-of join, point-in-interval range join, and
gap sessionization.

None exist in the reference (strictly batch dup-scan, SURVEY.md §2.8)
and Spark natively plans none of them well (no merge_asof; BETWEEN
theta-joins fall back to nested loops); all three are bread-and-butter
operations for aligning training-data streams.

Scale posture: each operator is ONE hash shuffle on the ``by`` key —
the window operators (asof_join, sessionize) follow it with an
in-partition sort and stay entirely in JVM window expressions (no join,
no Python); interval_join turns the range predicate into an equi-join
on epoch buckets. Skewed ``by`` keys (a viral user) concentrate one
partition's window sort — AQE's skew handling does not split windows,
so pathological keys should be pre-filtered or salted by the caller
(the equi-join in interval_join DOES get AQE skew splitting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Backward as-of join: for every left row, attach ``value_cols``
    from the right row with the greatest ``on`` <= the left row's ``on``
    within the same ``by`` group (inclusive match at equal ``on``); null
    when no prior right row exists — pandas ``merge_asof`` semantics,
    distributed.

    NOT implemented as a join: both sides are tagged and unioned, then a
    single window per ``by`` group carries the last-seen right-row
    struct forward (``last(..., ignorenulls=True)`` over rows between
    unbounded preceding and current). One shuffle, no per-row Python,
    no O(left x right) candidate blowup within a group.

    Determinism under ties: right rows sharing (by, on) are ordered by
    ``tiebreak_col`` ascending, so the carried row is the one with the
    GREATEST tiebreak value — replayable in plain SQL as a
    row_number() pick ordered by (on DESC, tiebreak DESC)."""
    tiebreak = tiebreak_col or value_cols[0]
    lcols = left.columns
    payload = F.struct(*[F.col(c) for c in value_cols])
    # a right row with a null timestamp has no position on the time
    # axis; nulls sort FIRST in the ascending window order, so left
    # unfiltered it would act as "earlier than everything" and match
    # left rows that have no genuine prior right row
    right = right.filter(F.col(on).isNotNull())
    r = right.select(
        F.col(by).alias(by),
        F.col(on).alias(on),
        F.col(tiebreak).alias("_tb"),
        payload.alias("_rv"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in lcols],
    )
    l = left.select(
        F.col(by).alias(by),
        F.col(on).alias(on),
        F.lit(None).cast(right.schema[tiebreak].dataType).alias("_tb"),
        F.lit(None).cast(r.schema["_rv"].dataType).alias("_rv"),
        F.lit(1).alias("_is_left"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
    )
    # right rows sort BEFORE left rows at equal `on` (inclusive match);
    # among equal-ts right rows the last in order is the max tiebreak
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("_is_left").asc(), F.col("_tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l.unionByName(r).withColumn("_match", F.last("_rv", ignorenulls=True).over(w))
    return carried.filter(F.col("_is_left") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in lcols],
        *[F.col("_match").getField(c).alias(f"{c}_right") for c in value_cols],
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    by: str,
    bin_seconds: int = 1_800,
) -> DataFrame:
    """Point-in-interval equi-binned range join: every (point, interval)
    pair in the same ``by`` group with ``start <= point_ts <= end``.

    A naive ``ON p.ts BETWEEN i.start AND i.end`` theta-join falls back
    to a broadcast-nested-loop in Spark (O(|points| x |intervals|) per
    group). Instead both sides bin to ``bin_seconds`` epoch buckets:
    each interval EXPLODES into the bins it covers, the join is a plain
    equi-join on (by, bin) — one hash shuffle, codegen-friendly — and
    the exact containment predicate filters bin-mates. Correctness does
    not depend on ``bin_seconds``; cost does: pick it near the typical
    interval length so intervals cover O(1) bins.

    Output: all columns of ``points`` + all columns of ``intervals``
    (callers project/rename; the two frames must not share column names
    other than ``by``)."""
    p_bin = F.floor(F.unix_micros(F.col(point_ts).cast("timestamp")) / (bin_seconds * 1_000_000))
    s_bin = F.floor(F.unix_micros(F.col(start_ts).cast("timestamp")) / (bin_seconds * 1_000_000))
    e_bin = F.floor(F.unix_micros(F.col(end_ts).cast("timestamp")) / (bin_seconds * 1_000_000))
    p = points.withColumn("_bin", p_bin)
    i = intervals.withColumn("_bin", F.explode(F.sequence(s_bin, e_bin)))
    joined = p.join(i, [by, "_bin"]).filter(
        (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) <= F.col(end_ts))
    )
    return joined.drop("_bin")


def sessionize(
    df: DataFrame,
    ts_col: str,
    by: str,
    gap_seconds: int,
    id_col: str | None = None,
) -> DataFrame:
    """Gap-based sessionization: within each ``by`` group (ordered by
    ``ts_col``, ties broken by ``id_col``), a new session starts when
    the gap to the previous event exceeds ``gap_seconds``. Adds
    ``session_idx`` (1-based per group) and ``session_id``
    (``"{by}-{session_idx}"``). Microsecond-exact gap arithmetic
    (``unix_micros``) so an oracle replays it bit-for-bit.

    One shuffle (the ``by`` partition), two stacked window expressions
    (lag + running sum) — the batch analog of Structured Streaming's
    ``session_window`` aggregation, but row-preserving."""
    order = [F.col(ts_col).asc()] + ([F.col(id_col).asc()] if id_col else [])
    w = Window.partitionBy(by).orderBy(*order)
    gap_us = int(gap_seconds) * 1_000_000
    # parquet timestamps read as TIMESTAMP_NTZ, which unix_micros rejects;
    # the session timezone is pinned to UTC (session.py) so the cast is
    # value-preserving — and only gap DIFFERENCES matter here anyway
    micros = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev = F.lag(micros).over(w)
    new_session = F.when(prev.isNull() | ((micros - prev) > F.lit(gap_us)), 1).otherwise(0)
    out = df.withColumn("session_idx", F.sum(new_session).over(w))
    return out.withColumn(
        "session_id", F.concat_ws("-", F.col(by).cast("string"), F.col("session_idx"))
    )


def funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Sequential funnel completion per user —
    ``(user, ts_1..ts_n, depth)``: ``ts_i`` is the FIRST time step i
    completed STRICTLY AFTER step i-1's completion time (the ordered
    semantics — a purchase logged before the user's first view does not
    count), null once the user stalls; ``depth`` counts completed
    steps. Users who never perform step 1 are absent (the funnel's
    population is step-1 reachers).

    Scale shape: step 1 is one partial-agg min per user; each later
    step is one join + one conditional-min aggregation, ALL keyed on
    the user column — the same hash partitioning end to end, so AQE
    reuses the exchange layout and the per-step state is one row per
    surviving user (never the event history). n_steps is small and
    fixed; each round re-scans the events filtered (and, on a
    type-partitioned table, partition-pruned) to ITS step's type —
    n_steps column-pruned scans total, each touching only that step's
    rows; cache the projected event frame when the source is not
    partitioned by type."""
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    base = df.select(
        F.col(user_col).alias("user"),
        F.col(ts_col).alias("_t"),
        F.col(type_col).alias("_y"),
    )
    cur = (
        base.filter(F.col("_y") == steps[0])
        .groupBy("user")
        .agg(F.min("_t").alias("ts_1"))
    )
    for i, st in enumerate(steps[1:], start=2):
        ev = base.filter(F.col("_y") == st).select("user", "_t")
        prev_cols = [c for c in cur.columns if c != "user"]
        cur = (
            cur.join(ev, "user", "left")
            .groupBy("user")
            .agg(
                *[F.first(c).alias(c) for c in prev_cols],
                F.min(
                    F.when(F.col("_t") > F.col(f"ts_{i - 1}"), F.col("_t"))
                ).alias(f"ts_{i}"),
            )
        )
    depth = sum(
        (F.col(f"ts_{i}").isNotNull().cast("int") for i in range(2, len(steps) + 1)),
        F.lit(1),
    )
    return cur.withColumn("depth", depth)
