"""Temporal operators: as-of join + sessionization planted cases."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from yadf_spark.operators import temporal


def _ts(minute, second=0, micro=0):
    return dt.datetime(2024, 1, 1, 0, minute, second, micro)


def test_asof_join_planted_cases(spark):
    """Backward inclusive match, tie-break at equal right ts, no-match
    null, and per-user isolation — the merge_asof contract."""
    left = spark.createDataFrame(
        [
            (1, 10, _ts(5)),   # after two errors -> latest (ts=4) wins
            (2, 10, _ts(2)),   # equal-ts error matches (inclusive)
            (3, 10, _ts(1)),   # before every error -> null
            (4, 20, _ts(9)),   # tie: two errors at ts=8 -> max id (102) wins
            (5, 30, _ts(9)),   # user with no errors at all -> null
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 10, _ts(2), 1.0),
            (101, 10, _ts(4), 2.0),
            (102, 20, _ts(8), 3.0),
            (103, 20, _ts(8), 4.0),
        ],
        "err_id long, user_id long, ts timestamp, val double",
    )
    out = {
        r["event_id"]: r
        for r in temporal.asof_join(
            left, right, on="ts", by="user_id", value_cols=["err_id", "val"],
            tiebreak_col="err_id",
        ).collect()
    }
    assert out[1]["err_id_right"] == 101 and out[1]["val_right"] == 2.0
    assert out[2]["err_id_right"] == 100  # inclusive at equal ts
    assert out[3]["err_id_right"] is None and out[3]["val_right"] is None
    assert out[4]["err_id_right"] == 103  # max tiebreak among equal ts
    assert out[5]["err_id_right"] is None
    # left columns pass through unchanged
    assert out[1]["user_id"] == 10 and out[1]["ts"] == _ts(5)


def test_asof_join_ignores_null_timestamp_right_rows(spark):
    """A right row with a null `on` has no position on the time axis;
    it must never match (nulls sort first in the ascending window, so
    unfiltered it would act as 'earlier than everything')."""
    left = spark.createDataFrame([(1, 1, _ts(5))], "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(9, 1, None, 7.0)], "err_id long, user_id long, ts timestamp, val double"
    )
    out = temporal.asof_join(left, right, on="ts", by="user_id", value_cols=["err_id", "val"])
    row = out.collect()[0]
    assert row["err_id_right"] is None and row["val_right"] is None


def test_asof_join_single_shuffle_plan(spark):
    """The as-of join must be union + ONE window exchange — no Join
    operator, no per-row Python."""
    left = spark.createDataFrame([(1, 1, _ts(1))], "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(2, 1, _ts(0), 1.0)], "err_id long, user_id long, ts timestamp, val double"
    )
    out = temporal.asof_join(left, right, on="ts", by="user_id", value_cols=["err_id", "val"])
    plan = str(out._jdf.queryExecution().optimizedPlan())
    assert "Join" not in plan
    assert plan.count("Window") == 1
    assert "PythonUDF" not in plan and "MapInPandas" not in plan


def test_interval_join_planted_cases(spark):
    """Inclusive endpoints, multi-bin intervals, per-key isolation, and
    1-microsecond misses — and the plan must be an equi-join, never a
    nested loop."""
    points = spark.createDataFrame(
        [
            (1, 7, _ts(10)),                 # == start -> match
            (2, 7, _ts(40)),                 # == end -> match
            (3, 7, _ts(40, 0, 1)),           # 1 us past end -> miss
            (4, 7, _ts(9, 59, 999_999)),     # 1 us before start -> miss
            (5, 8, _ts(20)),                 # wrong user -> miss
            (6, 7, _ts(25)),                 # interior, crosses a bin boundary
        ],
        "point_id long, user_id long, pts timestamp",
    )
    intervals = spark.createDataFrame(
        [(100, 7, _ts(10), _ts(40))],  # 30-min interval spanning two 900s bins
        "iv_id long, user_id long, ivs timestamp, ive timestamp",
    )
    out = temporal.interval_join(
        points, intervals, point_ts="pts", start_ts="ivs", end_ts="ive",
        by="user_id", bin_seconds=900,
    )
    assert sorted(r["point_id"] for r in out.collect()) == [1, 2, 6]
    assert len(out.columns) == 6  # all point + interval columns survive
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_sessionize_gap_boundaries(spark):
    """Strictly-greater-than-gap starts a new session; exactly-gap does
    not; users are independent; ids are 1-based per user."""
    rows = [
        (1, 7, _ts(0)),
        (2, 7, _ts(30)),          # gap == 1800s exactly -> same session
        (3, 7, _ts(30, 0, 1)),    # 1 microsecond later -> same session
        (4, 7, _ts(0) + dt.timedelta(seconds=3601)),  # > gap from #3? compute below
        (5, 8, _ts(59)),          # other user: own session numbering
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = {
        r["event_id"]: r
        for r in temporal.sessionize(df, "ts", "user_id", 1_800, id_col="event_id").collect()
    }
    assert out[1]["session_idx"] == 1
    assert out[2]["session_idx"] == 1  # 1800.000000s gap: not > gap
    assert out[3]["session_idx"] == 1  # 0.000001s gap
    # event 4 is 3601s after t0 = 1800.999999s after event 3 -> > gap
    assert out[4]["session_idx"] == 2
    assert out[4]["session_id"] == "7-2"
    assert out[5]["session_idx"] == 1 and out[5]["session_id"] == "8-1"


def test_sessionize_tie_determinism(spark):
    """Two events with identical (user, ts): the id_col tie-break makes
    ordering — and therefore session assignment — deterministic."""
    base = _ts(10)
    far = base + dt.timedelta(hours=2)
    df = spark.createDataFrame(
        [(2, 1, far), (1, 1, far), (0, 1, base)],
        "event_id long, user_id long, ts timestamp",
    )
    out = temporal.sessionize(df, "ts", "user_id", 1_800, id_col="event_id")
    got = {r["event_id"]: r["session_idx"] for r in out.collect()}
    assert got == {0: 1, 1: 2, 2: 2}


def test_funnel_ordered_semantics(spark):
    """Only strictly-after completions count: a purchase BEFORE the
    first view never completes the funnel; stalls leave nulls."""
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        # u1 completes in order
        (1, t0, "view"), (1, t0 + dt.timedelta(minutes=1), "click"),
        (1, t0 + dt.timedelta(minutes=2), "purchase"),
        # u2: purchase happens BEFORE the view -> depth 2 only
        (2, t0, "purchase"), (2, t0 + dt.timedelta(minutes=1), "view"),
        (2, t0 + dt.timedelta(minutes=2), "click"),
        # u3: view only
        (3, t0, "view"),
        # u4: never views -> absent
        (4, t0, "click"), (4, t0 + dt.timedelta(minutes=1), "purchase"),
        # u5: click at the EXACT view timestamp does not count (strict)
        (5, t0, "view"), (5, t0, "click"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {
        r.user: r
        for r in temporal.funnel(
            df, "user_id", "ts", "event_type", ["view", "click", "purchase"]
        ).collect()
    }
    assert set(out) == {1, 2, 3, 5}
    assert out[1].depth == 3 and out[1].ts_3 == t0 + dt.timedelta(minutes=2)
    assert out[2].depth == 2 and out[2].ts_3 is None
    assert out[3].depth == 1 and out[3].ts_2 is None
    assert out[5].depth == 1  # strict ordering: simultaneous click ignored


def test_funnel_requires_two_steps(spark):
    import pytest

    df = spark.createDataFrame([(1, None, "view")], "user_id long, ts timestamp, event_type string")
    with pytest.raises(ValueError):
        temporal.funnel(df, "user_id", "ts", "event_type", ["view"])
