"""Gap-based sessionization (streaming/sessions.py): merge rule,
boundary semantics, and streaming append-mode emission."""

import datetime as dt

from pyspark.sql import types as T

from dbpedia_spotlight_spark.streaming.sessions import sessionize

_SCHEMA = (
    "event_id long, ts timestamp, user_id long, value double"
)


def _ev(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def _us(t: dt.datetime) -> int:
    return int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)


def test_sessionize_merge_and_boundary(spark):
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        # user 1: two events 10 min apart -> one session
        (1, t0, 1, 1.0),
        (2, t0 + dt.timedelta(minutes=10), 1, 2.0),
        # an event EXACTLY 30 min after the last still MERGES (inclusive
        # window end); one second past the gap starts a new session
        (3, t0 + dt.timedelta(minutes=40), 1, 4.0),
        (5, t0 + dt.timedelta(minutes=70, seconds=1), 1, 16.0),
        # user 2: single event
        (4, t0, 2, 8.0),
    ]
    out = {
        (r.user_id, r.session_start_us): r
        for r in sessionize(_ev(spark, rows), gap="30 minutes").collect()
    }
    assert len(out) == 3
    s1 = out[(1, _us(t0))]
    assert s1.n_events == 3 and s1.total_value == 7.0
    # session end = last merged event (10:40) + 30 min gap
    assert s1.session_end_us == _us(t0 + dt.timedelta(minutes=70))
    s2 = out[(1, _us(t0 + dt.timedelta(minutes=70, seconds=1)))]
    assert s2.n_events == 1 and s2.total_value == 16.0
    assert out[(2, _us(t0))].n_events == 1


def test_sessionize_chained_extension(spark):
    # each event within gap of the PREVIOUS one keeps extending: total
    # span can exceed the gap (3 events 20 min apart, gap 30 -> 1 session)
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (i, t0 + dt.timedelta(minutes=20 * i), 1, 1.0) for i in range(3)
    ]
    out = sessionize(_ev(spark, rows), gap="30 minutes").collect()
    assert len(out) == 1
    assert out[0].n_events == 3
    assert out[0].session_start_us == _us(t0)
    assert out[0].session_end_us == _us(t0 + dt.timedelta(minutes=70))


def test_sessionize_streaming_append_emits_closed_sessions(spark, tmp_path):
    """Two availableNow runs: run 2's batch starts with the watermark at
    run 1's max event time minus 10 min, so sessions that ended before
    that are emitted and frozen; the still-open tail session is not."""
    import os

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    os.makedirs(in_dir)
    t = dt.datetime(2024, 1, 1, 10, 0, 0)

    def write(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)

    def run():
        src = spark.readStream.schema(schema).parquet(in_dir)
        q = (
            sessionize(src, gap="30 minutes", watermark="10 minutes")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # run 1: one early session (ends 10:40) + a late lone event at 13:00
    # that will push the watermark to 12:50 for the next run's batch
    write(
        [
            (1, t, 1, 1.0),
            (2, t + dt.timedelta(minutes=10), 1, 2.0),
            (3, t + dt.timedelta(hours=3), 1, 9.0),
        ]
    )
    run()
    # run 2: new data keeps the query progressing; the 10:00 session
    # (end 10:40 < watermark 12:50) must now be emitted exactly once
    write([(4, t + dt.timedelta(hours=6), 1, 5.0)])
    run()
    got = spark.read.parquet(out_dir).collect()
    emitted = {(r.session_start_us, r.n_events, r.total_value) for r in got}
    assert (_us(t), 2, 3.0) in emitted
    # the 16:00 tail session is still open (watermark behind it) — absent
    assert all(r.session_start_us != _us(t + dt.timedelta(hours=6)) for r in got)


def test_stream_stream_join_within(spark, tmp_path):
    """Both sides streaming: inner event-time join emits matched pairs;
    a click outside the 30-min lookback never matches."""
    import os

    from dbpedia_spotlight_spark.streaming.joins import join_within

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_id", T.LongType()),
        ]
    )
    ldir, rdir = str(tmp_path / "l"), str(tmp_path / "r")
    out_dir, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    os.makedirs(ldir), os.makedirs(rdir)
    t = dt.datetime(2024, 1, 1, 12, 0, 0)

    spark.createDataFrame(
        [(1, t, 100), (2, t, 200)], schema
    ).coalesce(1).write.mode("append").parquet(ldir)
    spark.createDataFrame(
        [
            (1, t - dt.timedelta(minutes=10), 101),  # in window
            (1, t - dt.timedelta(minutes=29), 102),  # in window
            (1, t - dt.timedelta(minutes=31), 103),  # too old
            (2, t + dt.timedelta(minutes=1), 201),   # after purchase
        ],
        schema,
    ).coalesce(1).write.mode("append").parquet(rdir)

    q = (
        join_within(
            spark.readStream.schema(schema).parquet(ldir),
            spark.readStream.schema(schema).parquet(rdir),
            within="30 minutes",
        )
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.l_event_id, r.r_event_id)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == {(100, 101), (100, 102)}


def test_burst_windows_flags_spike(spark):
    import datetime

    from dbpedia_spotlight_spark.streaming.sessions import burst_windows

    base = datetime.datetime(2024, 1, 1)
    rows = []
    # alternating 1/2 events per hour (baseline with variance), then a
    # 10-event spike at hour 10
    for h in range(10):
        rows.append(("e", base + datetime.timedelta(hours=h)))
        if h % 2 == 1:
            rows.append(("e", base + datetime.timedelta(hours=h, minutes=30)))
    for i in range(10):
        rows.append(("e", base + datetime.timedelta(hours=10, minutes=i)))
    # second key: flat (zero variance) -> the sd > 0 guard keeps it silent
    for h in range(12):
        rows.append(("quiet", base + datetime.timedelta(hours=h)))
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp")
    got = burst_windows(ev, z=2.0, baseline=24).collect()
    assert len(got) == 1
    r = got[0]
    assert r.event_type == "e" and r.n == 10 and r.zscore > 2.0


def test_event_quantiles_exact_positions(spark):
    import pytest

    from dbpedia_spotlight_spark.streaming.sessions import event_quantiles

    ev = spark.createDataFrame(
        [("a", float(i)) for i in range(1, 101)]
        + [("b", 5.0), ("b", 5.0), ("b", 9.0)],
        "event_type string, value double",
    )
    got = {
        (r.event_type, r.q): r.value
        for r in event_quantiles(ev, [0.5, 0.95, 1.0]).collect()
    }
    assert got[("a", 0.5)] == 50.0 and got[("a", 0.95)] == 95.0
    assert got[("a", 1.0)] == 100.0
    # ties: value at position is tie-order independent
    assert got[("b", 0.5)] == 5.0 and got[("b", 1.0)] == 9.0
    with pytest.raises(ValueError):
        event_quantiles(ev, [0.0])
