"""Funnel/retention/sequence analytics — semantic unit checks on a
hand-built event log plus the plan invariant backing the module's
single-shuffle claim."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from kafka_clickhouse_implementation_spark.operators.funnels import (
    FUNNEL_WINDOW_US,
    funnel_levels,
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, T0 + dt.timedelta(minutes=m), u, t, 0.0, "{}") for i, (u, m, t) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )


def test_funnel_levels_semantics(spark):
    ev = _events(
        spark,
        [
            # user 1: full chain within window -> level 3
            (1, 0, "view"), (1, 10, "click"), (1, 20, "purchase"),
            # user 2: view then click, purchase BEFORE the click -> level 2
            (2, 0, "view"), (2, 5, "purchase"), (2, 10, "click"),
            # user 3: view only -> level 1
            (3, 0, "view"), (3, 10, "error"),
            # user 4: no view at all -> level 0
            (4, 0, "click"), (4, 10, "purchase"),
            # user 5: chain completes but outside the 6h window -> level 2
            (5, 0, "view"), (5, 10, "click"), (5, 6 * 60 + 30, "purchase"),
        ],
    )
    got = {r.user_id: r.funnel_level for r in funnel_levels(ev).collect()}
    assert got == {1: 3, 2: 2, 3: 1, 4: 0, 5: 2}


def test_funnel_level_window_boundary(spark):
    # purchase at exactly t1 + window counts (<=, matching the oracle)
    ev = _events(spark, [(1, 0, "view"), (1, 10, "click"), (1, 360, "purchase")])
    assert FUNNEL_WINDOW_US == 360 * 60 * 1_000_000
    got = funnel_levels(ev).collect()
    assert got[0].funnel_level == 3


def test_funnel_plans_one_shuffle_for_chained_windows(spark):
    """The three chained window-mins share one user_id partitioning:
    exactly one Exchange before the per-user aggregation."""
    ev = _events(spark, [(1, 0, "view")])
    plan = funnel_levels(ev)._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    # one for the window stage; the groupBy("user_id") after it reuses
    # the same partitioning, so no second wide exchange
    assert n_exchanges == 1, plan


def test_sequence_match_order_determinism(spark):
    from kafka_clickhouse_implementation_spark.operators.funnels import user_event_seq

    # ties on ts broken by event_id: two events at the same minute
    ev = _events(spark, [(1, 0, "view"), (1, 0, "click"), (1, 5, "purchase")])
    assert user_event_seq(ev).collect()[0].seq == "vcp"


def _ordered_wire_chunks(ev, tmp_path, n_chunks=4):
    """ts-ordered wire files -> n micro-batches (mtimes forced
    increasing so the file source processes them in time order)."""
    import json
    import os

    wire = tmp_path / "wire"
    wire.mkdir(exist_ok=True)
    rows_sorted = (
        ev.select("user_id", "event_id", "event_type", "ts")
        .orderBy("ts", "event_id")
        .collect()
    )
    chunk = (len(rows_sorted) + n_chunks - 1) // n_chunks
    for i in range(n_chunks):
        path = wire / f"part-{i}.json"
        with open(path, "w") as f:
            for r in rows_sorted[i * chunk : (i + 1) * chunk]:
                f.write(
                    json.dumps(
                        {
                            "user_id": r.user_id,
                            "event_id": r.event_id,
                            "event_type": r.event_type,
                            "ts": r.ts.isoformat(sep=" "),
                        }
                    )
                    + "\n"
                )
        os.utime(path, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))
    return str(wire)


def test_streaming_funnel_matches_batch(spark, tmp_path):
    """Drain the real events table (sf0.001) through the stateful
    streaming funnel in multiple ts-ordered micro-batches; final
    per-user levels must equal the batch operator exactly."""
    from kafka_clickhouse_implementation_spark.io import load
    from kafka_clickhouse_implementation_spark.streaming.funnel import (
        streaming_funnel_levels,
    )

    ev = load(spark, "/root/testdata/sf0.001", "events").filter(F.col("user_id") < 40)
    batch = {r.user_id: r.funnel_level for r in funnel_levels(ev).collect()}

    wire = _ordered_wire_chunks(ev, tmp_path)
    stream = (
        spark.readStream.schema("user_id long, event_id long, event_type string, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .json(wire)
    )
    out = streaming_funnel_levels(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("funnel_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # level is monotone per user, so the max emission is the final state
    rows = spark.sql(
        "SELECT user_id, max(funnel_level) AS lvl FROM funnel_out GROUP BY user_id"
    ).collect()
    got = {r.user_id: r.lvl for r in rows}
    assert got == batch


def test_streaming_sessions_merge_across_batches(spark, tmp_path):
    """Native session windows must MERGE a session that spans
    micro-batches: one user with events 10 minutes apart split across
    two files is one session; a >30-minute gap in a later file opens a
    second. Complete-mode drain exposes the final state."""
    import datetime as dt

    from kafka_clickhouse_implementation_spark.streaming.sessions import (
        streaming_sessions,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # session 1: 12:00, 12:10 (file A), 12:20, 12:25 (file B)
        (1, 1, "view", t0),
        (1, 2, "click", t0 + dt.timedelta(minutes=10)),
        (1, 3, "view", t0 + dt.timedelta(minutes=20)),
        (1, 4, "view", t0 + dt.timedelta(minutes=25)),
        # session 2: 13:30 (file C, 65 min after last)
        (1, 5, "purchase", t0 + dt.timedelta(minutes=90)),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts timestamp"
    )
    wire = _ordered_wire_chunks(ev, tmp_path, n_chunks=3)
    stream = (
        spark.readStream.schema("user_id long, event_id long, event_type string, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .json(wire)
    )
    q = (
        streaming_sessions(stream)
        .writeStream.format("memory")
        .queryName("sess_merge_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["w"]["start"], r["w"]["end"], r["n"])
        for r in spark.sql("SELECT * FROM sess_merge_out").collect()
    )
    assert len(got) == 2
    s1_start, s1_end, s1_n = got[0]
    assert s1_start == t0 and s1_n == 4
    assert s1_end == t0 + dt.timedelta(minutes=55)  # last event + 30 min gap
    s2_start, s2_end, s2_n = got[1]
    assert s2_start == t0 + dt.timedelta(minutes=90) and s2_n == 1


def test_streaming_sessions_append_mode_emits_closed_once(spark, tmp_path):
    """Production session-window path: watermark + APPEND mode emits
    each session exactly once when the watermark passes its close, and
    evicts its state — the unbounded-stream variant of the
    complete-mode hermetic replay."""
    import datetime as dt
    import json as jsonlib
    import os

    from kafka_clickhouse_implementation_spark.streaming.sessions import (
        streaming_sessions,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    h = dt.timedelta(hours=1)
    rows_by_file = [
        [(1, 1, "view", t0), (1, 2, "click", t0 + dt.timedelta(minutes=10))],
        [(2, 3, "view", t0 + 2 * h)],  # advances watermark past user 1's close
        [(2, 4, "view", t0 + 4 * h)],  # closes user 2's first session
    ]
    wire = tmp_path / "wire"
    wire.mkdir()
    for i, rows in enumerate(rows_by_file):
        path = wire / f"part-{i}.json"
        with open(path, "w") as f:
            for (u, e, et, ts) in rows:
                f.write(jsonlib.dumps({
                    "user_id": u, "event_id": e, "event_type": et,
                    "ts": ts.isoformat(sep=" "),
                }) + "\n")
        os.utime(path, (1_700_000_000 + i * 10,) * 2)

    stream = (
        spark.readStream.schema("user_id long, event_id long, event_type string, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .json(str(wire))
        .withWatermark("ts", "0 seconds")
    )
    q = (
        streaming_sessions(stream)
        .writeStream.format("memory")
        .queryName("sess_append_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM sess_append_out").collect()
    user1 = [r for r in rows if r["user_id"] == 1]
    # exactly one closed session for user 1: [t0, t0+10min+30min), 2 events
    assert len(user1) == 1
    assert user1[0]["w"]["start"] == t0
    assert user1[0]["w"]["end"] == t0 + dt.timedelta(minutes=40)
    assert user1[0]["n"] == 2
    # user 2's final session (t0+4h) never closes — append emits at most
    # the first; nothing but closed sessions appear
    assert all(r["w"]["end"] <= t0 + 4 * h for r in rows)


def test_streaming_funnel_ttl_expires_abandoned_state(spark, tmp_path):
    """Event-time TTL: a funnel idle for > TTL past its last event is
    emitted once with expired=true and its state removed, while active
    funnels keep updating. Three ts-ordered files force the watermark
    forward so the timeout fires deterministically."""
    import datetime as dt

    from kafka_clickhouse_implementation_spark.streaming.funnel import (
        streaming_funnel_levels_ttl,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    h = dt.timedelta(hours=1)
    rows_by_file = [
        # file A: user 1 starts a funnel and goes silent; user 2 active
        [(1, 1, "view", t0), (2, 2, "view", t0)],
        # file B (t0+2h): only user 2 — watermark advances past user 1's
        # timeout stamp (t0 + 30min TTL)
        [(2, 3, "click", t0 + 2 * h)],
        # file C (t0+4h): pushes the watermark again so the timeout batch runs
        [(2, 4, "purchase", t0 + 4 * h)],
    ]
    import json as jsonlib
    import os

    wire = tmp_path / "wire"
    wire.mkdir()
    for i, rows in enumerate(rows_by_file):
        path = wire / f"part-{i}.json"
        with open(path, "w") as f:
            for (u, e, et, ts) in rows:
                f.write(jsonlib.dumps({
                    "user_id": u, "event_id": e, "event_type": et,
                    "ts": ts.isoformat(sep=" "),
                }) + "\n")
        os.utime(path, (1_700_000_000 + i * 10,) * 2)

    stream = (
        spark.readStream.schema("user_id long, event_id long, event_type string, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .json(str(wire))
    )
    out = streaming_funnel_levels_ttl(
        stream, ttl_us=30 * 60 * 1_000_000  # 30-minute TTL
    )
    q = (
        out.writeStream.format("memory")
        .queryName("funnel_ttl_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM funnel_ttl_out").collect()
    user1 = [r for r in rows if r["user_id"] == 1]
    user2 = [r for r in rows if r["user_id"] == 2]
    # user 1: one live emission, then exactly one expiry at level 1
    assert [r["funnel_level"] for r in user1 if r["expired"]] == [1]
    # user 2: never expired, reaches level 3 within the funnel window
    assert all(not r["expired"] for r in user2)
    assert max(r["funnel_level"] for r in user2) == 3


def test_streaming_retention_matches_batch(spark, tmp_path):
    """Same multi-batch contract for the stateful retention twin."""
    from kafka_clickhouse_implementation_spark.io import load
    from kafka_clickhouse_implementation_spark.streaming.retention import (
        streaming_retention,
    )

    ev = load(spark, "/root/testdata/sf0.001", "events").filter(F.col("user_id") < 40)
    d = ev.select("user_id", F.to_date("ts").alias("d"))
    first = d.groupBy("user_id").agg(F.min("d").alias("d0"))
    batch = {
        r.user_id: (r.r1, r.r7)
        for r in first.join(d.distinct(), "user_id")
        .groupBy("user_id", "d0")
        .agg(
            F.max(F.when(F.col("d") == F.date_add("d0", 1), 1).otherwise(0)).alias("r1"),
            F.max(F.when(F.col("d") == F.date_add("d0", 7), 1).otherwise(0)).alias("r7"),
        )
        .collect()
    }

    wire = _ordered_wire_chunks(ev, tmp_path)
    stream = (
        spark.readStream.schema("user_id long, event_id long, event_type string, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .json(wire)
    )
    q = (
        streaming_retention(stream)
        .writeStream.format("memory")
        .queryName("retention_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT user_id, max(r1) AS r1, max(r7) AS r7 FROM retention_out GROUP BY user_id"
    ).collect()
    got = {r.user_id: (r.r1, r.r7) for r in rows}
    assert got == batch


def test_retention_triangle_invariants(spark, sf_dir):
    """C164: age-0 activity equals the cohort size (every user is
    active in their own first week); n_active never exceeds n_cohort;
    n_active is non-increasing guarantees don't hold in general
    (users can skip a week and return), so only the hard invariants
    are pinned."""
    from kafka_clickhouse_implementation_spark.operators.funnels import (
        q_retention_triangle,
    )

    rows = q_retention_triangle(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.age <= 4
        assert 1 <= r.n_active <= r.n_cohort
    age0 = [r for r in rows if r.age == 0]
    assert age0 and all(r.n_active == r.n_cohort for r in age0)
