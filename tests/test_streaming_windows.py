"""Event-time windowed aggregation + streaming dedup under a real watermark:
a file stream processed across TWO availableNow restarts sharing a checkpoint,
so the watermark is persisted/restored exactly as a long-running pipeline
would — batch 2's late row is measured against batch 1's high-water mark.

(The reference is batch-only — SURVEY.md §2.10; these are the Structured
Streaming generalizations the build brief asks for: watermarks + windowed aggs
for late data, bounded-state streaming dedup.)"""

from __future__ import annotations

import datetime as dt
import os

from es_indexer_spark.streaming import dedup_events_stream, windowed_event_counts

SCHEMA = "event_id long, ts timestamp, event_type string, value double"


def _write_batch(spark, inbox: str, rows) -> None:
    df = spark.createDataFrame(
        [(i, dt.datetime.fromisoformat(t), k, v) for i, t, k, v in rows], SCHEMA
    )
    df.coalesce(1).write.mode("append").parquet(inbox)


def _run_stream(spark, inbox, ckpt, transform, mode):
    # foreachBatch sink: unlike the memory sink it SUPPORTS checkpoint
    # recovery, which is the whole point — the second run must restore the
    # first run's watermark. Returns only THIS run's emitted rows.
    emitted: list = []
    src = spark.readStream.schema(SCHEMA).parquet(inbox)
    q = (
        transform(src)
        .writeStream.outputMode(mode)
        .foreachBatch(lambda bdf, bid: emitted.extend(bdf.collect()))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return emitted


def test_windowed_counts_drop_late_rows(spark, tmp_path):
    inbox, ckpt = str(tmp_path / "inbox"), str(tmp_path / "ckpt")
    os.makedirs(inbox)
    wc = lambda df: windowed_event_counts(df, watermark="30 minutes")

    # batch 1: two 10:xx events + one 12:00 event -> watermark after the batch
    # is 12:00 - 30min = 11:30
    _write_batch(
        spark,
        inbox,
        [
            (1, "2024-01-01T10:00:00", "a", 1.0),
            (2, "2024-01-01T10:10:00", "a", 2.0),
            (3, "2024-01-01T12:00:00", "a", 3.0),
        ],
    )
    out1 = _run_stream(spark, inbox, ckpt, wc, "update")
    got1 = {(r["win_start"].hour, r["key"]): r["n_events"] for r in out1}
    assert got1[(10, "a")] == 2 and got1[(12, "a")] == 1

    # batch 2 (restart, same checkpoint): one LATE row at 10:15 — behind the
    # restored 11:30 watermark, must be DROPPED — and one live row at 12:10
    _write_batch(
        spark,
        inbox,
        [
            (4, "2024-01-01T10:15:00", "a", 4.0),
            (5, "2024-01-01T12:10:00", "a", 5.0),
        ],
    )
    out2 = _run_stream(spark, inbox, ckpt, wc, "update")
    upd = {(r["win_start"].hour, r["key"]): (r["n_events"], r["sum_value"]) for r in out2}
    assert (10, "a") not in upd          # late row dropped, window not re-emitted
    assert upd[(12, "a")] == (2, 8.0)    # live row counted


def test_windowed_counts_batch_equals_history(spark, tmp_path):
    """The same operator on a BATCH DataFrame returns the complete history
    (watermark no-op) — the contract-oracle path."""
    rows = [
        (1, "2024-01-01T10:00:00", "a", 1.0),
        (2, "2024-01-01T10:10:00", "b", 2.0),
        (3, "2024-01-01T12:00:00", "a", 3.0),
    ]
    df = spark.createDataFrame(
        [(i, dt.datetime.fromisoformat(t), k, v) for i, t, k, v in rows], SCHEMA
    )
    got = {
        (r["win_start"].hour, r["key"]): r["n_events"]
        for r in windowed_event_counts(df).collect()
    }
    assert got == {(10, "a"): 1, (10, "b"): 1, (12, "a"): 1}


def test_dedup_stream_within_watermark(spark, tmp_path):
    inbox, ckpt = str(tmp_path / "inbox"), str(tmp_path / "ckpt")
    os.makedirs(inbox)
    dd = lambda df: dedup_events_stream(df, key_cols=("event_id",), watermark="1 hour")

    _write_batch(
        spark,
        inbox,
        [(1, "2024-01-01T10:00:00", "a", 1.0), (2, "2024-01-01T10:01:00", "a", 2.0)],
    )
    out1 = _run_stream(spark, inbox, ckpt, dd, "append")
    assert sorted(r["event_id"] for r in out1) == [1, 2]

    # batch 2: event 1 re-delivered 5 min later (inside the watermark) must be
    # suppressed; event 3 is new
    _write_batch(
        spark,
        inbox,
        [(1, "2024-01-01T10:05:00", "a", 1.0), (3, "2024-01-01T10:06:00", "a", 3.0)],
    )
    out2 = _run_stream(spark, inbox, ckpt, dd, "append")
    assert sorted(r["event_id"] for r in out2) == [3]


def test_sessionize_stream_gap_and_timeout(spark, tmp_path):
    """Custom stateful operator (applyInPandasWithState): in-batch gap split
    emits the closed session immediately; the open tail is flushed by the
    EVENT-TIME timeout once a later batch's watermark passes last+gap."""
    from es_indexer_spark.streaming import sessionize_stream

    inbox, ckpt = str(tmp_path / "inbox"), str(tmp_path / "ckpt")
    os.makedirs(inbox)
    # the fixture schema's event_id column serves as the session (user) key
    tr = lambda df: sessionize_stream(
        df, user_col="event_id", gap="30 minutes", watermark="1 hour"
    )

    # user 1: 10:00/10:05 then 11:00 (55-min gap -> first session closes in
    # batch); user 2 at 13:00 pushes the watermark to 12:00 > the 11:30 timeout
    _write_batch(
        spark,
        inbox,
        [
            (1, "2024-01-01T10:00:00", "a", 1.0),
            (1, "2024-01-01T10:05:00", "a", 2.0),
            (1, "2024-01-01T11:00:00", "a", 3.0),
            (2, "2024-01-01T13:00:00", "b", 4.0),
        ],
    )
    out1 = _run_stream(spark, inbox, ckpt, tr, "update")
    s1 = {(r["user_id"], r["session_start"].hour, r["n_events"]) for r in out1}
    # closed by the in-batch 55-min gap:
    assert (1, 10, 2) in s1
    # availableNow runs a trailing micro-batch AFTER the data batch, where the
    # advanced watermark (13:00 - 1h = 12:00) fires the EVENT-TIME timeout of
    # user 1's open 11:00 session (timeout 11:30 < 12:00) -> flushed same run:
    assert (1, 11, 1) in s1
    assert all(u != 2 for u, _, _ in s1)  # user 2's 13:00 session still open

    # run 2 (restart, same checkpoint): user 2 returns at 15:00 — a 2-hour gap
    # closes the 13:00 session held in RESTORED state from run 1
    _write_batch(spark, inbox, [(2, "2024-01-01T15:00:00", "b", 5.0)])
    out2 = _run_stream(spark, inbox, ckpt, tr, "update")
    s2 = {(r["user_id"], r["session_start"].hour, r["session_end"].hour, r["n_events"]) for r in out2}
    assert (2, 13, 13, 1) in s2        # closed against state restored across runs
