"""Streaming session windows vs the batch gaps-and-islands twin.

Exercises the watermark lifecycle deliberately: the first availableNow
trigger can only finalize sessions whose end precedes (max event time -
watermark); a second trigger after a far-future sentinel event arrives
flushes everything else. The union of both emissions must equal BOTH
batch formulations — F.session_window in a batch groupBy AND the
lag-based `sessionize` query — on the fixture's microsecond timestamps
(the two gap semantics differ only at exactly-1800.000000s gaps)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from isimip_qa_spark.catalog import read_table
from isimip_qa_spark.queries.extras import sessionize
from isimip_qa_spark.streaming.session_stream import GAP, sessionize_stream

SF = "/root/testdata/sf0.01"
SENTINEL_USER = 10**9


def test_sessionize_stream_matches_batch(spark, tmp_path):
    ev = read_table(spark, SF, "events")
    src = str(tmp_path / "src")
    ev.coalesce(2).write.parquet(src)
    out = str(tmp_path / "out")

    q = sessionize_stream(spark, src, out)
    q.awaitTermination(180)
    first = spark.read.parquet(f"{out}/sessions")
    n_first = first.count()
    assert n_first > 0  # watermark passed most of the month-long fixture

    # sentinel far beyond max(ts) + watermark advances the global watermark
    far = ev.agg(F.max("ts")).first()[0] + datetime.timedelta(days=2)
    spark.createDataFrame(
        [(10**12, far, SENTINEL_USER, "x", 0.0, "{}")], ev.schema
    ).write.mode("append").parquet(src)
    q2 = sessionize_stream(spark, src, out)
    q2.awaitTermination(180)

    rows = [
        r
        for r in spark.read.parquet(f"{out}/sessions").collect()
        if r.user_id != SENTINEL_USER
    ]
    got = {(r.user_id, r.sess_start, r.sess_end, r.n_events) for r in rows}
    assert len(got) > n_first  # the second trigger flushed held-back state
    assert all(r.sess_end > r.sess_start for r in rows)

    # batch twin 1: the same session_window in a batch aggregation
    batch_sw = {
        (r.user_id, r.sess_start, r.sess_end, r.n_events)
        for r in (
            ev.groupBy("user_id", F.session_window("ts", GAP).alias("w"))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                "user_id",
                F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                    "sess_start"
                ),
                F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias(
                    "sess_end"
                ),
                "n_events",
            )
            .collect()
        )
    }
    assert got == batch_sw

    # batch twin 2: the lag-based gaps-and-islands query (no end column)
    batch_lag = {
        (r.user_id, r.sess_start, r.n_events)
        for r in sessionize(spark, SF).collect()
    }
    assert {(u, s, n) for u, s, _, n in got} == batch_lag
