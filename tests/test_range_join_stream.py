"""Stream-stream time-interval join vs the batch bucketized range join:
one availableNow pass over the sf0.01 events fixture must emit exactly
the batch twin's pairs (inner joins emit on match; the watermark only
evicts state), including any pairs in the sub-second truncation band."""

from __future__ import annotations

from isimip_qa_spark.catalog import read_table
from isimip_qa_spark.queries.extras import range_join_errors
from isimip_qa_spark.streaming.range_join_stream import range_join_stream

SF = "/root/testdata/sf0.01"


def test_range_join_stream_matches_batch(spark, tmp_path):
    ev = read_table(spark, SF, "events")
    src = str(tmp_path / "src")
    ev.coalesce(2).write.parquet(src)
    out = str(tmp_path / "out")

    q = range_join_stream(spark, src, out)
    assert q.awaitTermination(180), "stream did not finish in time"

    got = {
        (r.purchase_event, r.error_event, r.user_id, r.gap_s)
        for r in spark.read.parquet(f"{out}/pairs").collect()
    }
    batch = {
        (r.purchase_event, r.error_event, r.user_id, r.gap_s)
        for r in range_join_errors(spark, SF).collect()
    }
    assert got == batch
    assert len(got) > 0
