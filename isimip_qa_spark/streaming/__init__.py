"""Structured Streaming variant of the QA pipeline.

The reference's per-file incremental pattern (first/last emission,
/root/reference/isimip_qa/extractions/histogram.py:61-63, append-mode write
mean.py:38) is micro-batch-shaped; this module is its genuine streaming
recast: files arriving in a directory = micro-batches, watermarked windowed
aggregation = the per-period extraction series, `availableNow` = the bounded
backfill run.
"""
