"""Structured Streaming parity tier for the reference's pipeline.

The reference (/root/reference/regionSpout.go) is a streaming producer:
geo-filtered source → per-region fanout → serialize → route-by-region →
Kafka sink, with a 30 s tumbling per-region count monitor and a stubbed
stall-restart policy. This package re-expresses each stage on Structured
Streaming (SURVEY.md §3.4) and also provides the batch analog of each
operator so the DuckDB oracle can check semantics.
"""
