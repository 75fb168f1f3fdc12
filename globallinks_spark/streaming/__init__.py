"""Structured Streaming surface: incremental file ingest + windowed
aggregation. The reference's incremental behavior is restart-idempotence
over a file manifest (SURVEY §2.9); here both the faithful batch
equivalent and a real streaming pipeline are provided."""
