"""Sources & sinks: WAT envelope scan, pipe-text interchange, parquet
serving tables (SURVEY §2.1 S1-S7 / K1-K5)."""
