"""Relational + data-prep operators: extract, compact, linkdb query layer,
dedup family, similarity search, text analysis, multimodal plumbing."""
