"""Structured Streaming surface: watermarked windowed aggregations,
session windows, and incremental TF over a document stream.

The reference is strictly batch (SURVEY.md §2 gap table — no streaming of
any kind); this package is north-star engine surface built on
``readStream`` → transform → ``writeStream`` with event-time semantics.
"""
