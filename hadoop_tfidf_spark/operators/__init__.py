"""Relational + LLM-data-pipeline operators built from Spark primitives.

The reference engine's operator surface (SURVEY.md §2 O1–O21) lives in
``corpus``/``tfidf``/``search``; this package holds the engine-surface
extensions the north star requires — deduplication, similarity search,
multimodal column plumbing — each expressed as compositions of built-in
DataFrame operators (no Python UDFs except the clearly-marked multimodal
decode stub, which is an Arrow-batched ``mapInPandas``).
"""
