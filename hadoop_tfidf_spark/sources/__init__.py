"""Source connectors: normalized loaders for the engine's input tables.

The reference's only source is a text-file directory (SURVEY.md §2 O1,
handled in ``corpus.py``); this package holds the columnar loaders —
including schema quirks like nanosecond parquet timestamps that Spark's
vectorized reader refuses by default.
"""
