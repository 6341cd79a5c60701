"""Scalar / expression-level function library (JVM-side, no Python UDFs).

Everything here returns Column expressions built from ``pyspark.sql.functions``
so the hot path stays inside whole-stage codegen. The reference engine has no
function library at all (SURVEY.md §2 gap table) — only ``log10``/``*``/``+``
inlined in reducers — so this package is engine surface beyond parity.
"""
