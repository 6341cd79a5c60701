"""DuckDB-oracle comparison helper — mimics the driver's t2 check:
row-count + column-name schema + order-insensitive value comparison."""

from __future__ import annotations

import math

import duckdb


def duckdb_run(sql: str, sf_dir: str):
    """Run oracle SQL with the driver's pre-registered table views."""
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # v + 0.0 folds -0.0 into +0.0 so both engines format zero the same
        return f"{v + 0.0:.6f}"
    return v


def normalize(cols, rows):
    """Sort columns by name, normalize floats, sort rows — order-insensitive."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in order], out


def spark_run(df):
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    return cols, rows


def assert_matches_oracle(df, sql: str, sf_dir: str):
    s_cols, s_rows = normalize(*spark_run(df))
    o_cols, o_rows = normalize(*duckdb_run(sql, sf_dir))
    assert s_cols == o_cols, f"schema mismatch: spark={s_cols} oracle={o_cols}"
    assert len(s_rows) == len(o_rows), f"row count: spark={len(s_rows)} oracle={len(o_rows)}"
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b
    ]
    assert not mismatches, f"{len(mismatches)} row mismatches; first 5: {mismatches[:5]}"
