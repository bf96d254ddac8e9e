"""Local replica of the driver's t2 correctness check.

Runs a registered query on Spark and its DuckDB oracle on the same
parquet tables, then compares row count, sorted column names, and an
order-insensitive canonicalized value multiset. Floats are compared at
12 significant digits — queries are required to round their floating
aggregates, so a surviving disagreement is a real semantic bug, not ulp
noise (SURVEY.md §4.4.2).
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb
import numpy as np
import pandas as pd

from bangdatapipeline_spark.tables import TABLES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, (bool, np.bool_)):
        return "T" if v else "F"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "NULL"
        if math.isinf(f):
            return "inf" if f > 0 else "-inf"
        return f"{f:.12g}"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, pd.Timestamp):
        if v is pd.NaT:
            return "NULL"
        return v.isoformat()
    if isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_norm_value(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    if v is pd.NaT:
        return "NULL"
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    df = df.reindex(sorted(df.columns, key=str.lower), axis=1)
    rows = [tuple(_norm_value(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows)


def _non_scalar_cols(pdf: pd.DataFrame) -> list[str]:
    """Columns holding array/struct cells. The external driver's comparator
    canonicalizes via pandas ``sort_values``, which raises on unhashable
    cells — any such column would pass locally but ERR in the driver, so we
    reject it here (project arrays to CSV strings on both sides instead)."""
    bad = []
    for c in pdf.columns:
        col = pdf[c]
        if col.dtype == object and any(
            isinstance(v, (list, tuple, dict, np.ndarray)) for v in col.head(50)
        ):
            bad.append(c)
    return bad


def compare_query(spark, query, sf_dir: str) -> tuple[bool, str]:
    """Run query.fn on Spark and query.oracle on DuckDB; compare results."""
    spark_pdf = query.fn(spark, sf_dir).toPandas()
    spark_pdf.columns = [c.lower() for c in spark_pdf.columns]
    if query.oracle is None:
        n = len(spark_pdf)
        return True, f"rows-only: {n} rows"
    bad = _non_scalar_cols(spark_pdf)
    if bad:
        return False, f"non-scalar output columns (driver comparator would ERR): {bad}"

    con = duck_con(sf_dir)
    try:
        duck_pdf = con.execute(query.oracle).fetchdf()
    finally:
        con.close()
    duck_pdf.columns = [c.lower() for c in duck_pdf.columns]

    s_cols = sorted(spark_pdf.columns)
    d_cols = sorted(duck_pdf.columns)
    if s_cols != d_cols:
        return False, f"schema mismatch: spark={s_cols} duckdb={d_cols}"
    if len(spark_pdf) != len(duck_pdf):
        return False, f"rowcount mismatch: spark={len(spark_pdf)} duckdb={len(duck_pdf)}"

    s_rows = canonical_rows(spark_pdf)
    d_rows = canonical_rows(duck_pdf)
    if s_rows != d_rows:
        diffs = [(i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b]
        sample = diffs[:3]
        return False, (
            f"value mismatch: {len(diffs)}/{len(s_rows)} sorted rows differ; "
            f"cols={s_cols}; first diffs (spark vs duckdb): {sample}"
        )
    return True, f"ok: {len(s_rows)} rows"
