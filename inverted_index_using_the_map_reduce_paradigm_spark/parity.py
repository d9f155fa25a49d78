"""Shared result-comparison rules for the oracle-parity gate.

Both `tests/test_oracle_parity.py` and `scripts/parity_check.py` mirror
the driver's correctness check (sort columns by name, stringify with
float rounding, sort rows by all columns, compare cell-by-cell).  The
rules live HERE so the two consumers cannot drift: if the comparison
ever changes (e.g. float precision), it changes for both at once.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from .data import TABLES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """DuckDB connection with every fixture table registered as a view,
    matching the driver's pre-registered oracle environment."""
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Order-insensitive canonical form: columns sorted by name, cells
    stringified (floats at 6 decimals, nulls as a sentinel), rows sorted
    by all columns — the same shape the driver hashes."""
    df = df.reindex(sorted(df.columns), axis=1)

    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "<null>"
        if isinstance(v, float):
            return f"{v:.6f}"
        return str(v)

    out = df.apply(lambda col: col.map(cell))
    return out.sort_values(by=list(out.columns), ignore_index=True)
