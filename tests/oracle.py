"""Local replica of the driver's DuckDB-oracle correctness gate.

For a query name: run the Spark implementation and the oracle SQL over the
same sf dir, normalize both to pandas (columns sorted by name, rows sorted by
a stable string key), and assert exact equality of row count + values.
Stricter than a hash match — a failure shows the first differing cells.
"""

from __future__ import annotations

import duckdb
import pandas as pd

from change_data_capture_spark.schemas import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonical cell text: repr-ish strings, so float/decimal/timestamps with
    # equal values compare equal
    if df.empty:
        return df.reset_index(drop=True)
    as_str = df.astype("string").fillna("<NULL>")
    order = as_str.apply(lambda r: "\x1f".join(r), axis=1).sort_values().index
    return df.loc[order].reset_index(drop=True)


def compare(name: str, spark, sf_dir: str, queries: dict, oracles: dict) -> None:
    sdf = queries[name](spark, sf_dir)
    got = sdf.toPandas()
    con = duck_connection(sf_dir)
    want = con.sql(oracles[name]).df()
    con.close()
    compare_frames(name, got, want)


def compare_frames(name: str, got: pd.DataFrame, want: pd.DataFrame) -> None:
    """The value-equality core of :func:`compare`, for callers that build
    the Spark result / oracle frame themselves (parameterized gates)."""
    assert got.shape[0] == want.shape[0], (
        f"{name}: row count {got.shape[0]} != oracle {want.shape[0]}"
    )
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {sorted(got.columns)} != oracle {sorted(want.columns)}"
    )
    g, w = _normalize(got), _normalize(want)
    for col in g.columns:
        gc, wc = g[col], w[col]
        if gc.dtype.kind == "f" or wc.dtype.kind == "f":
            import numpy as np

            ga = gc.astype(float).to_numpy()
            wa = wc.astype(float).to_numpy()
            both_nan = pd.isna(ga) & pd.isna(wa)
            if not (both_nan | (ga == wa)).all():
                bad = (~(both_nan | (ga == wa))).nonzero()[0][:5]
                raise AssertionError(f"{name}.{col}: mismatch at rows {bad}: "
                                     f"{ga[bad]} != {wa[bad]}")
        else:
            gs = gc.astype("string").fillna("<NULL>")
            ws = wc.astype("string").fillna("<NULL>")
            if not (gs == ws).all():
                bad = (gs != ws).to_numpy().nonzero()[0][:5]
                raise AssertionError(
                    f"{name}.{col}: mismatch at rows {bad}: "
                    f"{gs.iloc[bad].tolist()} != {ws.iloc[bad].tolist()}"
                )
