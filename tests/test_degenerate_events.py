"""Degenerate-input robustness for the events-tier queries — the
companion of test_degenerate_docs for the stream table.

Adversarial shapes the fixture never produces: exact-timestamp TIES
(multiple events per user at one instant — the window-ordering hazard),
single-event users, purchase-with-no-prior-touch users (attribution
'direct' path), duplicated event ids, malformed/NULL JSON props, a user
whose events all share one session, and zero-value events. Every query
must evaluate AND agree with its DuckDB oracle on this corpus."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod
import tests.oracle as oracle_mod

EVENT_QUERIES = [
    "events_tumbling_hourly",
    "events_sessionization",
    "events_funnel_conversion",
    "events_retention_cohorts",
    "events_anomaly_zscore",
    "events_hopping_windows",
    "events_variant_props",
    "pivot_daily_event_types",
    "window_rolling_median",
    "attribution_last_touch",
    "timeseries_gapfill_locf",
    "window_range_frame",
    # round-3 session-2 additions (total semantics over events)
    "events_mad_robust_zscore",
    "asof_join_next_order",
    "events_markov_transitions",
    "events_ohlc_bars",
    "events_time_weighted_avg",
    "events_top_paths",
    "ab_test_welch",
    "events_time_to_convert",
    "events_dau_wau",
    "cumulative_unique_users",
]

_T0 = pd.Timestamp("2024-03-01 10:00:00")


def _rows():
    rows = []
    add = lambda eid, ts, uid, et, v, props='{"k": 1}': rows.append(  # noqa: E731
        dict(event_id=eid, ts=ts, user_id=uid, event_type=et, value=v, props=props)
    )
    # user 1: three events at the SAME instant (tie ordering), then purchase
    add(1, _T0, 1, "view", 5.0)
    add(2, _T0, 1, "click", 7.0)
    add(3, _T0, 1, "view", 9.0)
    add(4, _T0 + pd.Timedelta("5 min"), 1, "purchase", 100.0)
    # user 2: single event ever
    add(5, _T0, 2, "signup", 0.0)
    # user 3: purchase with no prior touch (direct attribution)
    add(6, _T0 + pd.Timedelta("1 h"), 3, "purchase", 50.0)
    # user 4: touch then purchase 8 days later (outside 7-day lookback)
    add(7, _T0, 4, "click", 1.0)
    add(8, _T0 + pd.Timedelta("8 days"), 4, "purchase", 2.0)
    # user 5: malformed and NULL props
    add(9, _T0, 5, "view", 3.0, "not json")
    add(10, _T0 + pd.Timedelta("1 min"), 5, "error", -4.0, None)
    # user 6: zero values, session exactly at the 30-min gap boundary
    add(11, _T0, 6, "view", 0.0)
    add(12, _T0 + pd.Timedelta("30 min"), 6, "view", 0.0)
    add(13, _T0 + pd.Timedelta("61 min"), 6, "view", 0.0)
    return rows


@pytest.fixture(scope="module")
def degenerate_events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("degenerate_events_sf")
    pdf = pd.DataFrame(_rows())
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    pdf.to_parquet(os.path.join(d, "events.parquet"))
    return str(d)


def _compare_events_only(name, spark, sf_dir):
    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS "
        f"SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    got = queries[name](spark, sf_dir).toPandas()
    if name not in oracles:
        return
    want = con.sql(oracles[name]).df()
    con.close()
    assert got.shape[0] == want.shape[0], (
        f"{name}: rows {got.shape[0]} != {want.shape[0]}"
    )
    assert sorted(got.columns) == sorted(want.columns)
    g, w = oracle_mod._normalize(got), oracle_mod._normalize(want)
    for col in g.columns:
        gc, wc = g[col], w[col]
        if gc.dtype.kind == "f" or wc.dtype.kind == "f":
            ga = gc.astype(float).to_numpy()
            wa = wc.astype(float).to_numpy()
            both_nan = pd.isna(ga) & pd.isna(wa)
            assert (both_nan | (ga == wa)).all(), (name, col)
        else:
            gs = gc.astype("string").fillna("<NULL>")
            ws = wc.astype("string").fillna("<NULL>")
            assert (gs == ws).all(), (
                f"{name}.{col}: {gs[gs != ws].head(3).tolist()} != "
                f"{ws[gs != ws].head(3).tolist()}"
            )


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_degenerate_events_parity(spark, degenerate_events_dir, name):
    _compare_events_only(name, spark, degenerate_events_dir)


@pytest.fixture(scope="module")
def empty_events_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("empty_events_sf")
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    pq.write_table(schema.empty_table(), os.path.join(d, "events.parquet"))
    return str(d)


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_empty_events_is_total(spark, empty_events_dir, name):
    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    rows = queries[name](spark, empty_events_dir).count()
    if name in oracles:
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS "
            f"SELECT * FROM read_parquet('{empty_events_dir}/events.parquet')"
        )
        want = con.sql(oracles[name]).df()
        con.close()
        assert rows == want.shape[0], (name, rows, want.shape[0])
