"""Property-based SCD2 testing (SURVEY.md §5 item 4): for seeded random CDC
histories — including replayed duplicates and shuffled arrival order — the
engine's SCD2 output must equal an independent pure-Python model, and the
validity intervals must partition time per key by LSN order.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql.types import (
    DecimalType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from change_data_capture_spark.operators.scd2 import SENTINEL_TS, scd2

_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("lsn", LongType(), nullable=True),
        StructField("ts_ms", LongType()),
        StructField("name", StringType()),
        StructField("description", StringType()),
        StructField("price", DecimalType(10, 2)),
    ]
)

_SENTINEL = dt.datetime.fromisoformat(f"{SENTINEL_TS}T00:00:00")


@st.composite
def cdc_history(draw):
    """Random history: per key, events with strictly increasing LSN; some
    rows replayed (exact duplicates); some NULL-lsn noise; arrival order
    shuffled."""
    n_keys = draw(st.integers(1, 6))
    rows = []
    lsn_counter = 1
    for key in range(n_keys):
        n_events = draw(st.integers(1, 5))
        for _ in range(n_events):
            lsn_counter += draw(st.integers(1, 3))
            ts = 1_700_000_000_000 + draw(st.integers(0, 10_000)) * 1_000
            row = (key, lsn_counter, ts, f"n{lsn_counter}", f"d{key}", None)
            rows.append(row)
            if draw(st.booleans()):  # at-least-once replay
                rows.append(row)
        if draw(st.booleans()):  # tombstone noise: NULL lsn, must be ignored
            rows.append((key, None, 1_700_000_000_000, "noise", "noise", None))
    return draw(st.permutations(rows))


def _model(rows):
    """Independent SCD2 model: filter NULL lsn, dedup (id,lsn), order by
    lsn, chain intervals, keep keys with >= 2 events."""
    per_key: dict[int, dict[int, tuple]] = {}
    for r in rows:
        if r[1] is None:
            continue
        per_key.setdefault(r[0], {})[r[1]] = r
    out = set()
    for key, by_lsn in per_key.items():
        events = [by_lsn[l] for l in sorted(by_lsn)]
        if len(events) < 2:
            continue
        for i, e in enumerate(events):
            start = dt.datetime.utcfromtimestamp(e[2] / 1000)
            end = (
                dt.datetime.utcfromtimestamp(events[i + 1][2] / 1000)
                if i + 1 < len(events)
                else _SENTINEL
            )
            out.add((key, e[3], e[4], None, start, end))
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(cdc_history())
def test_scd2_matches_model(spark, history):
    df = spark.createDataFrame(list(history), _SCHEMA)
    got = {
        (
            r.id,
            r.name,
            r.description,
            r.price,
            r.row_valid_start_timestamp,
            r.row_valid_expiration_timestamp,
        )
        for r in scd2(df).collect()
    }
    assert got == _model(history)


def test_scd2_reference_compat_mode(spark):
    """sentinel_ts='9999-01-01' + dedup_replays=False reproduce the
    reference's literal output shape: the far sentinel appears, and a key
    whose only second event is a replayed duplicate is emitted (zero-width
    closing interval) instead of dropped."""
    rows = [
        # key 1: a real change history
        (1, 10, 1_000, "a", "d", None),
        (1, 20, 2_000, "a2", "d", None),
        # key 2: second event is an exact replay of the first
        (2, 10, 1_000, "b", "d", None),
        (2, 10, 1_000, "b", "d", None),
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    out = scd2(df, sentinel_ts="9999-01-01", dedup_replays=False).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r.id, []).append(r)
    # default mode drops key 2 entirely; compat mode keeps it
    assert set(by_key) == {1, 2}
    assert len(by_key[2]) == 2
    zero_width = [
        r for r in by_key[2]
        if r.row_valid_start_timestamp == r.row_valid_expiration_timestamp
    ]
    assert len(zero_width) == 1
    sentinels = [
        r for r in out if r.row_valid_expiration_timestamp.year == 9999
    ]
    assert len(sentinels) == 2  # one open interval per key
    # and the default mode still drops the replay-only key
    strict = scd2(df).collect()
    assert {r.id for r in strict} == {1}
