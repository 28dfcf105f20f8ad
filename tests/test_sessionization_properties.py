"""Property-based sessionization check: for random event streams, the
engine's gap-sessionization must match an independent Python model — and
session invariants must hold (gap-bounded within, gap-exceeded between)."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

GAP_MS = 30 * 60 * 1000


@st.composite
def event_stream(draw):
    n_users = draw(st.integers(1, 4))
    rows = []
    eid = 0
    for u in range(n_users):
        t = 1_700_000_000_000
        for _ in range(draw(st.integers(1, 12))):
            # mix of intra-session steps and session-breaking gaps
            t += draw(st.sampled_from([1_000, 60_000, GAP_MS, GAP_MS + 1_000, 2 * GAP_MS]))
            rows.append((eid, u, t, 1.0))
            eid += 1
    return rows


def _model(rows):
    """Per user: break when gap > GAP_MS; return {(user, n_events, start, end)}."""
    by_user: dict[int, list[tuple]] = {}
    for r in sorted(rows, key=lambda r: (r[1], r[2], r[0])):
        by_user.setdefault(r[1], []).append(r)
    out = []
    for u, evs in by_user.items():
        cur = [evs[0]]
        for prev, nxt in zip(evs, evs[1:]):
            if nxt[2] - prev[2] > GAP_MS:
                out.append((u, len(cur), cur[0][2], cur[-1][2]))
                cur = []
            cur.append(nxt)
        out.append((u, len(cur), cur[0][2], cur[-1][2]))
    return sorted(out)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(event_stream())
def test_sessionization_matches_model(spark, rows):
    df = spark.createDataFrame(
        [(e, u, dt.datetime.utcfromtimestamp(t / 1000), v) for e, u, t, v in rows],
        "event_id long, user_id long, ts timestamp, value double",
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag("ts").over(w)
    new_session = (
        prev_ts.isNull()
        | (F.unix_millis(F.col("ts")) - F.unix_millis(prev_ts) > GAP_MS)
    ).cast("int")
    got = sorted(
        (r.user_id, r.n, int(r.s.timestamp() * 1000), int(r.e.timestamp() * 1000))
        for r in (
            df.select("user_id", "ts", "event_id", F.sum(new_session).over(wcum).alias("sid"))
            .groupBy("user_id", "sid")
            .agg(F.count(F.lit(1)).alias("n"), F.min("ts").alias("s"), F.max("ts").alias("e"))
        ).collect()
    )
    assert got == _model(rows)
