"""Arbitrary stateful streaming via ``applyInPandasWithState`` — the custom
state mechanism SURVEY.md §2.B lists alongside foreachBatch. Implements a
running per-key current-row tracker over the CDC stream: for every key the
state holds the latest (by LSN) row image and a change counter; each
micro-batch emits the keys it touched.

This is the "current dimension view" (SCD Type-1) companion to the SCD2
history table: at 100 TB you keep both — SCD2 via foreachBatch-MERGE
(scd2_stream.py), the hot current view via in-state tracking with
GroupState (RocksDB-backed state store on a real cluster).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: state tuple: (latest_lsn, name, price, n_changes, deleted)
_STATE_SCHEMA = "lsn bigint, name string, price double, n_changes int, deleted boolean"
_OUTPUT_SCHEMA = (
    "id bigint, lsn bigint, name string, price double, n_changes int, deleted boolean"
)


def _track_current(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold a key's micro-batch events (ordered by LSN) into the state."""
    if state.exists:
        lsn, name, price, n_changes, deleted = state.get
    else:
        lsn, name, price, n_changes, deleted = -1, None, None, 0, False

    for pdf in pdfs:
        pdf = pdf.sort_values("lsn")
        for row in pdf.itertuples(index=False):
            # nullable BIGINT arrives as NaN through Arrow/pandas
            if pd.isna(row.lsn) or row.lsn <= lsn:
                continue  # tombstone noise / replay / already applied
            lsn = int(row.lsn)
            n_changes += 1
            if row.op == "d":
                deleted, name, price = True, None, None
            else:
                deleted = False
                name = row.name
                price = float(row.price) if row.price is not None else None

    state.update((lsn, name, price, n_changes, deleted))
    yield pd.DataFrame(
        [
            {
                "id": key[0],
                "lsn": lsn,
                "name": name,
                "price": price,
                "n_changes": n_changes,
                "deleted": deleted,
            }
        ]
    )


def current_rows_stream(decoded_stream: DataFrame) -> DataFrame:
    """Maintain the per-key current row over a decoded CDC stream.

    ``update`` mode: each micro-batch emits the latest state for touched
    keys. State is partitioned by key across the cluster (same hash
    partitioning as any keyed operator) and lives in the state store —
    the scale ceiling is state size per key-partition, not stream length.
    """
    src = decoded_stream.select(
        "id", "op", "lsn", "name", decoded_stream.price.cast("double").alias("price")
    )
    return src.groupBy("id").applyInPandasWithState(
        _track_current,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
