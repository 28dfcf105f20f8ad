"""DuckDB twin of bench.py: runs the ORACLE SQL equivalents of the same
headline list on the same parquet at the same scale factor, same warm
methodology (2 runs, min) — the apples-to-apples single-node reference
point quoted in BENCH.md.

Usage: python tools/duckdb_twin_bench.py  (env: SPARK_GRAFT_SF_DIR)

Queries with no oracle entry (rows-only approximations) are skipped, as is
any headline entry whose oracle needs engine-specific features; the skip
list is printed so the Spark and DuckDB totals always cover an identical
query set.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import __spark_entry__ as entry
    from bench import HEADLINE

    oracles = entry.oracle_sql()
    con = duckdb.connect()
    con.execute(f"SET threads TO {int(os.environ.get('SPARK_GRAFT_CPUS', '32'))}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    timings: dict[str, float] = {}
    skipped = []
    for name in HEADLINE:
        if name not in oracles:
            skipped.append(name)
            continue
        per_run = []
        for _ in range(2):
            t0 = time.perf_counter()
            con.sql(oracles[name]).fetchall()
            per_run.append(time.perf_counter() - t0)
        timings[name] = round(min(per_run), 3)

    print(
        json.dumps(
            {
                "metric": "duckdb_twin_total_runtime",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "skipped_no_oracle": skipped,
            }
        )
    )


if __name__ == "__main__":
    main()
