"""Local replica of the driver's per-round correctness gate.

Builds a *vanilla* SparkSession (none of our session.py defaults — the real
driver constructs its own), runs each ``__spark_entry__.queries()`` entry at
sf=0.01, and compares against ``oracle_sql()`` with the strict cell-level
comparator in tests/oracle.py. Run with a hostile timezone to flush TZ bugs:

    TZ=America/New_York python tools/driver_sim.py [name ...]

With no args, checks every registered query (oracle-less ones get a
rows-only run). ``--first N`` limits to the first N in check-priority order,
mirroring a driver cap.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--first", type=int, default=None)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("driver-sim")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )

    import __spark_entry__ as entry
    from tests.oracle import compare, duck_connection

    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = args.names or list(qs)
    if args.first:
        names = names[: args.first]

    failures: list[str] = []
    for name in names:
        t0 = time.time()
        try:
            if name in oracles:
                compare(name, spark, args.sf_dir, qs, oracles)
                status = "PASS"
            else:
                n = qs[name](spark, args.sf_dir).count()
                status = f"ROWS-ONLY ({n} rows)"
        except Exception:
            status = "FAIL"
            failures.append(name)
            traceback.print_exc()
        print(f"{name:42s} {status:18s} {time.time() - t0:6.1f}s", flush=True)

    print(f"\n{len(names) - len(failures)}/{len(names)} ok")
    if failures:
        print("FAILED:", failures)
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
