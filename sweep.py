#!/usr/bin/env python
"""Plain-session oracle sweep: run EVERY __spark_entry__.queries() entry
and its oracle_sql() twin side-by-side and compare exactly — value AND
column-order equality — the same protocol the driver and judge use.

Run it from a NEUTRAL cwd (not the repo root): with the driver cwd
inside the repo, executor Python workers can import the package and a
Pandas-UDF closure that references a module-level function works by
accident; from /tmp it fails loudly if a kernel isn't pickled by value.

    cd /tmp && python /root/repo/sweep.py [sf_dir] [name ...]

Defaults to /root/testdata/sf0.01 (the driver's grading scale) and all
entries. Exit code 0 iff every compared entry is exact.
"""

from __future__ import annotations

import datetime
import decimal
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    args = sys.argv[1:]
    sf = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    names = args[1:] if args and os.path.isdir(args[0]) else args

    # a PLAIN session on purpose: the driver does not apply the engine's
    # session-factory configs, so neither does the sweep
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    todo = names or list(qs)
    t0 = time.time()
    bad = 0
    for name in todo:
        try:
            sdf = qs[name](spark, sf)
            odf = con.sql(os_[name])
            ocols = [c.lower() for c in odf.columns]
            scols = {c.lower(): c for c in sdf.columns}
            col_ok = [c.lower() for c in sdf.columns] == ocols
            srows = sorted(
                tuple(_norm(v) for v in r)
                for r in sdf.select(*[scols[c] for c in ocols]).collect()
            )
            orows = sorted(tuple(_norm(v) for v in r) for r in odf.fetchall())
            ok = col_ok and srows == orows
        except Exception as ex:  # noqa: BLE001 — report and keep sweeping
            bad += 1
            print(f"{name} ERROR {ex!r}"[:250], flush=True)
            continue
        if not ok:
            bad += 1
            print(
                f"{name} MISMATCH col_ok={col_ok} "
                f"rows {len(srows)} vs {len(orows)}",
                flush=True,
            )
    print(
        f"SWEEP DONE {len(todo)} entries, {bad} bad, {round(time.time() - t0)} s",
        flush=True,
    )
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
