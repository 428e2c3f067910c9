"""Mimic the driver's correctness gate: run every __spark_entry__ query
at sf0.01 in Spark AND its DuckDB oracle, compare row count + column
names + order-insensitive values. Usage:

    python scripts/selfcheck.py [query ...]   # default: all

A FULL run (no query filter) also records the per-query verdicts to
SELFCHECK_r{N}.json (N from SPARK_GRAFT_ROUND, default 04) — the
committed evidence that out-of-window queries were value-checked this
round, referenced by tests/test_driver_contract.py.
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from hama_spark.session import TABLES, get_spark

# override with SPARK_GRAFT_SELFCHECK_SF=/root/testdata/sf0.1 to verify
# oracle parity above the driver's gate scale
SF_DIR = os.environ.get("SPARK_GRAFT_SELFCHECK_SF", "/root/testdata/sf0.01")


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return str(v)


def main() -> int:
    only = set(sys.argv[1:])
    spark = get_spark(app_name="selfcheck")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, SF_DIR)
            rows = df.collect()
            cols = df.columns
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            results[name] = {"status": "FAIL", "why": f"spark error: {e}"[:300]}
            failures += 1
            continue
        elapsed = time.time() - t0
        if name not in oracles:
            print(f"ok-   {name}: rows={len(rows)} (rows-only, no oracle) [{elapsed:.1f}s]")
            results[name] = {"status": "rows-only", "rows": len(rows), "secs": round(elapsed, 1)}
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            results[name] = {"status": "FAIL", "why": f"oracle error: {e}"[:300]}
            failures += 1
            continue
        if sorted(c.lower() for c in cols) != sorted(c.lower() for c in ocols):
            print(f"FAIL  {name}: columns {cols} vs oracle {ocols}")
            results[name] = {"status": "FAIL", "why": f"columns {cols} vs {ocols}"[:300]}
            failures += 1
            continue
        # align oracle column order to spark's
        idx = [[c.lower() for c in ocols].index(c.lower()) for c in cols]
        orows = [tuple(r[i] for i in idx) for r in orows]
        if len(rows) != len(orows):
            print(f"FAIL  {name}: rowcount {len(rows)} vs oracle {len(orows)}")
            results[name] = {"status": "FAIL", "why": f"rowcount {len(rows)} vs {len(orows)}"}
            failures += 1
            continue
        a = sorted(tuple(norm(v) for v in r) for r in rows)
        b = sorted(tuple(norm(v) for v in r) for r in orows)
        if a != b:
            bad = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL  {name}: value mismatch, first diffs: {bad}")
            results[name] = {"status": "FAIL", "why": f"value mismatch: {bad}"[:300]}
            failures += 1
            continue
        print(f"OK    {name}: rows={len(rows)} hash-match [{elapsed:.1f}s]")
        results[name] = {"status": "hash-match", "rows": len(rows), "secs": round(elapsed, 1)}
    print("FAILURES:", failures)
    if not only:
        import json

        rnd = os.environ.get("SPARK_GRAFT_ROUND", "06")
        suffix = "_sf01" if "sf0.1" in SF_DIR else ""
        path = f"/root/repo/SELFCHECK_r{rnd}{suffix}.json"
        with open(path, "w") as f:
            json.dump(
                {"sf_dir": SF_DIR, "failures": failures, "results": results},
                f, indent=1, sort_keys=True,
            )
        print(f"wrote {path}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
