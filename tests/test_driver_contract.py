"""Driver-contract regression guard: the round driver builds its OWN
SparkSession (no hama_spark configs), then calls load_tables via the
entry points. Round 1 died 0/44 because the nanosAsLong parquet escape
hatch lived only in get_spark() — this test pins the fix by running the
contract on a deliberately bare session in a fresh interpreter.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

# a stock session: no nanosAsLong, stock shuffle partitions (200), no UTC
spark = (
    SparkSession.builder.appName("bare_driver")
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
spark.sparkContext.setCheckpointDir("/tmp/bare_driver_ckpt")

import __spark_entry__ as e

df = e.entry(spark)
rows = df.count()
assert rows >= 0 and len(df.schema) > 0, (rows, df.schema)

qs = e.queries()
# one timestamp-heavy query (events parquet is TIMESTAMP(NANOS) — the
# exact r1 failure) and one iterative one
for name in ("events_window", "inlink_count"):
    out = qs[name](spark, "/root/testdata/sf0.001")
    assert out.count() > 0, name
print("BARE_SESSION_OK", rows)
"""


def test_entry_and_queries_on_bare_session():
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(repo=REPO)],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "BARE_SESSION_OK" in proc.stdout, proc.stdout[-1000:]
