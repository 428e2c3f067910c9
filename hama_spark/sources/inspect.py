"""Parquet layout inspection: per-file footer stats and a clustering
quality score for data skipping.

At 100 TB the cheapest scan is the one that never opens the file:
engines skip whole files using footer min/max ranges, but skipping only
works when the writing layout CLUSTERED the column (sorted,
range-partitioned, or Z-ordered — ``sources.zorder``). This module
makes that property measurable: per-file ranges plus the expected
number of files a point lookup must open ("files hit per probe" —
1.0 = perfectly clustered, n_files = useless ranges).

Footer reading is pyarrow on the driver over locally-resolvable paths
(file:/ or plain) — fine for the layout sizes a human inspects; wire
the same per-file function through ``mapInPandas`` over a file list if
a layout ever has too many files for a driver loop (documented limit,
not a silent cap: the report raises beyond ``max_files``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def _local_parquet_files(path: str, max_files: int) -> list[str]:
    p = path[len("file:"):] if path.startswith("file:") else path
    if not os.path.isdir(p):
        if os.path.isfile(p):
            return [p]
        raise ValueError(f"not a local parquet path: {path}")
    out = []
    for root, _dirs, files in os.walk(p):
        for f in sorted(files):
            if f.endswith(".parquet") and not f.startswith((".", "_")):
                out.append(os.path.join(root, f))
    if len(out) > max_files:
        raise ValueError(
            f"{len(out)} files exceeds max_files={max_files} — inspect a "
            f"partition subdirectory, or raise the cap deliberately"
        )
    return out


def _file_ranges(path: str, column: str, max_files: int) -> list[dict]:
    """Per-file footer stats shared by the report and the score:
    {file, n_rows, n_bytes, min, max, has_stats} with min/max aggregated
    across row groups (native parquet types, not stringified)."""
    import pyarrow.parquet as pq

    out = []
    for f in _local_parquet_files(path, max_files):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(column) if column in md.schema.names else -1
        if idx < 0:
            raise ValueError(f"column {column!r} not in {f}")
        mn = mx = None
        have = True
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                have = False
                break
            mn = st.min if mn is None else min(mn, st.min)
            mx = st.max if mx is None else max(mx, st.max)
        out.append(
            {
                "file": os.path.basename(f),
                "n_rows": int(md.num_rows),
                "n_bytes": int(os.path.getsize(f)),
                "min": mn if have else None,
                "max": mx if have else None,
                "has_stats": have and mn is not None,
            }
        )
    return out


def parquet_layout_report(
    spark: SparkSession, path: str, column: str, max_files: int = 10_000
) -> DataFrame:
    """Per-file footer stats for ``column``: (file, n_rows, n_bytes,
    col_min, col_max) as a small DataFrame (one row per data file).
    min/max come from the parquet column statistics aggregated across
    row groups; files without stats for the column get NULL bounds
    (they can never be skipped — exactly what the report should
    surface)."""
    rows = [
        (
            r["file"],
            r["n_rows"],
            r["n_bytes"],
            str(r["min"]) if r["has_stats"] else None,
            str(r["max"]) if r["has_stats"] else None,
        )
        for r in _file_ranges(path, column, max_files)
    ]
    return spark.createDataFrame(
        rows, "file string, n_rows bigint, n_bytes bigint, col_min string, col_max string"
    )


def clustering_score(
    spark: SparkSession, path: str, column: str, max_files: int = 10_000
) -> dict:
    """Expected number of files a point lookup on ``column`` must open:
    probe at every file's min value (real data values, so the score is
    meaningful for numeric and string stats alike — and degenerate
    single-value layouts score n, not an optimistic zero-width 0) and
    average the count of files whose [min, max] contains the probe.
    1.0 means perfectly clustered; n_files means every file opens every
    time.

    Returns {n_files, files_hit_per_probe, unskippable_files}."""
    stats = _file_ranges(path, column, max_files)
    ranges = [(r["min"], r["max"]) for r in stats if r["has_stats"]]
    unskippable = sum(1 for r in stats if not r["has_stats"])
    n = len(stats)
    if not ranges:
        return {
            "n_files": n,
            "files_hit_per_probe": float(n),
            "unskippable_files": unskippable,
        }
    probes = [a for a, _ in ranges]
    hit = sum(
        sum(1 for a, b in ranges if a <= p <= b) for p in probes
    ) / len(probes)
    return {
        "n_files": n,
        # an unskippable file is opened by every probe
        "files_hit_per_probe": round(float(hit) + unskippable, 3),
        "unskippable_files": unskippable,
    }
