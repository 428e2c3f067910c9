"""Resumable multi-stage pipeline runner.

A 100 TB corpus-preparation run is hours of cluster time across many
stages (clean → dedup → decontam → score → select); when stage 4 dies,
re-running stages 1-3 is the expensive failure mode. This runner
materializes every stage to its own parquet directory with an explicit
commit manifest, and on re-run SKIPS the longest committed prefix whose
stage names still match the requested plan — the same
commit-marker-last discipline as ``sources.lake`` (a crashed write has
no manifest and is recomputed, never half-read).

Deliberate properties:
- Each stage reads its predecessor FROM PARQUET, not from lineage — a
  natural lineage cut (no 10-stage DAG recompiled per action) and the
  recovery point. This is the batch analogue of streaming checkpoints.
- The manifest records a CHAIN token hashing the stage's (position,
  name, fingerprint) together with its parent's chain; editing the
  pipeline invalidates the edited stage AND everything after it
  (results downstream of a changed stage are stale by definition),
  even across a crash between the upstream recompute and the
  downstream overwrite.
- ``fingerprint`` (optional per stage) lets callers invalidate on
  parameter changes too: it is stored in the manifest and compared on
  resume.
- No writer-writer coordination (same documented limit as the lake):
  serialize concurrent runs of one workdir externally.
"""

from __future__ import annotations

import json
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from hama_spark.sources.lake import _fs_and_path

MANIFEST = "_STAGE_COMMITTED"


def _stage_dir(workdir: str, index: int, name: str) -> str:
    return f"{workdir}/{index:02d}_{name}"


def _read_manifest(spark: SparkSession, stage_dir: str) -> dict | None:
    fs, jpath, jvm = _fs_and_path(spark, stage_dir)
    mpath = jvm.org.apache.hadoop.fs.Path(jpath, MANIFEST)
    if not fs.exists(mpath):
        return None
    # the _-prefixed name keeps the manifest invisible to the parquet
    # reader; read it JVM-side (py4j returns byte[] values but does NOT
    # propagate in-place buffer mutation, so IOUtils, not stream.read(buf))
    stream = fs.open(mpath)
    try:
        data = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
    finally:
        stream.close()
    return json.loads(data.decode("utf-8"))


def _write_manifest(spark: SparkSession, stage_dir: str, manifest: dict) -> None:
    fs, jpath, jvm = _fs_and_path(spark, stage_dir)
    mpath = jvm.org.apache.hadoop.fs.Path(jpath, MANIFEST)
    out = fs.create(mpath, True)
    try:
        out.write(json.dumps(manifest, sort_keys=True).encode("utf-8"))
    finally:
        out.close()


def run_stages(
    source: DataFrame,
    stages: list[tuple[str, Callable[[DataFrame], DataFrame]]],
    workdir: str,
    fingerprints: dict[str, str] | None = None,
    force: bool = False,
) -> tuple[DataFrame, list[dict]]:
    """Run ``stages`` (ordered ``(name, fn)`` pairs, each fn a
    DataFrame→DataFrame transform) with per-stage parquet
    materialization under ``workdir`` and resume-on-rerun.

    Returns (final DataFrame read from the last stage's directory,
    report) where report has one dict per stage:
    {stage, index, path, status: 'ran'|'skipped', rows}.

    Resume rule: stage i is skipped iff every stage ≤ i is committed
    with a matching CHAIN token — a hash over (index, name,
    fingerprint) AND the parent stage's chain, so a manifest certifies
    not just "this stage ran with these params" but "…on top of exactly
    this upstream history". This closes the interrupted-invalidation
    hole: recompute stage B (new fingerprint), crash before C
    overwrites, re-run — C's old manifest carries B-v1's chain, cannot
    match B-v2's, and C recomputes instead of silently serving data
    derived from the stale upstream. ``force=True`` recomputes
    everything. ``fingerprints`` maps stage name → an opaque string of
    the caller's parameters (hash thresholds, model versions, …)."""
    import hashlib

    if len({n for n, _ in stages}) != len(stages):
        raise ValueError("stage names must be unique")
    spark = source.sparkSession
    fingerprints = fingerprints or {}
    report: list[dict] = []
    current = source
    resuming = not force
    chain = "root"
    for i, (name, fn) in enumerate(stages):
        sdir = _stage_dir(workdir, i, name)
        fp = fingerprints.get(name, "")
        chain = hashlib.sha256(f"{chain}|{i}|{name}|{fp}".encode()).hexdigest()
        manifest = _read_manifest(spark, sdir) if resuming else None
        if manifest is not None and manifest.get("chain") == chain:
            current = spark.read.parquet(sdir)
            report.append(
                {
                    "stage": name,
                    "index": i,
                    "path": sdir,
                    "status": "skipped",
                    "rows": manifest.get("rows"),
                }
            )
            continue
        # first non-committed stage breaks the skippable prefix
        resuming = False
        out = fn(current)
        out.write.mode("overwrite").parquet(sdir)
        committed = spark.read.parquet(sdir)
        rows = committed.count()
        _write_manifest(
            spark,
            sdir,
            {
                "index": i,
                "stage": name,
                "fingerprint": fp,
                "chain": chain,
                "rows": rows,
            },
        )
        current = committed
        report.append(
            {
                "stage": name,
                "index": i,
                "path": sdir,
                "status": "ran",
                "rows": rows,
            }
        )
    return current, report
