"""Public plan-audit API: the scale anti-pattern gate the test suite
runs over every inventory query (tests/test_plan_audit.py), exposed so
USERS of the engine can gate their own pipelines the same way — in CI,
or as a pre-flight check before launching a 100 TB job.

Anti-patterns flagged:

- ``BatchEvalPython`` — a row-at-a-time Python UDF on the hot path
  (~10-100x slower than JVM expressions or Arrow-batched pandas).
- ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` — a join that
  lost its equi-condition; quadratic at scale.
- ``Exchange SinglePartition`` feeding a Window or Sort — a global
  window/sort that funnels the whole dataset through ONE task (fine
  for a 1-row aggregate, fatal for per-row ranking at scale).

The audit reads the optimized physical plan only — it never executes
the query.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


class PlanAuditError(AssertionError):
    """A scale anti-pattern was found in the physical plan."""


def plan_text(df: DataFrame, mode: str = "simple") -> str:
    """The physical plan as text (modes: simple, extended, formatted,
    cost, codegen — same as ``df.explain``)."""
    jvm = df.sparkSession._jvm
    em = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(em)


def audit_plan(
    df: DataFrame,
    allow_nested_loop: bool = False,
    allow_python: bool = False,
    allow_global_window: bool = False,
) -> list[str]:
    """Return a list of human-readable findings (empty = clean). Allow
    flags acknowledge intentional uses (a documented broadcast scorer,
    an Arrow decode stage) the way tests/test_plan_audit.py whitelists
    its ground-truth twins."""
    plan = plan_text(df, "simple")
    findings: list[str] = []
    if not allow_python and "BatchEvalPython" in plan:
        findings.append(
            "BatchEvalPython: row-at-a-time Python UDF on the hot path — "
            "use pyspark.sql.functions or an Arrow-batched pandas UDF"
        )
    if not allow_nested_loop:
        for node in ("CartesianProduct", "BroadcastNestedLoopJoin"):
            if node in plan:
                findings.append(
                    f"{node}: join lost its equi-condition — quadratic at scale"
                )
    if not allow_global_window and _global_window_funnel(plan):
        findings.append(
            "Exchange SinglePartition under a Window/Sort: global "
            "ordering funnels all rows through one task — partition "
            "the window or use a two-phase ranked prefix sum"
        )
    return findings


# plan nodes that merely wrap/relay their child in explain output (AQE
# stages, codegen adapters) — skipped when walking from an exchange up
# to its real consumer
_WRAPPER_RE = re.compile(
    r"\b(ShuffleQueryStage|AQEShuffleRead|InputAdapter|WholeStageCodegen|"
    r"ColumnarToRow|ReusedExchange|TableCacheQueryStage|InMemory)\b"
)
# consumers that mean "every row serializes through one task": a global
# Window / Sort / WindowGroupLimit. SortAggregate / SortMergeJoin embed
# the word Sort but are partitioned operators — excluded.
_FUNNEL_RE = re.compile(r"\b(Window(?:GroupLimit|Expression)?|Sort)\s*[\[(]")


def _global_window_funnel(plan: str) -> bool:
    """True when an Exchange SinglePartition feeds a Window/Sort. The
    consumer sits ABOVE the exchange in explain text, possibly behind
    AQE/codegen wrapper lines — adjacency alone misses executed (AQE)
    plans, so walk upward past wrappers to the first real operator."""
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        j = i - 1
        while j >= 0 and (
            _WRAPPER_RE.search(lines[j]) or not lines[j].strip(" +-*:()0-9")
        ):
            j -= 1
        if j < 0:
            continue
        consumer = lines[j]
        if "SortMergeJoin" in consumer or "SortAggregate" in consumer:
            continue
        if _FUNNEL_RE.search(consumer):
            return True
    return False


_UNKNOWN_SIZE_FLOOR = 1 << 60  # stats defaulted (≈ defaultSizeInBytes)


def _has_file_scan(node) -> bool:
    """True when the physical subtree reads from files (its size stats
    are then on-disk compressed bytes, not row footprint)."""
    name = node.nodeName().strip()
    # "Scan ExistingRDD" (checkpoints) carries row-based stats — only
    # format scans report on-disk bytes. Catalog tables append the
    # qualified table name ("Scan parquet spark_catalog.default.t"),
    # so match on the format PREFIX, not exact equality.
    if (
        "FileSourceScan" in name
        or name == "BatchScan"
        or any(
            name == f"Scan {fmt}" or name.startswith(f"Scan {fmt} ")
            for fmt in ("parquet", "orc", "csv", "json", "text")
        )
    ):
        return True
    return any(
        _has_file_scan(node.children().apply(i))
        for i in range(node.children().size())
    )


def audit_broadcast_sizes(
    df: DataFrame,
    max_broadcast_bytes: int = 256 * 1024 * 1024,
    flag_unknown: bool = True,
    file_compression_factor: float = 4.0,
) -> list[dict]:
    """Flag every BroadcastExchange whose build side's DECOMPRESSED
    size estimate exceeds ``max_broadcast_bytes``.

    Why this exists: Spark's broadcast decisions (including AQE's
    runtime SMJ→BHJ conversion) compare against COMPRESSED shuffle
    sizes — a highly compressible build side (minhash bucket keys,
    repeated tokens) can slip under the threshold compressed and then
    explode 10-50x when materialized as JVM rows on every executor.
    That exact failure killed a 100x minhash run before sort-merge
    hints fenced it (r5 scale tier); this check is the user-facing
    pre-flight for it. Catalyst's logical ``sizeInBytes`` is an
    uncompressed row-size estimate, so it catches what the compressed
    comparison misses.

    Walks the pre-adaptive physical plan (``queryExecution.sparkPlan``
    — never executes; exchanges are not materialized there yet, so the
    check targets the Broadcast*Join nodes and their build side
    directly). Returns one finding per oversized broadcast:
    {node, est_bytes (None = stats unavailable/defaulted),
    max_broadcast_bytes, detail}.

    File-backed build sides get ``file_compression_factor`` applied:
    Catalyst's sizeInBytes for a file scan is the ON-DISK (compressed)
    byte count — the very number whose optimism causes the failure —
    while JVM row footprint runs 3-10x that for parquet (default 4.0;
    ``spark.sql.sources.fileCompressionFactor`` exists for the same
    reason and defaults to a trusting 1.0). Build sides with DEFAULTED
    stats
    (e.g. a localCheckpoint behind an explicit broadcast() hint) are
    flagged as unknown when ``flag_unknown`` — an un-sized forced
    broadcast is exactly where the estimate discipline breaks down;
    pass ``flag_unknown=False`` to accept them knowingly."""
    root = df._jdf.queryExecution().sparkPlan()
    findings: list[dict] = []

    def walk(node) -> None:
        if (
            node.nodeName() in ("BroadcastHashJoin", "BroadcastNestedLoopJoin")
            and node.children().size() == 2
        ):
            build_left = node.buildSide().toString() == "BuildLeft"
            child = node.children().apply(0 if build_left else 1)
            est: int | None = None
            link = child.logicalLink()
            if link.isDefined():
                # py4j maps scala.BigInt through to a Python int when it
                # fits; fall back to string parsing otherwise
                raw = link.get().stats().sizeInBytes()
                est = raw if isinstance(raw, int) else int(str(raw))
                if est < _UNKNOWN_SIZE_FLOOR and _has_file_scan(child):
                    est = int(est * float(file_compression_factor))
            if est is None or est >= _UNKNOWN_SIZE_FLOOR:
                if flag_unknown:
                    findings.append(
                        {
                            "node": child.nodeName(),
                            "est_bytes": None,
                            "max_broadcast_bytes": int(max_broadcast_bytes),
                            "detail": (
                                "broadcast build side has no usable size "
                                "estimate (stats defaulted) — size it "
                                "explicitly or drop the broadcast hint"
                            ),
                        }
                    )
            elif est > int(max_broadcast_bytes):
                findings.append(
                    {
                        "node": child.nodeName(),
                        "est_bytes": est,
                        "max_broadcast_bytes": int(max_broadcast_bytes),
                        "detail": (
                            f"broadcast build side estimated at {est} bytes "
                            f"decompressed (> {int(max_broadcast_bytes)}); a "
                            "compressed-size check may still convert this — "
                            "hint merge/shuffle_hash on the join instead"
                        ),
                    }
                )
        for i in range(node.children().size()):
            walk(node.children().apply(i))

    walk(root)
    return findings


def assert_scalable_plan(df: DataFrame, **allow) -> None:
    """Raise :class:`PlanAuditError` listing every finding; no-op when
    the plan is clean. Keyword flags as in :func:`audit_plan`."""
    findings = audit_plan(df, **allow)
    if findings:
        raise PlanAuditError(
            "plan fails the scale audit:\n  - " + "\n  - ".join(findings)
        )


def scan_report(df: DataFrame) -> list[dict]:
    """Per-scan pushdown/pruning report from the formatted plan: one
    dict per file scan with ``location``, ``read_columns`` (what the
    scan actually reads — column pruning made visible), and
    ``pushed_filters`` (predicates that reached the format reader).
    The positive counterpart of :func:`audit_plan`: where audit flags
    anti-patterns, this shows whether pushdown and pruning landed —
    a scan reading 16 columns for a 2-column projection, or an empty
    ``pushed_filters`` under a selective predicate, is a 100 TB
    performance bug that returns correct answers at test scale."""
    txt = plan_text(df, "formatted")
    reports: list[dict] = []
    current: dict | None = None
    for line in txt.splitlines():
        s = line.strip()
        if re.match(r"\(\d+\) Scan \w+", s):
            current = {"location": "", "read_columns": [], "pushed_filters": []}
            reports.append(current)
        elif current is not None:
            if s.startswith("Location:"):
                m = re.search(r"\[([^\]]*)\]", s)
                current["location"] = m.group(1) if m else s[len("Location:"):].strip()
            elif s.startswith("PushedFilters:"):
                inner = s.split(":", 1)[1].strip().strip("[]")
                current["pushed_filters"] = (
                    [f.strip() for f in re.split(r",\s*(?![^()]*\))", inner)]
                    if inner
                    else []
                )
            elif s.startswith("ReadSchema:"):
                m = re.search(r"struct<(.*)>", s)
                if m and m.group(1):
                    current["read_columns"] = [
                        f.split(":", 1)[0] for f in re.split(r",(?![^<>]*>)", m.group(1))
                    ]
            elif not s:
                current = None
    return reports


def suggest_shuffle_partitions(
    df: DataFrame,
    target_partition_bytes: int = 128 * 1024 * 1024,
    sample_rows: int = 2000,
    min_partitions: int = 1,
    max_partitions: int = 200_000,
) -> dict:
    """Size ``spark.sql.shuffle.partitions`` for a relation: estimate
    the in-flight bytes and divide by a target partition size (default
    128 MB — the conventional working-set-per-task bound; README
    "knobs that change on a real cluster").

    Row width is estimated as the mean JSON-rendered length of an
    ARBITRARY head sample (``limit`` takes whichever partitions answer
    first — cheap, but reruns can sample different rows and data sorted
    by size can skew the estimate) times a 1.3 in-memory fudge
    (UnsafeRow + field overhead vs JSON text roughly cancel; this is a
    sizing heuristic, not an accountant). Two cheap jobs: one count,
    one ``sample_rows``-row aggregate.

    Returns {rows, est_row_bytes, est_total_bytes, target_partition_bytes,
    suggested_partitions}. Pair with AQE coalescing: set the suggestion
    as the ceiling and let AQE shrink small stages."""
    from pyspark.sql import functions as F

    rows = df.count()
    if rows == 0:
        return {
            "rows": 0,
            "est_row_bytes": 0,
            "est_total_bytes": 0,
            "target_partition_bytes": target_partition_bytes,
            "suggested_partitions": min_partitions,
        }
    width_row = (
        df.limit(sample_rows)
        .select(
            F.avg(
                F.length(F.to_json(F.struct(*[F.col(c) for c in df.columns])))
            ).alias("w")
        )
        .first()
    )
    est_row = float(width_row["w"] or 0.0) * 1.3
    total = int(est_row * rows)
    import math

    parts = max(
        min_partitions,
        min(max_partitions, math.ceil(total / target_partition_bytes)),
    )
    return {
        "rows": rows,
        "est_row_bytes": round(est_row, 1),
        "est_total_bytes": total,
        "target_partition_bytes": target_partition_bytes,
        "suggested_partitions": parts,
    }
