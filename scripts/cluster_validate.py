"""Multi-JVM validation under ``local-cluster[W,C,M]`` (round-7 verdict
item 2): witness — not just plan-assert — the design claims that only
matter across REAL executor boundaries. ``local[32]`` is one JVM: every
"shuffle" is an in-process memcpy, every "broadcast" a reference share,
executor loss is unobservable. Spark's local-cluster master launches a
real in-process standalone Master/Workers and SEPARATE executor JVMs,
so exchanges serialize, broadcasts transfer, and the measured deltas
mean what they would on a cluster. This is the reference's own core
claim surface (bsp/BSPMaster.java, bsp/GroomServer.java:744-750 task
dispatch): our equivalent is Spark's scheduler, exercised here.

Checks (each timed, each verified, all on seeded generated inputs):
  dense_pregel_ab   PageRank on a 1M-vertex graph, sparse loop vs the
                    exchange-free ``dense=True`` loop; value-hash of
                    the two results must match; record the speedup the
                    local[32] A/B could not honestly measure.
  co_located_join   write both sides bucketed, join exchange-free
                    (plan-asserted: zero Exchange operators) vs the
                    same join from plain parquet; row counts equal.
  recovery_10x      sssp on a 1M-vertex graph killed at superstep ~20,
                    resumed from the durable recover_dir checkpoint;
                    value-hash must equal the uninterrupted run's
                    (verdict item 6: kill-and-resume at the 10x tier,
                    here additionally under multi-JVM executors).
  minhash_100x      the 500k-doc (100x) MinHash+LSH tier — the one
                    that exposed the AQE decompressed-broadcast failure
                    in round 5 — re-run across real executors; pair
                    count must equal the local[32] run's (deterministic
                    seeded input).

Usage:
    python scripts/cluster_validate.py                  # all checks
    python scripts/cluster_validate.py dense_pregel_ab  # one check

Writes CLUSTER_r{ROUND}.json (repo root) and merges per-check so the
suite can run in chunks.
"""

from __future__ import annotations

import importlib
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyspark
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

ROUND = os.environ.get("SPARK_GRAFT_ROUND", "07")
WORKERS = int(os.environ.get("SPARK_GRAFT_LC_WORKERS", "4"))
CORES = int(os.environ.get("SPARK_GRAFT_LC_CORES", "8"))
MEM_MB = int(os.environ.get("SPARK_GRAFT_LC_MEM_MB", "4096"))
GRAPH_N = int(os.environ.get("SPARK_GRAFT_LC_GRAPH_N", "1000000"))


def build_spark() -> SparkSession:
    # local-cluster needs SPARK_HOME to spawn worker/executor JVMs; the
    # pip install IS a valid SPARK_HOME for that purpose
    os.environ.setdefault("SPARK_HOME", os.path.dirname(pyspark.__file__))
    s = (
        SparkSession.builder.appName("hama_spark_cluster_validate")
        .master(f"local-cluster[{WORKERS},{CORES},{MEM_MB}]")
        .config("spark.executor.memory", f"{max(1024, MEM_MB - 1024)}m")
        .config("spark.sql.shuffle.partitions", str(WORKERS * CORES))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        # executors are fresh JVMs with the launch cwd but no sys.path
        # surgery — hand them the repo for the Pandas-UDF pickles
        .config("spark.executorEnv.PYTHONPATH", REPO)
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.sql.warehouse.dir", "/tmp/hama_spark_lc_warehouse")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("WARN")
    s.sparkContext.setCheckpointDir("/tmp/hama_spark_lc_ckpt")
    return s


def _value_hash(df, cols: list[str]) -> int:
    """Order-independent content hash: sum of per-row xxhash64 over the
    named columns (doubles rounded to 9 dp first). Decimal accumulator:
    a long sum of 64-bit hashes overflows under ANSI mode."""
    exprs = [
        F.round(F.col(c), 9) if t.startswith("double") else F.col(c)
        for c, t in df.select(*cols).dtypes
    ]
    return int(
        df.select(
            F.sum(F.xxhash64(*exprs).cast("decimal(38,0)")).alias("h")
        ).first()["h"]
    )


def _executors(spark) -> int:
    return spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size() - 1


# ------------------------------------------------------------- checks
def check_dense_pregel_ab(spark) -> dict:
    """The r6 verdict's unverifiable claim: pregel(dense=True) trades
    one eager inbox action per superstep for ZERO vertex-side
    Exchanges — worth it only when an Exchange costs real network, i.e.
    never measurable inside one JVM. Measure both loops here."""
    from hama_spark.graph.pagerank import pagerank
    from hama_spark.sources import fast_graph_gen

    edges = (
        fast_graph_gen(spark, GRAPH_N, max_out=3, seed=42)
        .select("src", "dst")
        .localCheckpoint(eager=True)
    )
    parts = WORKERS * CORES * 2
    out: dict = {"graph_n": GRAPH_N, "num_partitions": parts}
    prs = {}
    for label, dense in (("sparse", False), ("dense", True)):
        t0 = time.time()
        prs[label] = pagerank(
            edges,
            epsilon=None,
            max_iter=5,
            self_ref=True,
            num_partitions=parts,
            dense=dense,
        ).localCheckpoint(eager=True)
        out[f"{label}_sec"] = round(time.time() - t0, 2)
    # Dense and sparse aggregate neighbor contributions under DIFFERENT
    # physical plans, so their float fold orders differ legitimately —
    # and across real executors the arrival order varies per run.
    # A rounded-value hash therefore flips whenever a rank lands near a
    # rounding boundary (observed flaky r8: same code, pass then fail).
    # Compare the relations the way floats must be compared: full outer
    # join on id, exact id-set match, max absolute rank difference
    # under tolerance.
    j = (
        prs["sparse"]
        .select("id", F.col("rank").alias("r_s"))
        .join(prs["dense"].select("id", F.col("rank").alias("r_d")), "id", "full")
    )
    row = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("r_s").isNull() | F.col("r_d").isNull(), 1).otherwise(0)
        ).alias("missing"),
        F.max(F.abs(F.col("r_s") - F.col("r_d"))).alias("mx"),
    ).first()
    out["rows"] = int(row["n"])
    out["max_abs_rank_diff"] = float(row["mx"]) if row["mx"] is not None else None
    out["values_match"] = bool(
        row["missing"] == 0 and row["mx"] is not None and row["mx"] <= 1e-9
    )
    out["dense_speedup"] = round(out["sparse_sec"] / out["dense_sec"], 3)
    edges.unpersist()
    return out


def check_co_located_join(spark) -> dict:
    """Bucketed SMJ across real executors: both sides written
    bucketBy(key) once, then joined with ZERO Exchange operators —
    vs the same join from plain parquet paying two network shuffles."""
    import shutil

    from hama_spark.operators.bucketing import co_located_join, write_bucketed

    # the in-memory catalog forgets tables across runs but their
    # LOCATIONS persist — clear them or saveAsTable dies with
    # LOCATION_ALREADY_EXISTS on the second invocation
    for tbl in ("lc_fact_b", "lc_dim_b"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(f"/tmp/hama_spark_lc_warehouse/{tbl}", ignore_errors=True)

    # env-tunable size (r8 verdict item 6): at the 2M smoke default the
    # Exchange saving is noise-level across 4 executors (0.97-1.28x
    # between rounds); a bigger tier makes the shuffled bytes matter
    n = int(os.environ.get("SPARK_GRAFT_LC_JOIN_N", "2000000"))
    if n < 4:
        # n < 4 makes n_dim = 0, so (id % 0) yields null join keys and
        # both joins return 0 rows — the rows/hash checks would then
        # pass vacuously (r9 ADVICE)
        raise ValueError(f"SPARK_GRAFT_LC_JOIN_N must be >= 4, got {n}")
    n_dim = n // 4
    fact = spark.range(n).select(
        (F.col("id") % n_dim).alias("k"),
        F.xxhash64("id").alias("payload"),
    )
    dim = spark.range(n_dim).select(
        F.col("id").alias("k"), F.md5(F.col("id").cast("string")).alias("attr")
    )
    plain_f, plain_d = "/tmp/hama_spark_lc_plain_f", "/tmp/hama_spark_lc_plain_d"
    fact.write.mode("overwrite").parquet(plain_f)
    dim.write.mode("overwrite").parquet(plain_d)
    write_bucketed(spark.read.parquet(plain_f), "lc_fact_b", "k", n_buckets=32)
    write_bucketed(spark.read.parquet(plain_d), "lc_dim_b", "k", n_buckets=32)

    agg = lambda j: j.groupBy().agg(  # noqa: E731
        F.count(F.lit(1)).alias("n"),
        # decimal: a long sum of xxhash64 overflows under ANSI mode
        F.sum(F.xxhash64("k", "attr").cast("decimal(38,0)")).alias("h"),
    )
    # pin both joins to SMJ: the contrast being measured is
    # shuffle-exchange vs bucket-layout SMJ, not SMJ vs broadcast
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        plain_join = agg(
            spark.read.parquet(plain_f).join(spark.read.parquet(plain_d), "k")
        )
        plain_plan = plain_join._jdf.queryExecution().executedPlan().toString()
        t0 = time.time()
        shuffled = plain_join.first()
        shuffled_sec = round(time.time() - t0, 2)

        joined = agg(co_located_join(spark, "lc_fact_b", "lc_dim_b", "k"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        t0 = time.time()
        bucketed = joined.first()
        bucketed_sec = round(time.time() - t0, 2)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    for tbl in ("lc_fact_b", "lc_dim_b"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    # the join itself must be exchange-free; the final 1-row global agg
    # legitimately adds one single-partition exchange — exclude it by
    # checking the plan BELOW the SortMergeJoin node
    join_plan = plan[plan.find("SortMergeJoin"):]
    # a zero-row join can only agree vacuously — fail loudly instead of
    # reporting rows_match/hash_match = true on no evidence (r9 ADVICE)
    if not bucketed["n"] or not shuffled["n"]:
        raise AssertionError(
            f"co-located-join check produced an empty join (bucketed n="
            f"{bucketed['n']}, shuffled n={shuffled['n']}) — cannot validate"
        )
    return {
        "join_n": n,
        "rows": int(bucketed["n"]),
        "rows_match": bucketed["n"] == shuffled["n"],
        "hash_match": bucketed["h"] == shuffled["h"],
        "join_exchange_free": "Exchange" not in join_plan and "SortMergeJoin" in plan,
        "plain_join_shuffles": plain_plan.count("Exchange hashpartitioning"),
        "shuffled_sec": shuffled_sec,
        "bucketed_sec": bucketed_sec,
        "bucketed_speedup": round(shuffled_sec / bucketed_sec, 3),
    }


def check_recovery_10x(spark) -> dict:
    """Kill-and-resume at the 10x tier (1M vertices), under real
    executors: run sssp uninterrupted, then a twin killed at superstep
    ~20 of its ~35, then resume from the durable checkpoint; the
    resumed result must value-hash-equal the uninterrupted one."""
    import shutil

    from hama_spark.sources import fast_graph_gen

    sssp_mod = importlib.import_module("hama_spark.graph.sssp")
    rdir = "/tmp/hama_spark_lc_recover"
    shutil.rmtree(rdir, ignore_errors=True)
    parts = WORKERS * CORES * 2
    edges = (
        fast_graph_gen(spark, GRAPH_N, max_out=3, weight=100, seed=7)
        .select("src", "dst", (F.col("weight") + 1).alias("weight"))
        .localCheckpoint(eager=True)
    )
    kw = dict(
        max_iter=50,
        num_partitions=parts,
        halt_check_interval=5,
        checkpoint_interval=5,
    )
    stats: dict = {}
    t0 = time.time()
    base = sssp_mod.sssp(edges, "0", stats_out=stats, **kw)
    base_hash = _value_hash(base, ["id", "dist"])
    base_sec = round(time.time() - t0, 2)

    real = sssp_mod.pregel
    kill_at = max(2, stats.get("supersteps_run", 35) // 2)
    seen: list[int] = []

    def killing(vertices, e, compute, **kw2):
        def crashing(df, ctx):
            seen.append(ctx.superstep)
            if ctx.superstep == kill_at:
                raise RuntimeError("simulated driver crash")
            return compute(df, ctx)

        return real(vertices, e, compute=crashing, **kw2)

    sssp_mod.pregel = killing
    crashed = False
    try:
        sssp_mod.sssp(edges, "0", recover_dir=rdir, **kw)
    except RuntimeError:
        crashed = True
    finally:
        sssp_mod.pregel = real

    t0 = time.time()
    resumed = sssp_mod.sssp(edges, "0", recover_dir=rdir, **kw)
    resumed_hash = _value_hash(resumed, ["id", "dist"])
    resume_sec = round(time.time() - t0, 2)
    edges.unpersist()
    shutil.rmtree(rdir, ignore_errors=True)
    return {
        "graph_n": GRAPH_N,
        "supersteps": stats.get("supersteps_run"),
        "killed_at": kill_at,
        "crashed": crashed,
        "hash_match": resumed_hash == base_hash,
        "uninterrupted_sec": base_sec,
        "resume_sec": resume_sec,
    }


def check_minhash_100x(spark) -> dict:
    """The 100x MinHash+LSH tier (500k generated docs) across real
    executors — the configuration whose AQE decompressed-broadcast
    failure the SMJ hints fence (r5); the pair count is deterministic,
    so it must equal the local[32] SCALE run's."""
    from scripts.scale_run import SMALL, gen_docs

    from hama_spark.extensions import minhash_lsh_dup_pairs

    n = SMALL["docs"] * 100
    docs = gen_docs(spark, n).localCheckpoint(eager=True)
    t0 = time.time()
    pairs = minhash_lsh_dup_pairs(docs, threshold=0.5, num_hashes=16, bands=4)
    rows = pairs.count()
    sec = round(time.time() - t0, 2)
    docs.unpersist()
    return {"docs": n, "pairs": rows, "sec": sec}


CHECKS = {
    "dense_pregel_ab": check_dense_pregel_ab,
    "co_located_join": check_co_located_join,
    "recovery_10x": check_recovery_10x,
    "minhash_100x": check_minhash_100x,
}


def main() -> int:
    only = set(sys.argv[1:])
    spark = build_spark()
    # warm: one shuffle so executor registration/codegen is off the clock
    spark.range(0, 1_000_000, 1, 32).groupBy(
        (F.col("id") % 97).alias("k")
    ).count().write.format("noop").mode("overwrite").save()

    from bench import _calibration

    out: dict = {
        "round": ROUND,
        "master": f"local-cluster[{WORKERS},{CORES},{MEM_MB}]",
        "executors_seen": _executors(spark),
        "cal_shuffle_sec": _calibration(spark),
        "checks": {},
    }
    for name, fn in CHECKS.items():
        if only and name not in only:
            continue
        try:
            out["checks"][name] = fn(spark)
        except Exception as e:  # record the failure, keep going
            out["checks"][name] = {"error": f"{type(e).__name__}: {e}"}
        print(f"# {name}: {out['checks'][name]}", file=sys.stderr)

    path = os.environ.get(
        "SPARK_GRAFT_CLUSTER_OUT", os.path.join(REPO, f"CLUSTER_r{ROUND}.json")
    )
    if only and os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
        prev.setdefault("checks", {}).update(out["checks"])
        prev["executors_seen"] = out["executors_seen"]
        prev["cal_shuffle_sec"] = out["cal_shuffle_sec"]
        out = prev
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
