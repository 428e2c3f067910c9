"""sf0.1 -> sf1.0 scaling measurement (the r4 verdict's top ask):
run the headline operators on SAME-GENERATOR synthetic inputs at 1x
(sf0.1-equivalent volume) and 10x (sf1.0-equivalent), and record
wall-clock next to input size. Pass criterion: one-shuffle operators
scale near-linearly, iterative operators shift from scheduling-bound
toward data-bound, and NO operator needs a plan change to survive the
10x — the observed half of the repo's 100 TB design claims.

Inputs are generated (not read from /root/testdata) because sf1.0
driver parquet does not exist and the test data is read-only; the
generators are seeded Spark expressions (md5/hash-derived, no driver
loops), so both scales draw from the same distribution and differ only
in row count. Workload shapes are held scale-honest: the BM25 query
set is constant size (a production query load does not grow 10x
because the corpus did), SemDeDup's cell count grows with the corpus
(fixed cells would turn the within-cell quadratic into a 100x), and
the events timeline extends with volume (constant event density).

Usage:
    python scripts/scale_run.py            # both scales, all ops
    python scripts/scale_run.py pagerank   # one op (both scales)
    python scripts/scale_run.py --xl minhash_lsh_pairs
        # additionally run the named ops at 100x (sf10-equivalent
        # volume) and record xl_sec / xl_vs_big into their entries —
        # the tier that exposed the AQE-broadcast failure the
        # sort-merge hints in minhash_lsh_dup_pairs now fence

Writes SCALE_r{ROUND}.json (repo root): per-op small/big seconds + output
rows, the time ratio, and the calibration shuffle time.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hama_spark.session import get_spark

ROUND = os.environ.get("SPARK_GRAFT_ROUND", "06")
SCALE = 10  # big = SCALE x small
SMALL = {"docs": 5_000, "emb": 5_000, "events": 100_000, "graph": 100_000}


# --------------------------------------------------------------- inputs
def gen_docs(spark, n: int, seed: int = 42):
    """(doc_id, text): 20-139 words drawn from a 5k-word skewed vocab;
    every 10th doc (id % 10 == 7) is a near-duplicate of its
    predecessor with ~1 in 17 words mutated — real work for the
    near-dup pair finders at every scale."""
    base = f"CASE WHEN doc_id % 10 = 7 THEN doc_id - 1 ELSE doc_id END"
    words = (
        f"transform(sequence(1, 20 + pmod(abs(hash({base}, {seed})), 120)), "
        f"j -> CASE WHEN doc_id % 10 = 7 AND pmod(j, 17) = 3 "
        f"     THEN concat('m', pmod(abs(hash(doc_id, j, {seed})), 99999)) "
        # square the uniform draw for a skewed (Zipf-ish) head
        f"     ELSE concat('w', cast(pow(pmod(abs(hash({base}, j, {seed})), 1000) / 1000.0, 2) * 5000 as int)) END)"
    )
    return (
        spark.range(n)
        .withColumnRenamed("id", "doc_id")
        .select("doc_id", F.expr(f"array_join({words}, ' ')").alias("text"))
    )


def gen_embeddings(spark, n: int, dim: int = 64, seed: int = 7):
    """(vec_id, embedding array<float>): unit-ish random vectors;
    every 10th is its predecessor with one coordinate nudged — planted
    near-dup clusters for the cosine pair finders."""
    base = "CASE WHEN vec_id % 10 = 7 THEN vec_id - 1 ELSE vec_id END"
    vec = (
        f"transform(sequence(0, {dim - 1}), i -> cast("
        f"(pmod(abs(hash({base}, i, {seed})), 2001) - 1000) / 1000.0 "
        f"+ CASE WHEN vec_id % 10 = 7 AND i = 0 THEN 0.05 ELSE 0.0 END "
        f"as float))"
    )
    return (
        spark.range(n)
        .withColumnRenamed("id", "vec_id")
        .select("vec_id", F.expr(vec).alias("embedding"))
    )


def gen_events(spark, n: int, seed: int = 11):
    """(event_id, ts): one event every ~25 s — the timeline EXTENDS
    with volume so event density (and interval-join match density) is
    scale-invariant."""
    secs = F.col("id") * 25 + F.pmod(F.abs(F.hash("id", F.lit(seed))), 25)
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(F.lit(1704067200) + secs).alias("ts"),
    )


# ------------------------------------------------------------ operators
def run_pagerank(spark, mult: int):
    from hama_spark.graph import pagerank
    from hama_spark.sources import fast_graph_gen

    n = SMALL["graph"] * mult
    parts = max(8, n // 6250)
    edges = (
        fast_graph_gen(spark, n, max_out=3, seed=42)
        .select("src", "dst")
        .localCheckpoint(eager=True)
    )
    pr = pagerank(edges, epsilon=None, max_iter=5, self_ref=True, num_partitions=parts)
    return pr.agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("rank"), 3).alias("total_rank")
    )


def run_sssp(spark, mult: int):
    from hama_spark.graph import sssp
    from hama_spark.sources import fast_graph_gen

    n = SMALL["graph"] * mult
    parts = max(8, n // 6250)
    edges = (
        fast_graph_gen(spark, n, max_out=3, weight=100, seed=7)
        .select("src", "dst", (F.col("weight") + 1).alias("weight"))
        .localCheckpoint(eager=True)
    )
    stats: dict = {}
    d = sssp(
        edges,
        "0",
        max_iter=50,
        num_partitions=parts,
        halt_check_interval=5,
        stats_out=stats,
    )
    out = d.agg(
        F.count(F.lit(1)).alias("n_vertices"),
        F.sum(F.when(F.col("dist") < 2147483647, 1).otherwise(0)).alias("n_reachable"),
    )
    # supersteps grow with graph diameter, so raw tier ratios overstate
    # per-superstep cost — record the count so the ratio can be
    # normalized (the r5 verdict's sssp follow-up)
    return out, {"supersteps": stats.get("supersteps_run")}


def run_kcore(spark, mult: int):
    from hama_spark.graph import kcore
    from hama_spark.sources import fast_graph_gen

    n = SMALL["graph"] * mult
    edges = (
        fast_graph_gen(spark, n, max_out=3, seed=42)
        .select("src", "dst")
        .localCheckpoint(eager=True)
    )
    return (
        kcore(edges, fixed_iters=6)
        .groupBy("core")
        .agg(F.count(F.lit(1)).alias("n_vertices"))
    )


def run_minhash_pairs(spark, mult: int):
    from hama_spark.extensions import minhash_lsh_dup_pairs

    docs = gen_docs(spark, SMALL["docs"] * mult).localCheckpoint(eager=True)
    return minhash_lsh_dup_pairs(docs, threshold=0.5, num_hashes=16, bands=4)


def run_dedup_near(spark, mult: int):
    from hama_spark.extensions import dedup_near

    docs = gen_docs(spark, SMALL["docs"] * mult).localCheckpoint(eager=True)
    return dedup_near(docs, threshold=0.5)


def run_bm25(spark, mult: int):
    from hama_spark.extensions.retrieval import bm25_topk, self_queries

    docs = gen_docs(spark, SMALL["docs"] * mult).localCheckpoint(eager=True)
    # CONSTANT query load at both scales: the corpus grows, the query
    # traffic does not — modulus scales with the corpus
    queries = self_queries(docs, modulus=101 * mult)
    return bm25_topk(docs, queries, k=5)


def run_semantic_pairs(spark, mult: int):
    from hama_spark.extensions import semantic_dup_pairs

    emb = gen_embeddings(spark, SMALL["emb"] * mult).localCheckpoint(eager=True)
    # scale-honest config: FIXED coarse cells (assignment stays one
    # linear map-side pass — growing cells with n makes the n x cells
    # assignment quadratic, measured 11.8x at 10x) plus the
    # max_cell_size re-split fence, which recursively subdivides
    # oversized cells so the within-cell quadratic stays bounded:
    # total cost ~ n log(n/cap)
    return semantic_dup_pairs(
        emb, threshold=0.9, n_cells=16, kmeans_iter=3, max_cell_size=600
    )


def run_ivf_build(spark, mult: int):
    """Large-k IVF training (kmeans_df: centers stay a DataFrame, one
    scalar driver count per Lloyd round). Scale-honest config: k=4096
    cells FIXED across tiers — a production index spec is chosen for
    target recall/cell size and the corpus grows under it (the same
    constant-workload discipline as BM25's query load). Per-iteration
    cost is then the linear n x k assignment scan plus a constant
    k*dim-row partial-aggregated shuffle, so tier ratios should be
    near-linear. This is exactly the regime where the driver-state
    Lloyd's per-iteration k*dim collect + literal re-broadcast would
    dominate (4096x64 literals re-compiled per round)."""
    from hama_spark.extensions.similarity import ivf_build

    n = SMALL["emb"] * mult
    emb = gen_embeddings(spark, n).localCheckpoint(eager=True)
    assigned, centers = ivf_build(emb, n_cells=4096, kmeans_iter=3)
    # summary keeps the output tiny while forcing the full build: cell
    # occupancy histogram stats + centroid count
    occ = assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("sz"))
    return occ.agg(
        F.count(F.lit(1)).alias("n_cells_used"),
        F.max("sz").alias("max_cell"),
        F.sum("sz").alias("n_points"),
    )


def run_pack_sequences(spark, mult: int):
    from hama_spark.extensions import pack_sequences, token_count

    docs = gen_docs(spark, SMALL["docs"] * mult)
    toks = docs.select("doc_id", token_count("text").alias("n_tokens"))
    return pack_sequences(toks, max_tokens=2048).select(
        "doc_id", "pos", "cum_before", "pack_id"
    )


def run_interval_join(spark, mult: int):
    from hama_spark.operators.temporal import interval_join

    ev = gen_events(spark, SMALL["events"] * mult).localCheckpoint(eager=True)
    pts = ev.filter(F.col("event_id") % 7 == 0)
    ivl = ev.filter(F.col("event_id") % 101 == 0).select(
        F.col("event_id").alias("iid"),
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 40 MINUTES")).alias("end"),
    )
    return interval_join(pts, ivl, bucket_secs=1800).select(
        "event_id", F.col("iid_r").alias("interval_id")
    )


def run_dedup_exact(spark, mult: int):
    from hama_spark.extensions import dedup_exact

    docs = gen_docs(spark, SMALL["docs"] * mult)
    return dedup_exact(docs)


def run_bloom_decontaminate(spark, mult: int):
    from hama_spark.extensions import bloom_decontaminate

    # the reference side grows WITH the corpus (a 1/89 slice) — the
    # cross-corpus regime the Bloom path exists for, where the exact
    # broadcast of the reference shingle set would eventually not fit
    docs = gen_docs(spark, SMALL["docs"] * mult).localCheckpoint(eager=True)
    return bloom_decontaminate(
        docs.filter(F.col("doc_id") % 89 != 0),
        docs.filter(F.col("doc_id") % 89 == 0),
        k=3,
        fpp=0.001,
    )


def _gen_edges(spark, mult: int, seed: int = 42, n: int | None = None):
    from hama_spark.sources import fast_graph_gen

    n = (n or SMALL["graph"]) * mult
    return (
        fast_graph_gen(spark, n, max_out=3, seed=seed)
        .select("src", "dst")
        .localCheckpoint(eager=True)
    )


def _scale_shuffle(spark, n_vertices: int, rows_per_part: int = 50_000) -> None:
    """Size shuffle partitions to the TIER's data, not the core count —
    what any real cluster submit does. At 32 fixed partitions the 100x
    graph tier put ~1M (key, id) rows through every task's hash
    aggregation with 32 concurrently live tasks in one 8g JVM:
    AGGREGATE_OUT_OF_MEMORY (observed r8 on the batched harmonic xl —
    in graph GEN's distinct, before any algorithm state). ~50k rows per
    partition keeps per-task aggregation state flat across tiers; the
    small/big tiers resolve to the same 32 as before, only xl grows.
    _time_op resets the conf before every op, so this never leaks
    across ops."""
    parts = max(int(spark.conf.get("spark.sql.shuffle.partitions")),
                n_vertices // rows_per_part)
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))


def run_hits(spark, mult: int):
    """Constant 5 iterations at every tier (an analyst picks the
    iteration budget, the graph grows under it), so the ratio isolates
    per-iteration join/agg cost."""
    from hama_spark.graph import hits

    h = hits(_gen_edges(spark, mult), iterations=5)
    return h.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("hub"), 3).alias("sum_hub"),
        F.round(F.sum("authority"), 3).alias("sum_auth"),
    )


def run_harmonic(spark, mult: int):
    """Landmark count FIXED across tiers (the BM25-style constant-
    workload discipline: a sampled-centrality budget is an analyst
    choice, not a function of corpus size); per-landmark BFS balls grow
    with the graph, so near-linear ratios are the pass bar.

    Tier-appropriate batching (r7 verdict item 2): batch_landmarks=2
    ONLY at the 100x tier. The landmark balls are independent, so
    batching is result-identical (pytest-pinned; sum_harmonic equal at
    every tier) while bounding live join state at 2·V rows — the lever
    that kept the unbatched 100x from fitting the default 8g heap (r7
    needed 48g). Where the working set FITS, batching is pure per-batch
    fixed cost: measured 2.3x at the 10x tier (46-52s vs 20-21s,
    interleaved A/B, identical sums — NOTES_r08.md), so small/big run
    the unbatched default a user at that scale would pick, exactly the
    tier-honest discipline of BM25's constant query load."""
    from hama_spark.graph import harmonic_centrality

    _scale_shuffle(spark, SMALL["graph"] * mult)
    hc = harmonic_centrality(
        _gen_edges(spark, mult), landmarks=8, radius=4,
        batch_landmarks=2 if mult >= SCALE * 10 else None,
    )
    return hc.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("harmonic"), 3).alias("sum_harmonic"),
    )


def run_betweenness(spark, mult: int):
    """Sampled truncated-Brandes episodes, source count FIXED across
    tiers (same constant-workload discipline as harmonic).
    batch_sources=1 only at the 100x tier — same tier-appropriate
    rationale and result-identity guarantee as run_harmonic."""
    from hama_spark.graph import betweenness_centrality

    _scale_shuffle(spark, SMALL["graph"] * mult)
    bc = betweenness_centrality(
        _gen_edges(spark, mult), sources=4, radius=3,
        batch_sources=1 if mult >= SCALE * 10 else None,
    )
    return bc.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("betweenness"), 3).alias("sum_btw"),
    )


def run_scc(spark, mult: int):
    """Directed random graph; rounds (color+collect passes) are logged
    so the tier ratio can be normalized by algorithmic round growth."""
    from hama_spark.graph import strongly_connected_components

    stats: dict = {}
    scc = strongly_connected_components(
        _gen_edges(spark, mult, seed=11),
        halt_check_interval=8,
        stats_out=stats,
    )
    out = scc.groupBy("scc").agg(F.count(F.lit(1)).alias("sz")).agg(
        F.count(F.lit(1)).alias("n_components"),
        F.max("sz").alias("max_scc"),
        F.sum("sz").alias("n_vertices"),
    )
    return out, {"rounds": stats.get("rounds")}


def run_random_walks(spark, mult: int):
    """walk_len fixed at 8: cost is walk_len joins against the capped
    neighbor lists — each a map-side lookup join on the pinned src
    partitioning, so the tier ratio should track the vertex count."""
    from hama_spark.graph import random_walks

    _scale_shuffle(spark, SMALL["graph"] * mult)
    w = random_walks(_gen_edges(spark, mult, seed=5), walk_len=8)
    return w.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("walk").cast("decimal(38,0)")).alias("sum_len"),
    )


def run_cc_twophase(spark, mult: int):
    """O(log n) star contraction: rounds are logged — they should grow
    ~log(10) ≈ +1 per tier while per-round cost grows linearly."""
    from hama_spark.graph.cc_twophase import connected_components_twophase

    stats: dict = {}
    cc = connected_components_twophase(
        _gen_edges(spark, mult, seed=23), stats_out=stats
    )
    out = cc.groupBy("component").agg(F.count(F.lit(1)).alias("sz")).agg(
        F.count(F.lit(1)).alias("n_components"),
        F.max("sz").alias("max_component"),
    )
    return out, {"rounds": stats.get("rounds")}


OPS = {
    "pagerank_gen": run_pagerank,
    "sssp_gen": run_sssp,
    "kcore_gen": run_kcore,
    "minhash_lsh_pairs": run_minhash_pairs,
    "dedup_near": run_dedup_near,
    "bm25_topk": run_bm25,
    "semantic_dup_pairs": run_semantic_pairs,
    "ivf_build": run_ivf_build,
    "pack_sequences": run_pack_sequences,
    "interval_join": run_interval_join,
    "dedup_exact": run_dedup_exact,
    "bloom_decontaminate": run_bloom_decontaminate,
    # round-7: the analytics family (verdict item 5)
    "hits_gen": run_hits,
    "harmonic_gen": run_harmonic,
    "betweenness_gen": run_betweenness,
    "scc_gen": run_scc,
    "random_walks_gen": run_random_walks,
    "cc_twophase_gen": run_cc_twophase,
}


_BASE_SHUFFLE: list[str] = []


def _time_op(spark, fn, mult: int) -> tuple[float, int, dict]:
    from pyspark.sql import Observation

    # restore the session's shuffle-partition default so a tier-scaled
    # override from a previous op (_scale_shuffle) never leaks into
    # this one; ops that need the override re-set it inside fn, and the
    # conf stays set through the noop write below (Spark reads it at
    # exchange-planning time, i.e. during execution)
    if not _BASE_SHUFFLE:
        _BASE_SHUFFLE.append(spark.conf.get("spark.sql.shuffle.partitions"))
    spark.conf.set("spark.sql.shuffle.partitions", _BASE_SHUFFLE[0])
    obs = Observation()
    t0 = time.time()
    result = fn(spark, mult)
    # ops may return (df, meta) to attach run counters (e.g. sssp's
    # superstep count) to their tier entry
    df, meta = result if isinstance(result, tuple) else (result, {})
    df.observe(obs, F.count(F.lit(1)).alias("n")).write.format("noop").mode(
        "overwrite"
    ).save()
    sec = round(time.time() - t0, 2)
    return sec, int(obs.get["n"]), meta


def main() -> int:
    argv = sys.argv[1:]
    xl = "--xl" in argv
    only = set(a for a in argv if not a.startswith("--"))
    spark = get_spark(app_name="hama_spark_scale")
    # warm the JVM so the first timed op does not absorb codegen costs
    gen_docs(spark, 1000).write.format("noop").mode("overwrite").save()

    from bench import _calibration

    # structural record of protocol deviations (r9 verdict item 9: the
    # betweenness-xl 16g case was disclosed only in NOTES, so the SCALE
    # row silently read as an 8g result). Format:
    #   SPARK_GRAFT_SCALE_DEVIATIONS="betweenness=16g driver mem;foo=..."
    # driver_mem is always recorded so a non-default heap is visible
    # even without an explicit note.
    deviations = {}
    for pair in os.environ.get("SPARK_GRAFT_SCALE_DEVIATIONS", "").split(";"):
        if "=" in pair:
            op, note = pair.split("=", 1)
            deviations[op.strip()] = note.strip()
    out: dict = {
        "round": ROUND,
        "scale_factor": SCALE,
        "small_volumes": SMALL,
        "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        "deviations": deviations,
        "cal_shuffle_sec": _calibration(spark),
        "ops": {},
    }
    for name, fn in OPS.items():
        if only and name not in only:
            continue
        if xl:
            # 100x tier only: one timed run, merged into the existing
            # entry (requires a prior small/big run for the ratio)
            xl_sec, xl_rows, xl_meta = _time_op(spark, fn, SCALE * 10)
            gc.collect()
            out["ops"][name] = {"xl_sec": xl_sec, "xl_out_rows": xl_rows}
            out["ops"][name].update({f"xl_{k}": v for k, v in xl_meta.items()})
            print(f"# {name} @100x: {xl_sec}s, rows {xl_rows}", file=sys.stderr)
            continue
        # small runs BEFORE and AFTER big; keep the faster small so the
        # ratio is computed against a fully-warmed baseline (the
        # conservative direction: a too-small denominator can only
        # overstate super-linearity, never hide it)
        small1, small_rows, small_meta = _time_op(spark, fn, 1)
        gc.collect()
        big_sec, big_rows, big_meta = _time_op(spark, fn, SCALE)
        gc.collect()
        small2, _, _ = _time_op(spark, fn, 1)
        gc.collect()
        small_sec = min(small1, small2)
        ratio = round(big_sec / small_sec, 2) if small_sec > 0 else None
        out["ops"][name] = {
            "small_sec": small_sec,
            "big_sec": big_sec,
            "time_ratio": ratio,
            "small_out_rows": small_rows,
            "big_out_rows": big_rows,
        }
        out["ops"][name].update({f"small_{k}": v for k, v in small_meta.items()})
        out["ops"][name].update({f"big_{k}": v for k, v in big_meta.items()})
        print(
            f"# {name}: {small_sec}s -> {big_sec}s (x{ratio}), "
            f"rows {small_rows} -> {big_rows}",
            file=sys.stderr,
        )
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"SCALE_r{ROUND}.json",
    )
    # merge with a previous partial run so the suite can execute in
    # chunks (each op is timed independently; nothing is shared)
    if (only or xl) and os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
        prev_ops = prev.get("ops", {})
        # deviations accumulate across chunked runs (a later chunk must
        # not erase an earlier chunk's disclosed deviation)
        out["deviations"] = {**prev.get("deviations", {}), **deviations}
        for k, v in out["ops"].items():
            if xl and k in prev_ops:
                # fold the xl fields into the existing small/big entry
                prev_ops[k].update(v)
            elif k in prev_ops:
                # small/big refresh: keep any xl fields already measured
                kept = {
                    f: prev_ops[k][f]
                    for f in ("xl_sec", "xl_out_rows")
                    if f in prev_ops[k]
                }
                prev_ops[k] = {**v, **kept}
            else:
                prev_ops[k] = v
            big = prev_ops[k].get("big_sec")
            if big and "xl_sec" in prev_ops[k]:
                prev_ops[k]["xl_vs_big"] = round(prev_ops[k]["xl_sec"] / big, 2)
        out["ops"] = {k: prev_ops[k] for k in OPS if k in prev_ops}
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["ops"], indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
