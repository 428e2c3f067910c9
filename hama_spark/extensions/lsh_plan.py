"""LSH parameter planning: choose (bands, rows) / (planes, tables) from
a target similarity threshold BEFORE burning a cluster pass at 100 TB.

At scale the LSH knobs are the whole cost model — bands×rows sets the
signature (shuffle bytes per doc), band count sets candidate-join
fan-out, planes set bucket sizes, tables multiply the index. Guessing
them wastes a corpus pass; this module makes the standard S-curve math
(Leskovec/Rajaraman/Ullman, "Mining of Massive Datasets" ch. 3 —
public) executable against the exact parameter names used by
``dedup.minhash_lsh_dup_pairs`` (num_hashes, bands) and
``similarity.lsh_cosine_topk`` (planes, tables).

Everything here is O(grid × candidate-params) driver-side arithmetic —
no Spark job; ``scurve_report`` returns a small DataFrame for the CLI.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def minhash_collision_prob(s: float, bands: int, rows_per_band: int) -> float:
    """P(candidate pair) for a pair at Jaccard similarity ``s`` under
    banded MinHash: 1 - (1 - s^r)^b. Monotone S-curve in s."""
    if not 0.0 <= s <= 1.0:
        raise ValueError(f"similarity must be in [0,1], got {s}")
    return 1.0 - (1.0 - s**rows_per_band) ** bands


def minhash_threshold(bands: int, rows_per_band: int) -> float:
    """The S-curve's steepest point ≈ (1/b)^(1/r): pairs above it are
    likely candidates, below it likely filtered."""
    return (1.0 / bands) ** (1.0 / rows_per_band)


def plan_minhash(
    threshold: float,
    max_hashes: int = 128,
    fp_weight: float = 1.0,
    fn_weight: float = 1.0,
    grid: int = 200,
) -> dict:
    """Pick (bands, rows_per_band) under a signature budget minimizing
    the weighted FP+FN probability mass around ``threshold``:

      fp_mass = ∫₀ᵗ P(s) ds      (pairs below t that still collide)
      fn_mass = ∫ₜ¹ (1 - P(s)) ds (pairs above t that never collide)

    ``fn_weight`` > ``fp_weight`` biases toward recall (dedup pipelines
    usually prefer a few extra exact-verify candidates over missed
    dups — candidates are verified, misses are gone).

    Returns {bands, rows_per_band, num_hashes, threshold_est, fp_mass,
    fn_mass} with num_hashes = bands * rows_per_band ≤ max_hashes, so
    the result plugs directly into minhash_signatures/minhash_band_rows
    (which require bands | num_hashes — exact here by construction)."""
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (0,1), got {threshold}")
    best: dict | None = None
    for r in range(1, max_hashes + 1):
        for b in range(1, max_hashes // r + 1):
            fp = fn = 0.0
            # midpoint rule on [0,1]
            for i in range(grid):
                s = (i + 0.5) / grid
                p = 1.0 - (1.0 - s**r) ** b
                if s < threshold:
                    fp += p
                else:
                    fn += 1.0 - p
            err = (fp_weight * fp + fn_weight * fn) / grid
            if best is None or err < best["_err"] - 1e-12:
                best = {
                    "bands": b,
                    "rows_per_band": r,
                    "num_hashes": b * r,
                    "threshold_est": minhash_threshold(b, r),
                    "fp_mass": fp / grid,
                    "fn_mass": fn / grid,
                    "_err": err,
                }
    assert best is not None
    best.pop("_err")
    return best


def cosine_collision_prob(
    cosine: float, planes: int, tables: int, probes: int = 1
) -> float:
    """P(a pair at the given cosine shares a bucket in ≥1 table) under
    random-hyperplane LSH. Single-plane agreement is 1 - θ/π (Charikar
    2002); a table of p planes agrees with probability (1-θ/π)^p;
    ``tables`` independent tables OR together.

    ``probes`` > 1 models query-side multi-probe OPTIMISTICALLY as "any
    ≤1-bit disagreement also collides": per table,
    p1^planes + planes·p1^(planes-1)·(1-p1) capped by the number of
    flipped buckets actually probed. An upper-ish bound — the real probe
    picks the lowest-margin bits, which are the likeliest flips, so the
    truth sits between the 1-probe curve and this one. Use the empirical
    ``ann_recall_report`` for the number you ship."""
    c = max(-1.0, min(1.0, cosine))
    p1 = 1.0 - math.acos(c) / math.pi
    exact = p1**planes
    if probes <= 1:
        per_table = exact
    else:
        one_off = planes * p1 ** (planes - 1) * (1.0 - p1)
        frac = min(1.0, (probes - 1) / planes)
        per_table = min(1.0, exact + frac * one_off)
    return 1.0 - (1.0 - per_table) ** tables


def plan_cosine(
    threshold: float,
    target_recall: float = 0.9,
    max_planes: int = 24,
    max_tables: int = 32,
    probes: int = 1,
) -> dict:
    """Pick (planes, tables) for hyperplane LSH: the MOST planes (small
    buckets = cheap per-bucket joins — at 100 TB bucket size is the
    quadratic term) such that some tables ≤ max_tables reaches
    ``target_recall`` collision probability at the cosine ``threshold``;
    then the fewest such tables (each table re-hashes the whole corpus).

    Returns {planes, tables, recall_at_threshold, prob_at_low} where
    prob_at_low is the collision probability at cosine threshold-0.2 —
    the selectivity number (how much junk the buckets let through)."""
    if not -1.0 < threshold < 1.0:
        raise ValueError(f"cosine threshold must be in (-1,1), got {threshold}")
    for planes in range(max_planes, 0, -1):
        for tables in range(1, max_tables + 1):
            rec = cosine_collision_prob(threshold, planes, tables, probes)
            if rec >= target_recall:
                return {
                    "planes": planes,
                    "tables": tables,
                    "recall_at_threshold": rec,
                    "prob_at_low": cosine_collision_prob(
                        threshold - 0.2, planes, tables, probes
                    ),
                }
    raise ValueError(
        f"no (planes<={max_planes}, tables<={max_tables}) reaches "
        f"recall {target_recall} at cosine {threshold}; raise max_tables "
        f"or probes, or lower target_recall"
    )


def scurve_report(
    spark: SparkSession, bands: int, rows_per_band: int, n: int = 21
) -> DataFrame:
    """The (s, p_candidate) S-curve as a tiny DataFrame — n evenly
    spaced similarity points. Driver-side math, createDataFrame of n
    rows; exists so the CLI/notebook can eyeball a plan next to real
    pair counts."""
    rows = [
        (round(i / (n - 1), 6), round(minhash_collision_prob(i / (n - 1), bands, rows_per_band), 9))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "s double, p_candidate double")
