"""LSH parameter planner: S-curve math properties, planner contracts,
and that a planned MinHash config actually drives the existing
minhash_lsh_dup_pairs with sane results (subset-of-brute invariant)."""

import math

import pytest

from hama_spark.extensions.lsh_plan import (
    cosine_collision_prob,
    minhash_collision_prob,
    minhash_threshold,
    plan_cosine,
    plan_minhash,
    scurve_report,
)


def test_minhash_scurve_shape():
    b, r = 20, 5
    assert minhash_collision_prob(0.0, b, r) == 0.0
    assert minhash_collision_prob(1.0, b, r) == 1.0
    probs = [minhash_collision_prob(i / 50, b, r) for i in range(51)]
    assert all(x <= y + 1e-12 for x, y in zip(probs, probs[1:])), "not monotone"
    # the classic MMDS example: t = (1/20)^(1/5) ~ 0.549
    t = minhash_threshold(b, r)
    assert abs(t - 0.5493) < 1e-3
    # curve is steep around t: clearly low below, clearly high above
    assert minhash_collision_prob(t - 0.25, b, r) < 0.05
    assert minhash_collision_prob(t + 0.25, b, r) > 0.95


def test_minhash_prob_validates():
    with pytest.raises(ValueError):
        minhash_collision_prob(1.5, 4, 4)


def test_plan_minhash_respects_budget_and_threshold():
    plan = plan_minhash(0.8, max_hashes=128)
    assert plan["num_hashes"] == plan["bands"] * plan["rows_per_band"]
    assert plan["num_hashes"] <= 128
    # the chosen curve's inflection sits near the requested threshold
    assert abs(plan["threshold_est"] - 0.8) < 0.15
    # and beats a deliberately bad config on total error mass
    bad_fp = bad_fn = 0.0
    grid = 200
    for i in range(grid):
        s = (i + 0.5) / grid
        p = minhash_collision_prob(s, 128, 1)  # all bands of 1 row: everything collides
        if s < 0.8:
            bad_fp += p / grid
        else:
            bad_fn += (1 - p) / grid
    assert plan["fp_mass"] + plan["fn_mass"] < bad_fp + bad_fn


def test_plan_minhash_fn_weight_biases_toward_recall():
    neutral = plan_minhash(0.7, max_hashes=64)
    recallish = plan_minhash(0.7, max_hashes=64, fn_weight=5.0)
    assert recallish["fn_mass"] <= neutral["fn_mass"] + 1e-12
    with pytest.raises(ValueError):
        plan_minhash(0.0)


def test_cosine_collision_prob_matches_charikar_single_plane():
    # one plane, one table: P = 1 - theta/pi exactly
    for c in (-0.5, 0.0, 0.5, 0.9):
        expect = 1.0 - math.acos(c) / math.pi
        assert abs(cosine_collision_prob(c, 1, 1) - expect) < 1e-12
    # multi-probe never lowers the probability
    assert cosine_collision_prob(0.5, 8, 2, probes=4) >= cosine_collision_prob(
        0.5, 8, 2
    )


def test_plan_cosine_contract():
    plan = plan_cosine(0.8, target_recall=0.9, max_planes=24, max_tables=32)
    assert plan["recall_at_threshold"] >= 0.9
    got = cosine_collision_prob(0.8, plan["planes"], plan["tables"])
    assert abs(got - plan["recall_at_threshold"]) < 1e-12
    # maximal-planes preference: planes+1 must NOT be satisfiable
    more = plan["planes"] + 1
    assert all(
        cosine_collision_prob(0.8, more, t) < 0.9 for t in range(1, 33)
    ) or more > 24
    # selectivity number is a probability and below the recall
    assert 0.0 <= plan["prob_at_low"] <= plan["recall_at_threshold"]
    # orthogonal pairs (p1 = 0.5) with one table can't hit 0.99
    with pytest.raises(ValueError):
        plan_cosine(0.0, target_recall=0.99, max_planes=4, max_tables=1)


def test_scurve_report_dataframe(spark):
    df = scurve_report(spark, bands=16, rows_per_band=4, n=11)
    rows = {r["s"]: r["p_candidate"] for r in df.collect()}
    assert len(rows) == 11
    assert rows[0.0] == 0.0 and rows[1.0] == 1.0


def test_planned_params_drive_minhash_lsh(spark, tables):
    """End-to-end: feed planner output into the real pair finder; LSH
    candidates stay a subset of brute-force n-gram Jaccard pairs at the
    planned threshold (verification is exact, so FPs can't leak)."""
    from hama_spark.extensions.dedup import (
        minhash_lsh_dup_pairs,
        ngram_jaccard_pairs,
    )

    plan = plan_minhash(0.5, max_hashes=32)
    docs = tables["documents"].limit(120)
    lsh = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_dup_pairs(
            docs,
            threshold=0.5,
            num_hashes=plan["num_hashes"],
            bands=plan["bands"],
        ).collect()
    }
    brute = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert lsh <= brute
