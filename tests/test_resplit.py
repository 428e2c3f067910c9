"""Oversized-cell re-split: the SemDeDup skew fence. Constructed data
with one dominant tight-but-spread cluster so the initial k-means
leaves an oversized cell that geometry CAN split."""

import math
import random

import pytest
from pyspark.sql import functions as F

from hama_spark.extensions.similarity import (
    _kmeans_cells,
    resplit_oversized_cells,
    semantic_dup_pairs,
)


def _skewed_embeddings(spark, n_big=300, n_rest=60, dim=8, seed=7):
    rng = random.Random(seed)
    rows = []
    # one broad cluster around +1 (splittable: real spread per dim)
    for i in range(n_big):
        rows.append((i, [1.0 + rng.uniform(-0.8, 0.8) for _ in range(dim)]))
    # scattered remainder around -1
    for i in range(n_big, n_big + n_rest):
        rows.append((i, [-1.0 + rng.uniform(-0.3, 0.3) for _ in range(dim)]))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def _cell_sizes(cb):
    return {
        r["cell"]: r["n"]
        for r in cb.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
    }


def test_resplit_bounds_cell_sizes(spark):
    emb = _skewed_embeddings(spark)
    cb, _ = _kmeans_cells(emb, n_cells=2, kmeans_iter=4, id_col="vec_id", vec_col="embedding")
    before = _cell_sizes(cb)
    cap = 80
    assert max(before.values()) > cap, "fixture must start oversized"

    out = resplit_oversized_cells(cb, cap, kmeans_iter=3, max_rounds=4)
    after = _cell_sizes(out)
    assert max(after.values()) <= cap, f"still oversized: {after}"
    # no rows lost, ids unchanged
    assert sum(after.values()) == sum(before.values())
    assert out.select("id").distinct().count() == emb.count()
    # untouched small cells keep their ids
    small_before = {c for c, n in before.items() if n <= cap}
    assert small_before <= set(after)


def test_resplit_noop_below_cap(spark):
    emb = _skewed_embeddings(spark, n_big=40, n_rest=40)
    cb, _ = _kmeans_cells(emb, n_cells=4, kmeans_iter=3, id_col="vec_id", vec_col="embedding")
    sizes = _cell_sizes(cb)
    cap = max(sizes.values())
    out = resplit_oversized_cells(cb, cap)
    assert _cell_sizes(out) == sizes


def test_resplit_irreducible_identical_points_terminates(spark):
    # 120 identical vectors: k-means cannot separate them; the loop must
    # stop on no-progress, not spin max_rounds jobs or crash
    rows = [(i, [1.0, 2.0, 3.0]) for i in range(120)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    cb, _ = _kmeans_cells(emb, n_cells=1, kmeans_iter=1, id_col="vec_id", vec_col="embedding")
    out = resplit_oversized_cells(cb, cap=50, max_rounds=5)
    sizes = _cell_sizes(out)
    assert sum(sizes.values()) == 120
    assert max(sizes.values()) >= 50  # irreducible mass stays together

    with pytest.raises(ValueError):
        resplit_oversized_cells(cb, cap=0)


def test_semantic_dup_pairs_capped_subset_and_default_unchanged(spark, tables):
    """max_cell_size pairs ⊆ uncapped pairs (cells only ever split), and
    the default path stays byte-identical to the driver query."""
    emb = tables["embeddings"]
    base = semantic_dup_pairs(emb, threshold=0.6, n_cells=4, kmeans_iter=3)
    base_pairs = {(r["id_a"], r["id_b"]) for r in base.collect()}

    capped = semantic_dup_pairs(
        emb, threshold=0.6, n_cells=4, kmeans_iter=3, max_cell_size=100
    )
    capped_pairs = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert capped_pairs <= base_pairs

    again = semantic_dup_pairs(emb, threshold=0.6, n_cells=4, kmeans_iter=3)
    assert {(r["id_a"], r["id_b"]) for r in again.collect()} == base_pairs


def test_semantic_pair_kernels_identical(spark, tables):
    """r9 lever: the numpy (BLAS batch, default via auto) and expr (JVM
    HOF self-join) pair kernels must produce identical (id_a, id_b,
    cosine, cell) sets — the kernel only changes how the prune BOUND is
    evaluated; every survivor is re-scored by the same exact JVM fold."""
    emb = tables["embeddings"]
    rows = lambda df: sorted(  # noqa: E731
        (r["id_a"], r["id_b"], r["cosine"], r["cell"]) for r in df.collect()
    )
    for cap in (None, 7):
        a = rows(
            semantic_dup_pairs(
                emb, threshold=0.2, n_cells=4, kmeans_iter=2, max_cell_size=cap,
                pair_kernel="numpy",
            )
        )
        b = rows(
            semantic_dup_pairs(
                emb, threshold=0.2, n_cells=4, kmeans_iter=2, max_cell_size=cap,
                pair_kernel="expr",
            )
        )
        assert a == b and len(a) > 0

    import pytest

    with pytest.raises(ValueError, match="pair_kernel"):
        semantic_dup_pairs(emb, pair_kernel="blas")


def test_pair_kernel_adaptive_strip_identical(spark, tables, monkeypatch):
    """r10 OOM fence (r9 ADVICE): an unfenced giant cell must not
    allocate a multi-GB bound strip — the strip narrows so block*n stays
    under _PAIR_BLOCK_ELEMS. Shrinking the budget forces multi-strip,
    narrowed-block execution on the fixture corpus; output must equal
    the expr kernel bit-for-bit (the strip is pure evaluation order)."""
    from hama_spark.extensions import similarity

    emb = tables["embeddings"]
    rows = lambda df: sorted(  # noqa: E731
        (r["id_a"], r["id_b"], r["cosine"], r["cell"]) for r in df.collect()
    )
    # ~1000 vectors over 2 cells -> cells of several hundred rows; a
    # 2048-element budget gives block = max(32, 2048//n) = 32 rows, so
    # every cell runs many narrowed strips
    monkeypatch.setattr(similarity, "_PAIR_BLOCK_ELEMS", 2048)
    a = rows(
        semantic_dup_pairs(emb, threshold=0.2, n_cells=2, kmeans_iter=2, pair_kernel="numpy")
    )
    b = rows(
        semantic_dup_pairs(emb, threshold=0.2, n_cells=2, kmeans_iter=2, pair_kernel="expr")
    )
    assert a == b and len(a) > 0
