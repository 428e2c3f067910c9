"""Similarity search over embedding columns (north star).

- cosine_topk: exact brute-force top-k — the correctness baseline and
  small-query path (queries side is broadcast).
- lsh_cosine_topk: random-hyperplane LSH — the 100 TB path. Hyperplane
  components are seeded ±1 derived driver-side from md5(seed:table:
  plane), so signatures are deterministic, partitioning-independent,
  and replayable in the DuckDB oracle. Candidates
  come from bucket collisions across ``tables`` independent hash tables,
  optionally widened query-side by bit-flip multi-probe (``probes``),
  then exact re-rank.
- ivf_topk: inverted-file index — k-means coarse centroids, probe the
  ``nprobe`` nearest cells, exact re-rank inside. Uses ml.kmeans.

Shuffle profile at scale: LSH/IVF turn the n×q cross join into
per-bucket joins; the re-rank top-k is a windowless groupBy(max_by)…
actually a window over query id — bounded by candidates, not corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hama_spark.plans.fences import once_per_row


def _normalized(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    # the norm is fenced through once_per_row: referenced inside the
    # division lambda, CollapseProject would otherwise inline the
    # aggregate and re-evaluate it per element (O(d^2) per row)
    norm = F.sqrt(
        F.aggregate(F.col(vec_col), F.lit(0.0), lambda a, x: a + x.cast("double") * x)
    )
    s = once_per_row(
        df.select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("_vec"), norm.alias("_n")
        ),
        "_n",
    )
    return s.select(
        "id",
        F.transform(F.col("_vec"), lambda x: x.cast("double") / F.col("_n")).alias("v"),
    )


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda p, q: p * q), F.lit(0.0), lambda s, x: s + x)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    query_vec_col: str | None = None,
) -> DataFrame:
    """Exact top-k by cosine: (query_id, id, cosine, rank). The queries
    side is broadcast — corpus×queries stays a map-side nested loop, no
    shuffle of the corpus. Ties broken by corpus id (deterministic)."""
    c = _normalized(corpus, id_col, vec_col)
    q = _normalized(queries, query_id_col or id_col, query_vec_col or vec_col)
    q = q.select(F.col("id").alias("qid"), F.col("v").alias("qv"))
    scored = c.join(F.broadcast(q)).select(
        "qid", "id", F.round(_dot(F.col("v"), F.col("qv")), 9).alias("cosine")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("qid").alias("query_id"), F.col("id").alias(id_col), "cosine", "rank")
    )


def _plane(seed: int, table: int, plane: int, dim: int) -> list[float]:
    """Deterministic ±1 hyperplane components, derived driver-side from
    md5(seed:table:plane) — O(dim) literals in the plan instead of
    per-row hash calls."""
    import hashlib

    comps: list[float] = []
    d = 0
    counter = 0
    while len(comps) < dim:
        h = hashlib.md5(f"{seed}:{table}:{plane}:{counter}".encode()).digest()
        for byte in h:
            if len(comps) >= dim:
                break
            comps.append(1.0 if byte & 1 else -1.0)
        counter += 1
    return comps


def _hyperplane_sig(vcol: str, dim: int, planes: int, seed: int, table: int) -> Column:
    """LSH signature: for each plane, sign of v · h_plane. Returns a
    bigint bucket id.

    Built as ONE SQL string parsed server-side (r10): the Column-API
    equivalent issues ~planes·dim py4j round-trips per signature —
    tables·planes·dim ≈ 2k driver calls ≈ 3s of pure DataFrame
    CONSTRUCTION per lsh call at the default 8×4×64 (measured: build
    3.2s vs execute 0.75s at sf0.1). The SQL text parses to the SAME
    Catalyst expression — identical ±1.0D literals, identical zip_with
    multiply, identical left-fold sum order — so every projection (and
    therefore every bucket id) is bit-equal to the Column-API build
    (pinned by tests/test_lsh_sig_sql.py against the old builder)."""
    terms = ["CAST(0 AS BIGINT)"]
    for p in range(planes):
        comps = ",".join(f"{c:.1f}D" for c in _plane(seed, table, p, dim))
        proj = (
            f"aggregate(zip_with(`{vcol}`, array({comps}), (a, b) -> a * b), "
            f"0.0D, (s, x) -> s + x)"
        )
        terms.append(
            f"(CASE WHEN {proj} > 0 THEN shiftleft(CAST(1 AS BIGINT), {p}) "
            f"ELSE CAST(0 AS BIGINT) END)"
        )
    return F.expr(" | ".join(terms))


def _with_buckets(df: DataFrame, vcol: str, dim: int, planes: int, tables: int, seed: int) -> DataFrame:
    """Explode each row into ``tables`` (tbl, bkt) bucket rows by its
    random-hyperplane signature in each table."""
    out = "_b"
    return (
        df.select(
            "*",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("tbl"),
                            _hyperplane_sig(vcol, dim, planes, seed, t).alias("bkt"),
                        )
                        for t in range(tables)
                    ]
                )
            ).alias(out),
        )
        .select("*", F.col(f"{out}.tbl").alias("tbl"), F.col(f"{out}.bkt").alias("bkt"))
        .drop(out)
    )


def _with_probe_buckets(
    df: DataFrame, vcol: str, dim: int, planes: int, tables: int, seed: int, probes: int
) -> DataFrame:
    """Query-side multi-probe buckets (Lv et al., multi-probe LSH): per
    table, the base signature bucket PLUS the ``probes - 1`` buckets
    reached by flipping the lowest-|projection| hyperplane bits — the
    planes the vector sits closest to, hence the likeliest sign
    disagreements with a true near neighbor. Recall rises with
    ``probes`` at the cost of probes× candidate-join rows on the QUERY
    side only; the corpus keeps one bucket row per table, so the index
    side (the 100 TB side) does not grow the way adding tables would.

    The per-plane projections are computed once per row (fenced with
    once_per_row — both the sign and the |margin| ranking read the same
    materialized array; CollapseProject would otherwise re-evaluate the
    dot products per use)."""
    proj_cols = {}
    for t in range(tables):
        projs = F.array(
            *[
                F.aggregate(
                    F.zip_with(
                        F.col(vcol),
                        F.array(*[F.lit(c) for c in _plane(seed, t, p, dim)]),
                        lambda a, b: a * b,
                    ),
                    F.lit(0.0),
                    lambda s, x: s + x,
                )
                for p in range(planes)
            ]
        )
        proj_cols[f"_pr{t}"] = projs
    s = df.select("*", *[c.alias(n) for n, c in proj_cols.items()])
    for n in proj_cols:
        s = once_per_row(s, n)

    def _base(pr: Column) -> Column:
        out = F.lit(0).cast("long")
        for p in range(planes):
            out = out.bitwiseOR(
                F.when(
                    F.element_at(pr, p + 1) > 0, F.shiftleft(F.lit(1).cast("long"), p)
                ).otherwise(F.lit(0).cast("long"))
            )
        return out

    buckets = []
    for t in range(tables):
        pr = F.col(f"_pr{t}")
        base = _base(pr)
        # planes ranked by |projection| ascending; flip the closest ones
        ranked = F.array_sort(
            F.array(
                *[
                    F.struct(
                        F.abs(F.element_at(pr, p + 1)).alias("m"),
                        F.lit(1 << p).cast("long").alias("mask"),
                    )
                    for p in range(planes)
                ]
            )
        )
        flips = F.slice(ranked, 1, min(probes - 1, planes))
        probe_bkts = F.concat(
            F.array(base),
            F.transform(flips, lambda f: base.bitwiseXOR(f["mask"])),
        )
        buckets.append(
            F.transform(
                probe_bkts,
                lambda b: F.struct(F.lit(t).alias("tbl"), b.alias("bkt")),
            )
        )
    out = (
        s.select("*", F.explode(F.flatten(F.array(*buckets))).alias("_b"))
        .select("*", F.col("_b.tbl").alias("tbl"), F.col("_b.bkt").alias("bkt"))
        .drop("_b", *proj_cols.keys())
    )
    return out


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    planes: int = 12,
    tables: int = 4,
    seed: int = 42,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probes: int = 1,
) -> DataFrame:
    """Approximate top-k: bucket corpus+queries by random-hyperplane
    signatures in ``tables`` independent tables, join on (table, bucket),
    exact-cosine re-rank candidates. Recall grows with tables; cost is
    per-bucket, never corpus×queries.

    ``probes > 1`` turns on query-side multi-probe: each query also
    searches the probes-1 neighboring buckets per table reached by
    flipping its lowest-margin signature bits. More recall WITHOUT
    growing the corpus-side index — at 100 TB, adding a table re-buckets
    the whole corpus, adding a probe only multiplies the (tiny,
    broadcast) query side."""
    if dim is None:
        dim = corpus.select(F.size(vec_col)).first()[0]
    c = _normalized(corpus, id_col, vec_col)
    q = _normalized(queries, id_col, vec_col).select(
        F.col("id").alias("qid"), F.col("v").alias("qv")
    )

    cb = _with_buckets(c, "v", dim, planes, tables, seed)
    if probes > 1:
        qb = _with_probe_buckets(q, "qv", dim, planes, tables, seed, probes)
    else:
        qb = _with_buckets(q, "qv", dim, planes, tables, seed)
    cand = (
        cb.join(qb, ["tbl", "bkt"])
        .select("qid", "id", "v", "qv")
        .distinct()
    )
    scored = cand.select(
        "qid", "id", F.round(_dot(F.col("v"), F.col("qv")), 9).alias("cosine")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("qid").alias("query_id"), F.col("id").alias(id_col), "cosine", "rank")
    )


def lsh_cosine_dup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    planes: int = 4,
    tables: int = 8,
    seed: int = 42,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate PAIRS at scale: candidates are rows
    colliding in the same (table, bucket) of the random-hyperplane LSH
    — a per-bucket self-join, never all-pairs — verified with the exact
    cosine (>= threshold). The scale twin of
    dedup.embedding_cosine_dup_pairs (brute-force ground truth); recall
    grows with ``tables``, bucket sizes shrink with ``planes``.

    Returns (id_a, id_b, cosine) with id_a < id_b, each pair once even
    when it collides in several tables."""
    if dim is None:
        dim = df.select(F.size(vec_col)).first()[0]
    n = _normalized(df, id_col, vec_col).localCheckpoint(eager=True)
    nb = _with_buckets(n, "v", dim, planes, tables, seed).select("tbl", "bkt", "id")
    # Candidate generation carries BARE IDS: the bucket self-join and the
    # collision dedup shuffle 16-byte pairs, never dim-sized vectors.
    # Vectors join back afterwards so each DISTINCT pair is scored
    # exactly once (a pair colliding in k tables would otherwise pay k
    # dot products, and dedup-with-vectors-in-tow would pay the shuffle).
    cand = (
        nb.alias("a")
        .join(nb.alias("b"), ["tbl", "bkt"])
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    va = n.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
    vb = n.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", F.round(_dot(F.col("va"), F.col("vb")), 9).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def _kmeans_cells(
    corpus: DataFrame, n_cells: int, kmeans_iter: int, id_col: str, vec_col: str
):
    """Shared IVF/SemDeDup preamble: L2-normalize (checkpointed once —
    centroid seed, training and assignment all read it), seed centers =
    first n_cells rows by id, deterministic Lloyd, assign cells with the
    trained centers embedded as plan literals (one codegen span, no
    nested-loop node against a 1-row centers relation). Returns
    (assigned(id, v, cell), centers)."""
    from hama_spark.functions.distance import MEASURES
    from hama_spark.ml.kmeans import _assign_expr, kmeans

    c = _normalized(corpus, id_col, vec_col).localCheckpoint(eager=True)
    init = [r["v"] for r in c.orderBy("id").limit(n_cells).collect()]
    # materialize_assignments=False: only the trained centers are used —
    # the assignment below re-derives cells from them, so the default's
    # eager one-row-per-point checkpoint would be a thrown-away full
    # pass (c is checkpointed, so lineage is deterministic)
    km = kmeans(
        c.select(F.col("v").alias("features")),
        init,
        max_iterations=kmeans_iter,
        materialize_assignments=False,
    )
    cb = c.select(
        "id", "v", _assign_expr(km.centers, MEASURES["euclidean"], feat="v").alias("cell")
    )
    return cb, km.centers


def ivf_build(
    corpus: DataFrame,
    n_cells: int,
    kmeans_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Large-k IVF training: coarse-quantizer k-means with the centers
    kept as a DATAFRAME end-to-end (ml.kmeans.kmeans_df) — the scale
    path for n_cells ≈ √n at corpus scale, where ``_kmeans_cells``'s
    per-iteration collect of k·dim sums and literal re-broadcast become
    the bottleneck (at k=4096·dim=64 the literal plan alone is ~260k
    expression nodes and every Lloyd round re-compiles it).

    Seeds are a hash-bucketed pick (top-n_cells by xxhash64(id) — a
    per-partition heap TakeOrdered, not a global sort), deterministic
    for a given corpus. Returns ``(assigned(id, v, cell), centers)``
    with ``centers`` a (center_id, center) DataFrame — feed the pair to
    :func:`ivf_topk` via ``cells=`` (it accepts DataFrame centers)."""
    from hama_spark.ml.kmeans import (
        _centers_np,
        assign_with_centers_df,
        assign_with_centers_np,
        kmeans_df,
    )
    from hama_spark.functions.distance import MEASURES

    c = _normalized(corpus, id_col, vec_col).localCheckpoint(eager=True)
    first = c.select(F.size("v").alias("_d")).first()
    if first is None:
        raise ValueError("ivf_build: corpus has no rows")
    dim = int(first["_d"])
    # deterministic distributed seed pick; the row_number window runs
    # over the n_cells surviving rows only (k rows, not the corpus)
    seeds = c.select(F.xxhash64(F.col("id")).alias("_h"), "v").orderBy("_h").limit(
        int(n_cells)
    )
    init = seeds.select(
        (F.row_number().over(Window.orderBy("_h")) - 1).alias("center_id"),
        F.col("v").alias("center"),
    ).localCheckpoint(eager=True)
    # the TRAINED center count (≤ n_cells when the corpus is small) —
    # the kernel mirror below must use the same k kmeans_df's auto rule
    # saw, or a small corpus trains float64-expr but assigns float32-
    # numpy and near-tie points land in different cells than training
    k_actual = init.count()
    # materialize_assignments=False: the cell assignment below re-runs
    # the kernel over the checkpointed c (deterministic lineage), so the
    # default's eager per-point checkpoint inside kmeans_df would be a
    # thrown-away full pass
    km = kmeans_df(
        c.select(F.col("v").alias("features")),
        init,
        max_iterations=kmeans_iter,
        materialize_assignments=False,
    )
    if k_actual * dim >= 32768:  # mirror kmeans_df's auto kernel
        assigned = assign_with_centers_np(
            c, _centers_np(km.centers), "euclidean", feat="v", out_col="cell"
        ).select("id", "v", "cell")
    else:
        assigned = assign_with_centers_df(
            c, km.centers, MEASURES["euclidean"], feat="v", out_col="cell"
        ).select("id", "v", "cell")
    return assigned, km.centers


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    kmeans_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_offset: int = 0,
    cells=None,
) -> DataFrame:
    """IVF: coarse-quantize the corpus with k-means centroids, search
    only the ``nprobe`` cells nearest each query, exact re-rank.
    Centroids are O(n_cells·dim) driver state (broadcast literals).
    ``cell_offset`` skips that many nearest cells before probing —
    offset 1 probes cells ranked 2..nprobe+1 (see hard_negatives).
    ``cells`` accepts a precomputed ``(assigned, centers)`` pair from
    an earlier call so a pipeline probing the same index several ways
    (search + hard negatives) trains k-means once — either
    ``_kmeans_cells``'s list centers or :func:`ivf_build`'s DataFrame
    centers (the large-k path: the centroid table is aggregated to one
    row and broadcast JVM-side instead of unrolled into ~k·dim plan
    literals)."""
    from hama_spark.functions.distance import MEASURES

    cb, centers = cells or _kmeans_cells(corpus, n_cells, kmeans_iter, id_col, vec_col)
    measure = MEASURES["euclidean"]

    q = _normalized(queries, id_col, vec_col).select(
        F.col("id").alias("qid"), F.col("v").alias("qv")
    )
    # nprobe nearest cells per query, after skipping cell_offset
    if isinstance(centers, DataFrame):
        rel = centers.agg(
            F.array_sort(F.collect_list(F.struct("center_id", "center"))).alias("_cs")
        )
        dists = F.transform(
            F.col("_cs"),
            lambda s: F.struct(
                measure(F.col("qv"), s["center"]).alias("d"),
                s["center_id"].cast("int").alias("cell"),
            ),
        )
        q = q.crossJoin(F.broadcast(rel))
    else:
        dists = F.array(
            *[
                F.struct(
                    measure(F.col("qv"), F.array(*[F.lit(x) for x in ctr])).alias("d"),
                    F.lit(i).alias("cell"),
                )
                for i, ctr in enumerate(centers)
            ]
        )
    qcells = q.select(
        "qid",
        "qv",
        F.explode(F.slice(F.array_sort(dists), 1 + cell_offset, nprobe)).alias("dc"),
    ).select("qid", "qv", F.col("dc.cell").alias("cell"))

    scored = cb.join(F.broadcast(qcells), "cell").select(
        "qid", "id", F.round(_dot(F.col("v"), F.col("qv")), 9).alias("cosine")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("qid").alias("query_id"), F.col("id").alias(id_col), "cosine", "rank")
    )


def knn_graph(
    corpus: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 2,
    kmeans_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cells=None,
) -> DataFrame:
    """k-nearest-neighbor GRAPH over the corpus itself: for every
    point, its ``k`` most cosine-similar other points. Returns
    (src, dst, cosine, rank) edges — the standard input to graph-based
    clustering, semantic-dedup variants that walk neighborhoods, and
    link-prediction features (feed the edges to ``graph/`` operators;
    symmetrize with a union of the reversed edges if the consumer
    wants an undirected graph).

    NOT :func:`ivf_topk` with the corpus as its own query set — that
    operator broadcasts the query side, which is exactly what must not
    happen when the query side IS the corpus. Here both sides stay
    distributed: points are coarse-quantized once (k-means centroids,
    O(n_cells·dim) driver state), every point also emits ``nprobe``
    probe rows for its nearest cells (including its own), and a
    SHUFFLE equi-join on the cell id scores candidates within cells —
    Σ |cell|·|probes(cell)| comparisons, never n². Top-k per point is
    a keyed window (never single-partition).

    Approximate with the usual IVF recall/nprobe trade-off; with
    ``nprobe >= n_cells`` every cell is probed and the result is EXACT
    brute-force kNN (the oracle-checked configuration). ``cells``
    accepts a precomputed ``(assigned, centers)`` pair (same contract
    as :func:`ivf_topk`) so a pipeline reuses one quantization.
    """
    from hama_spark.functions.distance import MEASURES

    cb, centers = cells or _kmeans_cells(corpus, n_cells, kmeans_iter, id_col, vec_col)
    measure = MEASURES["euclidean"]
    nprobe = min(int(nprobe), len(centers))

    dists = F.array(
        *[
            F.struct(
                measure(F.col("v"), F.array(*[F.lit(x) for x in ctr])).alias("d"),
                F.lit(i).alias("cell"),
            )
            for i, ctr in enumerate(centers)
        ]
    )
    probes = cb.select(
        F.col("id").alias("qid"),
        F.col("v").alias("qv"),
        F.explode(F.slice(F.array_sort(dists), 1, nprobe)).alias("dc"),
    ).select("qid", "qv", F.col("dc.cell").alias("cell"))

    # Scorer stays the shared HOF dot (_dot): an unrolled element_at
    # Add chain was measured 1.6x SLOWER here (128 bounds-checked array
    # accesses per row overflow codegen limits and fall back to a worse
    # interpreter than the HOF fold), and the HOF keeps summation order
    # bit-identical to the oracle's list_dot_product.
    scored = (
        cb.join(probes, "cell")  # shuffle equi-join: both sides are corpus-sized
        .filter(F.col("id") != F.col("qid"))
        .select(
            "qid", "id", F.round(_dot(F.col("v"), F.col("qv")), 9).alias("cosine")
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("src"), F.col("id").alias("dst"), "cosine", "rank"
        )
    )


# bound-matrix element budget for the numpy pair kernel: one strip is
# block x |cell| float64 (~256 MB at the default), the fence that keeps
# an unbounded cell from OOMing a Python worker. Module-level so tests
# can shrink it to force multi-strip execution on small cells.
_PAIR_BLOCK_ELEMS = 32 * 1024 * 1024


def _cell_pair_candidates_np(slim: DataFrame, threshold: float) -> DataFrame:
    """Candidate (id_a, id_b, cell) pairs whose partial-dot upper bound
    can reach ``threshold`` — the numpy kernel for semantic_dup_pairs'
    prune: one Arrow batch per cell (applyInPandas keyed on cell), the
    whole cell's bound matrix as a float64 BLAS matmul instead of a
    per-pair interpreted HOF. Rows are sorted by id inside the batch so
    positional upper-triangle == id_a < id_b (UTF-8 byte order equals
    code-point order, so pandas string sort matches Spark's binary
    string comparison; numeric ids trivially match). Row-blocked
    (1024-row strips, narrowed adaptively so one strip never exceeds
    ``_PAIR_BLOCK_ELEMS`` elements) so a cell above the resplit cap
    cannot allocate an unblocked |cell|² index set — nor, unfenced, a
    multi-GB strip. float64 GEMM vs the JVM fold
    differs only by summation order (≤ ~1e-15 on unit vectors), inside
    the caller's 1e-9 slack — no true pair can be pruned; equal-id
    pairs are excluded exactly like the expr join's strict <."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import IntegerType, StructField, StructType

    id_type = slim.schema["id"].dataType
    out_schema = StructType(
        [
            StructField("id_a", id_type),
            StructField("id_b", id_type),
            StructField("cell", IntegerType()),
        ]
    )
    thr = float(threshold) - 1e-9
    block_elems = _PAIR_BLOCK_ELEMS

    def pairs(pdf: "pd.DataFrame") -> "pd.DataFrame":
        n = len(pdf)
        empty_id = pdf["id"].iloc[:0]
        if n < 2:
            return pd.DataFrame(
                {"id_a": empty_id, "id_b": empty_id, "cell": pd.Series([], dtype="int32")}
            )
        pdf = pdf.sort_values("id", kind="mergesort").reset_index(drop=True)
        vh = np.stack(pdf["vh"].to_numpy()).astype(np.float64, copy=False)
        vt = pdf["vt"].to_numpy(dtype=np.float64)
        ids = pdf["id"].to_numpy()
        out_a, out_b = [], []
        # the per-strip bound matrix is block x n float64: cap it at
        # ~block_elems elements so an UNFENCED giant cell (max_cell_size
        # =None, skewed k-means) degrades to narrower strips instead of
        # allocating a multi-GB matrix in one Python worker (r9 ADVICE);
        # at bench-scale cells (n <= block_elems/1024) this stays the
        # measured 1024-row strip
        block = max(32, min(1024, block_elems // max(1, n)))
        for s in range(0, n - 1, block):
            e = min(s + block, n)
            bound = vh[s:e] @ vh.T + np.outer(vt[s:e], vt)
            ii, jj = np.nonzero(bound >= thr)
            keep = jj > (ii + s)
            ia, ib = ids[ii[keep] + s], ids[jj[keep]]
            ne = ia != ib  # strict <: drop duplicate-id pairs exactly
            out_a.append(ia[ne])
            out_b.append(ib[ne])
        if not out_a:
            return pd.DataFrame(
                {"id_a": empty_id, "id_b": empty_id, "cell": pd.Series([], dtype="int32")}
            )
        a = np.concatenate(out_a)
        return pd.DataFrame(
            {
                "id_a": a,
                "id_b": np.concatenate(out_b),
                "cell": np.full(len(a), int(pdf["cell"].iloc[0]), dtype="int32"),
            }
        )

    return slim.groupBy("cell").applyInPandas(pairs, out_schema)


def semantic_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.9,
    n_cells: int = 16,
    kmeans_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cell_size: int | None = None,
    pair_kernel: str = "auto",
) -> DataFrame:
    """SemDeDup-style candidate pairs: coarse-cluster the L2-normalized
    embeddings with k-means (same deterministic Lloyd as ivf_topk —
    seed centers = first ``n_cells`` rows by id), then compare cosine
    similarity only WITHIN each cluster and keep pairs ≥ ``threshold``.
    Returns (id_a, id_b, cosine, cell) with id_a < id_b and cosine
    rounded to 9 dp (the threshold applies to the rounded value so a
    SQL replay lands on identical boundary decisions).

    Scale shape: the quadratic compare is fenced inside cells — cost is
    Σ|cell|² not n², exactly the SemDeDup design (k grows with corpus
    size to keep cells bounded; ``max_cell_size`` re-splits any cell
    above that cap via ``resplit_oversized_cells`` — the skew fence for
    when k alone can't bound the quadratic). Centroids are
    O(n_cells·dim) driver state embedded as plan literals; the
    assignment pass is one map-side projection.

    ``pair_kernel`` picks HOW the Σ|cell|² prune bound is evaluated —
    the OUTPUT is identical either way (both kernels only generate
    candidates; every survivor is re-scored with the same exact JVM
    fold whose summation order matches the SQL oracle):

    - ``"expr"``: self-join on cell + the JVM higher-order-function
      bound — the original plan. Per-PAIR interpreted HOF evaluation
      makes it CPU-bound at Σ|cell|² scale (measured: the pair phase
      dominated the 10x tier at ~27 s of a ~42 s warm pipeline).
    - ``"numpy"``: one Arrow batch per cell (applyInPandas keyed by
      cell) computes the whole cell's bound matrix with a float64 BLAS
      matmul (guide-§4.2 shape: Spark does distribution, the batch
      kernel does the math). The per-task matrix is |cell|² floats —
      bounded by the same ``max_cell_size`` fence as the join, and the
      float64 GEMM differs from the HOF fold only by summation order
      (≤ ~1e-15 on unit vectors), which the existing 1e-9 slack already
      absorbs, so no true pair can be lost.
    - ``"auto"``: numpy.
    """
    if pair_kernel not in ("auto", "expr", "numpy"):
        raise ValueError(f"pair_kernel must be auto/expr/numpy, got {pair_kernel}")
    cb, _ = _kmeans_cells(corpus, n_cells, kmeans_iter, id_col, vec_col)
    if max_cell_size is not None:
        cb = resplit_oversized_cells(cb, max_cell_size, kmeans_iter=kmeans_iter)
    # Partial-dot prune (EXACT, standard partial-distance trick): with
    # v L2-normalized, cos(a,b) = <a_h,b_h> + <a_t,b_t> where h/t split
    # the vector at dim 16, and Cauchy-Schwarz bounds the tail:
    # <a_t,b_t> <= |a_t|·|b_t| with |v_t| = sqrt(1 - |v_h|²). The
    # Σ|cell|² candidate pass carries ONLY (id, cell, 16-dim head,
    # tail norm) — ~4x less row data than both full vectors — and the
    # few pairs whose upper bound can reach the threshold re-join by id
    # to fetch full vectors for the exact dot (candidate -> verify,
    # same shape as the MinHash verify step). The 1e-9 slack covers the
    # final 9-dp rounding (and ~1e-15 normalization/summation-order
    # error — both kernels), so no boundary pair is ever pruned;
    # survivors still get the exact rounded-cosine filter.
    head = F.slice(F.col("v"), 1, 16)
    cb = cb.select(
        "id",
        "v",
        "cell",
        head.alias("vh"),
        F.sqrt(F.greatest(F.lit(0.0), F.lit(1.0) - _dot(head, head))).alias("vt"),
    ).localCheckpoint(eager=True)
    slim = cb.select("id", "cell", "vh", "vt")
    if pair_kernel == "expr":
        a, b = slim.alias("a"), slim.alias("b")
        cand = (
            a.join(
                b, (F.col("a.cell") == F.col("b.cell")) & (F.col("a.id") < F.col("b.id"))
            )
            .where(
                _dot(F.col("a.vh"), F.col("b.vh")) + F.col("a.vt") * F.col("b.vt")
                >= F.lit(threshold) - F.lit(1e-9)
            )
            .select(
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                F.col("a.cell").cast("int").alias("cell"),
            )
        )
    else:
        cand = _cell_pair_candidates_np(slim, threshold)
    va = cb.select(F.col("id").alias("id_a"), F.col("v").alias("_va"))
    vb = cb.select(F.col("id").alias("id_b"), F.col("v").alias("_vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(_dot(F.col("_va"), F.col("_vb")), 9).alias("cosine"),
            "cell",
        )
        .filter(F.col("cosine") >= threshold)
    )


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.9,
    n_cells: int = 16,
    kmeans_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pairs: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup cluster collapse: ``semantic_dup_pairs`` -> connected
    components (Pregel min-label) -> keep the lowest id per semantic
    duplicate group. Returns (id_col, n_dups); n_dups = group size.
    ``pairs`` accepts a precomputed pair set so a pipeline that already
    materialized them pays only the collapse (mirrors dedup_near)."""
    from hama_spark.extensions.dedup import _collapse_pairs

    if pairs is None:
        pairs = semantic_dup_pairs(
            corpus, threshold, n_cells, kmeans_iter, id_col, vec_col
        ).localCheckpoint(eager=True)
    return _collapse_pairs(corpus, pairs, id_col)


def ann_recall_report(
    exact: DataFrame,
    approx: dict[str, DataFrame],
    query_col: str = "query_id",
    id_col: str = "vec_id",
) -> DataFrame:
    """Recall@k of approximate searchers against their brute-force twin
    — the number a user needs before trusting ``lsh_cosine_topk`` /
    ``ivf_topk`` parameters at scale (the ANN analogue of the
    reference's multiply-back verification, SpMVTest.java:131-141).

    ``exact`` is the ground-truth top-k (``cosine_topk``); ``approx``
    maps method name -> that method's top-k over the SAME queries.
    Returns one row per method: (method, n_exact, hits, recall) where
    recall = |approx ∩ exact| / |exact|. Each method costs one
    broadcast-sized join of two (n_queries·k)-row relations — the
    report is metadata-scale regardless of corpus size."""
    from functools import reduce

    gt = exact.select(query_col, id_col)
    outs = []
    for method in sorted(approx):
        hit = (
            approx[method]
            .select(query_col, id_col)
            .withColumn("_hit", F.lit(1))
        )
        outs.append(
            gt.join(hit, [query_col, id_col], "left")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_exact"),
                F.coalesce(F.sum("_hit"), F.lit(0)).cast("bigint").alias("hits"),
            )
            .select(
                F.lit(method).alias("method"),
                "n_exact",
                "hits",
                F.round(F.col("hits") / F.col("n_exact"), 6).alias("recall"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), outs)


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    kmeans_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cells=None,
) -> DataFrame:
    """Hard-negative mining for contrastive training (DPR-style, the
    standard retrieval-training data op): per query, the top-k most
    cosine-similar corpus vectors from OUTSIDE the query's own
    semantic cell — similar enough to be hard, excluded from the
    nearest cell so positives/near-duplicates don't leak into the
    negative set. Exactly the IVF probe with the first cell skipped
    (cells ranked 2..nprobe+1), so it inherits IVF's scale shape: the
    corpus never shuffles, per-query work is the probed slice."""
    return ivf_topk(
        corpus,
        queries,
        k=k,
        n_cells=n_cells,
        nprobe=nprobe,
        kmeans_iter=kmeans_iter,
        id_col=id_col,
        vec_col=vec_col,
        cell_offset=1,
        cells=cells,
    )


def resplit_oversized_cells(
    cb: DataFrame,
    cap: int,
    kmeans_iter: int = 3,
    max_rounds: int = 3,
) -> DataFrame:
    """Recursively split k-means cells larger than ``cap`` — the scale
    fence for ``semantic_dup_pairs``, whose within-cell compare is
    Σ|cell|²: one skewed cell re-introduces the quadratic this design
    exists to avoid. (SemDeDup grows k with corpus size; this handles
    the residual skew k can't.)

    ``cb`` is the assigned relation (id, v, cell). Every oversized cell
    is sub-clustered into ceil(|cell|/cap) parts, and ALL oversized
    cells train together in ONE Lloyd loop per round: assignment is a
    per-cell argmin over that cell's own centers, carried as a
    broadcast (cell -> centers) relation so the plan stays
    structurally constant across iterations and rounds; the update is
    one (cell, sub, dim) aggregation — so the per-round cost is
    ``kmeans_iter`` corpus-subset passes regardless of how many cells
    split. Rounds recurse on still-oversized subcells up to
    ``max_rounds``.

    Driver state: O(Σ k_c · dim) floats per round — same class as the
    IVF centroids. Cells of (near-)identical vectors are geometrically
    irreducible: if a round makes no progress on the oversized-size
    multiset it stops early, and such cells keep their size — their
    pair OUTPUT is legitimately quadratic (every pair is a true dup),
    so splitting them would only hide real results.

    New cell ids for split cells are allocated above max(existing id);
    untouched cells keep their ids."""
    import math

    from hama_spark.functions.distance import MEASURES

    if cap <= 0:
        raise ValueError(f"cap must be > 0, got {cap}")
    measure = MEASURES["euclidean"]
    prev_oversized: list[int] | None = None
    for _ in range(max_rounds):
        # ONE collected job per round carries the oversized-cell sizes,
        # their seed rows AND the global max cell id (as a schema-
        # aligned null-_rk union row) — previously sizes and seeds were
        # two separate driver round-trips per round (r9 VERDICT item 7).
        # k_c = ceil(n/cap) in pure INTEGER arithmetic ((n+cap-1) DIV
        # cap) so the filter can never disagree with the driver-side
        # math.ceil on a float rounding edge.
        wnd = Window.partitionBy("cell").orderBy("id")
        cwnd = Window.partitionBy("cell")
        probe = (
            cb.select(
                "cell",
                "v",
                F.row_number().over(wnd).alias("_rk"),
                F.count(F.lit(1)).over(cwnd).alias("_n"),
            )
            .where(
                (F.col("_n") > cap)
                & (F.col("_rk") <= F.expr(f"(_n + {int(cap)} - 1) DIV {int(cap)}"))
            )
            .select("cell", "_rk", "_n", "v")
        )
        rows = probe.unionByName(
            cb.agg(F.max("cell").alias("cell")).select(
                "cell",
                F.lit(None).cast("int").alias("_rk"),
                F.lit(None).cast("bigint").alias("_n"),
                F.lit(None).cast("array<double>").alias("v"),
            )
        ).collect()
        seed_rows = [r for r in rows if r["_rk"] is not None]
        sizes_over = {int(r["cell"]): int(r["_n"]) for r in seed_rows}
        big = {c: math.ceil(n / cap) for c, n in sizes_over.items()}
        oversized_now = sorted(sizes_over.values())
        if not big or oversized_now == prev_oversized:
            break
        prev_oversized = oversized_now

        bigset = sorted(big)
        subset = cb.where(F.col("cell").isin(bigset)).localCheckpoint(
            eager=True
        )
        keep = cb.where(~F.col("cell").isin(bigset))

        centers: dict[int, list[list[float]]] = {c: [None] * big[c] for c in bigset}
        for r in seed_rows:
            centers[int(r["cell"])][r["_rk"] - 1] = [float(x) for x in r["v"]]

        # remap ids for split cells: fresh ids above every existing id
        base = next(int(r["cell"]) for r in rows if r["_rk"] is None) + 1
        offsets = {}
        for c in bigset:
            offsets[c] = base
            base += big[c]

        spark = cb.sparkSession

        def _assigned():
            # subset + nearest-subcenter index, via a broadcast
            # (cell -> centers) relation instead of per-cell literal
            # `when`-chains: the plan is structurally identical across
            # Lloyd iterations and rounds (codegen compiles once), and
            # the center count no longer inflates the plan — with
            # hundreds of subcells the O(Σ k_c · dim) literal chain
            # dominated wall-clock, not the data pass.
            cdf = spark.createDataFrame(
                [
                    (c, offsets[c], [[float(x) for x in ctr] for ctr in centers[c]])
                    for c in bigset
                ],
                "cell int, off int, ctrs array<array<double>>",
            )
            dists = F.transform(F.col("ctrs"), lambda ctr: measure(F.col("v"), ctr))
            return subset.join(F.broadcast(cdf), "cell").select(
                "id",
                "v",
                "cell",
                "off",
                # array_position keeps the FIRST minimum -> the lowest
                # sub index wins ties, same rule as _assign_expr
                (F.array_position(dists, F.array_min(dists)) - 1)
                .cast("int")
                .alias("_sub"),
            )

        for _it in range(kmeans_iter):
            upd = (
                _assigned()
                .select("cell", "_sub", F.posexplode("v").alias("_dim", "_x"))
                .groupBy("cell", "_sub", "_dim")
                .agg(F.avg("_x").alias("_m"))
                .collect()
            )
            fresh: dict[tuple[int, int], dict[int, float]] = {}
            for r in upd:
                fresh.setdefault((int(r["cell"]), r["_sub"]), {})[r["_dim"]] = r["_m"]
            for (c, s), dims in fresh.items():
                centers[c][s] = [dims[d] for d in sorted(dims)]
            # empty subcells keep their previous center

        split = _assigned().select(
            "id", "v", (F.col("off") + F.col("_sub")).cast("int").alias("cell")
        )
        cb = keep.select("id", "v", F.col("cell").cast("int")).unionByName(
            split
        ).localCheckpoint(eager=True)
    return cb
