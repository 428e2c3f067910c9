"""Product quantization (PQ) for the ANN stack: compress each
L2-normalized embedding into ``m`` sub-space codebook codes (m bytes a
vector at nbits=8, here default nbits=4 → m nibbles) and score queries
against the COMPRESSED corpus by asymmetric distance (ADC) — the
IVF-PQ workhorse layout (Jégou et al., "Product Quantization for
Nearest Neighbor Search", TPAMI 2011; public FAISS architecture).

Why it matters at 100 TB: a 768-dim float32 embedding is 3 KB; its
m=96/nbits=8 PQ code is 96 bytes — a 32× smaller relation to scan,
shuffle and cache, while the codebooks themselves are O(m·2^nbits·dsub)
driver state (a few KB) broadcast into the plan. The corpus is encoded
ONCE; every query afterwards touches only the code relation.

Spark formulation (all JVM-side, no UDFs):

- training runs ALL m sub-spaces in ONE Lloyd loop over an exploded
  (id, subspace, subvector) relation — one map-side-combined groupBy
  per iteration for every codebook together, not m sequential k-means
  (same update/tie-break/empty-cell semantics as ``ml.kmeans``:
  lowest-index argmin wins ties, empty cells keep their center).
- encode/ADC carry the codebooks as a one-row broadcast
  ``array<array<array<double>>>`` relation (the ``ml.kmeans``
  codegen-stability trick — plan literals would recompile per call).
- ADC score = Σ_j  dot(q_sub_j, codebook[j][code_j]), computed with
  ``aggregate``/``zip_with`` over the broadcast codebooks; an optional
  exact re-rank joins the top ``rerank*k`` ADC candidates back to the
  raw vectors (production IVF-PQ shape: approximate recall, exact
  order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hama_spark.extensions.similarity import _dot, _normalized


def _codebook_df(spark, codebooks: list[list[list[float]]]):
    """One-row broadcast relation carrying the nested codebooks."""
    return spark.createDataFrame(
        [([[list(map(float, c)) for c in book] for book in codebooks],)],
        "cb array<array<array<double>>>",
    )


def _sub(vcol, j: int, dsub: int):
    return F.slice(vcol, j * dsub + 1, dsub)


def train_pq(
    corpus: DataFrame,
    m: int = 8,
    nbits: int = 4,
    kmeans_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Train ``m`` codebooks of ``2**nbits`` centers each over the
    corpus's L2-normalized sub-vectors. Deterministic: seed centers are
    the first ``2**nbits`` rows by id (the ``_kmeans_cells``
    discipline), updates are exact Lloyd.

    Returns ``codebooks[m][2**nbits][dim/m]`` (plain Python floats —
    O(m·2^nbits·dsub) driver state, like kmeans centers).
    """
    k = 1 << nbits
    c = _normalized(corpus, id_col, vec_col).localCheckpoint(eager=True)
    first = c.orderBy("id").limit(k).collect()
    if not first:
        raise ValueError("train_pq: empty corpus")
    dim = len(first[0]["v"])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    books = [
        [list(r["v"][j * dsub : (j + 1) * dsub]) for r in first] for j in range(m)
    ]
    # pad (corpus smaller than k): repeat the last seed — harmless, the
    # duplicate centers never win the strict-first argmin over a better fit
    for book in books:
        while len(book) < k:
            book.append(list(book[-1]))

    spark = corpus.sparkSession
    exploded = c.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("j"), _sub(F.col("v"), j, dsub).alias("sv"))
                    for j in range(m)
                ]
            )
        ).alias("e"),
    ).select(F.col("e.j").alias("j"), F.col("e.sv").alias("sv"))
    exploded = exploded.localCheckpoint(eager=True)

    iterations = 0
    while True:
        iterations += 1
        cdf = _codebook_df(spark, books)
        # this subspace's book: element_at(cb, j+1); squared-L2 argmin,
        # first match wins ties (array_position scans left to right)
        dists = F.transform(
            F.element_at(F.col("cb"), F.col("j") + 1),
            lambda ctr: F.aggregate(
                F.zip_with(F.col("sv"), ctr, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        assigned = exploded.crossJoin(F.broadcast(cdf)).select(
            "j",
            "sv",
            (F.array_position(dists, F.array_min(dists)) - 1).cast("int").alias("code"),
        )
        stats = (
            assigned.select("j", "code", F.posexplode("sv").alias("_d", "_x"))
            .groupBy("j", "code", "_d")
            .agg(F.sum("_x").alias("_s"), F.count(F.lit(1)).alias("_n"))
            .collect()
        )
        sums: dict[tuple[int, int], dict] = {}
        for r in stats:
            d = sums.setdefault((r["j"], r["code"]), {"n": r["_n"], "s": [0.0] * dsub})
            d["s"][r["_d"]] = r["_s"]
        moved = 0
        for (j, code), r in sums.items():
            new_c = [r["s"][d] / r["n"] for d in range(dsub)]
            if sum(abs(a - b) for a, b in zip(books[j][code], new_c)) > 0.0:
                books[j][code] = new_c
                moved += 1
        if moved == 0 or iterations >= kmeans_iter:
            break
    return books


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>): each vector's per-subspace nearest-center
    indices — the m-byte compressed representation the ADC scan reads.
    One map-only pass, codebooks broadcast once."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    c = _normalized(corpus, id_col, vec_col)
    cdf = _codebook_df(corpus.sparkSession, codebooks)

    def code(j: int):
        dists = F.transform(
            F.element_at(F.col("cb"), j + 1),
            lambda ctr: F.aggregate(
                F.zip_with(_sub(F.col("v"), j, dsub), ctr, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")

    return c.crossJoin(F.broadcast(cdf)).select(
        "id", F.array(*[code(j) for j in range(m)]).alias("codes")
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 8,
    nbits: int = 4,
    kmeans_iter: int = 5,
    rerank: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: list[list[list[float]]] | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """Approximate cosine top-k over the PQ-compressed corpus:
    (query_id, id_col, cosine, rank), rank 1 = best, exact-cosine
    re-ranked (ties → lowest id, the ``cosine_topk`` convention).

    ADC approximates dot(q, v) ≈ Σ_j dot(q_sub_j, codebook_j[code_j]);
    the top ``rerank·k`` ADC candidates per query are re-scored with
    the EXACT cosine against the raw vectors, so reported scores are
    true cosines and PQ error only costs recall, never score fidelity.
    Pass ``codebooks``/``codes`` from :func:`train_pq`/:func:`pq_encode`
    to reuse a trained index across query batches (the persistent-index
    path); otherwise both are derived here.

    Scale shape: the scan side is the (id, codes) relation — m small
    ints per corpus row; queries (an online batch, tiny next to the
    corpus) broadcast into the ADC join; the re-rank join touches raw
    vectors for only rerank·k·|Q| candidate ids.
    """
    if codebooks is None:
        codebooks = train_pq(corpus, m, nbits, kmeans_iter, id_col, vec_col)
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    if codes is None:
        codes = pq_encode(corpus, codebooks, id_col, vec_col)

    q = _normalized(queries, id_col, vec_col).select(
        F.col("id").alias("qid"), F.col("v").alias("qv")
    )
    cdf = _codebook_df(corpus.sparkSession, codebooks)
    q = q.crossJoin(F.broadcast(cdf))

    # ADC: fold over subspaces; the codebook row for this candidate's
    # j-th code is cb[j][codes[j]] (element_at is 1-based)
    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, j: acc
        + F.aggregate(
            F.zip_with(
                F.slice(F.col("qv"), j * F.lit(dsub) + 1, dsub),
                F.element_at(
                    F.element_at(F.col("cb"), j + 1),
                    F.element_at(F.col("codes"), j + 1) + 1,
                ),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc2, x: acc2 + x,
        ),
    )
    cand_w = Window.partitionBy("qid").orderBy(F.desc("_adc"), F.asc("id"))
    candidates = (
        codes.crossJoin(F.broadcast(q))
        .select("qid", "qv", "id", adc.alias("_adc"))
        .withColumn("_r", F.row_number().over(cand_w))
        .filter(F.col("_r") <= rerank * k)
        .select("qid", "qv", "id")
    )

    raw = _normalized(corpus, id_col, vec_col)
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("id"))
    return (
        candidates.join(raw, "id")
        .select("qid", "id", F.round(_dot(F.col("v"), F.col("qv")), 9).alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"), F.col("id").alias(id_col), "cosine", "rank"
        )
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    m: int = 8,
    nbits: int = 4,
    kmeans_iter: int = 5,
    rerank: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cells=None,
    codebooks: list[list[list[float]]] | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ: coarse k-means cells bound WHICH corpus slice each query
    scans (``nprobe`` of ``n_cells``); PQ codes bound WHAT the scan
    reads per row (m small ints, not dim floats); exact re-rank on the
    surviving ``rerank*k`` candidates restores true cosines. The
    production serving layout — both levers compose multiplicatively:
    at n_cells=1024/nprobe=8 and 768→96-byte codes, a query batch
    touches ~1/128 of the rows at ~1/32 of the bytes per row.

    ``cells``/``codebooks``/``codes`` accept pretrained artifacts
    (``_kmeans_cells`` pair, :func:`train_pq`, :func:`pq_encode`) so an
    index is trained once and probed many times.
    """
    from hama_spark.extensions.similarity import _kmeans_cells
    from hama_spark.functions.distance import MEASURES

    assigned, centers = cells or _kmeans_cells(
        corpus, n_cells, kmeans_iter, id_col, vec_col
    )
    if codebooks is None:
        codebooks = train_pq(corpus, m, nbits, kmeans_iter, id_col, vec_col)
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    if codes is None:
        codes = pq_encode(corpus, codebooks, id_col, vec_col)
    # a persisted code relation (load_pq_index) already carries cell
    coded = (
        codes
        if "cell" in codes.columns
        else codes.join(assigned.select("id", "cell"), "id")
    )

    measure = MEASURES["euclidean"]
    q = _normalized(queries, id_col, vec_col).select(
        F.col("id").alias("qid"), F.col("v").alias("qv")
    )
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
        F.explode(F.slice(F.array_sort(dists), 1, nprobe)).alias("dc"),
    ).select("qid", "qv", F.col("dc.cell").alias("cell"))
    qcells = qcells.crossJoin(
        F.broadcast(_codebook_df(corpus.sparkSession, codebooks))
    )

    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, j: acc
        + F.aggregate(
            F.zip_with(
                F.slice(F.col("qv"), j * F.lit(dsub) + 1, dsub),
                F.element_at(
                    F.element_at(F.col("cb"), j + 1),
                    F.element_at(F.col("codes"), j + 1) + 1,
                ),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc2, x: acc2 + x,
        ),
    )
    cand_w = Window.partitionBy("qid").orderBy(F.desc("_adc"), F.asc("id"))
    candidates = (
        coded.join(F.broadcast(qcells), "cell")
        .select("qid", "qv", "id", adc.alias("_adc"))
        .withColumn("_r", F.row_number().over(cand_w))
        .filter(F.col("_r") <= rerank * k)
        .select("qid", "qv", "id")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("id"))
    return (
        candidates.join(assigned.select("id", "v"), "id")
        .select("qid", "id", F.round(_dot(F.col("v"), F.col("qv")), 9).alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"), F.col("id").alias(id_col), "cosine", "rank"
        )
    )
