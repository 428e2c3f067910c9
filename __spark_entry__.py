"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` maps every implemented operator from SURVEY.md §2 (plus
the north-star extension operators) to a callable ``(spark, sf_dir) ->
DataFrame``; ``oracle_sql()`` gives the DuckDB-equivalent ANSI SQL for
every deterministic, SQL-expressible query. Iterative fixpoints (SSSP,
PageRank, GD) are oracle-checked via *unrolled* SQL iterations
(Bellman-Ford steps / power iterations / GD updates as chained CTEs),
generated programmatically below.

Cross-engine float policy: outputs that aggregate doubles are rounded
(2-9 dp depending on magnitude) on BOTH sides; pure int math and single
divisions are bit-exact and left unrounded.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hama_spark.session import load_tables

# ----------------------------------------------------------------------
# derived fixtures: graphs from the TPC-H-ish tables, defined ONCE in
# Spark and ONCE in SQL with identical semantics.
# ----------------------------------------------------------------------

# weighted DAG on nation keys: k -> k+1, k+2 with w = ((7k+13k')%20)+1
NATION_DAG_SQL = """
    SELECT CAST(a.n_nationkey AS VARCHAR) AS src,
           CAST(b.n_nationkey AS VARCHAR) AS dst,
           ((a.n_nationkey*7 + b.n_nationkey*13) % 20) + 1 AS weight
    FROM nation a JOIN nation b
      ON b.n_nationkey - a.n_nationkey IN (1, 2)
"""


def _nation_dag(spark: SparkSession, t) -> DataFrame:
    a, b = t["nation"].alias("a"), t["nation"].alias("b")
    return a.join(
        b,
        (F.col("b.n_nationkey") - F.col("a.n_nationkey")).isin(1, 2),
    ).select(
        F.col("a.n_nationkey").cast("string").alias("src"),
        F.col("b.n_nationkey").cast("string").alias("dst"),
        ((F.col("a.n_nationkey") * 7 + F.col("b.n_nationkey") * 13) % 20 + 1).alias(
            "weight"
        ),
    )


# directed ring-ish graph with uneven in-degree for PageRank:
# k -> (k+1)%25 and k -> (3k+2)%25, plus self-refs added by pagerank()
PR_EDGES_SQL = """
    SELECT CAST(n_nationkey AS VARCHAR) AS src,
           CAST((n_nationkey + 1) % 25 AS VARCHAR) AS dst FROM nation
    UNION
    SELECT CAST(n_nationkey AS VARCHAR),
           CAST((3*n_nationkey + 2) % 25 AS VARCHAR) FROM nation
"""


def _pr_edges(spark: SparkSession, t) -> DataFrame:
    n = t["nation"]
    return (
        n.select(
            F.col("n_nationkey").cast("string").alias("src"),
            ((F.col("n_nationkey") + 1) % 25).cast("string").alias("dst"),
        )
        .union(
            n.select(
                F.col("n_nationkey").cast("string"),
                ((F.col("n_nationkey") * 3 + 2) % 25).cast("string"),
            )
        )
        .distinct()
    )


# customer–nation bipartite graph (string ids) for connected components
def _cc_edges(spark: SparkSession, t) -> DataFrame:
    return t["customer"].select(
        F.concat(F.lit("c"), F.col("c_custkey")).alias("src"),
        F.concat(F.lit("n"), F.col("c_nationkey")).alias("dst"),
    )


# supplier->part graph for inlink counting (prefixed to keep id spaces
# disjoint)
def _sp_edges(spark: SparkSession, t) -> DataFrame:
    return t["lineitem"].select(
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey")).alias("dst"),
    )


SP_EDGES_SQL = "SELECT 's' || CAST(l_suppkey AS VARCHAR) AS src, 'p' || CAST(l_partkey AS VARCHAR) AS dst FROM lineitem"

SPMV_VEC_SQL = "SELECT CAST(i AS INT) AS pos, ((i*7) % 13) / 13.0 AS value FROM range(64) r(i)"

# sum-based gradient (no 1/m) scales with row count: alpha must keep the
# y-weighted cost monotone at the LARGEST sf we run (sf0.1, m≈600k,
# λmax≈5.6e6; 2e-7 diverges there, 1e-7 converges with margin)
GD_ALPHA = 1e-7
GD_ITERS = 5


# ----------------------------------------------------------------------
# unrolled-iteration SQL generators
# ----------------------------------------------------------------------
def _bellman_ford_sql(edges_sql: str, start: str, steps: int = 0) -> str:
    """Shortest-path oracle as a recursive CTE (valid because the
    fixture graph is a DAG — recursion terminates). An unrolled
    fixed-step variant re-opens the parquet view once per step and can
    exhaust file descriptors; the recursive form references it once."""
    return f"""
        WITH RECURSIVE e AS ({edges_sql}),
        -- no top-level UNION in a CTE body under WITH RECURSIVE: DuckDB
        -- gives it recursive-union semantics and skips the dedup
        v AS (SELECT DISTINCT id FROM (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
        walk(id, dist) AS (
            SELECT '{start}' AS id, 0 AS dist
            UNION ALL
            SELECT e.dst, walk.dist + e.weight FROM walk JOIN e ON e.src = walk.id
        ),
        best AS (SELECT id, min(dist) AS dist FROM walk GROUP BY id)
        SELECT v.id, CAST(coalesce(best.dist, 2147483647) AS INT) AS dist
        FROM v LEFT JOIN best ON best.id = v.id
    """


def _hits_sql(edges_sql: str, iters: int) -> str:
    """HITS replay (graph/hits.py): the exact synchronous schedule as
    chained CTEs. The loop is UNNORMALIZED — normalization commutes
    with the linear half-steps, so one final L2 normalization over ALL
    vertices reproduces the textbook per-half-step-normalized values
    (see graph/hits.py's derivation); intermediate score CTEs stay
    SPARSE (inner joins only), zeros are filled in the final select."""
    parts = [
        f"WITH e AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({edges_sql})),",
        "v AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst FROM e),",
        "h0 AS (SELECT id, 1.0::DOUBLE AS hub FROM v),",
        # a0 exists so the iters=0 replay is valid SQL (Spark's hits()
        # normalizes the all-ones initial state at iterations=0 too)
        "a0 AS (SELECT id, 1.0::DOUBLE AS authority FROM v)",
    ]
    for t in range(iters):
        parts.append(f""", a{t + 1} AS MATERIALIZED (
            SELECT e.dst AS id, sum(h.hub) AS authority
            FROM e JOIN h{t} h ON h.id = e.src GROUP BY 1),
          h{t + 1} AS MATERIALIZED (
            SELECT e.src AS id, sum(a.authority) AS hub
            FROM e JOIN a{t + 1} a ON a.id = e.dst GROUP BY 1)""")
    parts.append(f""", hn AS (SELECT sqrt(sum(hub*hub)) AS n FROM h{iters}),
        an AS (SELECT sqrt(sum(authority*authority)) AS n FROM a{iters})
        SELECT v.id,
          round(coalesce(CASE WHEN hn.n > 0 THEN h.hub / hn.n END, 0), 6) AS hub,
          round(coalesce(CASE WHEN an.n > 0 THEN a.authority / an.n END, 0), 6) AS authority
        FROM v
        LEFT JOIN h{iters} h ON h.id = v.id
        LEFT JOIN a{iters} a ON a.id = v.id
        CROSS JOIN hn CROSS JOIN an""")
    return "\n".join(parts)


def _harmonic_sql(edges_sql: str, landmarks: int, radius: int, seed: int) -> str:
    """Landmark harmonic-centrality replay (graph/centrality.py):
    seeded md5 landmark pick, then one frontier-expansion CTE pair per
    BFS round (symmetrized edges), exactly the DataFrame schedule."""
    parts = [
        f"""WITH re AS MATERIALIZED ({edges_sql}),
        e AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
            SELECT src, dst FROM re
            UNION ALL SELECT dst AS src, src AS dst FROM re)),
        v AS MATERIALIZED (SELECT DISTINCT id FROM (
            SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e)),
        lm AS MATERIALIZED (SELECT id FROM v
            ORDER BY md5('{seed}:' || id), id LIMIT {landmarks}),
        d0 AS MATERIALIZED (SELECT id AS lm, id, 0 AS d FROM lm),
        f0 AS (SELECT * FROM d0)"""
    ]
    for r in range(1, radius + 1):
        parts.append(f""", c{r} AS (
            SELECT DISTINCT f.lm AS lm, e.dst AS id
            FROM f{r - 1} f JOIN e ON e.src = f.id),
          f{r} AS MATERIALIZED (
            SELECT c.lm, c.id, {r} AS d FROM c{r} c
            WHERE NOT EXISTS (
                SELECT 1 FROM d{r - 1} p WHERE p.lm = c.lm AND p.id = c.id)),
          d{r} AS MATERIALIZED (
            SELECT lm, id, d FROM d{r - 1}
            UNION ALL SELECT lm, id, d FROM f{r})""")
    parts.append(f"""
        SELECT v.id,
               coalesce(s.h, 0.0) AS harmonic,
               CAST(coalesce(s.n, 0) AS BIGINT) AS n_lm
        FROM v LEFT JOIN (
            SELECT id,
                   round(sum(CASE WHEN d > 0 THEN 1.0 / d ELSE 0 END), 6) AS h,
                   count(*) AS n
            FROM d{radius} GROUP BY 1) s ON s.id = v.id""")
    return "\n".join(parts)


def _betweenness_sql(edges_sql: str, sources: int, radius: int, seed: int) -> str:
    """Sampled radius-bounded Brandes replay (graph/betweenness.py):
    md5-seeded source pick, forward BFS with integer sigma sums, DAG
    dependency accumulation walked back level-by-level — the exact
    DataFrame schedule as chained CTEs."""
    parts = [
        f"""WITH re AS MATERIALIZED ({edges_sql}),
        e AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
            SELECT src, dst FROM re
            UNION ALL SELECT dst AS src, src AS dst FROM re)),
        v AS MATERIALIZED (SELECT DISTINCT id FROM (
            SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e)),
        srcs AS MATERIALIZED (SELECT id FROM v
            ORDER BY md5('{seed}:' || id), id LIMIT {sources}),
        sp0 AS MATERIALIZED (
            SELECT id AS s, id, 0 AS d, 1::BIGINT AS sigma FROM srcs),
        f0 AS (SELECT * FROM sp0)"""
    ]
    for r in range(1, radius + 1):
        parts.append(f""", c{r} AS (
            SELECT f.s, e.dst AS id, sum(f.sigma) AS sigma
            FROM f{r - 1} f JOIN e ON e.src = f.id
            WHERE NOT EXISTS (
                SELECT 1 FROM sp{r - 1} p WHERE p.s = f.s AND p.id = e.dst)
            GROUP BY 1, 2),
          f{r} AS MATERIALIZED (SELECT s, id, {r} AS d, sigma FROM c{r}),
          sp{r} AS MATERIALIZED (
            SELECT s, id, d, sigma FROM sp{r - 1}
            UNION ALL SELECT s, id, d, sigma FROM f{r})""")
    parts.append(f""", dag AS MATERIALIZED (
            SELECT a.s, a.id AS vx, b.id AS w, a.d AS dv,
                   a.sigma AS sigma_v, b.sigma AS sigma_w
            FROM sp{radius} a
            JOIN e ON e.src = a.id
            JOIN sp{radius} b ON b.s = a.s AND b.id = e.dst
            WHERE b.d = a.d + 1),
        du{radius} AS (SELECT s, id, 0.0 AS delta FROM sp{radius} WHERE false)""")
    for r in range(radius - 1, -1, -1):
        parts.append(f""", dl{r} AS MATERIALIZED (
            SELECT g.s, g.vx AS id,
                   sum((CAST(g.sigma_v AS DOUBLE) / g.sigma_w)
                       * (1.0 + coalesce(x.delta, 0.0))) AS delta
            FROM dag g
            LEFT JOIN du{r + 1} x ON x.s = g.s AND x.id = g.w
            WHERE g.dv = {r}
            GROUP BY 1, 2),
          du{r} AS MATERIALIZED (
            SELECT s, id, delta FROM du{r + 1}
            UNION ALL SELECT s, id, delta FROM dl{r})""")
    parts.append(f"""
        SELECT v.id, coalesce(b.bc, 0.0) AS betweenness
        FROM v LEFT JOIN (
            SELECT id, round(sum(delta), 6) AS bc
            FROM du0 WHERE id <> s GROUP BY 1) b ON b.id = v.id""")
    return "\n".join(parts)


def _nb_confusion_sql(label_col: str = "lang", smoothing: float = 1.0) -> str:
    """Multinomial-NB resubstitution confusion replay
    (ml/naive_bayes.py): integer count model, ln terms from identical
    integer inputs, argmax by (round(score, 6) DESC, label ASC)."""
    a = float(smoothing)
    return f"""
        WITH labeled AS MATERIALIZED (
            SELECT doc_id, {label_col} AS label, text FROM documents
            WHERE {label_col} IS NOT NULL AND text IS NOT NULL),
        dt AS MATERIALIZED (
            SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS k FROM (
                SELECT doc_id,
                       unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
                FROM labeled) u
            WHERE tok <> '' GROUP BY 1, 2),
        ltoks AS MATERIALIZED (
            SELECT label, tok, CAST(count(*) AS BIGINT) AS cnt FROM (
                SELECT label,
                       unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
                FROM labeled) u
            WHERE tok <> '' GROUP BY 1, 2),
        classes AS MATERIALIZED (
            SELECT t.label, t.tot, d.n_docs
            FROM (SELECT label, sum(cnt) AS tot FROM ltoks GROUP BY 1) t
            JOIN (SELECT label, count(*) AS n_docs FROM labeled GROUP BY 1) d
              USING (label)),
        vocab AS (SELECT count(DISTINCT tok) AS v FROM ltoks),
        ntotal AS (SELECT sum(n_docs) AS nt FROM classes),
        cls AS MATERIALIZED (
            SELECT label, ln(n_docs) - ln(nt) AS log_prior,
                   tot + {a} * v AS den
            FROM classes CROSS JOIN vocab CROSS JOIN ntotal),
        scored AS MATERIALIZED (
            SELECT dt.doc_id, cls.label,
                   min(cls.log_prior)
                   + sum(dt.k * (ln(coalesce(tc.cnt, 0) + {a}) - ln(cls.den)))
                     AS score
            FROM dt CROSS JOIN cls
            LEFT JOIN ltoks tc ON tc.label = cls.label AND tc.tok = dt.tok
            GROUP BY 1, 2),
        pred AS (
            SELECT doc_id, label AS predicted,
                   row_number() OVER (PARTITION BY doc_id
                       ORDER BY round(score, 6) DESC, label ASC) AS rn
            FROM scored)
        SELECT l.label AS actual, p.predicted, CAST(count(*) AS BIGINT) AS n
        FROM labeled l JOIN pred p ON p.doc_id = l.doc_id AND p.rn = 1
        GROUP BY 1, 2
    """


def _pagerank_sql(edges_sql: str, n: int, iters: int, damping: float = 0.85) -> str:
    alpha = (1.0 - damping) / n
    parts = [
        f"WITH base AS ({edges_sql}),",
        "v AS (SELECT DISTINCT src AS id FROM base UNION SELECT DISTINCT dst FROM base),",
        # self-ref edges (hama.graph.self.ref), matching pagerank(self_ref=True)
        "e AS (SELECT src, dst FROM base UNION SELECT id, id FROM v),",
        "od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),",
        f"r0 AS (SELECT id, 1.0/{n} AS rank FROM v)",
    ]
    for i in range(iters):
        parts.append(
            f""", r{i + 1} AS (
            SELECT e.dst AS id, {alpha!r} + {damping} * sum(r.rank / od.outdeg) AS rank
            FROM r{i} r JOIN e ON e.src = r.id JOIN od ON od.src = e.src
            GROUP BY e.dst)"""
        )
    parts.append(f" SELECT id, round(rank, 9) AS rank FROM r{iters}")
    return "\n".join(parts)


def _walks_sql(edges_sql: str, walk_len: int, seed: int) -> str:
    """random_walks replay: sorted neighbor lists + per-step md5 draw
    keyed by (seed, walk_src, step). Dead ends stay in place."""
    parts = [
        f"""WITH base AS ({edges_sql}),
        nb AS MATERIALIZED (
          SELECT src, list_sort(list(DISTINCT dst)) AS nbrs FROM base GROUP BY src),
        v AS (SELECT DISTINCT src AS id FROM base UNION SELECT DISTINCT dst FROM base),
        s0 AS (SELECT id AS walk_src, id AS cur, id AS path FROM v)""",
    ]
    for k in range(walk_len):
        draw = f"('0x' || substr(md5('{seed}:' || walk_src || ':{k}'), 1, 8))::BIGINT"
        nxt = (
            f"CASE WHEN nb.nbrs IS NULL THEN s.cur "
            f"ELSE nb.nbrs[CAST({draw} % len(nb.nbrs) AS INT) + 1] END"
        )
        parts.append(
            f""", s{k + 1} AS MATERIALIZED (
            SELECT s.walk_src, {nxt} AS cur,
                   s.path || '->' || {nxt} AS path
            FROM s{k} s LEFT JOIN nb ON nb.src = s.cur)"""
        )
    parts.append(f" SELECT walk_src, path AS walk FROM s{walk_len}")
    return "\n".join(parts)


def _ppr_sql(edges_sql: str, source: str, iters: int, damping: float = 0.85) -> str:
    """Personalized-PageRank replay: same schedule as _pagerank_sql but
    the teleport mass (1-d) lands entirely on ``source`` and rank_0 is
    the indicator vector of the source."""
    parts = [
        f"WITH base AS ({edges_sql}),",
        "v AS (SELECT DISTINCT src AS id FROM base UNION SELECT DISTINCT dst FROM base),",
        "e AS (SELECT src, dst FROM base UNION SELECT id, id FROM v),",
        "od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),",
        f"r0 AS (SELECT id, CASE WHEN id = '{source}' THEN 1.0 ELSE 0.0 END AS rank FROM v)",
    ]
    for i in range(iters):
        parts.append(
            f""", r{i + 1} AS (
            SELECT e.dst AS id,
                   (CASE WHEN e.dst = '{source}' THEN {1.0 - damping!r} ELSE 0.0 END)
                   + {damping} * sum(r.rank / od.outdeg) AS rank
            FROM r{i} r JOIN e ON e.src = r.id JOIN od ON od.src = e.src
            GROUP BY e.dst)"""
        )
    parts.append(f" SELECT id, round(rank, 9) AS rank FROM r{iters}")
    return "\n".join(parts)


def _gd_logistic_sql(iters: int = GD_ITERS, alpha: float = GD_ALPHA) -> str:
    parts = [
        "WITH d AS (SELECT 1.0 AS x0, l_quantity/10.0 AS x1,",
        "                  CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS y",
        "           FROM lineitem),",
        "c AS (SELECT count(*) AS m FROM d),",
        "t0 AS (SELECT 0.0 AS a, 0.0 AS b)",
    ]
    h = "(1.0 / (1.0 + exp(-(t.a + t.b*d.x1))))"
    for i in range(iters):
        parts.append(
            f""", t{i + 1} AS (
            SELECT t.a - {alpha!r} * sum({h} - d.y) AS a,
                   t.b - {alpha!r} * sum(({h} - d.y) * d.x1) AS b
            FROM t{i} t, d GROUP BY t.a, t.b)"""
        )
    parts.append(
        f""" SELECT round(t.a, 6) AS theta0, round(t.b, 6) AS theta1,
               round(sum(-(d.y * ln({h}) + (1.0 - d.y) * ln(1.0 - {h}))) / c.m, 6) AS cost,
               {iters} AS iterations
        FROM t{iters} t, d, c GROUP BY t.a, t.b, c.m"""
    )
    return "\n".join(parts)


def _gd_linear_sql(iters: int = GD_ITERS, alpha: float = GD_ALPHA) -> str:
    parts = [
        "WITH d AS (SELECT 1.0 AS x0, l_quantity/10.0 AS x1,",
        "                  l_extendedprice/100000.0 AS y FROM lineitem),",
        "c AS (SELECT count(*) AS m FROM d),",
        "t0 AS (SELECT 0.0 AS a, 0.0 AS b)",
    ]
    for i in range(iters):
        parts.append(
            f""", t{i + 1} AS (
            SELECT t.a - {alpha!r} * sum(t.a + t.b*d.x1 - d.y) AS a,
                   t.b - {alpha!r} * sum((t.a + t.b*d.x1 - d.y) * d.x1) AS b
            FROM t{i} t, d GROUP BY t.a, t.b)"""
        )
    parts.append(
        f""" SELECT round(t.a, 6) AS theta0, round(t.b, 6) AS theta1,
               round(sum(d.y * pow(t.a + t.b*d.x1 - d.y, 2)) / (2*c.m), 6) AS cost,
               {iters} AS iterations
        FROM t{iters} t, d, c GROUP BY t.a, t.b, c.m"""
    )
    return "\n".join(parts)


KMEANS_ITERS = 3
KMEANS_K = 4
KMEANS_DIM = 64


QC_ALPHA, QC_ITERS = 1e-5, 6


def _quality_classifier_sql(iters: int = QC_ITERS, alpha: float = QC_ALPHA) -> str:
    """quality_classifier_scores replay: logistic GD (the M2 schedule —
    unnormalized gradient sums, zero init, fixed iterations) on
    [1, stopword_ratio, digit_ratio] predicting lang='en', then score
    every document with the final theta."""
    from hama_spark.extensions.text import EN_STOPWORDS

    inlist = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    toks = r"regexp_split_to_array(trim(text), '\s+')"
    parts = [
        f"""WITH d AS MATERIALIZED (
          SELECT doc_id,
                 len(list_filter({toks}, tk -> lower(tk) IN ({inlist}))) * 1.0
                   / len({toks}) AS x1,
                 coalesce(length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0
                   / nullif(length(text), 0), 0.0) AS x2,
                 CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
          FROM documents),
        t0 AS (SELECT 0.0 AS a, 0.0 AS b, 0.0 AS c)""",
    ]
    h = "(1.0 / (1.0 + exp(-(t.a + t.b*d.x1 + t.c*d.x2))))"
    for i in range(iters):
        parts.append(
            f""", t{i + 1} AS (
            SELECT t.a - {alpha!r} * sum({h} - d.y) AS a,
                   t.b - {alpha!r} * sum(({h} - d.y) * d.x1) AS b,
                   t.c - {alpha!r} * sum(({h} - d.y) * d.x2) AS c
            FROM t{i} t, d GROUP BY t.a, t.b, t.c)"""
        )
    parts.append(
        f""" SELECT d.doc_id, round({h}, 6) AS score, {h} >= 0.5 AS predicted
        FROM d, t{iters} t"""
    )
    return "\n".join(parts)


def _kmeans_sql(iters: int = KMEANS_ITERS, k: int = KMEANS_K, dim: int = KMEANS_DIM) -> str:
    """Unrolled Lloyd on embeddings: seed centers = first k vectors by
    vec_id (matching _q_kmeans), assign by argmin squared distance
    (|c|² − 2p·c — same ranking as Euclidean, |p|² constant per point),
    lowest cid wins ties, empty centers keep position. Mirrors
    hama_spark.ml.kmeans's exact schedule."""
    d2 = (
        "list_aggregate(list_transform(c.c, y -> y*y), 'sum')"
        " - 2*list_dot_product(e.v, c.c)"
    )
    parts = [
        "WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),",
        f"""c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS c
               FROM emb ORDER BY vec_id LIMIT {k})""",
    ]
    for t in range(iters + 1):
        parts.append(
            f""", a{t} AS (
              SELECT vec_id, v, cid FROM (
                SELECT e.vec_id, e.v, c.cid,
                       row_number() OVER (PARTITION BY e.vec_id
                                          ORDER BY {d2}, c.cid) AS rn
                FROM emb e CROSS JOIN c{t} c)
              WHERE rn = 1)"""
        )
        if t == iters:
            break
        parts.append(
            f""", u{t} AS (
              SELECT cid, dim, avg(val) AS m
              FROM (SELECT cid, unnest(v) AS val,
                           unnest(range(1, {dim + 1})) AS dim FROM a{t})
              GROUP BY cid, dim
            ), n{t} AS (SELECT cid, list(m ORDER BY dim) AS c FROM u{t} GROUP BY cid)
            , c{t + 1} AS (
              SELECT c.cid, coalesce(n.c, c.c) AS c
              FROM c{t} c LEFT JOIN n{t} n ON n.cid = c.cid)"""
        )
    parts.append(
        f""" SELECT CAST(cid AS INT) AS center_id, CAST(count(*) AS BIGINT) AS n_points
        FROM a{iters} GROUP BY cid"""
    )
    return "\n".join(parts)


def _matching_sql(edges_sql: str, seed: int = 42, rounds: int = 3) -> str:
    """Unrolled randomized-matching rounds mirroring
    hama_spark.graph.matching exactly: per round, RIGHT accepts the
    min-hash proposal, LEFT confirms the min-hash acceptance, both
    endpoints record; hash = md5("seed:round:l:r") first 8 hex."""
    parts = [
        f"WITH e AS (SELECT DISTINCT src AS l, dst AS r FROM ({edges_sql})),",
        """s0 AS (
          SELECT l AS id, 'L' AS side, CAST(NULL AS VARCHAR) AS match FROM (SELECT DISTINCT l FROM e)
          UNION ALL
          SELECT r, 'R', NULL FROM (SELECT DISTINCT r FROM e))""",
    ]
    for t in range(rounds):
        h = f"('0x' || substr(md5('{seed}:{t}:' || p.l || ':' || p.r), 1, 8))::BIGINT"
        parts.append(
            f""", p{t} AS (
              SELECT e.l, e.r FROM e
                JOIN s{t} sl ON sl.id = e.l AND sl.match IS NULL
                JOIN s{t} sr ON sr.id = e.r AND sr.match IS NULL
            ), acc{t} AS (
              SELECT l, r FROM (
                SELECT p.l, p.r,
                       row_number() OVER (PARTITION BY p.r ORDER BY {h}, p.l) AS rn
                FROM p{t} p) WHERE rn = 1
            ), m{t} AS (
              SELECT l, r FROM (
                SELECT p.l, p.r,
                       row_number() OVER (PARTITION BY p.l ORDER BY {h}, p.r) AS rn
                FROM acc{t} p) WHERE rn = 1
            ), s{t + 1} AS (
              SELECT s.id, s.side, coalesce(s.match, ml.r, mr.l) AS match
              FROM s{t} s
                LEFT JOIN m{t} ml ON ml.l = s.id
                LEFT JOIN m{t} mr ON mr.r = s.id)"""
        )
    parts.append(f" SELECT id, side, match FROM s{rounds}")
    return "\n".join(parts)


IVF_CELLS, IVF_PROBE, IVF_KM_ITERS, IVF_K = 8, 3, 3, 10


def _ivf_topk_sql(dim: int = 64, cell_offset: int = 0) -> str:
    """IVF replay: Lloyd on L2-normalized embeddings (seed centers =
    first IVF_CELLS by vec_id, lowest-cid ties, empty cells keep
    position), corpus assigned to final cells, each query probes its
    IVF_PROBE nearest cells, exact cosine re-rank inside. Mirrors
    extensions.similarity.ivf_topk + ml.kmeans exactly.
    ``cell_offset=1`` skips each query's own nearest cell — the
    hard-negative mining twin."""
    # k-means chain shared with the semantic-dedup oracles
    parts = [f"WITH {_km_cells_ctes(IVF_CELLS, IVF_KM_ITERS, dim)}"]
    parts.append(
        f""", q AS (SELECT vec_id AS qid, v AS qv FROM n WHERE vec_id < 5),
        qcells AS (
          SELECT qid, qv, cid FROM (
            SELECT q.qid, q.qv, c.cid,
                   row_number() OVER (PARTITION BY q.qid ORDER BY
                     list_aggregate(list_transform(c.c, y -> y*y), 'sum')
                     - 2*list_dot_product(q.qv, c.c), c.cid) AS rn
            FROM q CROSS JOIN c{IVF_KM_ITERS} c)
          WHERE rn BETWEEN {cell_offset + 1} AND {cell_offset + IVF_PROBE}),
        scored AS (
          SELECT qc.qid, a.vec_id AS id,
                 round(list_dot_product(a.v, qc.qv), 9) AS cosine
          FROM a{IVF_KM_ITERS} a JOIN qcells qc ON qc.cid = a.cid)
        SELECT query_id, vec_id, cosine, rank FROM (
          SELECT qid AS query_id, id AS vec_id, cosine,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY cosine DESC, id) AS rank
          FROM scored)
        WHERE rank <= {IVF_K}"""
    )
    return "\n".join(parts)


SEM_CELLS, SEM_KM_ITERS, SEM_THRESHOLD = 16, 3, 0.3


def _km_cells_ctes(n_cells: int, km_iters: int, dim: int = 64) -> str:
    """CTE definitions (no leading WITH) that replay ml.kmeans on the
    L2-normalized embeddings exactly like _ivf_topk_sql: seed centers =
    first n_cells by vec_id, argmin squared distance with lowest-cid
    ties, empty cells keep position. Ends at a{km_iters}(vec_id, v, cid)
    — the final cell assignment — marked MATERIALIZED because callers
    reference it twice (pair self-joins)."""
    d2 = (
        "list_aggregate(list_transform(c.c, y -> y*y), 'sum')"
        " - 2*list_dot_product(e.v, c.c)"
    )
    # EVERY chained CTE is MATERIALIZED: n/c{t}/a{t} are each referenced
    # more than once downstream, and DuckDB would otherwise inline them,
    # re-evaluating the whole prefix chain exponentially in km_iters
    # (the same trap _sssp_gen_sql documents for unrolled Bellman-Ford)
    parts = [
        """n AS MATERIALIZED (
          SELECT vec_id, list_transform(embedding::DOUBLE[], x -> x /
            sqrt(list_aggregate(list_transform(embedding::DOUBLE[], y -> y*y), 'sum'))) AS v
          FROM embeddings)""",
        f"""c0 AS MATERIALIZED (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS c
               FROM n ORDER BY vec_id LIMIT {n_cells})""",
    ]
    for t in range(km_iters + 1):
        mat = " MATERIALIZED"
        parts.append(
            f"""a{t} AS{mat} (
              SELECT vec_id, v, cid FROM (
                SELECT e.vec_id, e.v, c.cid,
                       row_number() OVER (PARTITION BY e.vec_id
                                          ORDER BY {d2}, c.cid) AS rn
                FROM n e CROSS JOIN c{t} c)
              WHERE rn = 1)"""
        )
        if t == km_iters:
            break
        parts.append(
            f"""u{t} AS (
              SELECT cid, dim, avg(val) AS m
              FROM (SELECT cid, unnest(v) AS val,
                           unnest(range(1, {dim + 1})) AS dim FROM a{t})
              GROUP BY cid, dim
            ), m{t} AS (SELECT cid, list(m ORDER BY dim) AS c FROM u{t} GROUP BY cid)
            , c{t + 1} AS MATERIALIZED (
              SELECT c.cid, coalesce(m.c, c.c) AS c
              FROM c{t} c LEFT JOIN m{t} m ON m.cid = c.cid)"""
        )
    return ",\n".join(parts)


def _semantic_pairs_sql(thr: float = SEM_THRESHOLD) -> str:
    """semantic_dup_pairs replay: k-means cells + within-cell cosine."""
    T = SEM_KM_ITERS
    return f"""WITH {_km_cells_ctes(SEM_CELLS, T)}
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_dot_product(a.v, b.v), 9) AS cosine,
               CAST(a.cid AS INT) AS cell
        FROM a{T} a JOIN a{T} b ON a.cid = b.cid AND a.vec_id < b.vec_id
        WHERE round(list_dot_product(a.v, b.v), 9) >= {thr!r}"""


def _semantic_dedup_sql(thr: float = SEM_THRESHOLD) -> str:
    """semantic_dedup replay: pairs -> transitive closure -> min-id
    label per group (same recursive-CC tail as the dedup_near oracle)."""
    T = SEM_KM_ITERS
    return f"""WITH RECURSIVE {_km_cells_ctes(SEM_CELLS, T)},
        pairs AS (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b
          FROM a{T} a JOIN a{T} b ON a.cid = b.cid AND a.vec_id < b.vec_id
          WHERE round(list_dot_product(a.v, b.v), 9) >= {thr!r}),
        e AS (SELECT id_a AS a, id_b AS b FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
        reach(a, b) AS (
          SELECT a, b FROM e
          UNION
          SELECT r.a, e.b FROM reach r JOIN e ON e.a = r.b
        ),
        lbl AS (SELECT a AS id, least(a, min(b)) AS comp FROM reach GROUP BY a),
        labeled AS (
          SELECT em.vec_id, coalesce(l.comp, em.vec_id) AS comp
          FROM embeddings em LEFT JOIN lbl l ON l.id = em.vec_id
        )
        SELECT min(vec_id) AS vec_id, CAST(count(*) AS BIGINT) AS n_dups
        FROM labeled GROUP BY comp"""


KCORE_ITERS = 6  # converged by iter 4 at sf0.01; fixed schedule both sides


def _kcore_sql(edges_sql: str, iters: int = KCORE_ITERS) -> str:
    """Synchronous h-index k-core refinement, unrolled: c0 = degree;
    c_{t+1}(v) = min(c_t(v), H-index of neighbor c_t values). Mirrors
    hama_spark.graph.kcore exactly (same fixed iteration count)."""
    parts = [
        f"WITH base AS ({edges_sql}),",
        "sym AS (SELECT DISTINCT * FROM (SELECT src, dst FROM base UNION ALL SELECT dst, src FROM base)),",
        "c0 AS (SELECT src AS id, CAST(count(*) AS INT) AS core FROM sym GROUP BY src)",
    ]
    for t in range(iters):
        parts.append(
            f""", n{t} AS (
              SELECT s.dst AS id, c.core AS nc
              FROM sym s JOIN c{t} c ON c.id = s.src
            ), h{t} AS (
              SELECT id, max(least(r, nc)) AS h FROM (
                SELECT id, nc, row_number() OVER (PARTITION BY id ORDER BY nc DESC) AS r
                FROM n{t}) GROUP BY id
            ), c{t + 1} AS (
              SELECT c.id, CAST(least(c.core, coalesce(h.h, 1)) AS INT) AS core
              FROM c{t} c LEFT JOIN h{t} h ON h.id = c.id
            )"""
        )
    parts.append(f" SELECT id, core FROM c{iters}")
    return "\n".join(parts)


# shared SQL fragments for the text/dedup oracles
_TOKS_SQL = "regexp_split_to_array(trim(text), '\\s+')"

# DuckDB twin of extensions.sampling._hash_key(seed=42, doc_id): 48-bit
# md5-derived key, identical bytes hashed in both engines.
_SAMPLE_HASH = "('0x' || substr(md5('42:' || doc_id), 1, 12))::BIGINT"
_SHINGLES_SQL = f"""
    toks AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
    sh AS (SELECT DISTINCT doc_id,
                  array_to_string(t[i:i+2], ' ') AS sh
           FROM toks, LATERAL (SELECT unnest(range(1, greatest(len(t)-2, 1)+1)) AS i))
"""


def _jaccard_tail_sql(threshold: float) -> str:
    return f"""
    , sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           count(*) * 1.0 / (sa.sz + sb.sz - count(*)) AS jaccard
    FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
         JOIN sz sa ON sa.doc_id = a.doc_id
         JOIN sz sb ON sb.doc_id = b.doc_id
    GROUP BY a.doc_id, b.doc_id, sa.sz, sb.sz
    HAVING count(*) * 1.0 / (sa.sz + sb.sz - count(*)) >= {threshold}
    """


def _minhash_lsh_sql(threshold: float = 0.5, num_hashes: int = 16, bands: int = 4) -> str:
    from hama_spark.extensions.dedup import MINHASH_PRIME, minhash_coeffs

    rpb = num_hashes // bands
    base = "(('0x' || substr(md5(sh), 1, 8))::BIGINT)"
    mins = ", ".join(
        f"min(({a} * {base} + {b}) % {MINHASH_PRIME}) AS m{i}"
        for i, (a, b) in enumerate(minhash_coeffs(num_hashes))
    )
    band_keys = ", ".join(
        "concat_ws('|', " + ", ".join(f"m{b * rpb + r}" for r in range(rpb)) + f") AS b{b}"
        for b in range(bands)
    )
    band_match = " OR ".join(f"x.b{b} = y.b{b}" for b in range(bands))
    return f"""
    WITH {_SHINGLES_SQL},
    sig AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
    bands AS (SELECT doc_id, {band_keys} FROM sig),
    cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
             FROM bands x JOIN bands y
               ON x.doc_id < y.doc_id AND ({band_match})),
    sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id)
    SELECT c.id_a, c.id_b,
           count(*) * 1.0 / (sa.sz + sb.sz - count(*)) AS jaccard
    FROM cand c JOIN sh a ON a.doc_id = c.id_a
         JOIN sh b ON b.doc_id = c.id_b AND b.sh = a.sh
         JOIN sz sa ON sa.doc_id = c.id_a
         JOIN sz sb ON sb.doc_id = c.id_b
    GROUP BY c.id_a, c.id_b, sa.sz, sb.sz
    HAVING count(*) * 1.0 / (sa.sz + sb.sz - count(*)) >= {threshold}
    """


def _bpe_token_count_sql() -> str:
    from hama_spark.extensions.text import BPE_PATTERN

    pat = BPE_PATTERN.replace("'", "''")
    return (
        f"SELECT doc_id, CAST(len(regexp_extract_all(text, '{pat}')) AS INT)"
        " AS n_bpe_tokens FROM documents"
    )


_COSINE_TOPK_SQL = """
    WITH n AS (
      SELECT vec_id, list_transform(embedding::DOUBLE[], x -> x /
        sqrt(list_aggregate(list_transform(embedding::DOUBLE[], y -> y*y), 'sum'))) AS v
      FROM embeddings)
    SELECT query_id, vec_id, cosine, rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
             round(list_dot_product(c.v, q.v), 9) AS cosine,
             row_number() OVER (PARTITION BY q.vec_id
                                ORDER BY round(list_dot_product(c.v, q.v), 9) DESC,
                                         c.vec_id) AS rank
      FROM n c, n q WHERE q.vec_id < 5)
    WHERE rank <= 10
"""


def _ann_recall_sql() -> str:
    """Recall@k of the LSH and IVF searchers vs the brute-force twin:
    replay all three SQL programs, overlap-join each approximate result
    with the exact one. (hybrid_search is exact within its metadata
    filter — recall vs its own ground truth is 1.0 by construction, so
    it is not in the report.)"""
    return f"""
        WITH brute AS MATERIALIZED (
          SELECT query_id, vec_id FROM ({_COSINE_TOPK_SQL})
        ),
        lshr AS MATERIALIZED (
          SELECT query_id, vec_id FROM ({_lsh_topk_sql(10, 4, 8, 64)})
        ),
        ivfr AS MATERIALIZED (
          SELECT query_id, vec_id FROM ({_ivf_topk_sql(64)})
        )
        SELECT method, n_exact, hits, round(hits * 1.0 / n_exact, 6) AS recall
        FROM (
          SELECT 'ivf_topk' AS method, CAST(count(*) AS BIGINT) AS n_exact,
                 CAST(count(a.query_id) AS BIGINT) AS hits
          FROM brute b LEFT JOIN ivfr a
            ON a.query_id = b.query_id AND a.vec_id = b.vec_id
          UNION ALL
          SELECT 'lsh_cosine_topk', CAST(count(*) AS BIGINT),
                 CAST(count(a.query_id) AS BIGINT)
          FROM brute b LEFT JOIN lshr a
            ON a.query_id = b.query_id AND a.vec_id = b.vec_id
        )
    """


_BPE_NUM_MERGES = 24


def _bpe_train_ctes(num_merges: int) -> str:
    """The BPE training schedule as chained CTEs: w0 = segmented
    pre-token vocabulary, then per round r: pair counts p{r} over the
    symbol arrays, argmax t{r} (count DESC, lhs, rhs), merged vocab
    w{r} via the same two-pass boundary-separator replace the engine
    applies (extensions/bpe.py). MATERIALIZED throughout — DuckDB
    inlines multiply-referenced CTEs otherwise and the chain goes
    exponential."""
    from hama_spark.extensions.text import BPE_PATTERN

    pat = BPE_PATTERN.replace("'", "''")
    parts = [
        f"""WITH w0 AS MATERIALIZED (
          SELECT word, n, chr(31) || regexp_replace(word, '(.)', '\\1' || chr(31), 'g') AS seg
          FROM (
            SELECT word, CAST(count(*) AS BIGINT) AS n
            FROM (SELECT unnest(regexp_extract_all(text, '{pat}')) AS word FROM documents)
            WHERE length(word) > 0 AND NOT contains(word, chr(31))
            GROUP BY word)
        )"""
    ]
    for r in range(1, num_merges + 1):
        parts.append(
            f""", p{r} AS MATERIALIZED (
          SELECT z[1] AS lhs, z[2] AS rhs, sum(n) AS cnt FROM (
            SELECT n, unnest(list_zip(i[1:len(i)-1], i[2:len(i)])) AS z FROM (
              SELECT n, s[2:len(s)-1] AS i FROM (
                SELECT n, string_split(seg, chr(31)) AS s FROM w{r - 1})
              ) WHERE len(i) >= 2
          ) GROUP BY 1, 2
        ), t{r} AS MATERIALIZED (
          SELECT lhs, rhs, cnt FROM p{r} ORDER BY cnt DESC, lhs, rhs LIMIT 1
        ), w{r} AS MATERIALIZED (
          -- LEFT JOIN, not a cross join: when training exhausts the
          -- vocabulary early t{{r}} is EMPTY, and the engine's loop
          -- breaks with the vocab intact — carry seg forward unchanged
          -- instead of annihilating every row
          SELECT word, n,
            CASE WHEN t.lhs IS NULL THEN seg ELSE
              replace(replace(seg,
                chr(31)||t.lhs||chr(31)||t.rhs||chr(31), chr(31)||t.lhs||t.rhs||chr(31)),
                chr(31)||t.lhs||chr(31)||t.rhs||chr(31), chr(31)||t.lhs||t.rhs||chr(31))
            END AS seg
          FROM w{r - 1} LEFT JOIN t{r} t ON TRUE
        )"""
        )
    return "".join(parts)


def _bpe_merges_sql(num_merges: int = _BPE_NUM_MERGES) -> str:
    tops = " UNION ALL ".join(
        f"SELECT {r} AS rank, lhs, rhs, lhs || rhs AS merged,"
        f" CAST(cnt AS BIGINT) AS pair_count FROM t{r}"
        for r in range(1, num_merges + 1)
    )
    return f"{_bpe_train_ctes(num_merges)} SELECT * FROM ({tops}) ORDER BY rank"


def _bpe_vocab_count_sql(num_merges: int = _BPE_NUM_MERGES) -> str:
    from hama_spark.extensions.text import BPE_PATTERN

    pat = BPE_PATTERN.replace("'", "''")
    return f"""{_bpe_train_ctes(num_merges)},
        fin AS MATERIALIZED (
          SELECT word, len(string_split(seg, chr(31))) - 2 AS n_sub FROM w{num_merges}
        ),
        dw AS (
          SELECT doc_id, unnest(regexp_extract_all(text, '{pat}')) AS word FROM documents
        ),
        agg AS (
          SELECT doc_id, sum(n_sub) AS n FROM dw JOIN fin USING (word)
          WHERE length(word) > 0 AND NOT contains(word, chr(31))
          GROUP BY doc_id)
        SELECT d.doc_id, CAST(coalesce(agg.n, 0) AS BIGINT) AS n_tokens
        FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id
    """


def _span_shingle_ctes(k: int, max_df: int | None, min_df: int = 2) -> str:
    """Positional k-token shingles restricted to hashes with
    doc-frequency in [min_df, max_df] — the shared prefix of the span
    detection/removal and boilerplate-removal oracles
    (extensions/dedup.py twins). ``max_df=None`` = uncapped."""
    df_cond = (
        f"df BETWEEN {min_df} AND {max_df}" if max_df is not None else f"df >= {min_df}"
    )
    return f"""
        WITH toks AS MATERIALIZED (
          SELECT doc_id AS id, {_TOKS_SQL} AS t FROM documents
        ),
        sh AS MATERIALIZED (
          SELECT id, CAST(i AS INT) AS pos,
                 md5(list_aggregate(t[i:i+{k - 1}], 'string_agg', ' ')) AS h
          FROM toks, unnest(generate_series(1, len(t) - {k - 1})) AS g(i)
          WHERE len(t) >= {k}
        ),
        hh AS MATERIALIZED (
          SELECT h FROM (SELECT h, count(DISTINCT id) AS df FROM sh GROUP BY h)
          WHERE {df_cond}
        ),
        shared AS MATERIALIZED (SELECT sh.id, sh.pos, sh.h FROM sh JOIN hh USING (h))
    """


def _shared_span_pairs_sql(k: int, min_shared: int, max_df: int) -> str:
    return f"""{_span_shingle_ctes(k, max_df)}
        SELECT a.id AS id_a, b.id AS id_b,
               CAST(count(DISTINCT a.h) AS BIGINT) AS n_shared,
               CAST(min(a.pos) AS INT) AS a_min_pos,
               CAST(max(a.pos) AS INT) AS a_max_pos,
               CAST(min(b.pos) AS INT) AS b_min_pos,
               CAST(max(b.pos) AS INT) AS b_max_pos
        FROM shared a JOIN shared b ON a.h = b.h AND a.id < b.id
        GROUP BY a.id, b.id
        HAVING count(DISTINCT a.h) >= {min_shared}
    """


def _scrub_shared_spans_sql(k: int, max_df: int | None, min_df: int = 2) -> str:
    return f"""{_span_shingle_ctes(k, max_df, min_df)},
        cov AS MATERIALIZED (
          SELECT DISTINCT id, pos + j AS tp
          FROM shared, unnest(generate_series(0, {k - 1})) AS u(j)
        ),
        tokp AS (
          SELECT id, CAST(i AS INT) AS tp, t[i] AS tok
          FROM toks, unnest(generate_series(1, len(t))) AS g(i)
        ),
        kept AS (
          SELECT tokp.id, tokp.tp, tokp.tok
          FROM tokp LEFT JOIN cov ON cov.id = tokp.id AND cov.tp = tokp.tp
          WHERE cov.id IS NULL
        ),
        reb AS (
          SELECT id, CAST(count(*) AS BIGINT) AS n_kept,
                 md5(string_agg(tok, ' ' ORDER BY tp)) AS fp
          FROM kept GROUP BY id
        )
        SELECT d.doc_id,
               CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tokens,
               CAST(len({_TOKS_SQL}) - coalesce(reb.n_kept, 0) AS BIGINT) AS n_removed,
               coalesce(reb.fp, md5('')) AS clean_fingerprint
        FROM documents d LEFT JOIN reb ON reb.id = d.doc_id
    """


def _bpe_top_tokens_sql(num_merges: int = _BPE_NUM_MERGES, top_n: int = 40) -> str:
    return f"""{_bpe_train_ctes(num_merges)},
        symc AS MATERIALIZED (
          SELECT sym AS token, CAST(sum(n) AS BIGINT) AS n_occurrences FROM (
            SELECT n, unnest(s[2:len(s)-1]) AS sym FROM (
              SELECT n, string_split(seg, chr(31)) AS s FROM w{num_merges})
          ) GROUP BY sym
        )
        SELECT token, n_occurrences, CAST(rank AS INT) AS rank FROM (
          SELECT token, n_occurrences,
                 row_number() OVER (ORDER BY n_occurrences DESC, token) AS rank
          FROM symc
        ) WHERE rank <= {top_n}
    """


def _bpe_fertility_sql(num_merges: int = _BPE_NUM_MERGES) -> str:
    from hama_spark.extensions.text import BPE_PATTERN

    pat = BPE_PATTERN.replace("'", "''")
    return f"""{_bpe_train_ctes(num_merges)},
        fin AS MATERIALIZED (
          SELECT word, len(string_split(seg, chr(31))) - 2 AS n_sub FROM w{num_merges}
        ),
        dw AS (
          SELECT doc_id, unnest(regexp_extract_all(text, '{pat}')) AS word FROM documents
        ),
        agg AS (
          SELECT doc_id, sum(n_sub) AS n FROM dw JOIN fin USING (word)
          WHERE length(word) > 0 AND NOT contains(word, chr(31))
          GROUP BY doc_id)
        SELECT d.lang AS slice,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(coalesce(agg.n, 0)) AS BIGINT) AS n_tokens,
               CAST(sum(length(d.text)) AS BIGINT) AS n_chars,
               round(sum(length(d.text)) * 1.0 / sum(coalesce(agg.n, 0)), 6)
                 AS chars_per_token
        FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id
        GROUP BY d.lang
    """


def _simhash_sql(max_hamming: int = 3) -> str:
    """60-bit SimHash pairs, mirroring extensions.dedup exactly: md5-
    derived token hashes, per-bit sign votes, 4x15-bit chunk banding,
    bit_count(xor) verification."""
    from hama_spark.extensions.dedup import SIMHASH_BITS, _SIMHASH_CHUNK

    votes = ", ".join(
        f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS b{j}"
        for j in range(SIMHASH_BITS)
    )
    sig = " + ".join(
        f"(CASE WHEN b{j} > 0 THEN (1::BIGINT << {j}) ELSE 0 END)"
        for j in range(SIMHASH_BITS)
    )
    mask = (1 << _SIMHASH_CHUNK) - 1
    chunk_rows = " UNION ALL ".join(
        f"SELECT doc_id, sig, {c} AS chunk, (sig >> {c * _SIMHASH_CHUNK}) & {mask} AS val FROM sig"
        for c in range(4)
    )
    return f"""
        WITH toks AS (
          SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents
        ),
        h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks),
        votes AS (SELECT doc_id, {votes} FROM h GROUP BY doc_id),
        sig AS (SELECT doc_id, {sig} AS sig FROM votes),
        chunks AS ({chunk_rows}),
        cand AS (
          SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
                 x.sig AS sa, y.sig AS sb
          FROM chunks x JOIN chunks y
            ON x.chunk = y.chunk AND x.val = y.val AND x.doc_id < y.doc_id)
        SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
        FROM cand WHERE bit_count(xor(sa, sb)) <= {max_hamming}
    """


def _hyperplane_bucket_sql(vcol: str, t: int, planes: int, dim: int, seed: int) -> str:
    """DuckDB expression for the random-hyperplane LSH bucket of table
    ``t``: the ±1 plane components come from driver-side md5 (hashlib)
    and are embedded as list literals in BOTH engines — no engine-side
    hashing to diverge."""
    from hama_spark.extensions.similarity import _plane

    terms = []
    for p in range(planes):
        comps = ", ".join(str(x) for x in _plane(seed, t, p, dim))
        terms.append(
            f"(CASE WHEN list_dot_product({vcol}, [{comps}]) > 0"
            f" THEN (1::BIGINT << {p}) ELSE 0 END)"
        )
    return " + ".join(terms)


def _lsh_topk_sql(
    k: int = 10, planes: int = 4, tables: int = 8, dim: int = 64, seed: int = 42
) -> str:
    """Random-hyperplane LSH top-k, mirroring extensions.similarity
    .lsh_cosine_topk (same driver-side plane literals)."""

    def bucket(vcol: str, t: int) -> str:
        return _hyperplane_bucket_sql(vcol, t, planes, dim, seed)

    cb = " UNION ALL ".join(
        f"SELECT vec_id, v, {t} AS tbl, {bucket('v', t)} AS bkt FROM n" for t in range(tables)
    )
    qb = " UNION ALL ".join(
        f"SELECT qid, qv, {t} AS tbl, {bucket('qv', t)} AS bkt FROM q" for t in range(tables)
    )
    return f"""
        WITH n AS (
          SELECT vec_id, list_transform(embedding::DOUBLE[], x -> x /
            sqrt(list_aggregate(list_transform(embedding::DOUBLE[], y -> y*y), 'sum'))) AS v
          FROM embeddings),
        q AS (SELECT vec_id AS qid, v AS qv FROM n WHERE vec_id < 5),
        cb AS ({cb}),
        qb AS ({qb}),
        cand AS (SELECT DISTINCT qb.qid, cb.vec_id AS id
                 FROM cb JOIN qb ON cb.tbl = qb.tbl AND cb.bkt = qb.bkt),
        scored AS (
          SELECT cand.qid, cand.id,
                 round(list_dot_product(c.v, q2.v), 9) AS cosine
          FROM cand JOIN n c ON c.vec_id = cand.id
               JOIN n q2 ON q2.vec_id = cand.qid)
        SELECT query_id, vec_id, cosine, rank FROM (
          SELECT qid AS query_id, id AS vec_id, cosine,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY cosine DESC, id) AS rank
          FROM scored)
        WHERE rank <= {k}
    """


def _lsh_pairs_sql(
    threshold: float = 0.45, planes: int = 4, tables: int = 8, dim: int = 64, seed: int = 42
) -> str:
    """Random-hyperplane LSH near-dup pairs, mirroring
    extensions.similarity.lsh_cosine_dup_pairs: same-bucket candidate
    self-join per table, distinct id pair, exact-cosine verify."""
    nb = " UNION ALL ".join(
        f"SELECT vec_id, v, {t} AS tbl,"
        f" {_hyperplane_bucket_sql('v', t, planes, dim, seed)} AS bkt FROM n"
        for t in range(tables)
    )
    return f"""
        WITH n AS (
          SELECT vec_id, list_transform(embedding::DOUBLE[], x -> x /
            sqrt(list_aggregate(list_transform(embedding::DOUBLE[], y -> y*y), 'sum'))) AS v
          FROM embeddings),
        nb AS ({nb}),
        cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
                 FROM nb a JOIN nb b
                   ON a.tbl = b.tbl AND a.bkt = b.bkt AND a.vec_id < b.vec_id)
        SELECT cand.id_a, cand.id_b,
               round(list_dot_product(x.v, y.v), 9) AS cosine
        FROM cand JOIN n x ON x.vec_id = cand.id_a
                  JOIN n y ON y.vec_id = cand.id_b
        WHERE round(list_dot_product(x.v, y.v), 9) >= {threshold}
    """


def _projection_sql(out_dim: int = 4, dim: int = 64, seed: int = 7) -> str:
    """DuckDB twin of vectors.random_projection: the identical seeded ±1
    literal matrix inlined into the SQL, same left-to-right double sum."""
    from hama_spark.extensions.vectors import projection_signs

    cols = []
    for j in range(out_dim):
        lits = ", ".join(str(c) for c in projection_signs(seed, j, dim))
        cols.append(
            f"round(list_aggregate(list_transform(range(1, {dim + 1}), "
            f"i -> embedding[i]::DOUBLE * ([{lits}]::DOUBLE[])[i]), 'sum') "
            f"/ sqrt({out_dim}), 9) AS p{j}"
        )
    return "SELECT vec_id, " + ", ".join(cols) + " FROM embeddings"


def _lang_id_sql() -> str:
    from hama_spark.extensions.text import LANG_MARKERS

    keys = []
    for lang, words in LANG_MARKERS.items():
        if lang == "zh":
            score = " + ".join(
                f"(length(text) - length(replace(text, '{w}', '')))" for w in words
            )
        else:
            inlist = ", ".join(f"'{w}'" for w in words)
            score = f"len(list_filter({_TOKS_SQL}, tk -> lower(tk) IN ({inlist})))"
        keys.append(f"lpad(CAST(({score}) AS VARCHAR), 8, '0') || ':{lang}'")
    greatest = "greatest(" + ", ".join(keys) + ")"
    return f"""
    SELECT doc_id,
           CASE WHEN substr({greatest}, 1, 8) <> '00000000'
                THEN substr({greatest}, 10, 2) ELSE 'und' END AS lang
    FROM documents
    """


def _stopword_count_sql() -> str:
    from hama_spark.extensions.text import EN_STOPWORDS

    inlist = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    return f"len(list_filter({_TOKS_SQL}, tk -> lower(tk) IN ({inlist})))"


def _quality_expr_sql() -> str:
    """The quality_score formula as a bare SQL expression — shared by
    the quality_score oracle and every oracle that ranks by quality."""
    return f"""0.25 * (CASE WHEN len({_TOKS_SQL}) BETWEEN 5 AND 100000 THEN 1.0 ELSE 0.0 END)
                 + 0.5 * (length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) * 1.0 / length(text))
                 + 0.25 * least({_stopword_count_sql()} * 5.0 / len({_TOKS_SQL}), 1.0)"""


# ----------------------------------------------------------------------
# queries
# ----------------------------------------------------------------------
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: MinHash-LSH near-duplicate detection over the documents
    corpus at sf0.001 — shingle, sign, band, bucket-join, verify."""
    from hama_spark.extensions import minhash_lsh_dup_pairs

    t = load_tables(spark, "/root/testdata/sf0.001")
    return minhash_lsh_dup_pairs(t["documents"], threshold=0.5)


def _q(fn):
    """Each query: (spark, sf_dir) -> DataFrame, loading driver tables."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        return fn(spark, load_tables(spark, sf_dir))

    return wrapped


# --- graph layer -------------------------------------------------------
def _q_inlink(spark, t):
    from hama_spark.graph import inlink_count

    return inlink_count(_sp_edges(spark, t))


def _q_sssp(spark, t):
    from hama_spark.graph import sssp

    # halt check every 4th superstep: the nation DAG is ~25 levels deep,
    # so batching executes 4 supersteps per Spark job (see pregel
    # halt_check_interval); extra post-fixpoint supersteps are no-ops.
    return sssp(_nation_dag(spark, t), "0", max_iter=40, halt_check_interval=4)


def _q_cc(spark, t):
    from hama_spark.graph import mindist_search

    return mindist_search(
        _cc_edges(spark, t), undirected=True, max_iter=50, halt_check_interval=4
    )


def _q_cc_twophase(spark, t):
    """O(log n) large-star/small-star connected components
    (graph/cc_twophase.py, Kiveris et al. SoCC'14) — same component
    labels as min-label propagation (min id per component), reachable
    in O(log n) alternating rounds instead of O(diameter) supersteps;
    the scale path for the long-chain components near-dup clustering
    produces. Same graph and oracle as ``connected_components``."""
    from hama_spark.graph import connected_components_twophase

    return connected_components_twophase(_cc_edges(spark, t))


def _q_pagerank(spark, t):
    from hama_spark.graph import pagerank

    pr = pagerank(_pr_edges(spark, t), epsilon=None, max_iter=10, self_ref=True)
    return pr.select("id", F.round("rank", 9).alias("rank"))


def _q_dynamic_sum(spark, t):
    from hama_spark.graph import dynamic_sum

    return dynamic_sum(t["lineitem"].select(F.col("l_linenumber").alias("value")))


def _q_kcore(spark, t):
    from hama_spark.graph import kcore

    return kcore(_sp_edges(spark, t), fixed_iters=KCORE_ITERS)


def _q_hits_scores(spark, t):
    """HITS hubs/authorities on the supplier->part link graph — the
    link-analysis companion to pagerank (graph/hits.py), fixed 5-round
    schedule replayed by _hits_sql."""
    from hama_spark.graph import hits

    return hits(_sp_edges(spark, t), iterations=5)


def _q_harmonic_centrality(spark, t):
    """Landmark harmonic centrality (graph/centrality.py) on the
    symmetrized supplier-part graph: 8 md5-seeded landmarks, BFS
    radius 4 — the Eppstein-Wang estimation shape that scales where
    all-pairs closeness cannot."""
    from hama_spark.graph import harmonic_centrality

    return harmonic_centrality(
        _sym_sp_edges_cached(spark, t), landmarks=8, radius=4, seed=42,
        prepared=True,
    )


_SYM_EDGES_MEMO: dict = {}


def _sym_sp_edges_cached(spark, t):
    """Symmetrized deduplicated supplier-part edge set, materialized
    once per (session, table plan): harmonic_centrality and
    betweenness_centrality run over the SAME undirected graph, so the
    union+distinct+checkpoint build (the dominant per-query setup cost)
    is paid once and both operators take the prepared=True fast path."""
    from pyspark.sql import functions as F

    edges = _sp_edges(spark, t)
    key = (spark.sparkContext.applicationId, edges.semanticHash())
    if key not in _SYM_EDGES_MEMO:
        _SYM_EDGES_MEMO.clear()  # single-entry memo, evict for GC
        e = edges.union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        _SYM_EDGES_MEMO[key] = e.distinct().localCheckpoint(eager=True)
    return _SYM_EDGES_MEMO[key]


def _q_betweenness(spark, t):
    """Sampled radius-bounded Brandes betweenness
    (graph/betweenness.py) on the symmetrized supplier-part graph: 4
    md5-seeded sources, radius 3 — bridge-vertex scoring at the
    K-episodes cost exact betweenness can't have at scale."""
    from hama_spark.graph import betweenness_centrality

    return betweenness_centrality(
        _sym_sp_edges_cached(spark, t), sources=4, radius=3, seed=42,
        prepared=True,
    )


def _q_nb_confusion(spark, t):
    """Multinomial naive-Bayes language-ID confusion matrix
    (ml/naive_bayes.py): one-shuffle count-model training + broadcast
    scoring over the documents corpus, resubstitution accuracy as an
    integer confusion relation."""
    from hama_spark.ml import nb_confusion

    return nb_confusion(t["documents"], label_col="lang")


def _q_triangles(spark, t):
    """Triangles + LCC over the part co-purchase projection (parts
    appearing in the same order) — a non-bipartite graph with real
    community structure, unlike the bipartite supplier-part edges."""
    from hama_spark.graph import triangle_count

    # deterministic 20% order decimation keeps the bench-scale wedge
    # count sane (wedge work grows ~m^1.5) while leaving a graph with
    # ~250k real triangles at sf0.1
    li = t["lineitem"].filter(F.col("l_orderkey") % 5 == 0).select(
        "l_orderkey", "l_partkey"
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .distinct()
    )
    return triangle_count(edges)


MATCH_ROUNDS = 3  # sf0.01 converges in 1; extra unrolled rounds no-op


def _q_bipartite_matching(spark, t):
    from hama_spark.graph import bipartite_matching

    edges = _sp_edges(spark, t).distinct()
    verts = (
        edges.select(F.col("src").alias("id"), F.lit("L").alias("side"))
        .union(edges.select(F.col("dst").alias("id"), F.lit("R").alias("side")))
        .distinct()
    )
    # full matching, hash-checked: the md5-seeded picks replay in SQL
    return bipartite_matching(verts, edges, seed=42, max_rounds=MATCH_ROUNDS)


def _q_semi_clustering(spark, t):
    from hama_spark.graph import semi_clustering

    edges = _nation_dag(spark, t).select(
        "src", "dst", F.col("weight").cast("double").alias("weight")
    )
    res = semi_clustering(
        edges,
        max_iter=SC_ITERS,
        max_vertex_count=SC_VMAX,
        max_clusters=SC_CMAX,
        max_sent=SC_SENT,
    )
    return res.select(
        "id",
        F.col("clusters")[0]["cid"].alias("best_cid"),
        F.round(F.col("clusters")[0]["score"], 6).alias("best_score"),
        F.size("clusters").alias("n_clusters"),
    )


# --- ML layer ----------------------------------------------------------
def _q_spmv(spark, t):
    from hama_spark.ml import spmv

    cells = t["lineitem"].groupBy(F.col("l_suppkey").alias("row")).agg(
        F.collect_list(
            F.struct((F.col("l_partkey") % 64).cast("int").alias("i"), F.col("l_quantity").alias("v"))
        ).alias("cells")
    )
    mat = cells.select(
        "row",
        F.transform("cells", lambda c: c["i"]).alias("indices"),
        F.transform("cells", lambda c: c["v"]).alias("values"),
    )
    vec = spark.range(64).select(
        F.col("id").cast("int").alias("pos"), ((F.col("id") * 7) % 13) / 13.0
    ).toDF("pos", "value")
    out = spmv(mat, vec)
    return out.select("row", F.round("value", 6).alias("value"))


def _q_sparse_spmv(spark, t):
    """M6 sparse half: per-supplier map<int,double> vectors through the
    svec kernels (SparseDoubleVector.java semantics — get-default 0,
    dot = multiply-then-sum over the key intersection). All values are
    integer quantities and half-integer weights, so every double op is
    exact and the oracle comparison is order-insensitive by construction.
    """
    from hama_spark.functions import svec_dot, svec_from_arrays, svec_nnz, svec_norm2, svec_sum

    cells = (
        t["lineitem"]
        .groupBy(
            F.col("l_suppkey").alias("row"),
            (F.col("l_partkey") % 64).cast("int").alias("k"),
        )
        .agg(F.sum("l_quantity").cast("double").alias("v"))
    )
    rows = cells.groupBy("row").agg(
        F.map_from_entries(F.array_sort(F.collect_list(F.struct("k", "v")))).alias("sv")
    )
    # sparse weight vector: only even part-buckets, half-integer weights
    xi = list(range(0, 64, 2))
    x = svec_from_arrays(
        F.array(*[F.lit(i) for i in xi]),
        F.array(*[F.lit(((i % 7) + 1) / 2.0) for i in xi]),
    )
    return rows.select(
        "row",
        svec_nnz("sv").alias("nnz"),
        F.round(svec_sum("sv"), 6).alias("sv_sum"),
        F.round(svec_norm2("sv"), 6).alias("sv_norm2"),
        F.round(svec_dot(F.col("sv"), x), 6).alias("y"),
    )


def _q_gd(spark, t):
    from hama_spark.ml import gradient_descent

    data = t["lineitem"].select(
        F.array(F.lit(1.0), F.col("l_quantity") / 10.0).alias("features"),
        (F.col("l_extendedprice") / 100000.0).alias("label"),
    )
    res = gradient_descent(
        data,
        model="linear",
        alpha=GD_ALPHA,
        cost_threshold=0.0,
        iterations_threshold=GD_ITERS,
    )
    return spark.createDataFrame(
        [(round(res.theta[0], 6), round(res.theta[1], 6), round(res.cost, 6), res.iterations)],
        "theta0 double, theta1 double, cost double, iterations int",
    )


def _q_gd_logistic(spark, t):
    from hama_spark.ml import gradient_descent

    data = t["lineitem"].select(
        F.array(F.lit(1.0), F.col("l_quantity") / 10.0).alias("features"),
        F.when(F.col("l_returnflag") == "R", 1.0).otherwise(0.0).alias("label"),
    )
    res = gradient_descent(
        data,
        model="logistic",
        alpha=GD_ALPHA,
        cost_threshold=0.0,
        iterations_threshold=GD_ITERS,
    )
    return spark.createDataFrame(
        [(round(res.theta[0], 6), round(res.theta[1], 6), round(res.cost, 6), res.iterations)],
        "theta0 double, theta1 double, cost double, iterations int",
    )


def _q_kmeans(spark, t):
    from hama_spark.ml import kmeans

    emb = t["embeddings"].select(F.col("embedding").cast("array<double>").alias("features"))
    init = [
        r["features"]
        for r in t["embeddings"]
        .orderBy("vec_id")
        .limit(KMEANS_K)
        .select(F.col("embedding").cast("array<double>").alias("features"))
        .collect()
    ]
    res = kmeans(emb, init, max_iterations=KMEANS_ITERS)
    return res.assignments.groupBy("center_id").agg(F.count(F.lit(1)).alias("n_points"))


def _q_pi(spark, t):
    from hama_spark.ml import estimate_pi

    return estimate_pi(spark, samples=100_000, seed=42)


# --- generated-graph scale runs (BASELINE.md bench plan: FastGraphGen-
# equivalent 10^4-10^6 vertex scales). The md5-based generator replays
# in SQL, so even the 100k-vertex PageRank is value-checked; SSSP stays
# rows-only (its recursive-CTE oracle needs a DAG, the gen graph has
# cycles) with invariants in pytest. ----------------------------------
GEN_N = 100_000
# loop partitioning for the generated graphs: ~6k vertices/partition at
# GEN_N — at local scale fewer/fuller partitions cut the per-superstep
# scheduling floor ~30% vs the 32-partition session default (measured);
# the same sizing rule (~100-200 MB of state per partition) applies on a
# cluster, just with a larger count
GEN_PARTS = max(8, GEN_N // 6250)


def _gen_edges_sql(n: int, max_out: int, seed: int) -> str:
    """fast_graph_gen(n, max_out, weight=0, seed) twin (per-src distinct
    destinations == SELECT DISTINCT)."""
    return f"""
        SELECT DISTINCT CAST(i AS VARCHAR) AS src,
               CAST((('0x' || substr(md5('{seed}:' || i || ':' || j), 1, 8))::BIGINT
                     % {n}) AS VARCHAR) AS dst
        FROM range({n}) r(i), range({max_out}) g(j)
    """


def _sssp_gen_sql(n: int, max_out: int, seed: int, wmod: int, steps: int) -> str:
    """Unrolled Bellman-Ford over the generated weighted graph (the
    fixture has cycles, so the recursive-walk oracle doesn't apply; the
    unrolled form is safe here — all CTEs are generated, no parquet view
    re-opens). ``steps`` = the Spark query's max_iter cap; extra steps
    past the fixpoint are no-ops, so results match even when Spark's
    frontier empties early. Weight = hash(seed+1, src, dst) % wmod + 1
    (fast_graph_gen's weight draw + the query's +1)."""
    parts = [
        f"""WITH p AS (
          SELECT DISTINCT i AS src_i,
                 ('0x' || substr(md5('{seed}:' || i || ':' || j), 1, 8))::BIGINT % {n} AS dst_i
          FROM range({n}) r(i), range({max_out}) g(j)),
        e AS (
          SELECT CAST(src_i AS VARCHAR) AS src, CAST(dst_i AS VARCHAR) AS dst,
                 ('0x' || substr(md5('{seed + 1}:' || src_i || ':' || dst_i), 1, 8))::BIGINT
                 % {wmod} + 1 AS weight
          FROM p),
        v AS (SELECT DISTINCT id FROM (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
        d0 AS (SELECT id, CASE WHEN id = '0' THEN 0 END AS dist FROM v)""",
    ]
    for t in range(steps):
        # MATERIALIZED is load-bearing: each d_t is referenced twice and
        # DuckDB would otherwise inline it, re-evaluating the whole
        # prefix chain exponentially
        parts.append(
            f""", d{t + 1} AS MATERIALIZED (
              SELECT id, min(dist) AS dist FROM (
                SELECT id, dist FROM d{t}
                UNION ALL
                SELECT e.dst, d.dist + e.weight FROM d{t} d
                  JOIN e ON e.src = d.id WHERE d.dist IS NOT NULL
              ) GROUP BY id)"""
        )
    parts.append(
        f""" SELECT CAST(count(*) AS BIGINT) AS n_vertices,
               CAST(sum(CASE WHEN dist IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_reachable,
               CAST(max(dist) AS INT) AS max_dist
        FROM d{steps}"""
    )
    return "\n".join(parts)


def _q_pagerank_gen(spark, t):
    from hama_spark.graph import pagerank
    from hama_spark.sources import fast_graph_gen

    # checkpoint the generated edges: the vertex-count, vertex-init and
    # edge-cache paths all derive from them — without it the md5
    # generator + distinct re-executes for each (measured -13% wall)
    edges = (
        fast_graph_gen(spark, GEN_N, max_out=3, seed=42)
        .select("src", "dst")
        .localCheckpoint(eager=True)
    )
    # partitioning sized to the generated graph (~100k vertices): fewer,
    # fuller partitions beat the session default at this volume
    pr = pagerank(edges, epsilon=None, max_iter=5, self_ref=True, num_partitions=GEN_PARTS)
    # output IS the PageRankTest invariant: Σranks ≈ 1 (rounded 2dp)
    return pr.agg(
        F.count(F.lit(1)).alias("n_vertices"),
        F.round(F.sum("rank"), 2).alias("sum_rank"),
    )


def _q_sssp_gen(spark, t):
    from hama_spark.graph import sssp
    from hama_spark.sources import fast_graph_gen

    # checkpoint for the same shared-derivation reason as _q_pagerank_gen
    # halt_check_interval: 5 measured best (r4 warm A/B of 5/8/12 on this
    # graph: 14.7-16.7 / 15.1-17.6 / 16.5-24.1s) — past 5 the extra
    # no-op supersteps cost what the saved driver round-trips buy back
    edges = (
        fast_graph_gen(spark, GEN_N, max_out=3, weight=100, seed=7)
        .select("src", "dst", (F.col("weight") + 1).alias("weight"))
        .localCheckpoint(eager=True)
    )
    d = sssp(
        edges, "0", max_iter=50, num_partitions=GEN_PARTS, halt_check_interval=5
    )
    return d.agg(
        F.count(F.lit(1)).alias("n_vertices"),
        F.sum(F.when(F.col("dist") < 2147483647, 1).otherwise(0)).alias("n_reachable"),
        F.max(F.when(F.col("dist") < 2147483647, F.col("dist"))).alias("max_dist"),
    )


SC_ITERS, SC_VMAX, SC_CMAX, SC_SENT = 4, 4, 4, 10


def _semi_clustering_sql(edges_sql: str) -> str:
    """SemiClustering replay: state is (id, members list, score) rows;
    per round — send top max_sent clusters to neighbors, extend
    candidates not containing the receiver (size < max), score distinct
    member-sets once ((iC - 0*bC) / (vC(vC-1)/2), singletons 1.0), merge
    with current clusters, keep best max_clusters by (score desc, size
    desc, cid asc). Mirrors hama_spark.graph.semiclustering exactly."""
    rank_order = "score DESC, len(members) DESC, array_to_string(members, '+') ASC"
    parts = [
        f"WITH base AS ({edges_sql}),",
        """sym AS (SELECT DISTINCT * FROM (
             SELECT src, dst, CAST(weight AS DOUBLE) AS weight FROM base
             UNION ALL
             SELECT dst, src, CAST(weight AS DOUBLE) FROM base)),""",
        """s0 AS (SELECT DISTINCT src AS id, [src] AS members, 1.0 AS score FROM sym)""",
    ]
    for t in range(SC_ITERS):
        parts.append(
            f""", ob{t} AS (
              SELECT id, members FROM (
                SELECT id, members,
                       row_number() OVER (PARTITION BY id ORDER BY {rank_order}) AS rn
                FROM s{t}) WHERE rn <= {SC_SENT}
            ), recv{t} AS (
              SELECT sym.dst AS id, ob.members
              FROM ob{t} ob JOIN sym ON sym.src = ob.id
            ), cand{t} AS (
              SELECT DISTINCT id, members FROM (
                SELECT id, members FROM recv{t}
                UNION ALL
                SELECT id, list_sort(list_append(members, id)) AS members
                FROM recv{t}
                WHERE NOT list_contains(members, id) AND len(members) < {SC_VMAX})
            ), sc{t} AS (
              SELECT m.members,
                     CASE WHEN len(m.members) > 1
                          THEN coalesce(sum(CASE WHEN list_contains(m.members, sym.dst)
                                                 THEN sym.weight END), 0.0) / 2
                               / (len(m.members) * (len(m.members) - 1) / 2)
                          ELSE 1.0 END AS score
              FROM (SELECT DISTINCT members FROM cand{t}) m
                   CROSS JOIN LATERAL (SELECT unnest(m.members) AS src) u
                   LEFT JOIN sym ON sym.src = u.src
              GROUP BY m.members
            ), merged{t} AS (
              SELECT id, members, score FROM (
                SELECT id, members, score,
                       row_number() OVER (
                         PARTITION BY id, array_to_string(members, '+')
                         ORDER BY score DESC) AS dup
                FROM (
                  SELECT c.id, c.members, sc.score
                  FROM cand{t} c JOIN sc{t} sc ON sc.members = c.members
                  WHERE list_contains(c.members, c.id)
                  UNION ALL
                  SELECT id, members, score FROM s{t})) WHERE dup = 1
            ), s{t + 1} AS (
              SELECT id, members, score FROM (
                SELECT id, members, score,
                       row_number() OVER (PARTITION BY id ORDER BY {rank_order}) AS rn
                FROM merged{t}) WHERE rn <= {SC_CMAX})"""
        )
    parts.append(
        f""" SELECT id, array_to_string(members, '+') AS best_cid,
               round(score, 6) AS best_score, CAST(n_clusters AS INT) AS n_clusters
        FROM (
          SELECT id, members, score,
                 count(*) OVER (PARTITION BY id) AS n_clusters,
                 row_number() OVER (PARTITION BY id ORDER BY {rank_order}) AS rn
          FROM s{SC_ITERS}) WHERE rn = 1"""
    )
    return "\n".join(parts)


CF_RANK, CF_ITERS, CF_LR, CF_SCALE = 4, 3, 0.01, 0.3


def _online_cf_sql(rank: int = CF_RANK, iters: int = CF_ITERS, lr: float = CF_LR) -> str:
    """Batch-MF replay as (id, dim, value) rows: same md5 init, same
    full-batch gradient schedule (both updates read iteration t's
    factors), same top-3 ranking as _q_online_cf."""
    div = repr(100_000.0 / (2 * CF_SCALE))

    def init(alias: str, id_col: str, seed: int) -> str:
        return f"""
        {alias}0 AS (
          SELECT id, j,
                 (('0x' || substr(md5('{seed}:' || id || ':' || j), 1, 8))::BIGINT
                  % 100000) / {div} - {CF_SCALE} AS val
          FROM (SELECT DISTINCT {id_col} AS id FROM ratings), range({rank}) g(j))"""

    parts = [
        """WITH ratings AS (
          SELECT (o_custkey % 100) AS "user", (o_orderkey % 40) AS item,
                 avg(o_totalprice / 100000.0) AS rating
          FROM orders GROUP BY 1, 2),""",
        init("uf", '"user"', 42) + ",",
        init("vf", "item", 43),
    ]
    for t in range(iters):
        parts.append(
            f""", err{t} AS (
              SELECT r."user", r.item, r.rating - sum(uf.val * vf.val) AS err
              FROM ratings r
                JOIN uf{t} uf ON uf.id = r."user"
                JOIN vf{t} vf ON vf.id = r.item AND vf.j = uf.j
              GROUP BY r."user", r.item, r.rating
            ), gu{t} AS (
              SELECT e."user" AS id, vf.j, sum(e.err * vf.val) AS g
              FROM err{t} e JOIN vf{t} vf ON vf.id = e.item
              GROUP BY e."user", vf.j
            ), gv{t} AS (
              SELECT e.item AS id, uf.j, sum(e.err * uf.val) AS g
              FROM err{t} e JOIN uf{t} uf ON uf.id = e."user"
              GROUP BY e.item, uf.j
            ), uf{t + 1} AS (
              SELECT u.id, u.j, u.val + {2 * lr} * coalesce(g.g, 0.0) AS val
              FROM uf{t} u LEFT JOIN gu{t} g ON g.id = u.id AND g.j = u.j
            ), vf{t + 1} AS (
              SELECT v.id, v.j, v.val + {2 * lr} * coalesce(g.g, 0.0) AS val
              FROM vf{t} v LEFT JOIN gv{t} g ON g.id = v.id AND g.j = v.j)"""
        )
    parts.append(
        f""" SELECT "user", item, score, rnk FROM (
          SELECT s."user", s.item, round(s.score, 6) AS score,
                 row_number() OVER (PARTITION BY s."user"
                                    ORDER BY s.score DESC, s.item) AS rnk
          FROM (
            SELECT u.uid AS "user", v.id AS item, sum(u.val * v.val) AS score
            FROM (SELECT id AS uid, j, val FROM uf{iters}
                  WHERE id IN (SELECT DISTINCT "user" FROM ratings WHERE "user" < 5)) u
              JOIN vf{iters} v ON v.j = u.j
            GROUP BY u.uid, v.id) s)
        WHERE rnk <= 3"""
    )
    return "\n".join(parts)


RB_PEERS, RB_MSGS, RB_SIZE, RB_STEPS = 32, 10_000, 100, 5


def _q_randbench(spark, t):
    # the reference's RandBench message round-trip tool (SURVEY §6):
    # wall-clock here / RB_STEPS ~ per-superstep shuffle cost
    from hama_spark.plans import rand_bench

    return rand_bench(spark, RB_PEERS, RB_MSGS, RB_SIZE, RB_STEPS, seed=42)


def _q_online_cf(spark, t):
    # M3: matrix-factorization recommender on an orders-derived rating
    # matrix; rows-only check (iterative float accumulation has no exact
    # SQL twin), invariants tested in tests/test_cf_sources.py
    from hama_spark.ml import online_cf_train

    ratings = (
        t["orders"]
        .select(
            (F.col("o_custkey") % 100).alias("user"),
            (F.col("o_orderkey") % 40).alias("item"),
            (F.col("o_totalprice") / 100000.0).alias("rating"),
        )
        .groupBy("user", "item")
        .agg(F.avg("rating").alias("rating"))
    )
    model = online_cf_train(
        ratings,
        rank=CF_RANK,
        iterations=CF_ITERS,
        learning_rate=CF_LR,
        init_scale=CF_SCALE,
        track_rmse=False,
    )
    users = ratings.select("user").distinct().filter("user < 5")
    return model.most_preferred_items(users, count=3).select(
        "user", "item", F.round("score", 6).alias("score"), "rnk"
    )


def _q_matmul(spark, t):
    # M6: dense A(7x8)·Aᵀ via mat_mul + mat_transpose; A[r][j] =
    # Σ l_quantity over (l_linenumber=r, l_partkey%8=j)
    from hama_spark.functions.linalg import mat_mul, mat_transpose

    a = (
        t["lineitem"]
        .groupBy(F.col("l_linenumber").alias("row"))
        .agg(
            F.array(
                *[
                    F.sum(F.when(F.col("l_partkey") % 8 == j, F.col("l_quantity")).otherwise(0.0))
                    for j in range(8)
                ]
            ).alias("vec")
        )
    )
    prod = mat_mul(a, mat_transpose(a))
    # rows are l_linenumber 1..7, so transposed vec position p == row p+1
    return prod.select("row", F.posexplode("vec").alias("pos", "v")).select(
        "row", (F.col("pos") + 1).alias("col"), F.round("v", 4).alias("value")
    )


def _q_mat_ops(spark, t):
    """M6 dense-matrix algebra surface (DoubleMatrix.java:79-270 /
    DenseDoubleMatrix.java): one chain exercising add, subtract, scale,
    divide-by-vector, elementwise apply, flipped scalar subtract
    (subtractBy), and the half-open re-indexing slice. A[r][j] and
    B[r][j] are integer-valued cell aggregates (exact doubles), so
    every derived value is bit-deterministic across engines."""
    from hama_spark.functions.linalg import (
        mat_add,
        mat_apply,
        mat_divide_vec,
        mat_scale,
        mat_slice,
        mat_subtract,
        mat_subtract_by,
    )

    li = t["lineitem"]
    a = li.groupBy(F.col("l_linenumber").alias("row")).agg(
        F.array(
            *[
                F.sum(
                    F.when(F.col("l_partkey") % 8 == j, F.col("l_quantity")).otherwise(0.0)
                )
                for j in range(8)
            ]
        ).alias("vec")
    )
    b = li.groupBy(F.col("l_linenumber").alias("row")).agg(
        F.array(
            *[
                (
                    F.sum(F.when(F.col("l_partkey") % 8 == j, 1.0).otherwise(0.0))
                    + F.lit(float(j + 1))
                )
                for j in range(8)
            ]
        ).alias("vec")
    )
    d = mat_subtract(mat_add(a, b), mat_scale(a, 0.5))  # 0.5*A + B
    e = mat_divide_vec(d, [float(j + 1) for j in range(8)])
    g = mat_apply(e, lambda x: F.when(x > 100.0, 100.0).otherwise(x))
    h = mat_subtract_by(g, 50.0)  # 50 - x (the reference's flipped operand)
    sl = mat_slice(h, 2, 8, 1, 5)  # rows [2,8) x cols [1,5), re-indexed
    return sl.select("row", F.posexplode("vec").alias("pos", "v")).select(
        "row", F.col("pos").alias("col"), F.round("v", 6).alias("value")
    )


# --- relational layer --------------------------------------------------
def _q_inner_join(spark, t):
    from hama_spark.operators import composite_join

    return composite_join(
        [
            t["customer"].select(F.col("c_custkey").alias("k"), "c_name", "c_nationkey"),
            t["orders"].select(F.col("o_custkey").alias("k"), "o_orderkey", "o_totalprice"),
        ],
        on="k",
        how="inner",
    ).select("k", "c_name", "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))


def _q_composite_join_3way(spark, t):
    """J1 n-ary surface: a 3-source inner join written in the reference's
    composite-join expression DSL (CompositeInputFormat.java:42-101) over
    same-keyed sources — nation key joins nation dims to per-nation
    customer and supplier rollups. Catalyst broadcasts the tiny sides."""
    from hama_spark.operators.join_expr import parse_join_expr

    tabs = {
        "nat": t["nation"].select(F.col("n_nationkey").alias("k"), "n_name"),
        "cust": t["customer"]
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.round(F.sum("c_acctbal"), 2).alias("cust_bal"),
        ),
        "supp": t["supplier"]
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_supp")),
    }
    return parse_join_expr("inner(tbl(nat), tbl(cust), tbl(supp))", tables=tabs, on="k")


def _q_full_outer_join(spark, t):
    from hama_spark.operators import composite_join

    return composite_join(
        [
            t["part"].select(F.col("p_partkey").alias("k"), "p_name"),
            t["lineitem"].groupBy(F.col("l_partkey").alias("k")).agg(F.count(F.lit(1)).alias("cnt")),
        ],
        on="k",
        how="full_outer",
    )


def _q_override_join(spark, t):
    from hama_spark.operators import override_join

    base = t["part"].select(F.col("p_partkey").alias("k"), F.col("p_retailprice").alias("price"))
    override = (
        t["part"]
        .filter(F.col("p_partkey") % 3 == 0)
        .select(F.col("p_partkey").alias("k"), F.round(F.col("p_retailprice") * 0.5, 2).alias("price"))
    )
    return override_join([base, override], on="k")


def _q_agg_lineitem(spark, t):
    # TPC-H Q1 shape: partial-agg'd scan with a pushed-down filter
    return (
        t["lineitem"]
        .filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def _q_revenue_by_nation(spark, t):
    # broadcast-dim star join: lineitem ⋈ orders ⋈ customer ⋈ nation
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def _q_top_customers(spark, t):
    from pyspark.sql import Window

    rev = (
        t["orders"]
        .groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("revenue"), F.asc("c_custkey"))
    return (
        rev.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("c_mktsegment", F.col("c_custkey").alias("custkey"), "revenue", "rnk")
    )


# --- streaming-shaped --------------------------------------------------
def _q_events_window(spark, t):
    from hama_spark.streaming import windowed_event_stats

    return windowed_event_stats(t["events"], window="1 hour")


def _q_events_enriched(spark, t):
    # stream-static enrichment: events decorated with customer market
    # segment via a broadcast dim join, then per-segment rollup
    from hama_spark.streaming import enrich_events

    dim = t["customer"].select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    enriched = enrich_events(t["events"], dim, on="user_id")
    return enriched.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )


def _q_events_props(spark, t):
    # semi-structured extraction: typed JSON field -> per-type rollup
    from hama_spark.streaming import parse_props

    p = parse_props(t["events"], {"k": "int"})
    return p.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("k").alias("sum_k"),
        F.round(F.avg("k"), 6).alias("avg_k"),
    )


def _q_events_dedup_hourly(spark, t):
    from hama_spark.streaming import dedup_events_within

    return dedup_events_within(t["events"], window="1 hour")


def _q_events_sliding(spark, t):
    from hama_spark.streaming import sliding_event_stats

    return sliding_event_stats(t["events"], window="2 hours", slide="1 hour")


def _q_sessionize(spark, t):
    from hama_spark.streaming import sessionize

    return sessionize(t["events"], gap_minutes=30)


# --- temporal joins ----------------------------------------------------
def _q_asof_purchase_click(spark, t):
    # for each purchase, the same user's latest click strictly before it
    # (one shuffle: union + per-user window carry-forward; the plan a
    # native sort-merge as-of join would produce)
    from hama_spark.operators.temporal import asof_join

    ev = t["events"]
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
    )
    j = asof_join(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="click_ts",
        strict=True, suffix="", tiebreak="click_id",
    )
    return j.select(
        "event_id",
        "user_id",
        "click_id",
        "click_value",
        (F.unix_micros("ts") - F.unix_micros("click_ts")).alias("micros_since_click"),
    )


def _q_band_error_counts(spark, t):
    # errors within ±5 min of each purchase — bucketed band join (pure
    # equi-join on epoch//300 buckets, no theta-join), then a per-left
    # rollup re-attached so rowless purchases keep count 0
    from hama_spark.operators.temporal import band_join

    ev = t["events"]
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "ts")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"), "ts"
    )
    pairs = band_join(purchases, errors, band_secs=300)
    per = pairs.groupBy("event_id").agg(
        F.count(F.lit(1)).alias("n_errors_5m"),
        F.sum("err_id_r").alias("sum_err_id"),
    )
    return purchases.select("event_id").join(per, on="event_id", how="left").select(
        "event_id",
        F.coalesce("n_errors_5m", F.lit(0).cast("long")).alias("n_errors_5m"),
        F.coalesce("sum_err_id", F.lit(0).cast("long")).alias("sum_err_id"),
    )


# --- embedding vector ops ----------------------------------------------
def _q_embedding_normalize(spark, t):
    from hama_spark.extensions.vectors import l2_normalize

    out = l2_normalize(t["embeddings"])
    return out.select(
        "vec_id",
        F.round("norm", 9).alias("norm"),
        F.size("unit").cast("long").alias("n_dims"),
    )


def _q_embedding_project(spark, t):
    from hama_spark.extensions.vectors import random_projection

    return random_projection(t["embeddings"])


def _q_embedding_quantize(spark, t):
    # int8 codes are engine-exact integers; only the scale is float, and
    # it is rounded for the compare like every other float output
    from hama_spark.extensions.vectors import quantize_int8

    q = quantize_int8(t["embeddings"])
    acc = F.lit(0).cast("long")
    return q.select(
        "vec_id",
        F.round("scale", 9).alias("scale"),
        F.aggregate(F.col("q"), acc, lambda a, x: a + x).alias("sum_q"),
        F.aggregate(F.col("q"), acc, lambda a, x: a + F.abs(x)).alias("sum_abs_q"),
        F.array_max("q").cast("long").alias("max_q"),
        F.array_min("q").cast("long").alias("min_q"),
    )


# --- extensions --------------------------------------------------------
def _q_token_count(spark, t):
    from hama_spark.extensions import token_count

    return t["documents"].select("doc_id", token_count("text").alias("n_tokens"))


def _q_bpe_token_count(spark, t):
    from hama_spark.extensions import bpe_token_count

    return t["documents"].select("doc_id", bpe_token_count("text").alias("n_bpe_tokens"))


def _q_text_stats(spark, t):
    from hama_spark.extensions.text import text_stats

    return t["documents"].select("doc_id", *text_stats("text"))


def _q_quality(spark, t):
    from hama_spark.extensions.text import quality_score

    return t["documents"].select("doc_id", quality_score("text").alias("quality"))


def _q_lang_id(spark, t):
    from hama_spark.extensions import lang_id

    return t["documents"].select("doc_id", lang_id("text").alias("lang"))


def _q_tfidf_top_terms(spark, t):
    from hama_spark.extensions import tfidf_top_terms

    return tfidf_top_terms(t["documents"], k=3)


def _q_top_ngrams(spark, t):
    from hama_spark.extensions import top_ngrams

    return top_ngrams(t["documents"], n=2, k=20)


def _q_repetition_stats(spark, t):
    from hama_spark.extensions import repetition_stats

    return repetition_stats(t["documents"])


def _q_pii_scrub(spark, t):
    """Synthetic PII is injected deterministically (doc_id % 5) so the
    redaction path actually fires on the PII-free generated corpus; the
    oracle applies the identical injection."""
    from hama_spark.extensions import pii_scrub

    injected = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit(" contact u"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com 10.0.0."),
                (F.col("doc_id") % 250).cast("string"),
                F.lit(" 555-123-4567"),
            ),
        ).otherwise(F.lit("")),
    )
    return t["documents"].select("doc_id", *pii_scrub(injected))


def _q_event_transitions(spark, t):
    from hama_spark.streaming import event_transitions

    return event_transitions(t["events"])


def _q_value_quantiles(spark, t):
    from hama_spark.functions import exact_group_quantiles

    return exact_group_quantiles(t["events"], "event_type", "value")


def _q_retention_cohorts(spark, t):
    from hama_spark.streaming import retention_cohorts

    return retention_cohorts(t["events"])


def _q_events_rollup(spark, t):
    from hama_spark.streaming import rollup_event_counts

    return rollup_event_counts(t["events"])


def _q_seeded_sample(spark, t):
    from hama_spark.extensions import seeded_sample

    return seeded_sample(t["documents"], 0.2).select("doc_id", "n_chars")


def _q_stratified_sample(spark, t):
    from hama_spark.extensions import lang_id, stratified_sample

    docs = t["documents"].select("doc_id", lang_id("text").alias("lang"))
    return stratified_sample(
        docs, "lang", {"en": 0.5, "de": 0.3}, default_fraction=0.1
    ).select("doc_id", "lang")


def _q_global_shuffle(spark, t):
    from hama_spark.extensions import global_shuffle

    return global_shuffle(t["documents"]).select("doc_id", "pos")


def _q_pack_sequences(spark, t):
    from hama_spark.extensions import pack_sequences, token_count

    toks = t["documents"].select("doc_id", token_count("text").alias("n_tokens"))
    return pack_sequences(toks, max_tokens=2048).select(
        "doc_id", "pos", "cum_before", "pack_id"
    )


def _q_interleave_mix(spark, t):
    from hama_spark.extensions import interleave_datasets, lang_id

    # materialize the lang scoring once — both source branches read it
    docs = (
        t["documents"]
        .select("doc_id", lang_id("text").alias("lang"))
        .localCheckpoint(eager=True)
    )
    en = docs.filter("lang = 'en'").select("doc_id")
    rest = docs.filter("lang <> 'en'").select("doc_id")
    # upweight the rare non-en slice 3x in the merged training order
    return interleave_datasets({"en": (en, 1.0), "rest": (rest, 3.0)}).select(
        "source", "doc_id", "pos"
    )


def _q_corpus_stats(spark, t):
    from hama_spark.extensions import clean_corpus, corpus_stats

    return corpus_stats(clean_corpus(t["documents"], min_quality=0.8))


def _q_fingerprint(spark, t):
    from hama_spark.extensions import doc_fingerprint

    return t["documents"].select("doc_id", doc_fingerprint("text").alias("fp"))


def _q_winnow(spark, t):
    # rolling-hash winnowing fingerprints, reduced to one summary row
    # per document (count/min/max/sum over the selected hashes) so the
    # oracle compare stays doc-sized while still covering every window
    from hama_spark.extensions.text import winnow_fingerprints

    fps = winnow_fingerprints(t["documents"])
    return fps.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_fps"),
        F.min("fp").alias("min_fp"),
        F.max("fp").alias("max_fp"),
        F.sum("fp").alias("sum_fp"),
    )


def _q_dedup_exact(spark, t):
    from hama_spark.extensions import dedup_exact

    return dedup_exact(t["documents"])


def _q_domain_mix(spark, t):
    """Temperature-based resampling weights over the documents table's
    source domains (alpha=0.5 — the standard tail-boosting mix)."""
    from hama_spark.extensions import mix_weights

    w = mix_weights(t["documents"], "source", alpha=0.5)
    return w.select(
        "source",
        "n",
        F.round("p", 6).alias("p"),
        F.round("q", 6).alias("q"),
        F.round("rate", 6).alias("rate"),
    )


def _q_decontaminate(spark, t):
    """Train/eval overlap check: docs with doc_id % 97 == 0 stand in for
    the benchmark set; every other doc is scored by the fraction of its
    word-3-gram shingles that leak from the benchmark."""
    from hama_spark.extensions import contamination_report

    docs = t["documents"]
    rep = contamination_report(
        docs.filter(F.col("doc_id") % 97 != 0),
        docs.filter(F.col("doc_id") % 97 == 0),
        k=3,
    )
    return rep.select(
        "doc_id",
        "n_hits",
        "n_shingles",
        F.round("contamination", 6).alias("contamination"),
    )


def _q_bloom_decontaminate(spark, t):
    """Bloom-pruned train/eval overlap check (extensions/dedup.py
    bloom_decontaminate): benchmark shingles build a Bloom filter,
    corpus shingles probe it map-side, and only the surviving sliver
    pays the exact confirm join — output value-identical to the exact
    broadcast path, so the oracle is the same SQL. Distinct benchmark
    split (% 89) from the `decontaminate` query so the two paths are
    independently checked."""
    from hama_spark.extensions import bloom_decontaminate

    docs = t["documents"]
    rep = bloom_decontaminate(
        docs.filter(F.col("doc_id") % 89 != 0),
        docs.filter(F.col("doc_id") % 89 == 0),
        k=3,
        fpp=0.001,
    )
    return rep.select(
        "doc_id",
        "n_hits",
        "n_shingles",
        F.round("contamination", 6).alias("contamination"),
    )


_LINE_WORDS = 8  # words per derived "line" for the line-dedup fixture


def _line_chunked_docs(t) -> DataFrame:
    """Derived fixture: documents re-wrapped with a newline every
    _LINE_WORDS tokens, so corpus-level duplicate-line removal has real
    duplicates to find (the synthetic text has no newlines of its own
    but repeats 8-word spans across documents)."""
    from hama_spark.extensions.text import tokenize

    toks = tokenize(F.col("text"))
    n_lines = F.ceil(F.size(toks) / F.lit(_LINE_WORDS)).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), n_lines - 1),
        lambda i: F.array_join(
            F.slice(toks, i * _LINE_WORDS + 1, _LINE_WORDS), " "
        ),
    )
    return (
        t["documents"]
        .filter(F.size(toks) > 0)
        .select("doc_id", F.array_join(lines, "\n").alias("text"))
    )


def _q_line_dedup(spark, t):
    """Falcon/RefinedWeb-style duplicate-line removal over the derived
    newline-chunked corpus: every occurrence of a line seen >=2 times
    corpus-wide is dropped and documents are rebuilt in order."""
    from hama_spark.extensions.corpus import dedup_lines

    return dedup_lines(_line_chunked_docs(t))


def _q_chunk_docs(spark, t):
    """Training-window chunking: 32-token windows every 24 tokens
    (8-token overlap), final partial window kept."""
    from hama_spark.extensions.corpus import chunk_tokens

    return chunk_tokens(t["documents"], size=32, stride=24)


def _q_dedup_incremental(spark, t):
    """Incremental exact dedup of an incoming batch against the
    already-ingested corpus: re-crawled copies (same text, new ids) are
    dropped, genuinely new revisions survive."""
    from hama_spark.extensions.corpus import dedup_against

    docs = t["documents"]
    recrawled = docs.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    revised = docs.filter(F.col("doc_id") % 20 == 1).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" v2")).alias("text"),
    )
    incoming = recrawled.unionByName(revised)
    return dedup_against(incoming, docs).select(
        "doc_id", F.length("text").alias("n_chars")
    )


def _q_token_entropy(spark, t):
    from hama_spark.extensions.corpus import token_entropy

    return token_entropy(t["documents"])


def _q_domain_cap(spark, t):
    """Per-domain document cap: keep the 5 highest-quality docs per
    source domain (quality desc, doc_id as the deterministic
    tie-break)."""
    from hama_spark.extensions.corpus import domain_cap
    from hama_spark.extensions.text import quality_score

    docs = t["documents"].select(
        "doc_id", "source", quality_score("text").alias("q")
    )
    capped = domain_cap(
        docs, "source", k=5, order_by=[F.col("q").desc(), F.col("doc_id")]
    )
    return capped.select("source", "doc_id", F.round("q", 6).alias("q"))


def _labelprop_sql(edges_sql: str, iters: int = 4) -> str:
    """Unrolled synchronous label propagation mirroring
    hama_spark.graph.labelprop exactly: per round every vertex takes
    the most frequent neighbor label (count desc, label asc ties) over
    the PREVIOUS round's labels."""
    parts = [
        f"WITH base AS ({edges_sql}),",
        """e AS (SELECT DISTINCT src, dst FROM (
             SELECT src, dst FROM base UNION ALL SELECT dst, src FROM base)),""",
        "l0 AS (SELECT DISTINCT src AS id, src AS label FROM e)",
    ]
    for t in range(iters):
        parts.append(
            f""", m{t} AS (
              SELECT e.dst AS id, l.label, count(*) AS c
              FROM e JOIN l{t} l ON l.id = e.src GROUP BY 1, 2
            ), p{t} AS (
              SELECT id, label FROM (
                SELECT id, label,
                       row_number() OVER (PARTITION BY id
                                          ORDER BY c DESC, label) AS rn
                FROM m{t}) WHERE rn = 1
            ), l{t + 1} AS (
              SELECT l.id, coalesce(p.label, l.label) AS label
              FROM l{t} l LEFT JOIN p{t} p ON p.id = l.id
            )"""
        )
    parts.append(f" SELECT id, label FROM l{iters}")
    return "\n".join(parts)


LP_EDGES_SQL = (
    "SELECT 's' || CAST(l_suppkey AS VARCHAR) AS src, "
    "'p' || CAST(l_partkey AS VARCHAR) AS dst "
    "FROM lineitem WHERE l_orderkey % 5 = 0"
)


def _q_label_communities(spark, t):
    """4 synchronous label-propagation rounds over the supplier-part
    graph (deterministic neighbor-majority schedule, SQL-replayed).
    Same 20% order decimation as triangle_count: the per-round
    (vertex, label) vote shuffle scales with edge multiplicity, and the
    decimated graph keeps every vertex while bounding bench cost."""
    from hama_spark.graph import label_propagation

    li = t["lineitem"].filter(F.col("l_orderkey") % 5 == 0)
    edges = li.select(
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("dst"),
    )
    return label_propagation(edges, iters=4)


def _q_bigram_perplexity(spark, t):
    """Corpus-self-trained add-k bigram LM perplexity per document —
    the KenLM-style pretraining quality filter."""
    from hama_spark.extensions import bigram_perplexity

    return bigram_perplexity(t["documents"], k=0.5)


def _q_rolling_user_stats(spark, t):
    """Trailing-20-event rolling mean/std + anomaly z-score per user."""
    from hama_spark.streaming import rolling_user_stats

    return rolling_user_stats(t["events"], n_events=20)


def _q_events_topk_hourly(spark, t):
    """Hourly heavy hitters: top-3 event types per tumbling hour."""
    from hama_spark.streaming import topk_per_window

    return topk_per_window(t["events"], k=3, window="1 hour")


def _q_degree_histogram(spark, t):
    """Out-degree distribution of the supplier->part graph (the p-side
    vertices appear with degree 0 — they never emit edges)."""
    from hama_spark.graph import degree_histogram

    return degree_histogram(_sp_edges(spark, t), direction="out")


def _q_sample_balanced(spark, t):
    """Fixed-size balanced sample: exactly 10 docs per source domain,
    chosen by deterministic seeded hash rank."""
    from hama_spark.extensions import sample_per_group

    return sample_per_group(t["documents"], "source", n=10).select(
        "source", "doc_id"
    )


_LSH_MEMO: dict = {}


def _lsh_pairs_cached(spark, docs):
    """MinHash-LSH pairs, materialized once per (session, corpus plan):
    bench/driver processes run both minhash_lsh_pairs and dedup_near, so
    the cluster-collapse query reuses the exact checkpointed pairs
    instead of re-shingling + re-signing the corpus (VERDICT r1 #3)."""
    from hama_spark.extensions import minhash_lsh_dup_pairs

    key = (spark.sparkContext.applicationId, docs.semanticHash())
    if key not in _LSH_MEMO:
        # single-entry memo: a new (session, corpus) key evicts the
        # old one so stale eager-checkpoint blocks can be GC'd
        _LSH_MEMO.clear()
        _LSH_MEMO[key] = minhash_lsh_dup_pairs(
            docs, threshold=0.5, num_hashes=16, bands=4
        ).localCheckpoint(eager=True)
    return _LSH_MEMO[key]


def _q_dedup_near(spark, t):
    from hama_spark.extensions import dedup_near

    docs = t["documents"]
    return dedup_near(docs, threshold=0.5, pairs=_lsh_pairs_cached(spark, docs))


def _q_ngram_jaccard(spark, t):
    from hama_spark.extensions import ngram_jaccard_pairs

    return ngram_jaccard_pairs(t["documents"], threshold=0.5, k=3)


def _q_minhash_lsh(spark, t):
    return _lsh_pairs_cached(spark, t["documents"])


def _q_simhash(spark, t):
    from hama_spark.extensions import simhash_dup_pairs

    return simhash_dup_pairs(t["documents"], max_hamming=3)


def _q_embedding_dups(spark, t):
    from hama_spark.extensions import embedding_cosine_dup_pairs

    # 0.5 sits just under the corpus max pairwise cosine (0.513 at
    # sf0.01) so the check is non-trivial (>=1 surviving pair).
    return embedding_cosine_dup_pairs(t["embeddings"], threshold=0.5)


_TOPK_MEMO: dict = {}


def _topk_cached(spark, emb, method: str):
    """The searchers' (tiny) top-k results, materialized once per
    (session, corpus): ann_recall consumes three of them and the
    standalone cosine_topk / lsh_cosine_topk / ivf_topk /
    hard_negatives queries re-read the same 50-row checkpoints instead
    of re-running the scans. The IVF index (k-means cells + centers)
    is itself cached so the plain probe and the hard-negative probe
    train once."""
    from hama_spark.extensions import cosine_topk, hard_negatives, ivf_topk, lsh_cosine_topk
    from hama_spark.extensions.similarity import _kmeans_cells

    key = (spark.sparkContext.applicationId, emb.semanticHash(), method)
    if key not in _TOPK_MEMO:
        # evict other corpora only (all methods of one corpus coexist —
        # ann_recall needs several together)
        for k_ in [k_ for k_ in _TOPK_MEMO if k_[:2] != key[:2]]:
            del _TOPK_MEMO[k_]
        q = emb.filter("vec_id < 5")
        if method == "cosine":
            df = cosine_topk(emb, q, k=10)
        elif method == "lsh":
            df = lsh_cosine_topk(emb, q, k=10, planes=4, tables=8, dim=64)
        else:
            cells_key = key[:2] + ("_cells",)
            if cells_key not in _TOPK_MEMO:
                cb, centers = _kmeans_cells(
                    emb, IVF_CELLS, IVF_KM_ITERS, "vec_id", "embedding"
                )
                _TOPK_MEMO[cells_key] = (cb.localCheckpoint(eager=True), centers)
            fn = ivf_topk if method == "ivf" else hard_negatives
            df = fn(
                emb, q, k=IVF_K, n_cells=IVF_CELLS, nprobe=IVF_PROBE,
                kmeans_iter=IVF_KM_ITERS, cells=_TOPK_MEMO[cells_key],
            )
        _TOPK_MEMO[key] = df.localCheckpoint(eager=True)
    return _TOPK_MEMO[key]


def _q_knn_graph(spark, t):
    """kNN graph over the embeddings corpus in the EXACT configuration
    (nprobe = n_cells probes every cell, so the IVF shuffle-join plan
    reproduces brute-force kNN and the cross-join oracle hash-matches;
    production calls drop nprobe for the approximate regime)."""
    from hama_spark.extensions import knn_graph

    return knn_graph(
        t["embeddings"], k=5, n_cells=8, nprobe=8, kmeans_iter=2
    )


def _q_cosine_topk(spark, t):
    return _topk_cached(spark, t["embeddings"], "cosine")


def _q_lsh_topk(spark, t):
    return _topk_cached(spark, t["embeddings"], "lsh")


_EMB_PAIRS_MEMO: dict = {}


def _emb_pairs_cached(spark, emb):
    """LSH cosine dup pairs, materialized once per (session, corpus):
    lsh_cosine_pairs and dedup_embedding share the bucket-join output the
    same way minhash_lsh_pairs/dedup_near share theirs."""
    from hama_spark.extensions import lsh_cosine_dup_pairs

    key = (spark.sparkContext.applicationId, emb.semanticHash())
    if key not in _EMB_PAIRS_MEMO:
        # single-entry memo: a new (session, corpus) key evicts the
        # old one so stale eager-checkpoint blocks can be GC'd
        _EMB_PAIRS_MEMO.clear()
        _EMB_PAIRS_MEMO[key] = lsh_cosine_dup_pairs(
            emb, threshold=0.45, planes=4, tables=8, dim=64
        ).localCheckpoint(eager=True)
    return _EMB_PAIRS_MEMO[key]


def _q_lsh_cosine_pairs(spark, t):
    return _emb_pairs_cached(spark, t["embeddings"])


def _q_dedup_embedding(spark, t):
    from hama_spark.extensions import dedup_embedding

    emb = t["embeddings"]
    return dedup_embedding(emb, pairs=_emb_pairs_cached(spark, emb))


def _q_ivf_topk(spark, t):
    return _topk_cached(spark, t["embeddings"], "ivf")


def _q_hard_negatives(spark, t):
    """Hard-negative mining (DPR-style): per query the top-k most
    similar corpus vectors from OUTSIDE its own semantic cell — the
    IVF probe with the nearest cell skipped, sharing ivf_topk's cached
    index (k-means trains once per corpus)."""
    return _topk_cached(spark, t["embeddings"], "hard_negatives")


def _q_video_frames(spark, t):
    from hama_spark.extensions import sample_frames

    media = t["documents"].filter(F.col("doc_id") < 50).select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        F.col("text").cast("binary").alias("payload"),
        F.lit("video/fake").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        ((F.col("n_chars") % 10 + 1) * 1000).cast("int").alias("duration_ms"),
    )
    return sample_frames(media, every_ms=1000)


def _q_audio_features(spark, t):
    from hama_spark.extensions import extract_audio_features

    media = t["documents"].select(
        F.col("doc_id").alias("media_id"),
        F.lit("audio").alias("kind"),
        F.col("text").cast("binary").alias("payload"),
        F.lit("audio/fake").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        (F.col("n_chars") * 50).cast("int").alias("duration_ms"),
    )
    return extract_audio_features(media)


def _q_image_features(spark, t):
    from hama_spark.extensions import extract_image_features

    media = t["documents"].select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.col("text").cast("binary").alias("payload"),
        F.lit("image/fake").alias("mime"),
        (F.col("n_chars") % 100).cast("int").alias("width"),
        ((F.col("n_chars") * 7) % 100).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )
    return extract_image_features(media)


def _q_perplexity_buckets(spark, t):
    """CCNet-style head/middle/tail split by per-language perplexity
    terciles under the corpus's own bigram LM."""
    from hama_spark.extensions import perplexity_buckets

    return perplexity_buckets(t["documents"], k=0.5)


IW_BUCKETS = 4096


def _q_importance_weights(spark, t):
    """DSIR-style hashed-unigram importance weights toward the English
    slice of the corpus."""
    from hama_spark.extensions import importance_weights

    return importance_weights(
        t["documents"], F.col("lang") == "en", n_buckets=IW_BUCKETS
    )


_SEM_PAIRS_MEMO: dict = {}


def _sem_pairs_cached(spark, emb):
    """semantic_dup_pairs materialized once per (session, corpus):
    semantic_dup_pairs and semantic_dedup share the within-cell join
    output the same way minhash_lsh_pairs/dedup_near share theirs."""
    from hama_spark.extensions import semantic_dup_pairs

    key = (spark.sparkContext.applicationId, emb.semanticHash())
    if key not in _SEM_PAIRS_MEMO:
        # single-entry memo: a new (session, corpus) key evicts the
        # old one so stale eager-checkpoint blocks can be GC'd
        _SEM_PAIRS_MEMO.clear()
        _SEM_PAIRS_MEMO[key] = semantic_dup_pairs(
            emb, threshold=SEM_THRESHOLD, n_cells=SEM_CELLS, kmeans_iter=SEM_KM_ITERS
        ).localCheckpoint(eager=True)
    return _SEM_PAIRS_MEMO[key]


def _q_semantic_dup_pairs(spark, t):
    return _sem_pairs_cached(spark, t["embeddings"])


def _q_semantic_dedup(spark, t):
    """SemDeDup: k-means cells -> within-cell cosine pairs -> connected
    components -> lowest id per semantic duplicate group."""
    from hama_spark.extensions import semantic_dedup

    emb = t["embeddings"]
    return semantic_dedup(
        emb, pairs=_sem_pairs_cached(spark, emb).drop("cosine", "cell")
    )


def _q_personalized_pagerank(spark, t):
    """Random-walk-with-restart proximity to vertex '0' — the
    recommendation / related-items flavor of PageRank."""
    from hama_spark.graph import pagerank

    pr = pagerank(
        _pr_edges(spark, t), epsilon=None, max_iter=10, self_ref=True, personalize="0"
    )
    return pr.select("id", F.round("rank", 9).alias("rank"))


def _q_random_walks(spark, t):
    """Seeded 8-step walks from every vertex of the nation graph —
    DeepWalk/node2vec corpus generation, reproducible by construction."""
    from hama_spark.graph import random_walks

    return random_walks(_pr_edges(spark, t), walk_len=8, seed=42)


def _q_data_quality(spark, t):
    """One-pass Deequ-style expectation suite over lineitem."""
    from hama_spark.extensions import check_expectations

    return check_expectations(
        t["lineitem"],
        [
            ("not_null", "l_orderkey"),
            ("not_null", "l_linestatus"),
            ("min", "l_quantity", 1.0),
            ("max", "l_discount", 0.1),
            ("in_set", "l_returnflag", ["A", "N", "R"]),
            # l_orderkey repeats across line numbers — this rule FAILS
            # by design, demonstrating violation detection
            ("unique", "l_orderkey"),
            ("nonempty",),
        ],
    )


def _q_domain_divergence(spark, t):
    """KL(P_source || P_corpus) over hashed-unigram buckets per source
    — the mixture-design diagnostic."""
    from hama_spark.extensions import domain_divergence

    return domain_divergence(t["documents"], n_buckets=IW_BUCKETS)


def _q_hybrid_search(spark, t):
    """Filtered vector search (the production RAG pattern): restrict
    the corpus by a metadata predicate (documents.lang = 'en', joined
    on vec_id = doc_id) BEFORE the cosine top-k, so the ANN pass scans
    only the qualifying slice — predicate + join prune ahead of the
    similarity math, exactly what you want at 100 TB."""
    from hama_spark.extensions import cosine_topk

    en_ids = (
        t["documents"].filter(F.col("lang") == "en").select(F.col("doc_id").alias("vec_id"))
    )
    corpus = t["embeddings"].join(en_ids, "vec_id")
    return cosine_topk(corpus, t["embeddings"].filter("vec_id < 5"), k=10)


def _q_split_dataset(spark, t):
    """Deterministic hash-banded train/val/test split — per-split doc
    and token totals (the report a data engineer checks first)."""
    from hama_spark.extensions import split_dataset, token_count

    s = split_dataset(t["documents"], seed=42)
    return s.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col("text"))).alias("n_tokens"),
    )


def _q_heuristic_flags(spark, t):
    """RedPajama/Gopher-style rule features per document."""
    from hama_spark.extensions import heuristic_flags

    return t["documents"].select("doc_id", *heuristic_flags(F.col("text")))


def _q_pmi_top_pairs(spark, t):
    """Top-40 collocations by PMI (min bigram count 5)."""
    from hama_spark.extensions import pmi_top_pairs

    return pmi_top_pairs(t["documents"], k=40, min_count=5)


def _q_quality_classifier(spark, t):
    """Learned quality filter: logistic regression (M2 trainer) on text
    features, trained on and scoring the corpus."""
    from hama_spark.extensions import quality_classifier_scores

    return quality_classifier_scores(t["documents"], alpha=QC_ALPHA, iterations=QC_ITERS)


_BPE_MEMO: dict = {}


def _bpe_merges_cached(spark, docs):
    """Trained BPE merge table, memoized per (session, corpus plan):
    bench/driver processes run both bpe_train_merges and
    bpe_vocab_token_count, and the counting query would otherwise
    re-run the full num_merges-round training loop."""
    from hama_spark.extensions.bpe import train_bpe_merges

    key = (spark.sparkContext.applicationId, docs.semanticHash())
    if key not in _BPE_MEMO:
        _BPE_MEMO.clear()
        _BPE_MEMO[key] = train_bpe_merges(docs, num_merges=_BPE_NUM_MERGES)
    return _BPE_MEMO[key]


def _q_bpe_train_merges(spark, t):
    """Real-vocabulary BPE training (Sennrich 2016): the learned merge
    table itself — oracle replays the full deterministic training
    schedule in SQL and must land the identical 24 rules."""
    from hama_spark.extensions.bpe import merges_df

    return merges_df(spark, _bpe_merges_cached(spark, t["documents"]))


_SPAN_SHINGLE_K, _SPAN_MAX_DF, _SPAN_MIN_SHARED = 8, 50, 3
# boilerplate regime: spans repeated across >= this many docs carry no
# training signal (3 on the fixture corpus — scale the threshold with
# corpus size in production)
_BOILER_MIN_DF = 3

_SPAN_MEMO: dict = {}


def _span_shingles_cached(spark, docs):
    """Doc-frequency-annotated positional shingles, materialized once
    per (session, corpus): shared_span_pairs, scrub_shared_spans AND
    scrub_boilerplate all slice their df range from the same
    (h, id, pos, df) relation — the shingle scan + df count price
    once; each query pays only its own filter + join."""
    from hama_spark.extensions.dedup import positional_shingles_with_df

    key = (spark.sparkContext.applicationId, docs.semanticHash())
    if key not in _SPAN_MEMO:
        _SPAN_MEMO.clear()
        _SPAN_MEMO[key] = positional_shingles_with_df(
            docs, k=_SPAN_SHINGLE_K
        ).localCheckpoint(eager=True)
    return _SPAN_MEMO[key]


def _span_shingles_range(spark, docs, min_df, max_df):
    from hama_spark.extensions.dedup import _df_range

    return _df_range(_span_shingles_cached(spark, docs), min_df, max_df)


def _q_shared_span_pairs(spark, t):
    """Exact duplicated-span detection (Lee et al. 2022 shape): doc
    pairs sharing >= 3 distinct 8-token runs, with span extents."""
    from hama_spark.extensions import shared_span_pairs

    docs = t["documents"]
    return shared_span_pairs(
        docs,
        k=_SPAN_SHINGLE_K,
        min_shared=_SPAN_MIN_SHARED,
        max_df=_SPAN_MAX_DF,
        shared=_span_shingles_range(spark, docs, 2, _SPAN_MAX_DF),
    )


def _q_scrub_shared_spans(spark, t):
    """Span-level dedup removal: tokens covered by cross-document
    8-token runs are cut; per-doc counts + cleaned-stream md5."""
    from hama_spark.extensions import scrub_shared_spans

    docs = t["documents"]
    return scrub_shared_spans(
        docs,
        k=_SPAN_SHINGLE_K,
        max_df=_SPAN_MAX_DF,
        shared=_span_shingles_range(spark, docs, 2, _SPAN_MAX_DF),
    )


def _q_scrub_boilerplate(spark, t):
    """Boilerplate removal — the complement of span dedup: spans
    repeated across >= _BOILER_MIN_DF documents (licenses, headers,
    chrome) are cut from every document, uncapped above (no pair join
    in this regime, so no quadratic hot bucket to fence)."""
    from hama_spark.extensions import scrub_shared_spans

    docs = t["documents"]
    return scrub_shared_spans(
        docs,
        k=_SPAN_SHINGLE_K,
        min_df=_BOILER_MIN_DF,
        max_df=None,
        shared=_span_shingles_range(spark, docs, _BOILER_MIN_DF, None),
    )


def _q_bpe_top_tokens(spark, t):
    """Vocabulary usage: top-40 trained-vocab tokens by corpus
    occurrence count (rides the memoized merge table)."""
    from hama_spark.extensions import bpe_top_tokens

    docs = t["documents"]
    return bpe_top_tokens(docs, _bpe_merges_cached(spark, docs), top_n=40)


def _q_bpe_fertility(spark, t):
    """Tokenizer fertility by language: chars-per-trained-token per
    slice — the number vocabulary design optimizes (rides the memoized
    merge table + one counting pass)."""
    from hama_spark.extensions import bpe_fertility

    docs = t["documents"]
    return bpe_fertility(docs, _bpe_merges_cached(spark, docs), by="lang")


def _q_ann_recall(spark, t):
    """Recall@k report: lsh_cosine_topk and ivf_topk vs the exact
    cosine_topk twin on the shared query set — the measurement that
    justifies trusting approximate search parameters at scale."""
    from hama_spark.extensions import ann_recall_report

    emb = t["embeddings"]
    return ann_recall_report(
        _topk_cached(spark, emb, "cosine"),
        {
            "lsh_cosine_topk": _topk_cached(spark, emb, "lsh"),
            "ivf_topk": _topk_cached(spark, emb, "ivf"),
        },
    )


def _q_bpe_vocab_token_count(spark, t):
    """Per-document token counts under the trained merge vocabulary —
    the production sizing metric the pre-tokenizer regex count
    (bpe_token_count) approximates."""
    from hama_spark.extensions.bpe import bpe_token_counts

    docs = t["documents"]
    return bpe_token_counts(docs, _bpe_merges_cached(spark, docs))


_BM25_MEMO: dict = {}


def _bm25_cached(spark, docs):
    """The (tiny) BM25 self-query top-k, materialized once per
    (session, corpus plan): bm25_topk and hybrid_rrf both consume it,
    so the corpus postings pass runs once."""
    from hama_spark.extensions.retrieval import bm25_topk, self_queries

    key = (spark.sparkContext.applicationId, docs.semanticHash())
    if key not in _BM25_MEMO:
        _BM25_MEMO.clear()  # single-entry memo, evict for GC
        _BM25_MEMO[key] = bm25_topk(
            docs, self_queries(docs), k=5
        ).localCheckpoint(eager=True)
    return _BM25_MEMO[key]


def _q_bm25_topk(spark, t):
    """BM25 lexical top-k retrieval (extensions/retrieval.py): every
    101st document self-queries with its first 8 tokens; scores are the
    Lucene/Okapi formula over the shared whitespace-token discipline,
    ranked on the 6-dp-rounded score so the ordering replays exactly in
    the DuckDB twin."""
    return _bm25_cached(spark, t["documents"])


def _q_hybrid_rrf(spark, t):
    """Reciprocal-rank fusion of lexical and dense retrieval
    (extensions/retrieval.py rrf_fuse): the BM25 self-query ranking
    over documents fused with the exact-cosine ranking over the
    aligned embeddings (same every-101st query ids), k0=60 — the
    standard hybrid-RAG combiner, operating on ranks only so the two
    scorers' incomparable scales never meet."""
    from hama_spark.extensions import cosine_topk
    from hama_spark.extensions.retrieval import rrf_fuse

    lex = _bm25_cached(spark, t["documents"])
    emb = t["embeddings"]
    dense = cosine_topk(
        emb, emb.filter("vec_id % 101 = 0"), k=5
    ).select("query_id", F.col("vec_id").alias("doc_id"), "rank")
    return rrf_fuse([lex, dense], k0=60, topk=5)


def _q_scd2_orders(spark, t):
    """Type-2 SCD history (operators/incremental.py scd2_history) from
    a deterministic CDC changelog derived from orders: key =
    o_orderkey % 1000 (so keys carry many versions), seq = o_orderkey,
    ops split I/U/D by key residue. One shuffle on the key; both
    window passes share it."""
    from hama_spark.operators.incremental import scd2_history

    ch = t["orders"].select(
        (F.col("o_orderkey") % 1000).alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.round(F.col("o_totalprice"), 2).alias("price"),
        F.when(F.col("o_orderkey") % 97 == 0, "D")
        .when(F.col("o_orderkey") % 2 == 1, "U")
        .otherwise("I")
        .alias("op"),
        F.col("o_orderkey").alias("seq"),
    )
    return scd2_history(ch, keys=["k"])


def _q_link_prediction(spark, t):
    """Neighborhood-overlap link prediction (graph/linkpred.py) on the
    symmetrized supplier-part graph: top-25 vertex pairs by
    Adamic-Adar through degree-capped wedge centers — candidate
    generation cost is Σ deg(w)² over centers, never |V|²."""
    from hama_spark.graph.linkpred import link_prediction

    return link_prediction(
        _sym_sp_edges_cached(spark, t),
        max_neighbor_degree=64, min_common=2, topk=25, prepared=True,
    )


_FUZZY_MEMO: dict = {}


def _fuzzy_pairs_cached(spark, customer):
    """Blocked fuzzy customer pairs, materialized once per (session,
    table plan): fuzzy_match_customers and entity_clusters share the
    FastSS candidate generation + levenshtein verify."""
    from hama_spark.operators.linkage import blocked_fuzzy_pairs

    key = (spark.sparkContext.applicationId, customer.semanticHash())
    if key not in _FUZZY_MEMO:
        _FUZZY_MEMO.clear()  # single-entry memo, evict for GC
        _FUZZY_MEMO[key] = blocked_fuzzy_pairs(
            customer, "c_custkey", "c_name", ["c_nationkey"], max_distance=1
        ).localCheckpoint(eager=True)
    return _FUZZY_MEMO[key]


def _q_fuzzy_match_customers(spark, t):
    """Blocked fuzzy record linkage (operators/linkage.py): customer
    name pairs within one edit inside a nation block — candidate
    generation is an equi-join on the blocking key so the quadratic is
    fenced to Σ|block|², and the levenshtein predicate is a JVM
    built-in post-join filter."""
    return _fuzzy_pairs_cached(spark, t["customer"])


def _q_entity_clusters(spark, t):
    """Entity resolution (operators/linkage.py entity_clusters): the
    memoized fuzzy customer pairs collapse into entities via the
    distributed Pregel CC, labeling EVERY record with its canonical
    entity_id + cluster_size — the golden-record assignment."""
    from hama_spark.operators.linkage import entity_clusters

    cust = t["customer"]
    return entity_clusters(
        cust, _fuzzy_pairs_cached(spark, cust), "c_custkey"
    ).select("c_custkey", "entity_id", "cluster_size")


def _q_corpus_diff(spark, t):
    """Snapshot delta audit (extensions/corpus.py snapshot_diff): two
    deterministic snapshots are derived from the fixture corpus — the
    "old" run lacks every 7th doc, the "new" run lacks every 5th and
    rewrites every 11th — and each doc is classified
    added/removed/changed/unchanged via md5-fingerprint full outer
    join (texts never shuffle, only 16-byte fingerprints)."""
    from hama_spark.extensions.corpus import snapshot_diff

    docs = t["documents"]
    old = docs.filter(F.col("doc_id") % 7 != 0)
    new = docs.filter(F.col("doc_id") % 5 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 11 == 0, F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")),
    )
    return snapshot_diff(old, new)


# --- round-5 additions -------------------------------------------------
def _scc_edges(spark, t):
    """Deterministic directed fixture graph that one round of the SCC
    coloring algorithm settles: a 5-cycle over regions, a 12-cycle over
    the first 12 customers, nation->region spokes, and one
    customer->nation bridge. Identical at every sf (region/nation are
    fixed-size; custkeys 1..12 always exist)."""
    r = t["region"].select(
        F.concat(F.lit("r"), F.col("r_regionkey")).alias("src"),
        F.concat(F.lit("r"), (F.col("r_regionkey") + 1) % 5).alias("dst"),
    )
    n = t["nation"].select(
        F.concat(F.lit("n"), F.col("n_nationkey")).alias("src"),
        F.concat(F.lit("r"), F.col("n_regionkey")).alias("dst"),
    )
    c = t["customer"].filter(F.col("c_custkey") <= 12).select(
        F.concat(F.lit("c"), F.col("c_custkey")).alias("src"),
        F.concat(
            F.lit("c"),
            F.when(F.col("c_custkey") == 12, F.lit(1)).otherwise(
                F.col("c_custkey") + 1
            ),
        ).alias("dst"),
    )
    bridge = t["customer"].filter(F.col("c_custkey") == 1).select(
        F.concat(F.lit("c"), F.col("c_custkey")).alias("src"),
        F.lit("n1").alias("dst"),
    )
    return r.union(n).union(c).union(bridge)


def _q_scc(spark, t):
    """Directed strongly connected components (graph/scc.py, the
    forward-color / backward-collect coloring algorithm): two cycles +
    spokes resolve to two multi-vertex SCCs and 26 singletons; the
    oracle is the transitive-closure definition (mutual reachability,
    max-id label)."""
    from hama_spark.graph.scc import strongly_connected_components

    return strongly_connected_components(_scc_edges(spark, t))


def _q_graph_diameter(spark, t):
    """HyperBall neighborhood function (graph/diameter.py) in its EXACT
    regime — k=64 exceeds every ball on this 30-vertex graph (nation
    25-ring + nation->region spokes, symmetrized), so the KMV sketches
    never fill and the curve equals the exact BFS pair counts the
    recursive-CTE oracle computes."""
    from hama_spark.graph.diameter import neighborhood_function

    ring = t["nation"].select(
        F.concat(F.lit("n"), F.col("n_nationkey")).alias("src"),
        F.concat(F.lit("n"), (F.col("n_nationkey") + 1) % 25).alias("dst"),
    )
    spokes = t["nation"].select(
        F.concat(F.lit("n"), F.col("n_nationkey")).alias("src"),
        F.concat(F.lit("r"), F.col("n_regionkey")).alias("dst"),
    )
    return neighborhood_function(
        ring.union(spokes), max_r=20, k=64, seed=1, symmetrize=True
    )


def _q_interval_join(spark, t):
    """Point-in-interval containment join (operators/temporal.py):
    intervals explode to epoch buckets, points bucket once, and the
    match is a pure equi-join + exact containment filter — never the
    BroadcastNestedLoopJoin naive BETWEEN SQL produces. Points = every
    7th event; intervals = 40-minute windows opened by every 101st."""
    from hama_spark.operators.temporal import interval_join

    pts = t["events"].filter(F.col("event_id") % 7 == 0).select("event_id", "ts")
    ivl = t["events"].filter(F.col("event_id") % 101 == 0).select(
        F.col("event_id").alias("iid"),
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 40 MINUTES")).alias("end"),
    )
    out = interval_join(pts, ivl, bucket_secs=1800)
    return out.select("event_id", F.col("iid_r").alias("interval_id"))


def _q_kneser_ney(spark, t):
    """Interpolated Kneser-Ney bigram perplexity (extensions/lm.py):
    absolute discounting plus the continuation-probability backoff that
    distinguishes KN from add-k smoothing, trained and scored in one
    corpus pass."""
    from hama_spark.extensions.lm import kneser_ney_perplexity

    return kneser_ney_perplexity(t["documents"])


def _q_k_anonymity(spark, t):
    """k-anonymity audit summary (extensions/privacy.py): one groupBy
    over the quasi-identifier tuple with map-side partials, one summary
    row to the driver."""
    from hama_spark.extensions.privacy import k_anonymity_summary

    return k_anonymity_summary(
        t["customer"], ["c_nationkey", "c_mktsegment"], k=5
    )


def _q_l_diversity(spark, t):
    """l-diversity audit (extensions/privacy.py): quasi-identifier
    groups whose sensitive column shows fewer than l distinct real
    values (NULLs excluded — they provide no diversity)."""
    from hama_spark.extensions.privacy import l_diversity_report

    return l_diversity_report(t["customer"], ["c_nationkey"], "c_mktsegment", l=6)


def _q_select_under_budget(spark, t):
    """Token-budget corpus selection (extensions/sampling.py): strict
    deterministic-order prefix under a cumulative-weight cap via the
    two-phase per-slice window + broadcast offsets — never a
    single-partition global window."""
    from hama_spark.extensions.sampling import select_under_budget

    return select_under_budget(
        t["documents"].select("doc_id", "n_chars"),
        budget=40_000,
        weight_col="n_chars",
        order_cols=["n_chars", "doc_id"],
        descending=True,
    )


def _q_key_overlap(spark, t):
    """KMV key-overlap join pre-flight (functions/sketches.py): one
    sketch pass per side, no shuffle of the data; with k=4096 above
    both distinct counts at sf0.01 the sketches never fill, so every
    estimate is EXACT set algebra the oracle replays directly — and the
    ``exact`` output column plus the 4k auto-escalation (one-pass since
    r7: sketch once at 4k, slice back to k when unfilled) keep that
    true at sf0.1 too (the r5 selfcheck's one divergence)."""
    from hama_spark.functions.sketches import key_overlap_report

    a = t["orders"].filter(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_custkey").alias("k")
    )
    b = t["customer"].filter(F.col("c_custkey") % 3 != 0).select(
        F.col("c_custkey").alias("k")
    )
    return key_overlap_report(a, b, "k", k=4096)


def _q_length_buckets(spark, t):
    """Length-bucketed dynamic batching (extensions/sampling.py
    bucket_by_length): power-of-two pad buckets, seeded md5 order,
    fixed-capacity batch ids — the padding-waste fix, fully replayable
    in SQL."""
    from hama_spark.extensions.sampling import bucket_by_length

    docs = t["documents"].select("doc_id", F.length("text").alias("n_tokens"))
    return bucket_by_length(docs, batch_tokens=4096, token_col="n_tokens", seed=42)


QUERIES: dict[str, Callable] = {
    # Ordering note (round 6): the driver truncates its correctness
    # check at the first 50 dict entries, so the window holds (a) the
    # round-6-new queries — mat_ops (M6 dense-matrix chain) and the
    # O(log n) two-phase CC — (b) key_overlap, whose OUTPUT SCHEMA
    # changed this round (exact column + 4k auto-escalation), (c) every
    # pregel-backed query (plans/pregel.py gained dense mode +
    # recover_dir this round — init/loop restructure touches them all)
    # plus the kmeans/ivf family (ml/kmeans.py gained the DataFrame-
    # centers path) and the bloom-backed pair (functions/bloom.py
    # validation rework), and (d) as much of the r5 window as still
    # fits. Displaced entries (online_cf/gradient_descent — own loops,
    # untouched this round — and the r5-green-and-unmodified tail) keep
    # their green r5 rows and are re-verified by the full per-round
    # selfcheck.
    #
    # new in round 6
    "mat_ops": _q_mat_ops,
    # new in round 5
    "strongly_connected_components": _q_scc,
    "graph_diameter": _q_graph_diameter,
    "interval_join": _q_interval_join,
    "kneser_ney_perplexity": _q_kneser_ney,
    "k_anonymity": _q_k_anonymity,
    "l_diversity": _q_l_diversity,
    "select_under_budget": _q_select_under_budget,
    "key_overlap": _q_key_overlap,
    "length_buckets": _q_length_buckets,
    "bloom_decontaminate": _q_bloom_decontaminate,
    "knn_graph": _q_knn_graph,
    # displaced below the 50-boundary since r3, modified in r4 —
    # restored per VERDICT r4 §next.2
    "text_stats": _q_text_stats,
    "quality_score": _q_quality,
    "heuristic_flags": _q_heuristic_flags,
    # retained r4 window (bpe_train_merges before bpe_vocab_token_count:
    # the counting query reuses the memoized merge table; ann_recall
    # re-derives the three searchers it compares)
    "hits_scores": _q_hits_scores,
    "harmonic_centrality": _q_harmonic_centrality,
    "betweenness": _q_betweenness,
    "fuzzy_match_customers": _q_fuzzy_match_customers,
    "entity_clusters": _q_entity_clusters,
    "bpe_train_merges": _q_bpe_train_merges,
    "bpe_vocab_token_count": _q_bpe_vocab_token_count,
    "ann_recall": _q_ann_recall,
    "cosine_topk": _q_cosine_topk,
    "lsh_cosine_topk": _q_lsh_topk,
    "ivf_topk": _q_ivf_topk,
    "kmeans_sizes": _q_kmeans,
    # shared_span_pairs before scrub_shared_spans: the removal reuses
    # the memoized cross-document shingle relation
    "shared_span_pairs": _q_shared_span_pairs,
    "scrub_shared_spans": _q_scrub_shared_spans,
    "inlink_count": _q_inlink,
    "sssp": _q_sssp,
    "connected_components": _q_cc,
    "connected_components_twophase": _q_cc_twophase,
    "pagerank": _q_pagerank,
    "dynamic_sum": _q_dynamic_sum,
    "kcore": _q_kcore,
    "bipartite_matching": _q_bipartite_matching,
    "semi_clustering": _q_semi_clustering,
    "pagerank_gen_100k": _q_pagerank_gen,
    "sssp_gen_100k": _q_sssp_gen,
    "personalized_pagerank": _q_personalized_pagerank,
    "random_walks": _q_random_walks,
    "label_communities": _q_label_communities,
    # minhash_lsh_pairs before dedup_near: the cluster-collapse query
    # reuses the memoized LSH pairs, so in-order runs price the
    # signature pipeline once (in the pairs query) and dedup_near shows
    # the connected-components cost alone; same memo pattern for
    # lsh_cosine_pairs/dedup_embedding and semantic pairs/dedup.
    "minhash_lsh_pairs": _q_minhash_lsh,
    "dedup_near": _q_dedup_near,
    "lsh_cosine_pairs": _q_lsh_cosine_pairs,
    "dedup_embedding": _q_dedup_embedding,
    "semantic_dup_pairs": _q_semantic_dup_pairs,
    "semantic_dedup": _q_semantic_dedup,
    "online_cf_topk": _q_online_cf,
    # ---- driver window boundary (entry 50 above this line) ----------
    # Everything below holds a green row (r2, r3 or r4) on code
    # unchanged since, re-verified per round by the full-inventory
    # selfcheck (SELFCHECK_r05.json, all queries hash-match at sf0.01;
    # SELFCHECK_r05_sf01.json repeats the full pass at sf0.1).
    # Displaced r4-window refresh slots (fresh r4 rows, code untouched
    # in r5): quality_classifier and importance_weights (displaced for
    # the new bloom_decontaminate and knn_graph rows), nb_lang_confusion,
    # bm25_topk, hybrid_rrf, scd2_orders, link_prediction, corpus_diff,
    # hard_negatives, scrub_boilerplate, bpe_top_tokens, bpe_fertility,
    # corpus_stats, value_quantiles. Displaced r6: the two gradient
    # descent queries (green r2-r5 rows, ml/gradient_descent.py untouched
    # since) — they sat at positions 51-52 while the marker claimed 50,
    # i.e. OUTSIDE the driver's real truncation window.
    "gradient_descent_linear": _q_gd,
    "gradient_descent_logistic": _q_gd_logistic,
    "importance_weights": _q_importance_weights,
    "quality_classifier": _q_quality_classifier,
    "nb_lang_confusion": _q_nb_confusion,
    "bm25_topk": _q_bm25_topk,
    "hybrid_rrf": _q_hybrid_rrf,
    "scd2_orders": _q_scd2_orders,
    "link_prediction": _q_link_prediction,
    "corpus_diff": _q_corpus_diff,
    "bpe_top_tokens": _q_bpe_top_tokens,
    "bpe_fertility": _q_bpe_fertility,
    "hard_negatives": _q_hard_negatives,
    "scrub_boilerplate": _q_scrub_boilerplate,
    "value_quantiles": _q_value_quantiles,
    "corpus_stats": _q_corpus_stats,
    "triangle_count": _q_triangles,
    "randbench": _q_randbench,
    "spmv": _q_spmv,
    "matmul": _q_matmul,
    "override_join": _q_override_join,
    "agg_lineitem": _q_agg_lineitem,
    "revenue_by_nation": _q_revenue_by_nation,
    "pi_estimate": _q_pi,
    # everything below holds a green r2/r3 row on unchanged code
    "inner_join": _q_inner_join,
    "full_outer_join": _q_full_outer_join,
    "top_customers": _q_top_customers,
    "events_window": _q_events_window,
    "events_sliding": _q_events_sliding,
    "events_enriched": _q_events_enriched,
    "asof_purchase_click": _q_asof_purchase_click,
    "band_error_counts": _q_band_error_counts,
    "events_props": _q_events_props,
    "events_dedup_hourly": _q_events_dedup_hourly,
    "token_count": _q_token_count,
    "bpe_token_count": _q_bpe_token_count,
    "lang_id": _q_lang_id,
    "doc_fingerprint": _q_fingerprint,
    "winnow_fingerprints": _q_winnow,
    "tfidf_top_terms": _q_tfidf_top_terms,
    "top_ngrams": _q_top_ngrams,
    "repetition_stats": _q_repetition_stats,
    "pii_scrub": _q_pii_scrub,
    "events_rollup": _q_events_rollup,
    "event_transitions": _q_event_transitions,
    "retention_cohorts": _q_retention_cohorts,
    "seeded_sample": _q_seeded_sample,
    "stratified_sample": _q_stratified_sample,
    "sessionize": _q_sessionize,
    "global_shuffle": _q_global_shuffle,
    "pack_sequences": _q_pack_sequences,
    "interleave_mix": _q_interleave_mix,
    "dedup_exact": _q_dedup_exact,
    "ngram_jaccard_pairs": _q_ngram_jaccard,
    "simhash_pairs": _q_simhash,
    "embedding_cosine_pairs": _q_embedding_dups,
    "embedding_normalize": _q_embedding_normalize,
    "embedding_project": _q_embedding_project,
    "embedding_quantize": _q_embedding_quantize,
    "image_features": _q_image_features,
    "audio_features": _q_audio_features,
    "video_frames": _q_video_frames,
    "spmv_sparse": _q_sparse_spmv,
    "composite_join_3way": _q_composite_join_3way,
    "decontaminate": _q_decontaminate,
    "domain_mix": _q_domain_mix,
    "line_dedup": _q_line_dedup,
    "chunk_docs": _q_chunk_docs,
    "dedup_incremental": _q_dedup_incremental,
    "token_entropy": _q_token_entropy,
    "domain_cap": _q_domain_cap,
    "rolling_user_stats": _q_rolling_user_stats,
    "events_topk_hourly": _q_events_topk_hourly,
    "degree_histogram": _q_degree_histogram,
    "sample_balanced": _q_sample_balanced,
    "bigram_perplexity": _q_bigram_perplexity,
    "perplexity_buckets": _q_perplexity_buckets,
    "split_dataset": _q_split_dataset,
    "pmi_top_pairs": _q_pmi_top_pairs,
    "hybrid_search": _q_hybrid_search,
    "domain_divergence": _q_domain_divergence,
    "data_quality": _q_data_quality,
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _q(fn) for name, fn in QUERIES.items()}


def _evict_topk_method(method: str) -> Callable[[], None]:
    """Evict one searcher's _TOPK_MEMO entries (and, for ivf-family
    methods, the shared trained-cells entry so a repeat prices the
    k-means training too)."""
    def _evict() -> None:
        drop = [
            k for k in _TOPK_MEMO
            if k[2] == method
            or (method in ("ivf", "hard_negatives") and k[2] == "_cells")
        ]
        for k in drop:
            del _TOPK_MEMO[k]
    return _evict


def bench_memo_resets() -> dict[str, Callable[[], None]]:
    """Query name -> zero-arg callable that evicts the memo THAT query
    populates. bench.py min-of-N calls the reset BETWEEN repeat runs of
    a memo-producing query, so a repeat re-prices the full pipeline
    instead of timing a memo hit (~0s, which would corrupt the min).
    The LAST repeat repopulates the memo, so downstream consumer
    queries (dedup_near, scrub_shared_spans, entity_clusters, ...)
    still ride a warm memo exactly as in a single-run bench. Consumers
    themselves need no reset: every one of their repeats does the same
    post-memo work. _SYM_EDGES_MEMO is deliberately absent — it is
    shared prep across the iterative graph block (already min-of-N
    since r6) and evicting it would change what those rows have
    measured since BENCH_r06."""
    return {
        "minhash_lsh_pairs": _LSH_MEMO.clear,
        "lsh_cosine_pairs": _EMB_PAIRS_MEMO.clear,
        "semantic_dup_pairs": _SEM_PAIRS_MEMO.clear,
        "bpe_train_merges": _BPE_MEMO.clear,
        "shared_span_pairs": _SPAN_MEMO.clear,
        "fuzzy_match_customers": _FUZZY_MEMO.clear,
        "bm25_topk": _BM25_MEMO.clear,
        "cosine_topk": _evict_topk_method("cosine"),
        "lsh_cosine_topk": _evict_topk_method("lsh"),
        "ivf_topk": _evict_topk_method("ivf"),
        "hard_negatives": _evict_topk_method("hard_negatives"),
        # ann_recall runs BEFORE the standalone searcher queries in dict
        # order (deliberate: it prices the three builders, they read its
        # memos) — so on repeat it must evict everything it built, or
        # min-of-N times a memo ride (observed: 13.8s -> 1.16s)
        "ann_recall": _evict_all_topk,
    }


def _evict_all_topk() -> None:
    _TOPK_MEMO.clear()


_BM25_TOPK_SQL = r"""
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
              FROM documents),
            tf AS MATERIALIZED (
              SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
            dl AS MATERIALIZED (
              SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
            dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
            stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
            qterms AS (
              SELECT DISTINCT query_id, term FROM (
                SELECT doc_id AS query_id,
                       unnest(list_slice(
                         regexp_split_to_array(trim(lower(text)), '\s+'),
                         1, 8)) AS term
                FROM documents WHERE doc_id % 101 = 0)
              WHERE term <> ''),
            scored AS (
              SELECT q.query_id, tf.doc_id,
                     round(sum( ln(1 + (n_docs - df + 0.5) / (df + 0.5))
                          * tf * (1.2 + 1)
                          / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)) ),
                       6) AS score
              FROM qterms q JOIN tf USING (term) JOIN dl USING (doc_id)
                   JOIN dfq ON dfq.term = tf.term CROSS JOIN stats
              GROUP BY 1, 2),
            ranked AS (
              SELECT query_id, doc_id, score,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY score DESC, doc_id ASC) AS rank
              FROM scored)
            SELECT query_id, doc_id, score, rank FROM ranked WHERE rank <= 5
        """


def _hybrid_rrf_sql() -> str:
    """RRF replay (extensions/retrieval.py rrf_fuse): the two component
    rankings are the EXACT bm25_topk and cosine_topk oracle programs
    (embedded as subqueries so the twins can never drift), fused with
    1/(60+rank) and re-ranked on the 9-dp-rounded sum."""
    return f"""
        WITH lex AS MATERIALIZED (
          SELECT query_id, doc_id, rank FROM ({_BM25_TOPK_SQL})),
        dense AS MATERIALIZED (
          SELECT query_id, vec_id AS doc_id, rank
          FROM ({_COSINE_TOPK_SQL.replace("q.vec_id < 5", "q.vec_id % 101 = 0")})
          WHERE rank <= 5),
        u AS (SELECT * FROM lex UNION ALL SELECT * FROM dense),
        fused AS (
          SELECT query_id, doc_id,
                 round(sum(1.0 / (60 + rank)), 9) AS rrf_score,
                 count(*) AS n_lists
          FROM u GROUP BY 1, 2),
        rk AS (
          SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY rrf_score DESC, doc_id) AS rank
          FROM fused)
        SELECT query_id, doc_id, rrf_score, n_lists, rank FROM rk WHERE rank <= 5
    """


def oracle_sql() -> dict[str, str]:
    """DuckDB twins — one per queries() entry. Iterative and
    seeded operators are covered by full SQL replays of their exact
    deterministic schedules (md5 hash streams, unrolled/recursive
    supersteps), so every query is value-hash-checked, not just
    row-counted."""
    d = _oracle_sql_literal()
    # two algorithms, one contract: star contraction must produce the
    # SAME (id, min-id component) labels as min-label propagation
    d["connected_components_twophase"] = d["connected_components"]
    return d


def _oracle_sql_literal() -> dict[str, str]:
    return {
        # --- round-5 additions ----------------------------------------
        # SCC by its defining property: scc(v) = max id u with v ->* u
        # AND u ->* v (self included) over the transitive closure of
        # the fixture graph — engine-independent ground truth, not a
        # replay of the coloring schedule.
        "strongly_connected_components": """
            WITH RECURSIVE edges AS (
              SELECT 'r' || r_regionkey AS src,
                     'r' || ((r_regionkey + 1) % 5) AS dst FROM region
              UNION ALL
              SELECT 'n' || n_nationkey, 'r' || n_regionkey FROM nation
              UNION ALL
              SELECT 'c' || c_custkey,
                     'c' || (CASE WHEN c_custkey = 12 THEN 1
                                  ELSE c_custkey + 1 END)
              FROM customer WHERE c_custkey <= 12
              UNION ALL
              SELECT 'c1', 'n1' FROM customer WHERE c_custkey = 1
            ),
            reach(a, b) AS (
              SELECT src, dst FROM edges
              UNION
              SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b
            ),
            verts AS (SELECT DISTINCT src AS id FROM edges
                      UNION SELECT DISTINCT dst FROM edges),
            mutual AS (
              SELECT r1.a AS v, r1.b AS u
              FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a)
            SELECT v.id, greatest(v.id, coalesce(max(m.u), v.id)) AS scc
            FROM verts v LEFT JOIN mutual m ON m.v = v.id
            GROUP BY v.id
        """,
        # exact-regime HyperBall == exact BFS pair counts: min-distance
        # closure via a bounded recursive walk, then N(r) per radius up
        # to the true (max finite distance) diameter
        "graph_diameter": """
            WITH RECURSIVE base AS (
              SELECT 'n' || n_nationkey AS src,
                     'n' || ((n_nationkey + 1) % 25) AS dst FROM nation
              UNION ALL
              SELECT 'n' || n_nationkey, 'r' || n_regionkey FROM nation
            ),
            edges AS (SELECT src, dst FROM base
                      UNION SELECT dst, src FROM base),
            verts AS (SELECT DISTINCT src AS id FROM edges),
            walk(a, b, d) AS (
              SELECT id, id, 0 FROM verts
              UNION
              SELECT w.a, e.dst, w.d + 1
              FROM walk w JOIN edges e ON e.src = w.b WHERE w.d < 20
            ),
            mind AS (SELECT a, b, min(d) AS d FROM walk GROUP BY 1, 2),
            rs AS (SELECT unnest(range(0, (SELECT max(d) + 1 FROM mind))) AS r)
            SELECT r::INT AS r,
                   (SELECT count(*) FROM mind WHERE d <= rs.r)::DOUBLE
                     AS reachable_pairs
            FROM rs
        """,
        "interval_join": """
            WITH pts AS (
              SELECT event_id, ts FROM events WHERE event_id % 7 = 0),
            ivl AS (
              SELECT event_id AS iid, ts AS s, ts + INTERVAL 40 MINUTE AS e
              FROM events WHERE event_id % 101 = 0)
            SELECT p.event_id, i.iid AS interval_id
            FROM pts p JOIN ivl i ON p.ts >= i.s AND p.ts <= i.e
        """,
        # interpolated KN bigram model: same tokenization, same 0.75
        # discount, same continuation counts (extensions/lm.py)
        "kneser_ney_perplexity": r"""
            WITH t AS (
              SELECT doc_id AS id,
                     regexp_split_to_array(trim(lower(text)), '\s+') AS toks
              FROM documents),
            bg AS MATERIALIZED (
              SELECT id, toks[i] AS w1, toks[i + 1] AS w2
              FROM t, unnest(generate_series(1, len(toks) - 1)) AS g(i)
              WHERE len(toks) >= 2),
            big AS MATERIALIZED (
              SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
            ctx AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
                           count(*) AS n1p_fwd FROM big GROUP BY 1),
            cont AS (SELECT w2, count(*) AS n1p_back FROM big GROUP BY 1),
            types AS (SELECT count(*) AS n_types FROM big),
            scored AS (
              SELECT bg.id,
                     ln(greatest(c12 - 0.75, 0) / c1
                        + 0.75 * n1p_fwd / c1 * (n1p_back / n_types)) AS lp
              FROM bg JOIN big USING (w1, w2) JOIN ctx USING (w1)
                   JOIN cont USING (w2) CROSS JOIN types)
            SELECT id AS doc_id, count(*) AS n_bigrams,
                   round(avg(lp), 6) AS avg_logp,
                   round(exp(-avg(lp)), 6) AS ppl
            FROM scored GROUP BY id
        """,
        "k_anonymity": """
            WITH g AS (
              SELECT count(*)::BIGINT AS n FROM customer
              GROUP BY c_nationkey, c_mktsegment)
            SELECT 5 AS k, count(*)::BIGINT AS n_groups,
                   sum(CASE WHEN n < 5 THEN 1 ELSE 0 END)::BIGINT
                     AS n_violating_groups,
                   sum(n)::BIGINT AS n_rows,
                   sum(CASE WHEN n < 5 THEN n ELSE 0 END)::BIGINT
                     AS n_violating_rows,
                   min(n)::BIGINT AS min_group_size
            FROM g
        """,
        "l_diversity": """
            SELECT c_nationkey, count(*)::BIGINT AS n_rows,
                   count(DISTINCT c_mktsegment)::BIGINT AS n_sensitive
            FROM customer GROUP BY 1
            HAVING count(DISTINCT c_mktsegment) < 6
        """,
        "select_under_budget": """
            SELECT doc_id, n_chars,
                   sum(n_chars) OVER (ORDER BY n_chars DESC, doc_id DESC
                     ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_weight
            FROM documents
            QUALIFY cum_weight <= 40000
        """,
        # unfilled KMV sketches (k=4096 > both distinct counts) make
        # every report field exact set algebra; the float pipeline
        # (i/u, then * u) is replayed operation-for-operation so IEEE
        # rounding agrees bit-for-bit
        "key_overlap": """
            WITH A AS (SELECT DISTINCT o_custkey AS v FROM orders
                       WHERE o_orderkey % 2 = 0),
            B AS (SELECT DISTINCT c_custkey AS v FROM customer
                  WHERE c_custkey % 3 <> 0),
            s AS (SELECT (SELECT count(*) FROM A)::DOUBLE AS da,
                         (SELECT count(*) FROM B)::DOUBLE AS db,
                         (SELECT count(*) FROM A JOIN B USING (v))::DOUBLE AS i,
                         (SELECT count(*) FROM
                            (SELECT v FROM A UNION SELECT v FROM B))::DOUBLE AS u)
            SELECT round(da, 2) AS distinct_a_est,
                   round(db, 2) AS distinct_b_est,
                   round((i / u) * u, 2) AS intersect_est,
                   round(i / u, 6) AS jaccard_est,
                   round(least((i / u) * u / da, 1.0), 6) AS containment_a_in_b,
                   round(least((i / u) * u / db, 1.0), 6) AS containment_b_in_a,
                   TRUE AS exact
            FROM s
        """,
        "length_buckets": """
            WITH d AS (
              SELECT doc_id, length(text) AS n_tokens,
                     CAST(ceil(log2(greatest(length(text), 1))) AS INT) AS lb,
                     ('0x' || substr(md5('42:' || doc_id), 1, 12))::BIGINT AS h
              FROM documents),
            p AS (
              SELECT *, row_number() OVER (
                PARTITION BY lb ORDER BY h % 64, h, doc_id) AS pos_in_bucket
              FROM d)
            SELECT doc_id, n_tokens, lb AS length_bucket,
                   CAST(power(2, lb) AS BIGINT) AS pad_len,
                   CAST(pos_in_bucket AS BIGINT) AS pos_in_bucket,
                   'b' || lb || '_' ||
                     CAST(floor((pos_in_bucket - 1) /
                       greatest(floor(4096 / power(2, lb)), 1)) AS BIGINT)
                     AS batch_id
            FROM p
        """,
        "inlink_count": f"""
            WITH e AS ({SP_EDGES_SQL}),
            v AS (SELECT DISTINCT src AS id FROM e UNION SELECT DISTINCT dst FROM e),
            c AS (SELECT dst AS id, count(*) AS inlinks FROM e GROUP BY dst)
            SELECT v.id, CAST(coalesce(c.inlinks, 0) AS BIGINT) AS inlinks
            FROM v LEFT JOIN c ON c.id = v.id
        """,
        "sssp": _bellman_ford_sql(NATION_DAG_SQL, "0", 25),
        "connected_components": """
            WITH m AS (SELECT c_nationkey AS k,
                              least('n' || CAST(c_nationkey AS VARCHAR),
                                    min('c' || CAST(c_custkey AS VARCHAR))) AS comp
                       FROM customer GROUP BY c_nationkey)
            SELECT 'c' || CAST(c_custkey AS VARCHAR) AS id, m.comp AS component
            FROM customer JOIN m ON m.k = c_nationkey
            UNION ALL
            SELECT 'n' || CAST(k AS VARCHAR), comp FROM m
        """,
        "hits_scores": _hits_sql(SP_EDGES_SQL, 5),
        "harmonic_centrality": _harmonic_sql(SP_EDGES_SQL, 8, 4, 42),
        "betweenness": _betweenness_sql(SP_EDGES_SQL, 4, 3, 42),
        "nb_lang_confusion": _nb_confusion_sql("lang"),
        "pagerank": _pagerank_sql(PR_EDGES_SQL, 25, 10),
        "personalized_pagerank": _ppr_sql(PR_EDGES_SQL, "0", 10),
        "random_walks": _walks_sql(PR_EDGES_SQL, 8, 42),
        "pagerank_gen_100k": f"""
            SELECT CAST(count(*) AS BIGINT) AS n_vertices,
                   round(sum(rank), 2) AS sum_rank
            FROM ({_pagerank_sql(_gen_edges_sql(GEN_N, 3, 42), GEN_N, 5)})
        """,
        "sssp_gen_100k": _sssp_gen_sql(GEN_N, 3, 7, 100, 50),
        "kcore": _kcore_sql(SP_EDGES_SQL),
        "bipartite_matching": _matching_sql(SP_EDGES_SQL, 42, MATCH_ROUNDS),
        "semi_clustering": _semi_clustering_sql(NATION_DAG_SQL),
        "triangle_count": f"""
            WITH e0 AS (
              SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
              FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
              WHERE a.l_partkey < b.l_partkey
                AND a.l_orderkey % 5 = 0),
            base AS (SELECT src, dst FROM e0 WHERE src <> dst),
            sym AS (SELECT src, dst FROM base
                    UNION SELECT dst AS src, src AS dst FROM base),
            deg AS (SELECT src AS id, count(*) AS deg FROM sym GROUP BY 1),
            e AS (SELECT s.src, s.dst, dd.deg AS dd
                  FROM sym s
                  JOIN deg ds ON ds.id = s.src
                  JOIN deg dd ON dd.id = s.dst
                  WHERE ds.deg < dd.deg
                     OR (ds.deg = dd.deg AND s.src < s.dst)),
            tri AS (SELECT a.u, a.v, b.w
                    FROM (SELECT src AS u, dst AS v, dd AS dv FROM e) a
                    JOIN (SELECT src AS u, dst AS w, dd AS dw FROM e) b USING (u)
                    JOIN (SELECT src AS v, dst AS w FROM e) c
                      ON c.v = a.v AND c.w = b.w
                    WHERE a.dv < b.dw OR (a.dv = b.dw AND a.v < b.w)),
            pv AS (SELECT id, count(*) AS triangles FROM (
                     SELECT u AS id FROM tri
                     UNION ALL SELECT v FROM tri
                     UNION ALL SELECT w FROM tri) x
                   GROUP BY 1)
            SELECT d.id, CAST(d.deg AS BIGINT) AS degree,
                   CAST(coalesce(pv.triangles, 0) AS BIGINT) AS triangles,
                   CASE WHEN d.deg >= 2
                        THEN round(2.0 * coalesce(pv.triangles, 0)
                                   / (d.deg * (d.deg - 1)), 9)
                        ELSE 0.0 END AS lcc
            FROM deg d LEFT JOIN pv ON pv.id = d.id
        """,
        "randbench": f"""
            SELECT (('0x' || substr(md5(CAST(s.s AS VARCHAR) || ':' ||
                       CAST(i.i AS VARCHAR) || ':42'), 1, 8))::BIGINT
                    % {RB_PEERS}) AS peer,
                   CAST(count(*) AS BIGINT) AS n_received,
                   CAST(count(*) * {RB_SIZE} AS BIGINT) AS bytes_received
            FROM range({RB_STEPS}) s(s), range({RB_MSGS}) i(i)
            GROUP BY 1
        """,
        "matmul": """
            WITH cells AS (
              SELECT l_linenumber AS r, l_partkey % 8 AS j, sum(l_quantity) AS v
              FROM lineitem GROUP BY 1, 2
            )
            SELECT a.r AS row, b.r AS col, round(sum(a.v * b.v), 4) AS value
            FROM cells a JOIN cells b ON a.j = b.j
            GROUP BY a.r, b.r
        """,
        "mat_ops": """
            WITH cells AS (
              SELECT l_linenumber AS r, l_partkey % 8 AS j,
                     sum(l_quantity) AS qty, count(*) AS cnt
              FROM lineitem GROUP BY 1, 2
            ),
            dense AS (
              SELECT rr.r, jj.j,
                     coalesce(c.qty, 0.0) AS a,
                     coalesce(c.cnt, 0) + jj.j + 1.0 AS b
              FROM (SELECT DISTINCT l_linenumber AS r FROM lineitem) rr
              CROSS JOIN (SELECT unnest(range(8)) AS j) jj
              LEFT JOIN cells c ON c.r = rr.r AND c.j = jj.j
            )
            SELECT CAST(r - 2 AS INT) AS row, CAST(j - 1 AS INT) AS col,
                   round(50.0 - least((0.5 * a + b) / (j + 1), 100.0), 6) AS value
            FROM dense WHERE r >= 2 AND r < 8 AND j >= 1 AND j < 5
        """,
        "dynamic_sum": """
            SELECT 'sum' AS vertex,
                   CAST(sum(l_linenumber) + count(*) AS BIGINT) AS value
            FROM lineitem
        """,
        "spmv": f"""
            WITH v AS ({SPMV_VEC_SQL})
            SELECT l_suppkey AS row,
                   round(sum(l_quantity * v.value), 6) AS value
            FROM lineitem JOIN v ON v.pos = l_partkey % 64
            GROUP BY l_suppkey
        """,
        # key-ascending list folds mirror the svec kernels' sorted-entry
        # aggregation; all terms are exact binary doubles (integer sums,
        # half-integer weights) so the hashes are order-stable
        "spmv_sparse": """
            WITH cells AS (
              SELECT l_suppkey AS row,
                     CAST(l_partkey % 64 AS INT) AS k,
                     CAST(sum(l_quantity) AS DOUBLE) AS v
              FROM lineitem GROUP BY 1, 2
            )
            SELECT row,
                   CAST(count(*) AS INT) AS nnz,
                   round(list_aggregate(list(v ORDER BY k), 'sum'), 6) AS sv_sum,
                   round(sqrt(list_aggregate(list(v * v ORDER BY k), 'sum')), 6)
                     AS sv_norm2,
                   round(coalesce(list_aggregate(
                       list(v * ((k % 7) + 1) / 2.0 ORDER BY k)
                         FILTER (WHERE k % 2 = 0),
                       'sum'), 0.0), 6) AS y
            FROM cells GROUP BY row
        """,
        "composite_join_3way": """
            SELECT n.k, n.n_name, c.n_cust, c.cust_bal, s.n_supp
            FROM (SELECT n_nationkey AS k, n_name FROM nation) n
            JOIN (SELECT c_nationkey AS k,
                         CAST(count(*) AS BIGINT) AS n_cust,
                         round(sum(c_acctbal), 2) AS cust_bal
                  FROM customer GROUP BY 1) c USING (k)
            JOIN (SELECT s_nationkey AS k,
                         CAST(count(*) AS BIGINT) AS n_supp
                  FROM supplier GROUP BY 1) s USING (k)
        """,
        "gradient_descent_linear": _gd_linear_sql(),
        "gradient_descent_logistic": _gd_logistic_sql(),
        "kmeans_sizes": _kmeans_sql(),
        "online_cf_topk": _online_cf_sql(),
        "pi_estimate": """
            WITH s AS (
              SELECT (('0x' || substr(md5(CAST(i AS VARCHAR) || ':42'), 1, 13))::BIGINT
                      / 4503599627370496.0) * 2 - 1 AS x,
                     (('0x' || substr(md5(CAST(i AS VARCHAR) || ':43'), 1, 13))::BIGINT
                      / 4503599627370496.0) * 2 - 1 AS y
              FROM range(100000) r(i))
            SELECT 4.0 * sum(CASE WHEN x*x + y*y <= 1.0 THEN 1 ELSE 0 END)
                   / 100000.0 AS pi
            FROM s
        """,
        "inner_join": """
            SELECT c_custkey AS k, c_name, o_orderkey, round(o_totalprice, 2) AS o_totalprice
            FROM customer JOIN orders ON c_custkey = o_custkey
        """,
        "full_outer_join": """
            SELECT coalesce(p.k, l.k) AS k, p.p_name, l.cnt
            FROM (SELECT p_partkey AS k, p_name FROM part) p
            FULL OUTER JOIN (SELECT l_partkey AS k, count(*) AS cnt
                             FROM lineitem GROUP BY 1) l ON p.k = l.k
        """,
        "override_join": """
            SELECT p_partkey AS k,
                   CASE WHEN p_partkey % 3 = 0 THEN round(p_retailprice * 0.5, 2)
                        ELSE p_retailprice END AS price
            FROM part
        """,
        "agg_lineitem": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_discount), 6) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "revenue_by_nation": """
            SELECT n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   count(*) AS n_items
            FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "top_customers": """
            WITH rev AS (SELECT o_custkey, round(sum(o_totalprice), 2) AS revenue
                         FROM orders GROUP BY o_custkey)
            SELECT c_mktsegment, c_custkey AS custkey, revenue, rnk
            FROM (SELECT c_mktsegment, c_custkey, revenue,
                         row_number() OVER (PARTITION BY c_mktsegment
                                            ORDER BY revenue DESC, c_custkey) AS rnk
                  FROM rev JOIN customer ON o_custkey = c_custkey)
            WHERE rnk <= 5
        """,
        "events_window": """
            SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S') AS window_start,
                   event_type,
                   count(*) AS n_events,
                   round(sum(value), 6) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "events_enriched": """
            SELECT c_mktsegment,
                   count(*) AS n_events,
                   round(sum(value), 6) AS sum_value
            FROM events e LEFT JOIN customer c ON c.c_custkey = e.user_id
            GROUP BY c_mktsegment
        """,
        "events_props": """
            SELECT event_type,
                   count(*) AS n_events,
                   CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
                   round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 6) AS avg_k
            FROM events GROUP BY event_type
        """,
        "events_dedup_hourly": """
            SELECT user_id, event_type,
                   strftime(w, '%Y-%m-%d %H:%M:%S') AS window_start,
                   event_id,
                   n_in_window
            FROM (SELECT user_id, event_type, event_id,
                         time_bucket(INTERVAL 1 HOUR, ts) AS w,
                         row_number() OVER (
                           PARTITION BY user_id, event_type, time_bucket(INTERVAL 1 HOUR, ts)
                           ORDER BY ts, event_id) AS rn,
                         count(*) OVER (
                           PARTITION BY user_id, event_type, time_bucket(INTERVAL 1 HOUR, ts)
                         ) AS n_in_window
                  FROM events)
            WHERE rn = 1
        """,
        # as-of join: LATERAL top-1 subquery is the executable spec of
        # "latest click strictly before the purchase" (DuckDB's ASOF
        # JOIN has the same semantics; LATERAL pins the tie-break)
        "asof_purchase_click": """
            SELECT l.event_id, l.user_id, r.click_id, r.click_value,
                   CASE WHEN r.click_ts IS NULL THEN NULL
                        ELSE epoch_us(l.ts) - epoch_us(r.click_ts) END
                     AS micros_since_click
            FROM (SELECT user_id, event_id, ts FROM events
                  WHERE event_type = 'purchase') l
            LEFT JOIN LATERAL (
              SELECT e.event_id AS click_id, e.ts AS click_ts,
                     e.value AS click_value
              FROM events e
              WHERE e.user_id = l.user_id AND e.event_type = 'click'
                AND e.ts < l.ts
              ORDER BY e.ts DESC, e.event_id DESC LIMIT 1
            ) r ON true
        """,
        "band_error_counts": """
            SELECT a.event_id,
                   count(b.event_id) AS n_errors_5m,
                   coalesce(sum(b.event_id), 0)::BIGINT AS sum_err_id
            FROM (SELECT event_id, ts FROM events WHERE event_type = 'purchase') a
            LEFT JOIN (SELECT event_id, ts FROM events WHERE event_type = 'error') b
              ON b.ts BETWEEN a.ts - INTERVAL 300 SECONDS
                          AND a.ts + INTERVAL 300 SECONDS
            GROUP BY a.event_id
        """,
        # sliding 2h/1h: an event belongs to the 2 hourly-aligned windows
        # starting at bucket(ts) and bucket(ts)-1h
        "events_sliding": """
            SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts) - (k.k * INTERVAL 1 HOUR),
                            '%Y-%m-%d %H:%M:%S') AS window_start,
                   event_type,
                   count(*) AS n_events,
                   round(sum(value), 6) AS sum_value
            FROM events, range(2) k(k)
            GROUP BY 1, 2
        """,
        "sessionize": """
            WITH brk AS (
              SELECT user_id, ts,
                     CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 30*60*1000000
                          OR lag(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS b
              FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), sid AS (
              SELECT user_id, ts,
                     -- CAST: DuckDB widens this window sum to HUGEINT, which the
                     -- driver's Arrow->pandas path renders as float64 and breaks
                     -- the value hash against Spark's bigint (r2's only red row)
                     CAST(sum(b) OVER (PARTITION BY user_id ORDER BY ts) AS BIGINT)
                       AS session_id
              FROM brk)
            SELECT user_id, session_id,
                   strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
                   count(*) AS n_events
            FROM sid GROUP BY user_id, session_id
        """,
        "token_count": f"SELECT doc_id, len({_TOKS_SQL}) AS n_tokens FROM documents",
        "bpe_token_count": _bpe_token_count_sql(),
        "bpe_train_merges": _bpe_merges_sql(),
        "bpe_vocab_token_count": _bpe_vocab_count_sql(),
        "bpe_top_tokens": _bpe_top_tokens_sql(),
        "bpe_fertility": _bpe_fertility_sql(),
        "shared_span_pairs": _shared_span_pairs_sql(
            _SPAN_SHINGLE_K, _SPAN_MIN_SHARED, _SPAN_MAX_DF
        ),
        "scrub_shared_spans": _scrub_shared_spans_sql(_SPAN_SHINGLE_K, _SPAN_MAX_DF),
        "scrub_boilerplate": _scrub_shared_spans_sql(
            _SPAN_SHINGLE_K, None, _BOILER_MIN_DF
        ),
        "text_stats": f"""
            SELECT doc_id,
                   length(text) AS n_chars,
                   len({_TOKS_SQL}) AS n_tokens,
                   length(text) * 1.0 / len({_TOKS_SQL}) AS avg_token_len,
                   length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) * 1.0 / length(text) AS alnum_ratio,
                   length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0 / length(text) AS digit_ratio,
                   {_stopword_count_sql()} * 1.0 / len({_TOKS_SQL}) AS stopword_ratio
            FROM documents
        """,
        "quality_score": f"""
            SELECT doc_id, {_quality_expr_sql()} AS quality
            FROM documents
        """,
        "lang_id": _lang_id_sql(),
        "doc_fingerprint": "SELECT doc_id, md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp FROM documents",
        # winnowing (k=5 char grams, w=4 windows): hash every k-gram,
        # min per sliding window, distinct mins per doc, then the same
        # count/min/max/sum summary the Spark query computes
        "winnow_fingerprints": r"""
            WITH n AS (
              SELECT doc_id,
                     lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS norm
              FROM documents
            ), h AS (
              SELECT doc_id,
                     CASE WHEN length(norm) >= 5 THEN
                       list_transform(range(1, length(norm) - 5 + 2),
                         i -> ('0x' || substr(md5(substr(norm, i::INT, 5)), 1, 8))::BIGINT)
                     ELSE []::BIGINT[] END AS hs
              FROM n
            ), f AS (
              SELECT doc_id,
                     unnest(CASE
                       WHEN len(hs) >= 4 THEN list_distinct(
                         list_transform(range(1, len(hs) - 4 + 2),
                           j -> list_min(hs[j::INT:(j + 3)::INT])))
                       WHEN len(hs) >= 1 THEN [list_min(hs)]
                       ELSE []::BIGINT[] END) AS fp
              FROM h
            )
            SELECT doc_id, count(*) AS n_fps, min(fp) AS min_fp,
                   max(fp) AS max_fp, sum(fp)::BIGINT AS sum_fp
            FROM f GROUP BY doc_id
        """,
        "corpus_diff": """
            WITH old AS (
              SELECT doc_id, md5(text) AS old_fp
              FROM documents WHERE doc_id % 7 <> 0),
            new AS (
              SELECT doc_id,
                     md5(CASE WHEN doc_id % 11 = 0 THEN text || ' v2'
                              ELSE text END) AS new_fp
              FROM documents WHERE doc_id % 5 <> 0)
            SELECT coalesce(old.doc_id, new.doc_id) AS doc_id,
                   CASE WHEN old_fp IS NULL THEN 'added'
                        WHEN new_fp IS NULL THEN 'removed'
                        WHEN old_fp = new_fp THEN 'unchanged'
                        ELSE 'changed' END AS status,
                   coalesce(new_fp, old_fp) AS fingerprint
            FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id
        """,
        "fuzzy_match_customers": """
            SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
                   CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS distance
            FROM customer a JOIN customer b
              ON a.c_nationkey = b.c_nationkey
             AND a.c_custkey < b.c_custkey
            WHERE levenshtein(a.c_name, b.c_name) <= 1
        """,
        "entity_clusters": """
            WITH RECURSIVE fp AS (
              SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
              FROM customer a JOIN customer b
                ON a.c_nationkey = b.c_nationkey
               AND a.c_custkey < b.c_custkey
              WHERE levenshtein(a.c_name, b.c_name) <= 1),
            e AS (SELECT id_a AS a, id_b AS b FROM fp
                  UNION ALL SELECT id_b, id_a FROM fp),
            reach(a, b) AS (
              SELECT a, b FROM e
              UNION
              SELECT r.a, e.b FROM reach r JOIN e ON e.a = r.b),
            lbl AS (SELECT a AS id, least(a, min(b)) AS comp FROM reach GROUP BY a),
            labeled AS (
              SELECT c.c_custkey, coalesce(l.comp, c.c_custkey) AS comp
              FROM customer c LEFT JOIN lbl l ON l.id = c.c_custkey),
            stats AS (
              SELECT comp, min(c_custkey) AS entity_id,
                     CAST(count(*) AS BIGINT) AS cluster_size
              FROM labeled GROUP BY comp)
            SELECT c_custkey, entity_id, cluster_size
            FROM labeled JOIN stats USING (comp)
        """,
        "bm25_topk": _BM25_TOPK_SQL,
        "hybrid_rrf": _hybrid_rrf_sql(),
        "scd2_orders": """
            WITH ch AS (
              SELECT o_orderkey % 1000 AS k,
                     o_orderstatus AS status,
                     round(o_totalprice, 2) AS price,
                     CASE WHEN o_orderkey % 97 = 0 THEN 'D'
                          WHEN o_orderkey % 2 = 1 THEN 'U'
                          ELSE 'I' END AS op,
                     o_orderkey AS seq
              FROM orders),
            v AS (
              SELECT *, lead(seq) OVER (
                       PARTITION BY k ORDER BY seq, (op = 'D'), op
                     ) AS next_seq
              FROM ch)
            SELECT k, status, price,
                   seq AS valid_from, next_seq AS valid_to,
                   next_seq IS NULL AS is_current
            FROM v WHERE op <> 'D'
        """,
        "link_prediction": f"""
            WITH re AS ({SP_EDGES_SQL}),
            e AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
                SELECT src, dst FROM re
                UNION ALL SELECT dst AS src, src AS dst FROM re)),
            deg AS MATERIALIZED (
                SELECT src AS id, count(*) AS deg FROM e GROUP BY 1),
            legs AS MATERIALIZED (
                SELECT e.src AS w, e.dst AS v, d.deg
                FROM e JOIN deg d ON d.id = e.src WHERE d.deg <= 64),
            pairs AS (
                SELECT a.v AS id_a, b.v AS id_b,
                       count(*) AS common_neighbors,
                       round(sum(1.0 / ln(a.deg)), 6) AS adamic_adar
                FROM legs a JOIN legs b ON a.w = b.w AND a.v < b.v
                GROUP BY 1, 2 HAVING count(*) >= 2)
            SELECT id_a, id_b, common_neighbors,
                   round(common_neighbors::DOUBLE
                         / (da.deg + db.deg - common_neighbors), 6) AS jaccard,
                   adamic_adar
            FROM pairs
            JOIN deg da ON da.id = pairs.id_a
            JOIN deg db ON db.id = pairs.id_b
            ORDER BY adamic_adar DESC, id_a, id_b LIMIT 25
        """,
        "tfidf_top_terms": r"""
            WITH toks AS (
              SELECT doc_id AS id,
                     unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
              FROM documents),
            tf AS (SELECT id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
            dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
            n AS (SELECT count(*) AS n_docs FROM documents),
            scored AS (
              SELECT id, tf.term, tf.tf,
                     tf.tf * ln((n_docs + 1)::DOUBLE / (df + 1)) AS score
              FROM tf JOIN dfq USING (term) CROSS JOIN n),
            ranked AS (
              SELECT *, row_number() OVER (PARTITION BY id
                                           ORDER BY score DESC, term ASC) AS rn
              FROM scored)
            SELECT id AS doc_id, term, tf, round(score, 6) AS score
            FROM ranked WHERE rn <= 3
        """,
        "top_ngrams": r"""
            WITH t AS (
              SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS toks
              FROM documents),
            b AS (
              SELECT unnest(list_transform(range(1, len(toks)),
                                           i -> toks[i] || ' ' || toks[i + 1])) AS ngram
              FROM t WHERE len(toks) >= 2)
            SELECT ngram, count(*) AS cnt FROM b
            GROUP BY 1 ORDER BY cnt DESC, ngram ASC LIMIT 20
        """,
        "repetition_stats": r"""
            WITH t AS (
              SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
              FROM documents),
            b AS (
              SELECT doc_id,
                     unnest(list_transform(range(1, len(toks)),
                                           i -> toks[i] || ' ' || toks[i + 1])) AS bg
              FROM t WHERE len(toks) >= 2),
            c AS (SELECT doc_id, bg, count(*) AS c FROM b GROUP BY 1, 2)
            SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
                   round(max(c)::DOUBLE / sum(c), 6) AS top_bigram_frac,
                   round((sum(c) - count(*))::DOUBLE / sum(c), 6) AS dup_bigram_frac
            FROM c GROUP BY doc_id
        """,
        "pii_scrub": r"""
            WITH t AS (
              SELECT doc_id,
                     text || CASE WHEN doc_id % 5 = 0
                       THEN ' contact u' || CAST(doc_id AS VARCHAR)
                            || '@example.com 10.0.0.'
                            || CAST(doc_id % 250 AS VARCHAR) || ' 555-123-4567'
                       ELSE '' END AS text
              FROM documents)
            SELECT doc_id,
                   len(regexp_extract_all(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
                   len(regexp_extract_all(text,
                       '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ipv4,
                   len(regexp_extract_all(text,
                       '\b\d{3}-\d{3}-\d{4}\b')) AS n_phone,
                   md5(regexp_replace(regexp_replace(regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                       '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IPV4>', 'g'),
                       '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g')) AS clean_fp
            FROM t
        """,
        "event_transitions": """
            WITH p AS (
              SELECT event_type AS from_type,
                     lead(event_type) OVER w AS to_type,
                     date_diff('microsecond', ts, lead(ts) OVER w) AS gap_us
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
            SELECT from_type, to_type,
                   count(*) AS n_transitions,
                   round(CAST(sum(gap_us) AS DOUBLE) / count(*) / 1e6, 3)
                     AS avg_gap_s
            FROM p
            WHERE to_type IS NOT NULL AND gap_us <= CAST(3600 AS BIGINT) * 1000000
            GROUP BY 1, 2
        """,
        "value_quantiles": """
            SELECT event_type, count(*) AS n,
                   round(quantile_cont(value, 0.5), 6) AS p50,
                   round(quantile_cont(value, 0.9), 6) AS p90,
                   round(quantile_cont(value, 0.99), 6) AS p99
            FROM events GROUP BY 1
        """,
        "retention_cohorts": """
            WITH f AS (SELECT user_id, min(date_trunc('day', ts)) AS cohort_day
                       FROM events GROUP BY 1),
            a AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day
                  FROM events)
            SELECT strftime(f.cohort_day, '%Y-%m-%d') AS cohort_day,
                   CAST(date_diff('day', f.cohort_day, a.day) AS BIGINT)
                     AS day_offset,
                   count(*) AS n_active
            FROM a JOIN f USING (user_id)
            GROUP BY 1, 2
        """,
        "events_rollup": """
            WITH e AS (
              SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                     event_type, value
              FROM events)
            SELECT coalesce(day, 'ALL') AS day,
                   coalesce(event_type, 'ALL') AS event_type,
                   CAST(grouping_id(day, event_type) AS BIGINT) AS gid,
                   count(*) AS n_events,
                   round(sum(value), 2) AS sum_value
            FROM e GROUP BY ROLLUP (day, event_type)
        """,
        "seeded_sample": f"""
            SELECT doc_id, n_chars FROM documents
            WHERE {_SAMPLE_HASH} % 1000000 < {int(0.2 * 1_000_000)}
        """,
        "stratified_sample": f"""
            WITH langs AS ({_lang_id_sql()})
            SELECT doc_id, lang FROM langs
            WHERE {_SAMPLE_HASH} % 1000000 <
                  (CASE WHEN lang = 'de' THEN {int(0.3 * 1_000_000)}
                        WHEN lang = 'en' THEN {int(0.5 * 1_000_000)}
                        ELSE {int(0.1 * 1_000_000)} END)
        """,
        "global_shuffle": f"""
            WITH h AS (SELECT doc_id, {_SAMPLE_HASH} AS h FROM documents)
            SELECT doc_id,
                   CAST(row_number() OVER (ORDER BY h % 64, h, doc_id) AS BIGINT) AS pos
            FROM h
        """,
        "pack_sequences": f"""
            WITH toks AS (SELECT doc_id, len({_TOKS_SQL}) AS n_tokens,
                                 {_SAMPLE_HASH} AS h
                          FROM documents)
            SELECT doc_id,
                   CAST(row_number() OVER (ORDER BY h % 64, h, doc_id) AS BIGINT) AS pos,
                   CAST(coalesce(sum(n_tokens) OVER (
                          ORDER BY h % 64, h, doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                        AS BIGINT) AS cum_before,
                   CAST(floor(coalesce(sum(n_tokens) OVER (
                          ORDER BY h % 64, h, doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2048)
                        AS BIGINT) AS pack_id
            FROM toks
        """,
        "corpus_stats": f"""
            WITH l AS ({_lang_id_sql()}),
            q AS (
                SELECT doc_id,
                       0.25 * (CASE WHEN len({_TOKS_SQL}) BETWEEN 5 AND 100000 THEN 1.0 ELSE 0.0 END)
                     + 0.5 * (length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) * 1.0 / length(text))
                     + 0.25 * least({_stopword_count_sql()} * 5.0 / len({_TOKS_SQL}), 1.0) AS quality,
                       len({_TOKS_SQL}) AS n_tokens,
                       md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp
                FROM documents
            ),
            base AS (
                SELECT q.doc_id, l.lang, q.quality, q.n_tokens, q.fp
                FROM q JOIN l ON l.doc_id = q.doc_id
                WHERE q.quality >= 0.8
            ),
            surv AS (
                SELECT * FROM (
                    SELECT base.*, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
                    FROM base) WHERE rn = 1
            )
            SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
                   round(avg(quality), 6) AS avg_quality
            FROM surv GROUP BY lang
        """,
        "interleave_mix": f"""
            WITH l AS ({_lang_id_sql()}),
            pe AS (SELECT 'en' AS source, doc_id,
                          (row_number() OVER (ORDER BY h % 64, h, doc_id) - 0.5) / 1.0 AS mkey
                   FROM (SELECT doc_id, {_SAMPLE_HASH} AS h FROM l WHERE lang = 'en')),
            pr AS (SELECT 'rest' AS source, doc_id,
                          (row_number() OVER (ORDER BY h % 64, h, doc_id) - 0.5) / 3.0 AS mkey
                   FROM (SELECT doc_id, {_SAMPLE_HASH} AS h FROM l WHERE lang <> 'en')),
            u AS (SELECT * FROM pe UNION ALL SELECT * FROM pr)
            SELECT source, doc_id,
                   CAST(row_number() OVER (ORDER BY mkey, source, doc_id) AS BIGINT) AS pos
            FROM u
        """,
        "dedup_exact": """
            SELECT min(doc_id) AS doc_id, CAST(count(*) AS BIGINT) AS n_dups
            FROM (SELECT doc_id, md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp
                  FROM documents)
            GROUP BY fp
        """,
        "ngram_jaccard_pairs": f"WITH {_SHINGLES_SQL} {_jaccard_tail_sql(0.5)}",
        "domain_mix": """
            WITH g AS (SELECT source, CAST(count(*) AS DOUBLE) AS sz
                       FROM documents GROUP BY source),
            nrm AS (SELECT sum(sz) AS tot, sum(pow(sz, 0.5)) AS za FROM g)
            SELECT g.source,
                   CAST(sz AS BIGINT) AS n,
                   round(sz / tot, 6) AS p,
                   round(pow(sz, 0.5) / za, 6) AS q,
                   round((pow(sz, 0.5) / za) / (sz / tot), 6) AS rate
            FROM g, nrm
        """,
        # exact-regime kNN graph (nprobe = n_cells): the IVF
        # shuffle-join plan compares every pair exactly once, so
        # brute-force kNN SQL is the ground truth — same normalize/dot/
        # rounding/tie discipline as the proven cosine_topk twin
        "knn_graph": """
            WITH n AS (
              SELECT vec_id, list_transform(embedding::DOUBLE[], x -> x /
                sqrt(list_aggregate(list_transform(embedding::DOUBLE[], y -> y*y),
                     'sum'))) AS v
              FROM embeddings)
            SELECT src, dst, cosine, rank FROM (
              SELECT q.vec_id AS src, c.vec_id AS dst,
                     round(list_dot_product(c.v, q.v), 9) AS cosine,
                     row_number() OVER (PARTITION BY q.vec_id
                        ORDER BY round(list_dot_product(c.v, q.v), 9) DESC,
                                 c.vec_id) AS rank
              FROM n c, n q WHERE c.vec_id <> q.vec_id)
            WHERE rank <= 5
        """,
        # identical relational semantics to `decontaminate` (the Bloom
        # prune is plan-level only: no false negatives, false positives
        # removed by the exact confirm join) on the % 89 split
        "bloom_decontaminate": f"""
            WITH {_SHINGLES_SQL},
            bsh AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 89 = 0),
            csh AS (SELECT doc_id, sh FROM sh WHERE doc_id % 89 <> 0),
            sizes AS (SELECT doc_id, count(*) AS n_shingles
                      FROM csh GROUP BY doc_id),
            hits AS (SELECT doc_id, count(*) AS n_hits
                     FROM csh JOIN bsh USING (sh) GROUP BY doc_id)
            SELECT s.doc_id,
                   CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
                   CAST(s.n_shingles AS BIGINT) AS n_shingles,
                   round(coalesce(h.n_hits, 0) * 1.0 / s.n_shingles, 6)
                     AS contamination
            FROM sizes s LEFT JOIN hits h USING (doc_id)
        """,
        "decontaminate": f"""
            WITH {_SHINGLES_SQL},
            bsh AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 97 = 0),
            csh AS (SELECT doc_id, sh FROM sh WHERE doc_id % 97 <> 0),
            sizes AS (SELECT doc_id, count(*) AS n_shingles
                      FROM csh GROUP BY doc_id),
            hits AS (SELECT doc_id, count(*) AS n_hits
                     FROM csh JOIN bsh USING (sh) GROUP BY doc_id)
            SELECT s.doc_id,
                   CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
                   CAST(s.n_shingles AS BIGINT) AS n_shingles,
                   round(coalesce(h.n_hits, 0) * 1.0 / s.n_shingles, 6)
                     AS contamination
            FROM sizes s LEFT JOIN hits h USING (doc_id)
        """,
        # duplicate-line removal over the derived 8-word-line corpus:
        # a line is dropped EVERYWHERE when it appears >=2 times
        # corpus-wide; docs rebuilt from surviving lines in order
        "line_dedup": rf"""
            WITH w AS (
              SELECT doc_id,
                     generate_subscripts(regexp_split_to_array(trim(text), '\s+'), 1) AS ord,
                     unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
              FROM documents
            ), l AS (
              SELECT doc_id, CAST((ord - 1) // {_LINE_WORDS} AS INT) AS pos,
                     string_agg(tok, ' ' ORDER BY ord) AS line
              FROM w GROUP BY 1, 2
            ), c AS (SELECT line, count(*) AS cnt FROM l GROUP BY 1),
            f AS (
              SELECT l.doc_id, l.pos, l.line, (c.cnt >= 2) AS dup
              FROM l JOIN c ON c.line = l.line
            )
            SELECT doc_id,
                   string_agg(line, chr(10) ORDER BY pos)
                     FILTER (WHERE NOT dup) AS text,
                   CAST(count(*) FILTER (WHERE NOT dup) AS BIGINT) AS n_kept,
                   CAST(count(*) FILTER (WHERE dup) AS BIGINT) AS n_dropped
            FROM f GROUP BY doc_id
            HAVING count(*) FILTER (WHERE NOT dup) > 0
        """,
        "chunk_docs": r"""
            WITH d AS (
              SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
              FROM documents WHERE length(trim(text)) > 0
            ), s AS (
              SELECT doc_id, toks,
                     unnest(generate_series(0, len(toks) - 1, 24)) AS start_tok
              FROM d
            )
            SELECT doc_id,
                   CAST(start_tok // 24 AS INT) AS chunk_id,
                   CAST(start_tok AS INT) AS start_tok,
                   CAST(least(32, len(toks) - start_tok) AS INT) AS chunk_len,
                   toks[CAST(start_tok + 1 AS INT)] AS first_token
            FROM s
        """,
        "dedup_incremental": """
            WITH incoming AS (
              SELECT doc_id + 100000 AS doc_id, text
              FROM documents WHERE doc_id % 20 = 0
              UNION ALL
              SELECT doc_id + 200000, text || ' v2'
              FROM documents WHERE doc_id % 20 = 1
            )
            SELECT i.doc_id, length(i.text) AS n_chars
            FROM incoming i
            WHERE NOT EXISTS (
              SELECT 1 FROM documents d WHERE md5(d.text) = md5(i.text)
            )
        """,
        "token_entropy": r"""
            WITH tok AS (
              SELECT doc_id,
                     unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
              FROM documents),
            c AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2)
            SELECT doc_id,
                   CAST(sum(c) AS BIGINT) AS n_tokens,
                   CAST(count(*) AS BIGINT) AS n_distinct,
                   round(count(*) / CAST(sum(c) AS DOUBLE), 6) AS ttr,
                   round(log2(CAST(sum(c) AS DOUBLE))
                         - sum(c * log2(c)) / CAST(sum(c) AS DOUBLE), 6)
                     AS entropy_bits
            FROM c GROUP BY doc_id
        """,
        "domain_cap": f"""
            WITH scored AS (
              SELECT source, doc_id,
                     {_quality_expr_sql()} AS q
              FROM documents
            ), ranked AS (
              SELECT *, row_number() OVER (PARTITION BY source
                                           ORDER BY q DESC, doc_id) AS rn
              FROM scored
            )
            SELECT source, doc_id, round(q, 6) AS q
            FROM ranked WHERE rn <= 5
        """,
        "rolling_user_stats": """
            SELECT event_id, user_id,
                   round(avg(value) OVER w, 6) AS roll_mean,
                   round(stddev_samp(value) OVER w, 6) AS roll_std,
                   round(CASE WHEN stddev_samp(value) OVER w > 0
                              THEN (value - avg(value) OVER w)
                                   / stddev_samp(value) OVER w END, 6) AS z
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
        """,
        "events_topk_hourly": """
            WITH c AS (
              SELECT time_bucket(INTERVAL 1 HOUR, ts) AS wstart, event_type,
                     count(*) AS n_events
              FROM events GROUP BY 1, 2
            ), r AS (
              SELECT *, row_number() OVER (PARTITION BY wstart
                        ORDER BY n_events DESC, event_type) AS rk
              FROM c
            )
            SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS window_start,
                   event_type, CAST(n_events AS BIGINT) AS n_events,
                   CAST(rk AS INT) AS rk
            FROM r WHERE rk <= 3
        """,
        "degree_histogram": f"""
            WITH e AS ({SP_EDGES_SQL}),
            deg AS (SELECT src AS id, count(*) AS degree FROM e GROUP BY 1),
            zeros AS (
              SELECT DISTINCT dst AS id FROM e
              WHERE dst NOT IN (SELECT src FROM e)
            ),
            alldeg AS (SELECT degree FROM deg
                       UNION ALL SELECT 0 FROM zeros)
            SELECT CAST(degree AS BIGINT) AS degree,
                   CAST(count(*) AS BIGINT) AS n_vertices
            FROM alldeg GROUP BY 1
        """,
        "sample_balanced": f"""
            WITH r AS (
              SELECT source, doc_id,
                     row_number() OVER (PARTITION BY source
                       ORDER BY {_SAMPLE_HASH}, doc_id) AS rk
              FROM documents
            )
            SELECT source, doc_id FROM r WHERE rk <= 10
        """,
        "label_communities": _labelprop_sql(LP_EDGES_SQL, 4),
        "bigram_perplexity": r"""
            WITH t AS (
              SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
              FROM documents
            ), bgf AS (
              SELECT doc_id,
                     unnest(list_transform(range(1, len(toks)), i -> toks[i])) AS w1,
                     unnest(list_transform(range(1, len(toks)), i -> toks[i + 1])) AS w2
              FROM t WHERE len(toks) >= 2
            ), big AS (SELECT w1, w2, count(*) AS c12 FROM bgf GROUP BY 1, 2),
            ctx AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM big GROUP BY 1),
            v AS (
              SELECT count(DISTINCT tok) AS v FROM (
                SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
                FROM documents)
            )
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_bigrams,
                   round(avg(ln((c12 + 0.5) / (c1 + 0.5 * v))), 6) AS avg_logp,
                   round(exp(-avg(ln((c12 + 0.5) / (c1 + 0.5 * v)))), 6) AS ppl
            FROM bgf JOIN big USING (w1, w2) JOIN ctx USING (w1) CROSS JOIN v
            GROUP BY doc_id
        """,
        "perplexity_buckets": r"""
            WITH t AS (
              SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
              FROM documents
            ), bgf AS (
              SELECT doc_id,
                     unnest(list_transform(range(1, len(toks)), i -> toks[i])) AS w1,
                     unnest(list_transform(range(1, len(toks)), i -> toks[i + 1])) AS w2
              FROM t WHERE len(toks) >= 2
            ), big AS (SELECT w1, w2, count(*) AS c12 FROM bgf GROUP BY 1, 2),
            ctx AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM big GROUP BY 1),
            v AS (
              SELECT count(DISTINCT tok) AS v FROM (
                SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
                FROM documents)
            ),
            ppl AS (
              SELECT doc_id,
                     round(exp(-avg(ln((c12 + 0.5) / (c1 + 0.5 * v)))), 6) AS ppl
              FROM bgf JOIN big USING (w1, w2) JOIN ctx USING (w1) CROSS JOIN v
              GROUP BY doc_id
            ),
            scored AS (
              SELECT d.doc_id, d.lang, p.ppl
              FROM documents d JOIN ppl p USING (doc_id)
            ),
            thr AS (
              SELECT lang, round(quantile_cont(ppl, 1.0/3), 6) AS t1,
                     round(quantile_cont(ppl, 2.0/3), 6) AS t2
              FROM scored GROUP BY lang
            )
            SELECT doc_id, lang, ppl,
                   CASE WHEN ppl <= t1 THEN 'head'
                        WHEN ppl <= t2 THEN 'middle'
                        ELSE 'tail' END AS bucket
            FROM scored JOIN thr USING (lang)
        """,
        "importance_weights": rf"""
            WITH tk AS (
              SELECT doc_id, lang = 'en' AS tgt,
                     ('0x' || substr(md5(tok), 1, 8))::BIGINT % {IW_BUCKETS} AS h
              FROM (
                SELECT doc_id, lang,
                       unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
                FROM documents)
            ), model AS (
              SELECT h, count(*) AS c_raw,
                     sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS c_tgt
              FROM tk GROUP BY h
            ), tot AS (
              SELECT CAST(sum(c_raw) AS BIGINT) AS t_raw,
                     CAST(sum(c_tgt) AS BIGINT) AS t_tgt FROM model
            ), w AS (
              SELECT h, ln((c_tgt + 1.0) / (t_tgt + 1.0 * {IW_BUCKETS}))
                      - ln((c_raw + 1.0) / (t_raw + 1.0 * {IW_BUCKETS})) AS lw
              FROM model CROSS JOIN tot
            )
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                   round(sum(lw), 6) AS logw
            FROM tk JOIN w USING (h) GROUP BY doc_id
        """,
        "data_quality": """
            WITH m AS (
              SELECT CAST(count(*) AS DOUBLE) AS n,
                     count(l_orderkey) * 1.0 / count(*) AS nn_ok,
                     count(l_linestatus) * 1.0 / count(*) AS nn_ls,
                     CAST(min(l_quantity) AS DOUBLE) AS mn_q,
                     CAST(max(l_discount) AS DOUBLE) AS mx_d,
                     sum(CASE WHEN l_returnflag IN ('A','N','R') THEN 1 ELSE 0 END)
                       * 1.0 / count(*) AS inset,
                     CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS uq
              FROM lineitem
            )
            SELECT 'in_set' AS rule, 'l_returnflag' AS "column",
                   round(inset, 6) AS metric, inset = 1.0 AS passed FROM m
            UNION ALL SELECT 'max', 'l_discount', round(mx_d, 6), mx_d <= 0.1 FROM m
            UNION ALL SELECT 'min', 'l_quantity', round(mn_q, 6), mn_q >= 1.0 FROM m
            UNION ALL SELECT 'nonempty', '*', round(n, 6), n > 0 FROM m
            UNION ALL SELECT 'not_null', 'l_linestatus', round(nn_ls, 6), nn_ls = 1.0 FROM m
            UNION ALL SELECT 'not_null', 'l_orderkey', round(nn_ok, 6), nn_ok = 1.0 FROM m
            UNION ALL SELECT 'unique', 'l_orderkey', round(uq, 6), uq = n FROM m
        """,
        "domain_divergence": rf"""
            WITH tk AS (
              SELECT source AS domain,
                     ('0x' || substr(md5(tok), 1, 8))::BIGINT % {IW_BUCKETS} AS h
              FROM (
                SELECT source,
                       unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
                FROM documents)
            ), dom AS (
              SELECT domain, h, CAST(count(*) AS BIGINT) AS c_d FROM tk GROUP BY 1, 2
            ), corpus AS (
              SELECT h, CAST(sum(c_d) AS BIGINT) AS c_all FROM dom GROUP BY 1
            ), dt AS (
              SELECT domain, CAST(sum(c_d) AS BIGINT) AS t_d FROM dom GROUP BY 1
            ), at AS (SELECT CAST(sum(c_all) AS BIGINT) AS t_all,
                             CAST(count(*) AS BIGINT) AS n_obs FROM corpus),
            j AS (
              SELECT g.domain, g.t_d, g.c_all, at.t_all, at.n_obs,
                     coalesce(d.c_d, 0) AS c_d
              FROM (SELECT dt.domain, dt.t_d, c.h, c.c_all
                    FROM dt CROSS JOIN corpus c) g
              LEFT JOIN dom d ON d.domain = g.domain AND d.h = g.h
              CROSS JOIN at
            ),
            agged AS (
              SELECT domain, CAST(max(t_d) AS BIGINT) AS n_tokens,
                     sum(((c_d + 1.0) / (t_d + 1.0 * {IW_BUCKETS}))
                         * ln(((c_d + 1.0) / (t_d + 1.0 * {IW_BUCKETS}))
                              / ((c_all + 1.0) / (t_all + 1.0 * {IW_BUCKETS}))))
                       AS s_obs,
                     max(t_all) AS t_all, max(n_obs) AS n_obs
              FROM j GROUP BY domain
            )
            SELECT domain, n_tokens,
                   round(s_obs + ({IW_BUCKETS} - n_obs)
                         * (1.0 / (n_tokens + 1.0 * {IW_BUCKETS}))
                         * ln((1.0 / (n_tokens + 1.0 * {IW_BUCKETS}))
                              / (1.0 / (t_all + 1.0 * {IW_BUCKETS}))), 6) AS kl
            FROM agged
        """,
        "semantic_dup_pairs": _semantic_pairs_sql(),
        "semantic_dedup": _semantic_dedup_sql(),
        "quality_classifier": _quality_classifier_sql(),
        "split_dataset": r"""
            WITH s AS (
              SELECT ('0x' || substr(md5('42:' || doc_id), 1, 12))::BIGINT
                       % 1000000 AS key,
                     len(regexp_split_to_array(trim(text), '\s+')) AS n_toks
              FROM documents
            )
            SELECT CASE WHEN key < 900000 THEN 'train'
                        WHEN key < 950000 THEN 'val'
                        ELSE 'test' END AS split,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_toks) AS BIGINT) AS n_tokens
            FROM s GROUP BY 1
        """,
        "heuristic_flags": r"""
            SELECT doc_id,
                   round(len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) * 1.0
                         / len(regexp_split_to_array(trim(text), '\s+')), 6) AS uniq_token_frac,
                   round(len(list_filter(string_split(text, chr(10)),
                             l -> starts_with(trim(l), '-') OR starts_with(trim(l), '*'))) * 1.0
                         / len(string_split(text, chr(10))), 6) AS bullet_line_frac,
                   round(length(text) * 1.0 / len(string_split(text, chr(10))), 6)
                     AS mean_line_len,
                   round(length(regexp_replace(text, '[^{}]', '', 'g')) * 1.0
                         / length(text), 6) AS brace_char_frac,
                   substr(text, length(text), 1) IN ('.', '!', '?', '"')
                     AS ends_with_terminal
            FROM documents
        """,
        "pmi_top_pairs": r"""
            WITH t AS (
              SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS toks
              FROM documents
            ), bgf AS (
              SELECT unnest(list_transform(range(1, len(toks)), i -> toks[i])) AS w1,
                     unnest(list_transform(range(1, len(toks)), i -> toks[i + 1])) AS w2
              FROM t WHERE len(toks) >= 2
            ), big AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n FROM bgf GROUP BY 1, 2),
            l AS (SELECT w1, CAST(sum(n) AS BIGINT) AS c1 FROM big GROUP BY 1),
            r AS (SELECT w2, CAST(sum(n) AS BIGINT) AS c2 FROM big GROUP BY 1),
            tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM big)
            SELECT w1, w2, n, pmi,
                   CAST(row_number() OVER (ORDER BY pmi DESC, w1, w2) AS INT) AS rank
            FROM (
              SELECT w1, w2, n,
                     round(ln(n * 1.0 * nn / (c1 * c2)), 6) AS pmi
              FROM big JOIN l USING (w1) JOIN r USING (w2) CROSS JOIN tot
              WHERE n >= 5)
            QUALIFY rank <= 40
        """,
        "dedup_near": f"""
            WITH RECURSIVE pairs AS (
              SELECT id_a, id_b FROM ({_minhash_lsh_sql(0.5, 16, 4)})
            ),
            e AS (SELECT id_a AS a, id_b AS b FROM pairs
                  UNION ALL SELECT id_b, id_a FROM pairs),
            reach(a, b) AS (
              SELECT a, b FROM e
              UNION
              SELECT r.a, e.b FROM reach r JOIN e ON e.a = r.b
            ),
            lbl AS (SELECT a AS id, least(a, min(b)) AS comp FROM reach GROUP BY a),
            labeled AS (
              SELECT d.doc_id, coalesce(l.comp, d.doc_id) AS comp
              FROM documents d LEFT JOIN lbl l ON l.id = d.doc_id
            )
            SELECT min(doc_id) AS doc_id, CAST(count(*) AS BIGINT) AS n_dups
            FROM labeled GROUP BY comp
        """,
        "minhash_lsh_pairs": _minhash_lsh_sql(0.5, 16, 4),
        "simhash_pairs": _simhash_sql(3),
        "lsh_cosine_topk": _lsh_topk_sql(10, 4, 8, 64),
        "lsh_cosine_pairs": _lsh_pairs_sql(0.45, 4, 8, 64),
        "dedup_embedding": f"""
            WITH RECURSIVE pairs AS (
              SELECT id_a, id_b FROM ({_lsh_pairs_sql(0.45, 4, 8, 64)})
            ),
            e AS (SELECT id_a AS a, id_b AS b FROM pairs
                  UNION ALL SELECT id_b, id_a FROM pairs),
            reach(a, b) AS (
              SELECT a, b FROM e
              UNION
              SELECT r.a, e.b FROM reach r JOIN e ON e.a = r.b
            ),
            lbl AS (SELECT a AS id, least(a, min(b)) AS comp FROM reach GROUP BY a),
            labeled AS (
              SELECT m.vec_id, coalesce(l.comp, m.vec_id) AS comp
              FROM embeddings m LEFT JOIN lbl l ON l.id = m.vec_id
            )
            SELECT min(vec_id) AS vec_id, CAST(count(*) AS BIGINT) AS n_dups
            FROM labeled GROUP BY comp
        """,
        "ivf_topk": _ivf_topk_sql(64),
        "ann_recall": _ann_recall_sql(),
        "hard_negatives": _ivf_topk_sql(64, cell_offset=1),
        "embedding_normalize": """
            SELECT vec_id,
                   round(sqrt(list_aggregate(
                     list_transform(embedding::DOUBLE[], y -> y*y), 'sum')), 9)
                     AS norm,
                   len(embedding) AS n_dims
            FROM embeddings
        """,
        "embedding_project": _projection_sql(),
        "embedding_quantize": """
            WITH s AS (
              SELECT vec_id, embedding::DOUBLE[] AS v,
                     list_max(list_transform(embedding::DOUBLE[], x -> abs(x)))
                       / 127.0 AS scale
              FROM embeddings
            ), q AS (
              SELECT vec_id, scale,
                     CASE WHEN scale > 0 THEN
                       list_transform(v, x -> CAST(round(x / scale, 0) AS BIGINT))
                     ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS codes
              FROM s
            )
            SELECT vec_id, round(scale, 9) AS scale,
                   CAST(list_sum(codes) AS BIGINT) AS sum_q,
                   CAST(list_sum(list_transform(codes, c -> abs(c))) AS BIGINT)
                     AS sum_abs_q,
                   CAST(list_max(codes) AS BIGINT) AS max_q,
                   CAST(list_min(codes) AS BIGINT) AS min_q
            FROM q
        """,
        "embedding_cosine_pairs": """
            WITH n AS (
              SELECT vec_id, list_transform(embedding::DOUBLE[], x -> x /
                sqrt(list_aggregate(list_transform(embedding::DOUBLE[], y -> y*y), 'sum'))) AS v
              FROM embeddings)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_dot_product(a.v, b.v), 9) AS cosine
            FROM n a JOIN n b ON a.vec_id < b.vec_id
            WHERE round(list_dot_product(a.v, b.v), 9) >= 0.5
        """,
        "cosine_topk": _COSINE_TOPK_SQL,
        "hybrid_search": """
            WITH en AS (SELECT doc_id FROM documents WHERE lang = 'en'),
            n AS (
              SELECT vec_id, list_transform(embedding::DOUBLE[], x -> x /
                sqrt(list_aggregate(list_transform(embedding::DOUBLE[], y -> y*y), 'sum'))) AS v
              FROM embeddings),
            c AS (SELECT n.* FROM n JOIN en ON en.doc_id = n.vec_id)
            SELECT query_id, vec_id, cosine, rank FROM (
              SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
                     round(list_dot_product(c.v, q.v), 9) AS cosine,
                     row_number() OVER (PARTITION BY q.vec_id
                                        ORDER BY round(list_dot_product(c.v, q.v), 9) DESC,
                                                 c.vec_id) AS rank
              FROM c, n q WHERE q.vec_id < 5)
            WHERE rank <= 10
        """,
        # documents.text is ASCII-only in the driver data (verified per
        # SF), so the byte-level fake decode equals code-point math here.
        "image_features": """
            SELECT doc_id AS media_id,
                   CAST(n_chars % 100 AS INT) AS width,
                   CAST((n_chars * 7) % 100 AS INT) AS height,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                   md5(text) AS md5,
                   CAST(list_sum(list_transform(split(text, ''), c -> unicode(c)))
                        // length(text) AS INT) AS mean_byte
            FROM documents
        """,
        "audio_features": """
            SELECT doc_id AS media_id,
                   CAST(n_chars * 50 AS INT) AS duration_ms,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                   md5(text) AS md5,
                   CAST(floor(sqrt(
                     list_sum(list_transform(split(text, ''), c -> unicode(c) * unicode(c)))
                     * 1.0 / length(text))) AS INT) AS rms_byte
            FROM documents
        """,
        "video_frames": """
            WITH vid AS (
              SELECT doc_id AS media_id, text,
                     CAST((n_chars % 10 + 1) * 1000 AS INT) AS duration_ms
              FROM documents WHERE doc_id < 50
            )
            SELECT media_id, CAST(ts_ms AS INT) AS ts_ms,
                   md5(text || CAST(ts_ms AS VARCHAR)) AS frame_md5
            FROM vid, unnest(range(0, duration_ms, 1000)) AS u(ts_ms)
        """,
    }
