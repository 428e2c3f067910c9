"""HITS (graph/hits.py): unrolled-SQL replay on the fixture-derived
graph plus structural sanity on a known topology."""

from __future__ import annotations


def _hits_sql(edges_sql: str, iters: int) -> str:
    """The exact synchronous schedule as chained CTEs, mirroring
    hama_spark.graph.hits (L2 normalization over ALL vertices each
    half-step)."""
    parts = [
        f"WITH e AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({edges_sql})),",
        "v AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst FROM e),",
        "h0 AS (SELECT id, 1.0::DOUBLE AS hub FROM v),",
        "a0 AS (SELECT id, 1.0::DOUBLE AS authority FROM v)",
    ]
    for t in range(iters):
        parts.append(f""", ac{t} AS (
            SELECT v.id, coalesce(s.s, 0) AS raw FROM v
            LEFT JOIN (SELECT e.dst AS id, sum(h.hub) AS s
                       FROM e JOIN h{t} h ON h.id = e.src GROUP BY 1) s
              ON s.id = v.id),
          an{t} AS (SELECT sqrt(sum(raw*raw)) AS n FROM ac{t}),
          a{t + 1} AS MATERIALIZED (
            SELECT id, CASE WHEN n > 0 THEN raw / n ELSE 0 END AS authority
            FROM ac{t} CROSS JOIN an{t}),
          hc{t} AS (
            SELECT v.id, coalesce(s.s, 0) AS raw FROM v
            LEFT JOIN (SELECT e.src AS id, sum(a.authority) AS s
                       FROM e JOIN a{t + 1} a ON a.id = e.dst GROUP BY 1) s
              ON s.id = v.id),
          hn{t} AS (SELECT sqrt(sum(raw*raw)) AS n FROM hc{t}),
          h{t + 1} AS MATERIALIZED (
            SELECT id, CASE WHEN n > 0 THEN raw / n ELSE 0 END AS hub
            FROM hc{t} CROSS JOIN hn{t})""")
    parts.append(
        f"SELECT h.id, round(h.hub, 6) AS hub, round(a.authority, 6) AS authority "
        f"FROM h{iters} h JOIN a{iters} a ON a.id = h.id"
    )
    return "\n".join(parts)


def test_hits_matches_unrolled_sql_on_fixture_graph(spark, tables, duck):
    from tests.conftest import assert_df_equals_oracle

    from hama_spark.graph.hits import hits
    from pyspark.sql import functions as F

    edges = tables["lineitem"].select(
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey")).alias("dst"),
    )
    sql = _hits_sql(
        "SELECT 's' || l_suppkey AS src, 'p' || l_partkey AS dst FROM lineitem",
        5,
    )
    assert_df_equals_oracle(hits(edges, iterations=5), duck, sql, tol=1e-5)


def test_hits_star_topology(spark):
    """Star u -> {v1, v2, v3}: u is the only hub, the leaves split
    authority evenly; scores L2-normalize to 1."""
    from hama_spark.graph.hits import hits

    e = spark.createDataFrame(
        [("u", "v1"), ("u", "v2"), ("u", "v3")], "src string, dst string"
    )
    got = {r.id: (r.hub, r.authority) for r in hits(e, iterations=3).collect()}
    assert got["u"][0] == 1.0 and got["u"][1] == 0.0
    import math
    for leaf in ("v1", "v2", "v3"):
        assert abs(got[leaf][1] - 1 / math.sqrt(3)) < 1e-6
        assert got[leaf][0] == 0.0
