"""Graph / dataset text readers (G12, G13, S13).

Reference formats:
- tab adjacency ``id\\tdst1 dst2 ...`` — examples/PageRank.java:90-109
  (PagerankTextReader) and examples/MindistSearch.java:86-104.
- weighted adjacency ``id\\tdst:w\\tdst:w...`` — examples/SSSP.java:91-118
  (SSSPTextReader).
- JSON vertex rows ``[id, 0, [[dst, w], ...]]`` —
  examples/PageRank.java:111-132 (PagerankJsonReader).
- MovieLens ``user::item::rating[::ts]`` —
  ml/recommendation/cf/MovieLensConverter.java.

All readers return NORMALIZED edge DataFrames (src, dst[, weight]) —
the §1.1 mapping: a Hama Vertex row is a vertices-DF row plus edges-DF
rows, so "parse a vertex" == "emit its edge rows" (vertex set =
distinct ids). Pure text + split + explode: splittable scans, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_tab_adjacency(spark: SparkSession, path: str) -> DataFrame:
    """``id\\tdst1 dst2 ...`` -> (src string, dst string). Hama's reader
    indexes the 2nd tab field unconditionally, so lines must have both
    columns; empty neighbor tokens are dropped."""
    lines = spark.read.text(path)
    parts = F.split(F.col("value"), "\t")
    return (
        lines.select(
            F.trim(parts[0]).alias("src"),
            F.explode(F.split(F.trim(parts[1]), " ")).alias("dst"),
        )
        .filter(F.col("dst") != "")
    )


def read_weighted_adjacency(spark: SparkSession, path: str) -> DataFrame:
    """``id\\tdst:w\\tdst:w...`` -> (src, dst, weight int)
    (SSSP.java:91-118 splits on tab, then each part on ':')."""
    lines = spark.read.text(path)
    parts = F.split(F.col("value"), "\t")
    edges = lines.select(
        F.trim(parts[0]).alias("src"),
        F.explode(F.slice(parts, 2, 2147483647)).alias("e"),
    )
    kv = F.split(F.col("e"), ":")
    return edges.filter(F.col("e") != "").select(
        "src", kv[0].alias("dst"), kv[1].cast("int").alias("weight")
    )


def read_json_graph(spark: SparkSession, path: str) -> DataFrame:
    """``[id, value, [[dst, w], ...]]`` JSON rows ->
    (src string, dst string, weight int)."""
    lines = spark.read.text(path)
    # JSON arrays are heterogeneous ([int, int, [[int,int],...]]); parse
    # the outer array positionally with get_json_object (pure JVM).
    return (
        lines.select(
            F.get_json_object("value", "$[0]").alias("src"),
            F.explode(
                F.from_json(F.get_json_object("value", "$[2]"), "array<array<int>>")
            ).alias("edge"),
        )
        .select(
            "src",
            F.col("edge")[0].cast("string").alias("dst"),
            F.col("edge")[1].cast("int").alias("weight"),
        )
    )


def read_movielens(spark: SparkSession, path: str) -> DataFrame:
    """``user::item::rating[::timestamp]`` -> (user long, item long,
    rating double). '::' is a multi-char delimiter, so split, not csv."""
    lines = spark.read.text(path)
    p = F.split(F.col("value"), "::")
    return lines.select(
        p[0].cast("long").alias("user"),
        p[1].cast("long").alias("item"),
        p[2].cast("double").alias("rating"),
    )
