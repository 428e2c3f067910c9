"""Input/output format equivalents (S1-S10) + counters (P9).

The reference's format zoo maps almost 1:1 onto Spark readers/writers;
these wrappers pin the exact semantics (column names, separators,
compression) so a Hama job's I/O contract can be restated in one call.

| ref | here |
|---|---|
| TextInputFormat (bsp/TextInputFormat.java:28, (offset, line)) | ``read_text`` |
| KeyValueTextInputFormat (bsp/KeyValueTextInputFormat.java:31, split at first tab) | ``read_text_kv`` |
| SequenceFileInputFormat (bsp/SequenceFileInputFormat.java:28) | parquet is this engine's binary format of record: ``spark.read.parquet`` |
| CombineFileInputFormat (bsp/CombineFileInputFormat.java:59) | built-in: ``spark.sql.files.maxPartitionBytes`` / ``openCostInBytes`` |
| NullInputFormat (bsp/NullInputFormat.java:26) | ``spark.range(n)`` |
| FileInputFormat globbing (bsp/FileInputFormat.java:46-174) | ``pathGlobFilter`` option |
| TextOutputFormat (bsp/TextOutputFormat.java:33, key\\tvalue + codec) | ``write_text_kv`` |
| SequenceFileOutputFormat (bsp/SequenceFileOutputFormat.java:27) | ``df.write.parquet`` |
| NullOutputFormat (bsp/NullOutputFormat.java:22) | ``write_null`` (noop sink) |

Counters (bsp/BSPPeer.java:157-188): ``observed`` attaches named
aggregate metrics to a DataFrame — evaluated during the action that
consumes it, collected from the Observation without a second pass
(Spark's ``df.observe``; accumulator semantics without RDD surface).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation, SparkSession
from pyspark.sql import functions as F


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """(offset long, line string) — TextInputFormat emits the byte
    offset as key; Spark doesn't expose offsets, so a per-file row
    index stands in (monotonic within each file, same ordering)."""
    from pyspark.sql import Window

    w = Window.partitionBy(F.col("_file")).orderBy(F.monotonically_increasing_id())
    return (
        spark.read.text(path)
        .select(F.input_file_name().alias("_file"), F.col("value").alias("line"))
        .withColumn("offset", F.row_number().over(w).cast("long") - 1)
        .select("offset", "line")
    )


def read_text_kv(spark: SparkSession, path: str, sep: str = "\t") -> DataFrame:
    """(key string, value string) — split each line at the FIRST ``sep``
    (KeyValueLineRecordReader semantics; value empty when absent)."""
    lines = spark.read.text(path)
    idx = F.instr(F.col("value"), sep)
    return lines.select(
        F.when(idx > 0, F.substring_index("value", sep, 1))
        .otherwise(F.col("value"))
        .alias("key"),
        F.when(idx > 0, F.expr(f"substring(value, instr(value, '{sep}') + {len(sep)})"))
        .otherwise(F.lit(""))
        .alias("value"),
    )


def write_text_kv(
    df: DataFrame,
    path: str,
    key_col: str = "key",
    value_col: str = "value",
    sep: str = "\t",
    compression: str | None = None,
    mode: str = "overwrite",
) -> None:
    """``key\\tvalue`` lines, optional codec (gzip/bzip2/...) —
    TextOutputFormat.java:33-116."""
    out = df.select(
        F.concat_ws(sep, F.col(key_col).cast("string"), F.col(value_col).cast("string")).alias(
            "value"
        )
    )
    writer = out.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    writer.text(path)


def write_null(df: DataFrame) -> None:
    """Discard output, still executing the plan (NullOutputFormat)."""
    df.write.format("noop").mode("overwrite").save()


def observed(
    df: DataFrame, name: str, **metrics: Column
) -> tuple[DataFrame, Observation]:
    """Attach counters: ``df2, obs = observed(df, "job", n=F.count(F.lit(1)))``;
    after an action on df2, ``obs.get["n"]`` holds the count — one pass,
    no extra job (vs a separate ``.count()``)."""
    obs = Observation(name)
    return df.observe(obs, *[m.alias(k) for k, m in metrics.items()]), obs
