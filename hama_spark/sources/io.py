"""Input/output format equivalents (S1-S10) + counters (P9).

The reference's format zoo maps almost 1:1 onto Spark readers/writers;
these wrappers pin the exact semantics (column names, separators,
compression) so a Hama job's I/O contract can be restated in one call.

| ref | here |
|---|---|
| TextInputFormat (bsp/TextInputFormat.java:28, (offset, line)) | ``read_text`` |
| KeyValueTextInputFormat (bsp/KeyValueTextInputFormat.java:31, split at first tab) | ``read_text_kv`` |
| SequenceFileInputFormat (bsp/SequenceFileInputFormat.java:28) | ``read_sequence_file`` (Hadoop ``.seq``; parquet remains the binary format of record for new data) |
| CombineFileInputFormat (bsp/CombineFileInputFormat.java:59) | built-in: ``spark.sql.files.maxPartitionBytes`` / ``openCostInBytes`` |
| NullInputFormat (bsp/NullInputFormat.java:26) | ``spark.range(n)`` |
| FileInputFormat globbing (bsp/FileInputFormat.java:46-174) | ``pathGlobFilter`` option |
| TextOutputFormat (bsp/TextOutputFormat.java:33, key\\tvalue + codec) | ``write_text_kv`` |
| SequenceFileOutputFormat (bsp/SequenceFileOutputFormat.java:27) | ``write_sequence_file`` |
| NullOutputFormat (bsp/NullOutputFormat.java:22) | ``write_null`` (noop sink) |
| Pipes / arbitrary-language UDFs (c++/src/main/native/pipes/api/hama/Pipes.hh:56) | ``pipe_lines`` (``RDD.pipe``) |

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


def read_sequence_file(
    spark: SparkSession,
    path: str,
    key_col: str = "key",
    value_col: str = "value",
    min_partitions: int | None = None,
) -> DataFrame:
    """Read a Hadoop SequenceFile as (key, value) rows
    (SequenceFileInputFormat.java:28). Writable->Python conversion is
    Spark's built-in (Text->str, LongWritable->int, BytesWritable->
    bytearray, ...); splits parallelize like any Hadoop input, so a
    directory of .seq shards scans with full parallelism. This is the
    migration on-ramp for existing Hama data — convert once to parquet
    (``df.write.parquet``) and stay columnar after that."""
    rdd = spark.sparkContext.sequenceFile(path, minSplits=min_partitions)
    return spark.createDataFrame(rdd, schema=[key_col, value_col])


def write_sequence_file(
    df: DataFrame, path: str, key_col: str = "key", value_col: str = "value"
) -> None:
    """Write (key, value) rows as a Hadoop SequenceFile
    (SequenceFileOutputFormat.java:27). Python primitives map back to
    Writables (str->Text, int->LongWritable, ...)."""
    df.select(key_col, value_col).rdd.map(tuple).saveAsSequenceFile(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    sort_by: list[str] | None = None,
    max_records_per_file: int | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
    salt_tasks: int | None = None,
) -> None:
    """Hive-style partitioned lake sink: one directory level per
    partition column, so readers prune whole partitions from WHERE
    clauses (PartitionFilters in the scan, zero I/O for pruned values).

    Scale shape: rows are repartitioned on the partition keys first so
    each task writes into few directories — without this, every task
    holds a writer per live partition value and the job emits
    tasks x partitions small files. ``sort_by`` orders rows inside each
    file (tighter parquet min/max row-group stats -> better data
    skipping, and better compression). ``max_records_per_file`` caps
    file size for downstream split planning.

    ``salt_tasks``: by default each partition value lands in exactly one
    write task, which serializes a hot partition (one huge date in a
    date-partitioned corpus) through a single writer. Setting
    ``salt_tasks=N`` spreads every partition value over up to N tasks
    (partition keys + a bounded deterministic salt), trading ≤N files
    per partition value for parallel writes of hot values.
    """
    part_cols = [F.col(c) for c in partition_by]
    if salt_tasks and salt_tasks > 1:
        # same retry-stable salt recipe as operators/skew._with_salt.
        # Explicit numPartitions: an unsized repartition is AQE-
        # coalescible, which would merge the salted splits right back
        # into one writer task — the situation the salt exists to avoid.
        salt = F.pmod(
            F.xxhash64(*part_cols, F.monotonically_increasing_id()),
            F.lit(salt_tasks),
        )
        n_shuffle = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        out = df.repartition(max(n_shuffle, salt_tasks), *part_cols, salt)
    else:
        out = df.repartition(*part_cols)
    if sort_by:
        out = out.sortWithinPartitions(*partition_by, *sort_by)
    writer = out.write.format(fmt).mode(mode).partitionBy(*partition_by)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.save(path)


def pipe_lines(
    df: DataFrame,
    command: str,
    sep: str = "\t",
    out_col: str = "line",
) -> DataFrame:
    """Arbitrary-language UDF surface (P19): stream rows through an
    external command, one tab-joined line per row on stdin, one output
    row per stdout line — the Hama Pipes contract
    (c++/src/main/native/pipes/api/hama/Pipes.hh:56) restated as
    ``RDD.pipe``. The command runs once per partition, so a C++/awk/
    any-language filter scales with the partition count; this is the
    documented escape hatch, NOT the hot path (built-in columnar
    expressions and Pandas UDFs stay preferred)."""
    spark = df.sparkSession
    # concat_ws silently drops NULL slots, which would shift field
    # positions for the external command — empty-string them instead
    line = F.concat_ws(
        sep, *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in df.columns]
    )
    rdd = df.select(line.alias("l")).rdd.map(lambda r: r[0]).pipe(command)
    return spark.createDataFrame(rdd.map(lambda s: (s,)), schema=f"{out_col} string")


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


DOCUMENTS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def read_jsonl_docs(
    spark: SparkSession,
    path: str,
    schema: str = DOCUMENTS_SCHEMA,
    permissive: bool = True,
) -> DataFrame:
    """Read a JSON-Lines corpus (the LLM-pipeline interchange format —
    one JSON document per line, optionally .gz/.zst-sharded) with an
    ENFORCED schema: schema-on-read inference over 100 TB would pay a
    full sampling pass and can drift between shards, so the corpus
    contract is pinned instead. ``permissive`` (Spark PERMISSIVE mode)
    never drops rows: extra fields are ignored and a MALFORMED line
    becomes a row with every schema column null — filter/account for
    all-null rows downstream if shard corruption matters.
    ``permissive=False`` switches to FAILFAST so a malformed shard
    aborts the read instead.

    Compressed shards (.gz) are line-splittable only per file — shard
    the corpus into many files for scan parallelism (the writer below
    does)."""
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE" if permissive else "FAILFAST")
        .json(path)
    )


def write_jsonl_docs(
    df: DataFrame,
    path: str,
    compression: str | None = "gzip",
    num_shards: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a corpus as sharded JSON-Lines. gzip by default (the
    de-facto corpus interchange); ``num_shards`` controls output file
    count — gzip shards are non-splittable, so shard count IS the read
    parallelism of the next pipeline stage. Leave None to inherit the
    current partitioning."""
    out = df.repartition(num_shards) if num_shards else df
    writer = out.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)


def compact_parquet(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_mb: int = 256,
    sort_by: list[str] | None = None,
) -> int:
    """Compact a small-files parquet dataset into ~``target_mb`` output
    files — the standard lakehouse maintenance job (streaming sinks and
    fine-grained partition writes leave thousands of KB-scale files;
    each costs a task + open/footer overhead per scan, and at 100 TB
    the listing alone dominates).

    Output file count = ceil(total_bytes / target), so the rewrite is
    one shuffle-free coalesce when shrinking (or a repartition when
    ``sort_by`` asks for clustering: repartitionByRange + sort keeps
    min/max stats tight for pruning). Writes to ``out_path`` (never in
    place — the caller swaps directories after validating), returns the
    number of files written.
    """
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    total = p.getFileSystem(conf).getContentSummary(p).getLength()
    n_out = max(1, -(-int(total) // (target_mb * 1024 * 1024)))

    df = spark.read.parquet(path)
    if sort_by:
        out = df.repartitionByRange(n_out, *sort_by).sortWithinPartitions(*sort_by)
    else:
        out = df.coalesce(n_out)
    out.write.mode("error").parquet(out_path)

    op = jvm.org.apache.hadoop.fs.Path(out_path)
    fs = op.getFileSystem(conf)
    it = fs.listStatus(op)
    return sum(
        1 for i in range(len(it)) if it[i].getPath().getName().endswith(".parquet")
    )


def read_csv_quarantine(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = False,
    sep: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """CSV ingestion with bad-row quarantine: returns ``(good, bad)``
    where ``good`` has exactly ``schema`` and ``bad`` is (raw_line) —
    every malformed input row (wrong arity, type-cast failure) captured
    verbatim instead of silently nulled (PERMISSIVE's default) or
    aborting the whole job (FAILFAST). The standard ingest contract for
    a pipeline fed by external dumps: load what parses, park the rest
    for inspection, let row counts reconcile (|input| = |good| + |bad|).

    Implementation: PERMISSIVE mode with ``columnNameOfCorruptRecord``
    — Spark's native malformed-row capture, one pass, no second parse.
    The corrupt-record column must be selected before filtering (Spark
    refuses a corrupt-only projection on CSV otherwise), hence the
    cache-free double filter on one scan.
    """
    corrupt = "_corrupt_record"
    full_schema = f"{schema}, {corrupt} string"
    raw = (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt)
        .option("header", header)
        .option("sep", sep)
        .csv(path)
        .cache()
    )
    good = raw.filter(F.col(corrupt).isNull()).drop(corrupt)
    bad = raw.filter(F.col(corrupt).isNotNull()).select(
        F.col(corrupt).alias("raw_line")
    )
    return good, bad
