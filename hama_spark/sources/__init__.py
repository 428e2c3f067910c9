from hama_spark.sources.inspect import clustering_score, parquet_layout_report
from hama_spark.sources.generators import fast_graph_gen, symmetric_matrix_gen
from hama_spark.sources.io import (
    compact_parquet,
    observed,
    pipe_lines,
    read_jsonl_docs,
    read_sequence_file,
    read_text,
    read_text_kv,
    write_null,
    write_partitioned,
    write_jsonl_docs,
    write_sequence_file,
    write_text_kv,
)
from hama_spark.sources.lake import (
    SnapshotLockError,
    current_version,
    list_snapshots,
    merge_snapshot,
    read_snapshot,
    stream_merge_into,
    vacuum_snapshots,
    write_snapshot,
)
from hama_spark.sources.warc import read_warc_records
from hama_spark.sources.zorder import with_zorder_key, write_zordered
from hama_spark.sources.readers import (
    read_json_graph,
    read_movielens,
    read_tab_adjacency,
    read_weighted_adjacency,
)

__all__ = [
    "compact_parquet",
    "with_zorder_key",
    "write_zordered",
    "read_tab_adjacency",
    "read_weighted_adjacency",
    "read_json_graph",
    "read_movielens",
    "fast_graph_gen",
    "symmetric_matrix_gen",
    "read_text",
    "read_text_kv",
    "read_sequence_file",
    "write_text_kv",
    "write_sequence_file",
    "write_null",
    "write_partitioned",
    "read_jsonl_docs",
    "write_jsonl_docs",
    "pipe_lines",
    "observed",
    "SnapshotLockError",
    "write_snapshot",
    "read_snapshot",
    "merge_snapshot",
    "list_snapshots",
    "current_version",
    "vacuum_snapshots",
    "stream_merge_into",
    "read_warc_records",
]
