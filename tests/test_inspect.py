"""Parquet layout report / clustering score: a range-partitioned write
must score near 1 file-per-probe, a hash-shuffled write near n."""

import pytest
from pyspark.sql import functions as F

from hama_spark.sources.inspect import clustering_score, parquet_layout_report


def test_layout_report_matches_data(spark, tables, tmp_path):
    docs = tables["documents"].select("doc_id", "n_chars")
    path = str(tmp_path / "sorted")
    docs.repartitionByRange(4, "doc_id").sortWithinPartitions("doc_id").write.parquet(path)

    rep = parquet_layout_report(spark, path, "doc_id").collect()
    assert sum(r["n_rows"] for r in rep) == docs.count()
    assert all(r["n_bytes"] > 0 for r in rep)
    # every file carries stats and ranges are consistent
    for r in rep:
        assert r["col_min"] is not None and int(r["col_min"]) <= int(r["col_max"])


def test_clustering_score_sorted_vs_shuffled(spark, tables, tmp_path):
    docs = tables["documents"].select("doc_id", "n_chars")
    sorted_path = str(tmp_path / "s")
    shuffled_path = str(tmp_path / "h")
    docs.repartitionByRange(5, "doc_id").write.parquet(sorted_path)
    docs.repartition(5, "n_chars").write.parquet(shuffled_path)

    good = clustering_score(spark, sorted_path, "doc_id")
    bad = clustering_score(spark, shuffled_path, "doc_id")
    assert good["n_files"] >= 4 and bad["n_files"] >= 4
    assert good["files_hit_per_probe"] <= 1.5, good
    # boundary-min probes bias edge files low, but a shuffled layout
    # still scores several files per probe — the separation is the point
    assert bad["files_hit_per_probe"] >= 2.5, bad
    assert bad["files_hit_per_probe"] > 2 * good["files_hit_per_probe"], (good, bad)


def test_clustering_score_validates(spark, tables, tmp_path):
    docs = tables["documents"].select("doc_id")
    path = str(tmp_path / "p")
    docs.write.parquet(path)
    with pytest.raises(ValueError, match="not in"):
        clustering_score(spark, path, "nope")
    with pytest.raises(ValueError, match="max_files"):
        clustering_score(spark, path, "doc_id", max_files=0)
    with pytest.raises(ValueError, match="not a local parquet path"):
        clustering_score(spark, str(tmp_path / "missing"), "doc_id")
