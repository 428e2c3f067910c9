"""CLI entry point (python -m hama_spark): each subcommand runs end to
end on fixture parquet in a fresh interpreter and prints one parseable
JSON line whose numbers agree with the underlying operators."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"


def _run(*args: str) -> dict:
    proc = subprocess.run(
        [sys.executable, "-m", "hama_spark", *args],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


def test_cli_profile():
    out = _run(
        "profile", "--input", f"{SF}/documents.parquet", "--columns", "doc_id,n_chars"
    )
    cols = {c["column"]: c for c in out["columns"]}
    assert set(cols) == {"doc_id", "n_chars"}
    assert cols["doc_id"]["n_rows"] == 500 and cols["doc_id"]["n_nulls"] == 0


def test_cli_dedup_and_drift(tmp_path):
    out = _run(
        "dedup",
        "--input", f"{SF}/documents.parquet",
        "--output", str(tmp_path / "deduped"),
        "--threshold", "0.5",
    )
    # matches the driver query's known survivor count on this fixture
    assert out["docs_in"] == 500 and out["docs_kept"] == 476
    drift = _run(
        "drift",
        "--old", f"{SF}/documents.parquet",
        "--new", f"{SF}/documents.parquet",
        "--column", "n_chars",
        "--buckets", "4",
    )
    assert drift["psi_total"] == 0.0  # identical snapshots


def test_cli_prepare(tmp_path):
    out = _run(
        "prepare",
        "--input", f"{SF}/documents.parquet",
        "--output", str(tmp_path / "clean"),
        "--min-quality", "0.0",
    )
    stages = {r["stage"]: r for r in out["funnel"]}
    assert "near_dedup" in stages or len(stages) >= 3
    assert os.path.isdir(str(tmp_path / "clean"))


def test_cli_decontam(tmp_path):
    """Corpus decontaminated against a benchmark slice of itself: every
    benchmark twin (plus its near-dups) must be flagged and dropped."""
    import duckdb

    bench = str(tmp_path / "bench")
    duckdb.connect().execute(
        f"""COPY (SELECT doc_id + 100000 AS doc_id, text
               FROM read_parquet('{SF}/documents.parquet')
               WHERE doc_id % 37 = 0)
            TO '{bench}' (FORMAT PARQUET)"""
    )
    out = _run(
        "decontam",
        "--input", f"{SF}/documents.parquet",
        "--benchmark", bench,
        "--output", str(tmp_path / "clean"),
        "--threshold", "0.5",
    )
    # the 14 verbatim twins are all caught (near side >= exact side)
    assert out["near_flagged"] >= 14
    assert out["total_flagged"] >= out["exact_flagged"]
    n_kept = duckdb.connect().execute(
        f"SELECT count(*) FROM read_parquet('{tmp_path}/clean/*.parquet')"
    ).fetchone()[0]
    assert n_kept == 500 - out["total_flagged"]
    # the Bloom-pruned exact pass is a plan change, not a result change
    out_bloom = _run(
        "decontam",
        "--input", f"{SF}/documents.parquet",
        "--benchmark", bench,
        "--threshold", "0.5",
        "--bloom",
    )
    assert out_bloom["exact_flagged"] == out["exact_flagged"]
    assert out_bloom["total_flagged"] == out["total_flagged"]


def test_cli_lshplan_no_spark():
    out = _run("lshplan", "--threshold", "0.8", "--max-hashes", "64")
    assert out["num_hashes"] <= 64
    assert out["bands"] * out["rows_per_band"] == out["num_hashes"]
    cos = _run("lshplan", "--threshold", "0.8", "--cosine", "--target-recall", "0.9")
    assert cos["recall_at_threshold"] >= 0.9


def test_cli_scaling_and_vector_drift():
    out = _run(
        "scaling", "--input", f"{SF}/documents.parquet",
        "--top-n", "50", "--points", "5",
    )
    assert out["zipf"]["n_terms"] > 0
    assert len(out["curve"]) == 5
    drift = _run(
        "drift",
        "--old", f"{SF}/embeddings.parquet",
        "--new", f"{SF}/embeddings.parquet",
        "--vector-column", "embedding",
    )
    assert abs(drift["embedding"]["centroid_cosine"] - 1.0) < 1e-9


def test_cli_card(tmp_path):
    out = str(tmp_path / "card.md")
    res = _run("card", "--input", f"{SF}/documents.parquet",
               "--output", out, "--name", "docs")
    assert res["chars"] > 500
    md = open(out).read()
    assert "# Dataset card: docs" in md and "## Duplication" in md


def test_cli_layout():
    out = _run("layout", "--input", f"{SF}/documents.parquet",
               "--column", "doc_id", "--files")
    assert out["n_files"] >= 1
    assert out["files_hit_per_probe"] >= 1.0
    assert len(out["files"]) == out["n_files"]
