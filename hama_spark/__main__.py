"""Command-line entry point: the engine's most common end-to-end jobs
as one-liners, for operators who drive pipelines from a scheduler
rather than a notebook. Each subcommand prints ONE JSON summary line
to stdout (machine-parseable; everything else goes to stderr).

    python -m hama_spark profile  --input corpus/ [--columns a,b]
    python -m hama_spark prepare  --input corpus/ --output clean/
                                  [--benchmark bench/] [--min-quality Q]
    python -m hama_spark dedup    --input corpus/ --output deduped/
                                  [--threshold T]
    python -m hama_spark decontam --input corpus/ --benchmark bench/
                                  [--output clean/] [--threshold T]
    python -m hama_spark drift    --old v1/ --new v2/ [--column n_chars]
                                  [--vector-column embedding]
    python -m hama_spark lshplan  --threshold 0.8 [--cosine] (no Spark)
    python -m hama_spark scaling  --input corpus/  (Zipf + Heaps)
    python -m hama_spark card     --input corpus/ [--output card.md]
    python -m hama_spark layout   --input table/ --column k [--files]

Inputs/outputs are parquet paths (any Hadoop-FS scheme the session
resolves) — EXCEPT ``layout``, which reads parquet footers driver-side
via pyarrow and accepts local/file: paths only. The session comes from
``hama_spark.get_spark`` — override parallelism with SPARK_GRAFT_CPUS
as in bench.py.
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark():
    from hama_spark import get_spark

    return get_spark(app_name="hama_spark_cli")


def _read(spark, path):
    return spark.read.parquet(path)


def cmd_profile(args) -> dict:
    from hama_spark.extensions.expectations import column_profile, corr_matrix

    spark = _spark()
    df = _read(spark, args.input)
    cols = args.columns.split(",") if args.columns else None
    rows = [r.asDict() for r in column_profile(df, cols).collect()]
    out = {"command": "profile", "input": args.input, "columns": rows}
    if args.corr:
        out["correlations"] = [
            r.asDict()
            for r in corr_matrix(df, cols if cols and len(cols) > 1 else None).collect()
        ]
    return out


def cmd_prepare(args) -> dict:
    from hama_spark.extensions.pipeline import prepare_training_corpus

    spark = _spark()
    docs = _read(spark, args.input)
    benchmark = _read(spark, args.benchmark) if args.benchmark else None
    corpus, report = prepare_training_corpus(
        docs,
        benchmark,
        min_quality=args.min_quality,
        near_threshold=args.threshold,
        keep_best_by=args.keep_best_by,
        id_col=args.id_col,
        text_col=args.text_col,
    )
    corpus.write.mode(args.mode).parquet(args.output)
    funnel = [r.asDict() for r in report.collect()]
    return {
        "command": "prepare",
        "input": args.input,
        "output": args.output,
        "funnel": funnel,
    }


def cmd_dedup(args) -> dict:
    from pyspark.sql import functions as F

    from hama_spark.extensions.dedup import dedup_near

    spark = _spark()
    docs = _read(spark, args.input)
    survivors = dedup_near(
        docs, threshold=args.threshold, id_col=args.id_col, text_col=args.text_col
    )
    kept = docs.join(survivors.select(args.id_col), args.id_col)
    kept.write.mode(args.mode).parquet(args.output)
    n_in, n_out = docs.count(), kept.count()
    return {
        "command": "dedup",
        "input": args.input,
        "output": args.output,
        "docs_in": n_in,
        "docs_kept": n_out,
        "docs_removed": n_in - n_out,
    }


def cmd_decontam(args) -> dict:
    from pyspark.sql import functions as F

    from hama_spark.extensions.dedup import (
        contamination_report,
        near_contamination_pairs,
    )

    spark = _spark()
    corpus = _read(spark, args.input)
    bench = _read(spark, args.benchmark)
    # checkpoint the ID relations (ids only, never text) so the write
    # and the three summary counts don't each re-shingle the corpus —
    # same survivor-ID discipline as cmd_dedup / prepare_training_corpus
    if args.bloom:
        from hama_spark.extensions.dedup import bloom_decontaminate

        exact_rep = bloom_decontaminate(
            corpus, bench, id_col=args.id_col, text_col=args.text_col
        )
    else:
        exact_rep = contamination_report(
            corpus, bench, id_col=args.id_col, text_col=args.text_col
        )
    exact = (
        exact_rep.filter(F.col("contamination") >= args.max_overlap)
        .select(F.col(args.id_col).alias("flagged_id"))
        .localCheckpoint(eager=True)
    )
    near = (
        near_contamination_pairs(
            corpus,
            bench,
            threshold=args.threshold,
            id_col=args.id_col,
            text_col=args.text_col,
        )
        .select(F.col("corpus_id").alias("flagged_id"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    flagged = exact.union(near).distinct().localCheckpoint(eager=True)
    if args.output:
        kept = corpus.join(
            flagged, corpus[args.id_col] == flagged["flagged_id"], "left_anti"
        )
        kept.write.mode(args.mode).parquet(args.output)
    return {
        "command": "decontam",
        "input": args.input,
        "benchmark": args.benchmark,
        "exact_flagged": exact.count(),
        "near_flagged": near.count(),
        "total_flagged": flagged.count(),
        "output": args.output,
    }


def cmd_drift(args) -> dict:
    from hama_spark.extensions.expectations import distribution_drift

    if not args.column and not args.vector_column:
        raise SystemExit("drift: pass --column and/or --vector-column")
    spark = _spark()
    old, new = _read(spark, args.old), _read(spark, args.new)
    out: dict = {"command": "drift"}
    if args.column:
        rows = [
            r.asDict()
            for r in distribution_drift(
                old, new, args.column, n_buckets=args.buckets
            ).collect()
        ]
        out |= {
            "column": args.column,
            "psi_total": rows[0]["psi_total"] if rows else None,
            "buckets": rows,
        }
    if args.vector_column:
        from hama_spark.extensions.vectors import embedding_drift

        out["embedding"] = embedding_drift(
            old, new, vec_col=args.vector_column
        ).first().asDict()
    return out


def cmd_lshplan(args) -> dict:
    """Driver-side math only — no Spark session."""
    from hama_spark.extensions.lsh_plan import plan_cosine, plan_minhash

    if args.cosine:
        plan = plan_cosine(
            args.threshold,
            target_recall=args.target_recall,
            max_planes=args.max_planes,
            max_tables=args.max_tables,
            probes=args.probes,
        )
    else:
        plan = plan_minhash(
            args.threshold,
            max_hashes=args.max_hashes,
            fp_weight=args.fp_weight,
            fn_weight=args.fn_weight,
        )
    return {"command": "lshplan", "cosine": bool(args.cosine), **plan}


def cmd_scaling(args) -> dict:
    from hama_spark.extensions.scaling import heaps_curve, heaps_fit, zipf_fit

    spark = _spark()
    docs = _read(spark, args.input)
    zipf = zipf_fit(
        docs, top_n=args.top_n, skip_top=args.skip_top, text_col=args.text_col
    ).first()
    curve = heaps_curve(docs, points=args.points, text_col=args.text_col)
    curve_rows = [r.asDict() for r in curve.collect()]
    try:
        heaps = heaps_fit(curve_rows)  # fit from the collected points —
        # passing the DataFrame would re-run the corpus DAG
    except ValueError as e:  # degenerate corpora still get the curve
        heaps = {"error": str(e)}
    return {
        "command": "scaling",
        "input": args.input,
        "zipf": zipf.asDict() if zipf else None,
        "heaps": heaps,
        "curve": curve_rows,
    }


def cmd_layout(args) -> dict:
    from hama_spark.sources.inspect import clustering_score, parquet_layout_report

    spark = _spark()
    score = clustering_score(spark, args.input, args.column)
    out = {"command": "layout", "input": args.input, "column": args.column, **score}
    if args.files:
        out["files"] = [
            r.asDict()
            for r in parquet_layout_report(spark, args.input, args.column).collect()
        ]
    return out


def cmd_card(args) -> dict:
    from hama_spark.extensions.datacard import dataset_card, write_dataset_card

    spark = _spark()
    docs = _read(spark, args.input)
    if args.output:
        md = write_dataset_card(
            docs, args.output, name=args.name, text_col=args.text_col
        )
    else:
        md = dataset_card(docs, name=args.name, text_col=args.text_col)
        print(md, file=sys.stderr)
    return {
        "command": "card",
        "input": args.input,
        "output": args.output,
        "chars": len(md),
    }


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="hama_spark")
    sub = p.add_subparsers(dest="command", required=True)

    sp = sub.add_parser("profile", help="one-pass per-column profile")
    sp.add_argument("--input", required=True)
    sp.add_argument("--columns", default=None)
    sp.add_argument("--corr", action="store_true",
                    help="also emit the pairwise numeric correlation matrix")
    sp.set_defaults(fn=cmd_profile)

    sp = sub.add_parser("prepare", help="end-to-end corpus preparation")
    sp.add_argument("--input", required=True)
    sp.add_argument("--output", required=True)
    sp.add_argument("--benchmark", default=None)
    sp.add_argument("--min-quality", type=float, default=0.3)
    sp.add_argument("--threshold", type=float, default=0.5)
    sp.add_argument("--keep-best-by", default=None,
                    help="numeric column whose argmax survives each near-dup cluster")
    sp.add_argument("--id-col", default="doc_id")
    sp.add_argument("--text-col", default="text")
    sp.add_argument("--mode", default="error")
    sp.set_defaults(fn=cmd_prepare)

    sp = sub.add_parser("dedup", help="near-dup collapse, keep survivors")
    sp.add_argument("--input", required=True)
    sp.add_argument("--output", required=True)
    sp.add_argument("--threshold", type=float, default=0.5)
    sp.add_argument("--id-col", default="doc_id")
    sp.add_argument("--text-col", default="text")
    sp.add_argument("--mode", default="error")
    sp.set_defaults(fn=cmd_dedup)

    sp = sub.add_parser(
        "decontam", help="flag/drop train docs leaking eval benchmark content"
    )
    sp.add_argument("--input", required=True)
    sp.add_argument("--benchmark", required=True)
    sp.add_argument("--output", default=None)
    sp.add_argument("--max-overlap", type=float, default=0.8,
                    help="exact shingle-overlap fraction that flags a doc")
    sp.add_argument("--threshold", type=float, default=0.5,
                    help="near-dup whole-doc Jaccard that flags a doc")
    sp.add_argument("--bloom", action="store_true",
                    help="Bloom-prune the exact overlap pass (same result; "
                    "use when the benchmark side is itself corpus-sized)")
    sp.add_argument("--id-col", default="doc_id")
    sp.add_argument("--text-col", default="text")
    sp.add_argument("--mode", default="error")
    sp.set_defaults(fn=cmd_decontam)

    sp = sub.add_parser("drift", help="PSI / embedding drift between two snapshots")
    sp.add_argument("--old", required=True)
    sp.add_argument("--new", required=True)
    sp.add_argument("--column", default=None)
    sp.add_argument("--buckets", type=int, default=10)
    sp.add_argument("--vector-column", default=None,
                    help="embedding column: also emit centroid/norm drift")
    sp.set_defaults(fn=cmd_drift)

    sp = sub.add_parser(
        "lshplan", help="pick LSH parameters from a similarity threshold (no Spark)"
    )
    sp.add_argument("--threshold", type=float, required=True)
    sp.add_argument("--cosine", action="store_true",
                    help="plan hyperplane LSH (planes/tables) instead of MinHash")
    sp.add_argument("--max-hashes", type=int, default=128)
    sp.add_argument("--fp-weight", type=float, default=1.0)
    sp.add_argument("--fn-weight", type=float, default=1.0)
    sp.add_argument("--target-recall", type=float, default=0.9)
    sp.add_argument("--max-planes", type=int, default=24)
    sp.add_argument("--max-tables", type=int, default=32)
    sp.add_argument("--probes", type=int, default=1)
    sp.set_defaults(fn=cmd_lshplan)

    sp = sub.add_parser(
        "layout", help="parquet clustering score (files hit per point lookup)"
    )
    sp.add_argument("--input", required=True)
    sp.add_argument("--column", required=True)
    sp.add_argument("--files", action="store_true",
                    help="also list per-file min/max footer stats")
    sp.set_defaults(fn=cmd_layout)

    sp = sub.add_parser("card", help="markdown dataset card for a corpus")
    sp.add_argument("--input", required=True)
    sp.add_argument("--output", default=None,
                    help="write the markdown here (any Hadoop-FS scheme); "
                         "omit to print to stderr")
    sp.add_argument("--name", default="corpus")
    sp.add_argument("--text-col", default="text")
    sp.set_defaults(fn=cmd_card)

    sp = sub.add_parser("scaling", help="Zipf slope + Heaps vocab-growth report")
    sp.add_argument("--input", required=True)
    sp.add_argument("--text-col", default="text")
    sp.add_argument("--top-n", type=int, default=200)
    sp.add_argument("--skip-top", type=int, default=0)
    sp.add_argument("--points", type=int, default=20)
    sp.set_defaults(fn=cmd_scaling)

    args = p.parse_args(argv)
    out = args.fn(args)
    print(json.dumps(out, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
