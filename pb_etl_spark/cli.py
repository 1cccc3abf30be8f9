"""CLI entry point (parity with reference cli.py:6-16 / __main__.py).

``python -m pb_etl_spark [--workdir DIR] [--root DIR] [--seed N] [--master M]``
runs the full parity pipeline and prints the expected-vs-actual report.

``python -m pb_etl_spark --corpus --sf-dir DIR`` runs the corpus-curation
DAG (filter → dedup → pack → report) against a testdata sf directory
instead — same salted incremental semantics, LLM-corpus workload.
"""

from __future__ import annotations

import argparse
import json


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="pb_etl_spark")
    p.add_argument("--workdir", default="./data/repository", help="salted stage output root")
    p.add_argument("--root", default=None, help="external CSV root (else $PB_ETL_SPARK_DATA_ROOT)")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--master", default="local[*]")
    # parity: the reference parses --full and ignores it (cli.py:9-16)
    p.add_argument("--full", action="store_true", help=argparse.SUPPRESS)
    p.add_argument(
        "--corpus", action="store_true", help="run the corpus-curation DAG instead"
    )
    p.add_argument(
        "--sf-dir",
        default="/root/testdata/sf0.001",
        help="testdata scale-factor dir for --corpus",
    )
    p.add_argument(
        "--epoch",
        type=int,
        default=0,
        help="training epoch for --corpus: bumping it re-runs only the "
        "shuffle stage (prefix stages reused from their content address)",
    )
    args = p.parse_args(argv)

    from pb_etl_spark.session import get_spark

    spark = get_spark("pb_etl_spark", master=args.master)
    if args.corpus:
        from pb_etl_spark.corpus_pipeline import run_corpus_pipeline

        print(
            json.dumps(
                run_corpus_pipeline(
                    spark, args.sf_dir, args.workdir, epoch=args.epoch
                )
            )
        )
        return 0

    from pb_etl_spark.pipeline import run_pipeline

    report, runner = run_pipeline(spark, args.workdir, root=args.root, seed=args.seed)
    print(json.dumps({"report": report, "ran": runner.ran, "skipped": runner.skipped}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
