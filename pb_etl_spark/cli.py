"""CLI entry point (parity with reference cli.py:6-16 / __main__.py).

``python -m pb_etl_spark [--workdir DIR] [--root DIR] [--seed N] [--master M]``
runs the full parity pipeline and prints the expected-vs-actual report.
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
    args = p.parse_args(argv)

    from pb_etl_spark.pipeline import run_pipeline
    from pb_etl_spark.session import get_spark

    spark = get_spark("pb_etl_spark", master=args.master)
    report, runner = run_pipeline(spark, args.workdir, root=args.root, seed=args.seed)
    print(json.dumps({"report": report, "ran": runner.ran, "skipped": runner.skipped}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
