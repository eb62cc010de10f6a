"""CLI entry point (the reference's ``python main.py`` analogue).

    python -m options_data_pipeline_spark run-batch --sf-dir DIR --out DIR
    python -m options_data_pipeline_spark sql --sf-dir DIR "SELECT ..."
    python -m options_data_pipeline_spark query NAME --sf-dir DIR [-n 20]
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="options_data_pipeline_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    rb = sub.add_parser("run-batch", help="run the batch volatility pipeline")
    rb.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    rb.add_argument("--out", required=True, help="market_data sink dir")
    rb.add_argument("--state", default=None, help="atr_state snapshot dir")

    qs = sub.add_parser("sql", help="run ad-hoc SQL over registered views")
    qs.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    qs.add_argument("stmt")
    qs.add_argument("-n", type=int, default=20)

    qq = sub.add_parser("query", help="run a named registry query")
    qq.add_argument("name")
    qq.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    qq.add_argument("-n", type=int, default=20)

    sub.add_parser("list", help="list registry queries")

    args = p.parse_args(argv)

    from .session import get_spark
    from . import registry

    if args.cmd == "list":
        for name in registry.queries():
            print(name)
        return 0

    spark = get_spark("odp-cli")
    try:
        if args.cmd == "run-batch":
            from .sources.tables import load_ticks
            from .pipeline import run_batch

            n = run_batch(load_ticks(spark, args.sf_dir), args.out, state_path=args.state)
            print(f"wrote {n} rows to {args.out}")
        elif args.cmd == "sql":
            from .sql import create_views

            create_views(spark, args.sf_dir)
            spark.sql(args.stmt).show(args.n, truncate=False)
        elif args.cmd == "query":
            registry.queries()[args.name](spark, args.sf_dir).show(args.n, truncate=False)
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
