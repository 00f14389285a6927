"""CLI entry points (reference CLI parity, /root/reference/src/main.rs:37-62):

  python -m ru_cdc_spark gen-config <path>   # --gen analog (config scaffold)
  python -m ru_cdc_spark serve <config>      # --serve analog (run pipeline)
  python -m ru_cdc_spark check [sf_dir]      # correctness gate
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="ru_cdc_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    gen = sub.add_parser("gen-config", help="write a scaffold config JSON")
    gen.add_argument("path")

    serve = sub.add_parser("serve", help="run the streaming CDC pipeline")
    serve.add_argument("config")
    serve.add_argument("--once", action="store_true",
                       help="process available data and exit (availableNow)")

    check = sub.add_parser("check", help="run the DuckDB-oracle correctness gate")
    check.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.001")

    snap = sub.add_parser(
        "snapshot",
        help="resumable DBLog-style incremental snapshot of a live "
             "table (chunked, watermark-deduped, re-runnable: "
             "completed chunks are skipped)")
    snap.add_argument("host")
    snap.add_argument("port", type=int)
    snap.add_argument("table")
    snap.add_argument("out_dir")
    snap.add_argument("--user", default="repl")
    snap.add_argument("--password", default="replpass")
    snap.add_argument("--db", default="app")
    snap.add_argument("--chunk", type=int, default=10_000)
    snap.add_argument("--keyset", action="store_true",
                      help="equal-count chunk bounds (sparse pks)")

    args = parser.parse_args(argv)

    if args.cmd == "gen-config":
        from ru_cdc_spark.config import PipelineConfig

        PipelineConfig.gen_default().save_to(args.path)
        print(f"wrote scaffold config to {args.path}")
        return 0

    if args.cmd == "serve":
        from ru_cdc_spark.config import PipelineConfig
        from ru_cdc_spark.session import get_spark
        from ru_cdc_spark.streaming.pipeline import CdcPipeline

        cfg = PipelineConfig.load_from(args.config)
        spark = get_spark("ru_cdc_spark_serve")
        pipe = CdcPipeline(spark, cfg)
        query = pipe.start_to_sinks()
        if args.once:
            query.awaitTermination()
        else:  # run until interrupted
            spark.streams.awaitAnyTermination()
        return 0

    if args.cmd == "snapshot":
        from ru_cdc_spark.session import get_spark
        from ru_cdc_spark.sources.incremental_snapshot import (
            plan_snapshot,
            run_snapshot_resumable,
        )

        import json as _json
        import os as _os

        spark = get_spark("ru_cdc_spark_snapshot")
        plan = plan_snapshot(args.host, args.port, args.user,
                             args.password, args.table, args.chunk,
                             db=args.db, keyset=args.keyset)
        df = run_snapshot_resumable(spark, args.host, args.port,
                                    args.user, args.password, plan,
                                    args.out_dir)
        n = df.count()
        # on RESUME the runner executes the PERSISTED original plan —
        # report ITS coordinates, not the fresh re-plan's (starting
        # the change stream at the later position would skip every
        # change between the original and new start)
        with open(_os.path.join(args.out_dir, "plan.json")) as fh:
            eff = _json.load(fh)
        print(f"snapshot of {args.table}: {n} rows across "
              f"{len(eff['ranges'])} chunks -> {args.out_dir} "
              f"(stream from {eff['start_file']}:{eff['start_pos']})")
        return 0

    if args.cmd == "check":
        from tools.check_correctness import main as check_main

        sys.argv = ["check_correctness", args.sf_dir]
        return check_main()

    return 2


if __name__ == "__main__":
    raise SystemExit(main())
