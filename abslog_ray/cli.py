"""Thin CLI (SURVEY.md §2 X3; reference: log_show.py argparse subcommands
``request`` / ``distribution`` / ``detail`` and the cron-invoked
log_analyse.py collector).

    python -m abslog_ray.cli run --input DIR --sink DIR [--checkpoint DIR] [--dedup]
    python -m abslog_ray.cli request --sink DIR [-l N] [-f ISO] [-t ISO] [-s ROLE]
    python -m abslog_ray.cli detail --sink DIR --pattern P [-l N]
    python -m abslog_ray.cli distribution --sink DIR [--unit hour] [--pattern P]
    python -m abslog_ray.cli query --name NAME [--sf-dir DIR] [--list]

Owns its Ray session (the ONLY library-adjacent place allowed to init Ray
besides bench.py and the test fixture).
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray():
    import os

    import ray
    if not ray.is_initialized():
        # Defer the address to the environment: under `ray job submit`
        # RAY_ADDRESS points at the cluster and a hard-coded
        # address="local" would silently start a fresh single-node
        # instance INSIDE the job instead of using the cluster.  With no
        # env set, "local" keeps the standalone-CLI behavior.
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")
    from abslog_ray.config import tune_data_context
    tune_data_context()


def main(argv=None):
    ap = argparse.ArgumentParser(prog="abslog_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    runp = sub.add_parser("run", help="collector: parse->enrich->route->aggregate")
    runp.add_argument("--input", required=True)
    runp.add_argument("--sink", required=True)
    runp.add_argument("--checkpoint")
    runp.add_argument("--chunk-files", type=int, default=64)
    runp.add_argument("--dedup", action="store_true",
                      help="drop duplicate turn texts (keep first; "
                           "cross-chunk via the routed sink's fp64 column)")

    qp = sub.add_parser("query", help="run any registry query by name")
    qp.add_argument("--name")
    qp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    qp.add_argument("-l", "--limit", type=int, default=20,
                    help="max rows to print (0 = all)")
    qp.add_argument("--list", action="store_true",
                    help="list available query names and exit")

    for name in ("request", "detail", "distribution"):
        q = sub.add_parser(name)
        q.add_argument("--sink", required=True)
        q.add_argument("-l", "--limit", type=int, default=10)
        q.add_argument("-f", "--t-from")
        q.add_argument("-t", "--t-to")
        q.add_argument("-s", "--role")
        if name == "detail":
            q.add_argument("--pattern", required=True)
        if name == "distribution":
            q.add_argument("--unit", default="hour",
                           choices=["minute", "ten_min", "hour", "day"])
            q.add_argument("--pattern",
                           help="restrict to one abstracted pattern "
                                "(reference: distribution for one uri_abs)")
        q.add_argument("--metric", default="hits",
                       choices=["hits", "bytes_sum", "err_hits"])

    args = ap.parse_args(argv)
    _init_ray()

    import pandas as pd
    import ray

    if args.cmd == "query":
        from abslog_ray.pipelines.queries import QUERIES
        if args.list or args.name is None or args.name not in QUERIES:
            print("available queries:", ", ".join(sorted(QUERIES)))
            return 0 if (args.list or args.name is None) else 2
        fn, _sql = QUERIES[args.name]
        res = fn(args.sf_dir)
        if isinstance(res, ray.data.Dataset) and args.limit:
            # push the limit into the Dataset so row-level queries (chunks,
            # conversation_texts, ...) never materialize the whole corpus
            # driver-side just to print a few rows (ADVICE r02)
            res = res.limit(args.limit)
        if not isinstance(res, pd.DataFrame):
            res = res.to_pandas()     # Dataset and pyarrow.Table both have it
        if args.limit:
            res = res.head(args.limit)
        print(res.to_string())
        import ray
        ray.shutdown()
        return 0

    if args.cmd == "run":
        from abslog_ray.config import PipelineConfig
        from abslog_ray.fixtures import ROLE_SINKS, TOOL_CATS
        from abslog_ray.pipelines.run import run_pipeline
        cfg = PipelineConfig(tool_lookup=dict(TOOL_CATS),
                             role_lookup=dict(ROLE_SINKS),
                             sink_root=args.sink,
                             checkpoint_dir=args.checkpoint,
                             chunk_files=args.chunk_files,
                             dedup_turns=args.dedup)
        metrics = run_pipeline(args.input, cfg)
        print(json.dumps(metrics, indent=1, default=str))
        return 0

    from abslog_ray.pipelines import show
    ds = show.read_summaries(args.sink)
    t_from = pd.Timestamp(args.t_from) if args.t_from else None
    t_to = pd.Timestamp(args.t_to) if args.t_to else None
    ds = show.filter_range(ds, t_from, t_to, args.role)

    if args.cmd == "request":
        out = show.top_patterns(ds, metric=args.metric, n=args.limit)
    elif args.cmd == "detail":
        out = show.pattern_detail(ds, args.pattern, n=args.limit)
    else:
        out = show.distribution(ds, args.unit, pattern=args.pattern)
    print(out.to_pandas().to_string())
    import ray
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
