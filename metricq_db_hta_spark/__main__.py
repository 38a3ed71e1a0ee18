"""CLI entry point (the reference's main.cpp analogue:
/root/reference/src/main.cpp — CLI flags, construct the service, run).

Subcommands:

  ingest   --input DIR --store DIR [--continuous]   streaming ingest A1-A6
  backfill --source DIR --store DIR                 bulk import (A18)
  history  --store DIR --type TYPE [--metric M]     Q1-Q4 over a store
           [--start NS] [--end NS] [--interval-max NS]
  query    --name NAME [--sf-dir DIR]               any declared query
  compact  --store DIR [--min-batches N]            raw small-file OPTIMIZE
           [--defer-delete]                         snapshot-isolated mode
  vacuum   --store DIR [--grace-s S]                delete expired retired batches (no Spark)
  retain   --store DIR [--raw-max-age-s S]          tiered TTL expiry (no Spark)
           [--level-max-age W_NS=AGE_S ...] [--hist-max-age W_NS=AGE_S ...]
           [--counter-max-age W_NS=AGE_S ...]
  backup   --store DIR --dest DIR                   snapshot-pinned consistent copy (no Spark)
  store-stats --store DIR                           batch/file/journal health (no Spark)
  fsck     --store DIR [--start NS] [--end NS]      audit levels vs raw recompute
  delete-metric --store DIR --metric M [--dry-run]  erase one metric everywhere
  rename-metric --store DIR --old A --new B         migrate a metric's history
  sql      --store DIR "SELECT ..."                 ad-hoc Spark SQL over the store
  export   --store DIR --dest DIR [--format csv]    dump raw samples (csv/jsonl/parquet)
  serve    --store DIR [--host H] [--port P]        resident history RPC

Examples:
  python -m metricq_db_hta_spark ingest --input /data/chunks --store /data/hta
  python -m metricq_db_hta_spark history --store /data/hta --type last_value
  python -m metricq_db_hta_spark query --name hta_level0
"""

from __future__ import annotations

import argparse
import os
import sys

from metricq_db_hta_spark.functions.timeutil import TS_MAX_NS
from metricq_db_hta_spark.session import get_spark


def _history_service(spark, store: str, widths: list[int] | None):
    # single owner of the store read path (journal honoring + missing-level
    # tolerance): plans/serve.py
    from metricq_db_hta_spark.plans.serve import build_history_service

    return build_history_service(spark, store, widths)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="metricq_db_hta_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    pi = sub.add_parser("ingest")
    pi.add_argument("--input", required=True)
    pi.add_argument("--store", required=True)
    pi.add_argument("--width-ns", type=int, default=3_600_000_000_000)
    pi.add_argument("--levels", type=int, default=3)
    pi.add_argument("--hist-levels", type=int, default=0,
                    help="also maintain N distributional (histogram) "
                    "levels at the same widths (0 = off)")
    pi.add_argument("--counter-levels", type=int, default=0,
                    help="also maintain N counter (increase/reset) "
                    "levels at the same widths (0 = off)")
    pi.add_argument("--continuous", action="store_true")
    pi.add_argument("--format", choices=["parquet", "csv", "jsonl"],
                    default="parquet", dest="ingest_format",
                    help="chunk encoding (schema-pinned csv/jsonl via "
                    "sources/formats.py options)")

    pb = sub.add_parser("backfill")
    pb.add_argument("--source", required=True)
    pb.add_argument("--format", choices=["parquet", "csv", "jsonl"],
                    default="parquet",
                    help="source encoding; csv/jsonl read schema-pinned "
                    "(sources/formats.py) — e.g. re-importing an `export`")
    pb.add_argument("--store", required=True)
    pb.add_argument("--width-ns", type=int, default=3_600_000_000_000)
    pb.add_argument("--levels", type=int, default=3)
    pb.add_argument("--hist-levels", type=int, default=0,
                    help="also maintain N distributional (histogram) "
                    "levels at the same widths (0 = off)")
    pb.add_argument("--counter-levels", type=int, default=0,
                    help="also maintain N counter (increase/reset) "
                    "levels at the same widths (0 = off)")

    ph = sub.add_parser("history")
    ph.add_argument("--store", required=True)
    ph.add_argument(
        "--type",
        required=True,
        choices=[
            "aggregate_timeline", "flex_timeline", "aggregate",
            "aggregate_tiered", "timeline_tiered", "last_value",
            "gapfill_timeline", "resample",
            "aggregate_timeline_pattern", "aggregate_pattern",
            "counter_rate",
        ],
    )
    ph.add_argument("--metric", default=None)
    ph.add_argument("--pattern", default=None,
                    help="metric glob (* any run, ? one char — e.g. "
                    "'host.*.power'): required by the *_pattern types, "
                    "and an alternative to --metric for "
                    "aggregate_timeline (per-metric lines), "
                    "gapfill_timeline (dense merged fleet line) and "
                    "last_value (fleet current values)")
    ph.add_argument("--start", type=int, default=0)
    ph.add_argument("--end", type=int, default=TS_MAX_NS)
    ph.add_argument("--interval-max", type=int, default=TS_MAX_NS)
    ph.add_argument("--step-ns", type=int, default=0,
                    help="resample grid step (resample type only)")
    ph.add_argument("--width-ns", type=int, default=3_600_000_000_000)
    ph.add_argument("--attribution", choices=["range", "stored"],
                    default="range",
                    help="counter_rate only: 'range' nulls the first "
                    "in-range sample (monitoring range semantics); "
                    "'stored' uses the persisted full-history increase "
                    "chain — servable from counter levels even where "
                    "raw has expired (unservable edge slivers printed)")
    ph.add_argument("--levels", type=int, default=None,
                    help="level count (with --width-ns); default: discover "
                    "the level tables from the store layout")

    pq = sub.add_parser("query")
    pq.add_argument("--name", required=True)
    pq.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    pq.add_argument("--limit", type=int, default=20)

    pc = sub.add_parser("compact")
    pc.add_argument("--store", required=True)
    pc.add_argument("--min-batches", type=int, default=2)
    pc.add_argument(
        "--defer-delete",
        action="store_true",
        help="retire sources instead of deleting them (snapshot-isolated "
        "compaction: concurrent readers keep their pinned version; run "
        "'vacuum' after the grace period to reclaim space)",
    )
    pc.add_argument(
        "--force-recover",
        action="store_true",
        help="roll back a fresh writing-state journal even though a live "
        "compaction may own it (operator's explicit crash adjudication)",
    )

    pst = sub.add_parser("store-stats")
    pst.add_argument("--store", required=True)
    pst.add_argument("--list-metrics", action="store_true",
                     help="include the store's metric names (from the "
                     "finest level table's partition layout — a directory "
                     "listing, no data read; the CLI twin of the serve "
                     "list_metrics request)")
    pst.add_argument("--pattern", default=None,
                     help="glob filter for --list-metrics (* any run, "
                     "? one char)")

    pv = sub.add_parser("vacuum")
    pv.add_argument("--store", required=True)
    pv.add_argument(
        "--grace-s",
        type=float,
        default=15 * 60.0,
        help="minimum age (s) of a retired batch before deletion; size "
        "above the longest-running read against this store",
    )

    pr = sub.add_parser("retain")
    pr.add_argument("--store", required=True)
    pr.add_argument(
        "--raw-max-age-s",
        type=float,
        default=None,
        help="expire raw sample partitions older than this many seconds",
    )
    pr.add_argument(
        "--level-max-age",
        action="append",
        default=[],
        metavar="WIDTH_NS=AGE_S",
        help="expire one aggregate level's partitions past AGE_S seconds "
        "(repeatable; unlisted levels are kept forever — coarser levels "
        "must be retained at least as long as finer ones)",
    )
    pr.add_argument(
        "--hist-max-age",
        action="append",
        default=[],
        metavar="WIDTH_NS=AGE_S",
        help="same for a distributional (histogram) level",
    )
    pr.add_argument(
        "--counter-max-age",
        action="append",
        default=[],
        metavar="WIDTH_NS=AGE_S",
        help="same for a counter (increase/reset) level",
    )
    pr.add_argument(
        "--dry-run",
        action="store_true",
        help="plan only: report the floors and partition-dir counts this "
        "policy would expire, without advertising or deleting anything",
    )

    pbk = sub.add_parser("backup")
    pbk.add_argument("--store", required=True)
    pbk.add_argument("--dest", required=True,
                     help="destination directory (must not exist); the "
                     "copy is itself a valid store — raw pinned to the "
                     "CURRENT snapshot, levels + retention floors along; "
                     "run 'fsck --repair' on it if backed up live")

    pdm = sub.add_parser("delete-metric")
    pdm.add_argument("--store", required=True)
    pdm.add_argument("--metric", required=True,
                     help="exact metric name to erase from raw, every "
                     "level/hist table, and the drops_log; refuses while "
                     "a batch holding it is torn or replayable")
    pdm.add_argument("--dry-run", action="store_true",
                     help="run every guard and count what WOULD be "
                     "removed without touching the store")

    pex = sub.add_parser("export")
    pex.add_argument("--store", required=True)
    pex.add_argument("--dest", required=True,
                     help="output directory (must not exist)")
    pex.add_argument("--format", choices=["csv", "jsonl", "parquet"],
                     default="csv")
    pex.add_argument("--metric", default=None)
    pex.add_argument("--pattern", default=None,
                     help="metric glob (mutually exclusive with --metric)")
    pex.add_argument("--start", type=int, default=0)
    pex.add_argument("--end", type=int, default=TS_MAX_NS)

    psq = sub.add_parser("sql")
    psq.add_argument("--store", required=True)
    psq.add_argument("query",
                     help="Spark SQL over the store views: raw, "
                     "level_<width>, hist_<width>, drops_log")
    psq.add_argument("--max-rows", type=int, default=100)
    psq.add_argument("--explain", action="store_true",
                     help="print the formatted physical plan instead of "
                     "executing (verify pruning/pushdown in production)")

    prm = sub.add_parser("rename-metric")
    prm.add_argument("--store", required=True)
    prm.add_argument("--old", required=True, help="current metric name")
    prm.add_argument("--new", required=True,
                     help="target name; must not already exist in the "
                     "store (histories are never merged)")
    prm.add_argument("--dry-run", action="store_true")

    pf = sub.add_parser("fsck")
    pf.add_argument("--store", required=True)
    pf.add_argument("--start", type=int, default=None,
                    help="audit only buckets with start >= this ns")
    pf.add_argument("--end", type=int, default=None,
                    help="audit only buckets with start < this ns")
    pf.add_argument(
        "--repair",
        action="store_true",
        help="after the audit, rebuild every level/hist table from "
        "committed raw (partitions above the raw retention floor only — "
        "below it the level rows are the sole copy of expired history) "
        "and re-audit; quiesce writers first",
    )

    ps = sub.add_parser("serve")
    ps.add_argument("--store", required=True)
    ps.add_argument("--host", default="127.0.0.1")
    ps.add_argument("--port", type=int, default=8765)
    ps.add_argument("--width-ns", type=int, default=3_600_000_000_000)
    ps.add_argument("--levels", type=int, default=None,
                    help="level count (with --width-ns); default: discover "
                    "the level tables from the store layout")

    args = p.parse_args(argv)

    if args.cmd == "store-stats":
        # pure metadata: no SparkSession needed — usable while a writer runs
        import json as _json

        from metricq_db_hta_spark.operators.retention import retention_floors
        from metricq_db_hta_spark.streaming import store_meta

        def _table_bytes(root: str) -> int:
            total = 0
            for dirpath, _, files in os.walk(root):
                total += sum(
                    os.path.getsize(os.path.join(dirpath, f))
                    for f in files
                    if f.endswith(".parquet")
                )
            return total

        on_disk = store_meta.raw_batches_on_disk(args.store)
        committed = store_meta.committed_batches(args.store)
        stats = {
            "batches_on_disk": sorted(on_disk),
            "committed": sorted(committed & on_disk),
            "uncommitted": sorted(on_disk - committed),
            # offsets-minus-commits: ids the engine WILL replay (at most
            # one) - NOT mere commits-file absence, which also happens for
            # purged/rebuilt checkpoints that can never replay
            "replay_pending": sorted(
                store_meta.replayable_batches(args.store) & on_disk
            ),
            "raw_files": store_meta.data_file_count(
                store_meta.raw_path(args.store)
            ),
            "files_per_batch": {
                str(b): store_meta.data_file_count(
                    store_meta.batch_dir(args.store, b)
                )
                for b in sorted(on_disk)
            },
            "compaction_journal_pending": os.path.exists(
                store_meta.journal_path(args.store)
            ),
            "retired_awaiting_vacuum": sorted(
                store_meta.retired_batches(args.store)
            ),
            "snapshot_version": (
                store_meta.current_snapshot(args.store) or {}
            ).get("version"),
            "retention_floors": retention_floors(args.store),
            # bytes per table tier — what a retention policy trades away;
            # driver-side walk, no Spark
            "bytes_per_table": {
                name: _table_bytes(os.path.join(args.store, name))
                for name in sorted(os.listdir(args.store))
                if name == "raw"
                or name.partition("_")[0] in ("level", "hist")
                and name.partition("_")[2].isdigit()
            },
        }
        if args.list_metrics:
            from urllib.parse import unquote as _unquote

            from metricq_db_hta_spark.plans.history import glob_match

            widths = sorted(
                int(n.split("_", 1)[1])
                for n in os.listdir(args.store)
                if n.startswith("level_") and n.split("_", 1)[1].isdigit()
            )
            names: list[str] = []
            if widths:
                troot = os.path.join(args.store, f"level_{widths[0]}")
                names = sorted(
                    _unquote(n.split("=", 1)[1])
                    for n in os.listdir(troot)
                    if n.startswith("metric=")
                )
            if args.pattern:
                names = [n for n in names if glob_match(n, args.pattern)]
            stats["metrics"] = names
        print(_json.dumps(stats, indent=2))
        return 0

    if args.cmd == "vacuum":
        from metricq_db_hta_spark.operators import maintenance

        try:
            gone = maintenance.vacuum(args.store, grace_s=args.grace_s)
        except RuntimeError as e:
            print(f"vacuum: {e}", file=sys.stderr)
            return 2
        print(f"vacuumed {len(gone)} retired batches: {gone}", file=sys.stderr)
        return 0

    if args.cmd == "backup":
        # manifest-pinned file copy: no SparkSession needed
        from metricq_db_hta_spark.operators.backup import backup_store

        try:
            res = backup_store(args.store, args.dest)
        except ValueError as e:
            print(f"backup: {e}", file=sys.stderr)
            return 2
        print(
            f"backed up snapshot v{res.snapshot_version}: batches "
            f"{res.batches}, tables {res.tables}, {res.n_files} files / "
            f"{res.n_bytes} bytes -> {args.dest}",
            file=sys.stderr,
        )
        return 0

    if args.cmd == "retain":
        # pure metadata walk (operators/retention.py) — no SparkSession
        import time as _time

        from metricq_db_hta_spark.operators import retention as _ret

        def _ages(pairs: list[str], flag: str) -> dict[int, int]:
            out = {}
            for spec in pairs:
                try:
                    w, age_s = spec.split("=", 1)
                    out[int(w)] = int(float(age_s) * 1e9)
                except ValueError:
                    p.error(f"--{flag} expects WIDTH_NS=AGE_S, got {spec!r}")
            return out

        try:
            policy = _ret.RetentionPolicy(
                raw_max_age_ns=(
                    int(args.raw_max_age_s * 1e9)
                    if args.raw_max_age_s is not None
                    else None
                ),
                level_max_age_ns=_ages(args.level_max_age, "level-max-age"),
                hist_max_age_ns=_ages(args.hist_max_age, "hist-max-age"),
                counter_max_age_ns=_ages(
                    args.counter_max_age, "counter-max-age"
                ),
            )
            res = _ret.expire(
                args.store,
                policy,
                now_ns=int(_time.time() * 1e9),
                dry_run=args.dry_run,
            )
        except (ValueError, RuntimeError) as e:
            print(f"retain: {e}", file=sys.stderr)
            return 2
        verb = "would expire" if args.dry_run else "expired"
        print(
            f"{verb} {res.deleted_dirs} partition dirs; "
            f"emptied batches {res.emptied_batches}; floors {res.floors}",
            file=sys.stderr,
        )
        return 0

    if args.cmd in ("delete-metric", "rename-metric"):
        # per-metric surgery is metadata-only directory work UNLESS the
        # store keeps a drops_log (or a torn swap of one) — only then pay
        # the Spark startup the metadata path doesn't need
        from metricq_db_hta_spark.operators.erase import (
            delete_metric,
            rename_metric,
        )

        dl = os.path.join(args.store, "drops_log")
        needs_spark = os.path.isdir(dl) or os.path.isdir(dl + ".swap_old")
        sp = get_spark("metricq-db-hta-spark-cli") if needs_spark else None
        try:
            if args.cmd == "delete-metric":
                res = delete_metric(
                    args.store, args.metric, spark=sp, dry_run=args.dry_run
                )
                verb = "would erase" if args.dry_run else "erased"
                print(
                    f"{verb} metric {args.metric!r}: {res.raw_dirs} raw "
                    f"batch partitions, {res.table_dirs} level/hist "
                    f"partitions, {res.drops_rows} drops_log rows; "
                    f"emptied batches {res.emptied_batches}",
                    file=sys.stderr,
                )
            else:
                res = rename_metric(
                    args.store, args.old, args.new, spark=sp,
                    dry_run=args.dry_run,
                )
                verb = "would rename" if args.dry_run else "renamed"
                print(
                    f"{verb} metric {args.old!r} -> {args.new!r}: "
                    f"{res.raw_dirs} raw batch partitions, "
                    f"{res.table_dirs} level/hist partitions, "
                    f"{res.drops_rows} drops_log rows",
                    file=sys.stderr,
                )
        except (RuntimeError, ValueError) as e:
            # guard refusals are operational outcomes, not bugs: the
            # message says what to settle first (journal, torn batch,
            # replay barrier, clash, typo'd name) — one line, no traceback
            print(f"{args.cmd}: {e}", file=sys.stderr)
            return 1
        return 0

    spark = get_spark("metricq-db-hta-spark-cli")

    if args.cmd in ("ingest", "backfill"):
        from metricq_db_hta_spark.streaming.ingest_stream import StreamingIngest

        widths = tuple(args.width_ns * 10**k for k in range(args.levels))
        hist = tuple(args.width_ns * 10**k for k in range(args.hist_levels))
        counters = tuple(
            args.width_ns * 10**k for k in range(args.counter_levels)
        )
        svc = StreamingIngest(
            spark, args.store, level_widths_ns=widths, hist_widths_ns=hist,
            counter_widths_ns=counters,
        )
        if args.cmd == "backfill":
            from metricq_db_hta_spark.streaming.ingest_stream import SAMPLE_SCHEMA

            if args.format == "csv":
                from metricq_db_hta_spark.sources import formats

                src = formats.read_csv(spark, args.source, SAMPLE_SCHEMA)
            elif args.format == "jsonl":
                from metricq_db_hta_spark.sources import formats

                src = formats.read_jsonl(spark, args.source, SAMPLE_SCHEMA)
            else:
                src = spark.read.schema(SAMPLE_SCHEMA).parquet(args.source)
            svc.backfill(src)
        elif args.continuous:
            q = svc.start(
                args.input, available_now=False,
                source_format=args.ingest_format,
            )
            q.awaitTermination()
        else:
            svc.run_until_drained(
                args.input, source_format=args.ingest_format
            )
        return 0

    if args.cmd == "history":
        # default: follow the writer's actual level set (store layout)
        widths = (
            None
            if args.levels is None
            else [args.width_ns * 10**k for k in range(args.levels)]
        )
        svc = _history_service(spark, args.store, widths)
        if args.type == "aggregate_timeline":
            df = svc.aggregate_timeline(
                args.metric, args.start, args.end, args.interval_max,
                pattern=args.pattern,
            )
        elif args.type == "flex_timeline":
            df = svc.flex_timeline(args.metric, args.start, args.end, args.interval_max)
        elif args.type == "aggregate":
            df = svc.aggregate(args.metric, args.start, args.end)
        elif args.type in ("aggregate_tiered", "timeline_tiered"):
            # retention-aware whole-range aggregate: expired-raw history
            # answered from retained coarse levels, uncovered slivers
            # printed (plans/history.py::aggregate_tiered)
            from metricq_db_hta_spark.operators.retention import (
                retention_floors,
            )

            fl = retention_floors(args.store)
            floors = {w: fl.get(f"level_{w}", 0) for w in svc.widths}
            if args.type == "aggregate_tiered":
                df, gaps = svc.aggregate_tiered(
                    args.metric, args.start, args.end, floors
                )
            else:
                df, gaps = svc.timeline_tiered(
                    args.metric, args.start, args.end, args.interval_max,
                    floors,
                )
            for lo, hi in gaps:
                print(f"uncovered: [{lo}, {hi})", file=sys.stderr)
        elif args.type == "gapfill_timeline":
            # dense types demand an explicit finite range (HistoryServer
            # applies the same contract + spine-size cap on the RPC path)
            if (args.metric is None) == (args.pattern is None) or (
                args.end == TS_MAX_NS
            ):
                print(
                    "gapfill_timeline requires exactly one of --metric/"
                    "--pattern and a finite --end"
                )
                return 2
            if args.pattern is not None:
                df = svc.aggregate_timeline_pattern_gapfill(
                    args.pattern, args.start, args.end, args.interval_max
                )
            else:
                df = svc.aggregate_timeline_gapfill(
                    args.metric, args.start, args.end, args.interval_max
                )
        elif args.type == "aggregate_timeline_pattern":
            if not args.pattern:
                print("aggregate_timeline_pattern requires --pattern")
                return 2
            df = svc.aggregate_timeline_pattern(
                args.pattern, args.start, args.end, args.interval_max
            )
        elif args.type == "aggregate_pattern":
            if not args.pattern:
                print("aggregate_pattern requires --pattern")
                return 2
            df = svc.aggregate_pattern(args.pattern, args.start, args.end)
        elif args.type == "counter_rate":
            if (args.metric is None) == (args.pattern is None):
                print(
                    "counter_rate requires exactly one of --metric/--pattern"
                )
                return 2
            if args.pattern is not None and args.attribution != "stored":
                # fleet merge (same semantics as the serve RPC's
                # counter_rate + pattern)
                df = svc.counter_rate_timeline_pattern(
                    args.pattern, args.start, args.end, args.width_ns
                )
            elif args.attribution == "stored":
                import glob as _glob

                from metricq_db_hta_spark.operators.retention import (
                    retention_floors,
                )

                cws = sorted(
                    (
                        int(os.path.basename(d).split("_", 1)[1])
                        for d in _glob.glob(
                            os.path.join(args.store, "counter_*")
                        )
                        if os.path.basename(d).split("_", 1)[1].isdigit()
                    ),
                    reverse=True,
                )
                cws = [w for w in cws if args.width_ns % w == 0]
                if not cws:
                    print(
                        "attribution=stored needs a maintained counter_<w> "
                        "level dividing --width-ns (writer: --counter-levels)"
                    )
                    return 2
                counter = spark.read.parquet(
                    os.path.join(args.store, f"counter_{cws[0]}")
                )
                floors = retention_floors(args.store)
                # clamp to the COUNTER table's own retention floor, like
                # the serve RPC: interior buckets below it are gone from
                # the level rows, so serving the range unclamped would
                # return silently-short history with no gap line
                start = args.start
                cfloor = floors.get(f"counter_{cws[0]}", 0)
                if cfloor > start:
                    print(
                        f"clamped start to counter_{cws[0]} retention "
                        f"floor {cfloor}",
                        file=sys.stderr,
                    )
                    start = cfloor
                from metricq_db_hta_spark.plans.history import glob_match
                from metricq_db_hta_spark.streaming import store_meta

                all_gaps = store_meta.counter_coverage_gaps(
                    args.store, cws[0]
                )
                if args.pattern is None:
                    cov = all_gaps.get(args.metric, [])
                else:
                    cov = [
                        s
                        for m, sp in all_gaps.items()
                        if glob_match(m, args.pattern)
                        for s in sp
                    ]
                df, gaps = svc.counter_rate_timeline_stored(
                    counter, cws[0], args.metric, start, args.end,
                    args.width_ns,
                    raw_floor_ns=floors.get("raw", 0),
                    pattern=args.pattern,
                    coverage_gaps=[
                        (lo, hi)
                        for lo, hi in cov
                        if lo < args.end and hi > start
                    ],
                )
                for lo, hi in gaps:
                    print(f"uncovered: [{lo}, {hi})", file=sys.stderr)
            else:
                df = svc.counter_rate_timeline(
                    args.metric, args.start, args.end, args.width_ns
                )
        elif args.type == "resample":
            if args.metric is None or args.end == TS_MAX_NS or args.step_ns <= 0:
                print("resample requires --metric, a finite --end and --step-ns")
                return 2
            from metricq_db_hta_spark.plans.history import resample_linear

            df = resample_linear(
                svc.raw, args.metric, args.start, args.end, args.step_ns
            )
        else:
            df = svc.last_value(args.metric, pattern=args.pattern)
        df.show(100, truncate=False)
        return 0

    if args.cmd == "compact":
        from metricq_db_hta_spark.operators import maintenance

        # recover/compact raise RuntimeError with operator-actionable
        # messages (fresh writing-state journal -> liveness guard, journal
        # present -> run recover first, post-compact verify mismatch). Those
        # are expected operational outcomes, not bugs: print the message and
        # exit nonzero instead of dumping a traceback (round-8 ADVICE).
        try:
            action = maintenance.recover_compaction(
                args.store, force=args.force_recover
            )
            if action != "none":
                print(f"recovered prior compaction: {action}", file=sys.stderr)
            res = maintenance.compact_raw(
                spark,
                args.store,
                min_batches=args.min_batches,
                defer_source_delete=args.defer_delete,
            )
        except RuntimeError as e:
            print(f"compact: {e}", file=sys.stderr)
            return 2
        if res is None:
            print("nothing to compact", file=sys.stderr)
        else:
            print(
                f"compacted batches {res.sources} -> {res.dest}: "
                f"{res.n_files_before} files -> {res.n_files_after} "
                f"({res.n_rows} rows)",
                file=sys.stderr,
            )
        return 0

    if args.cmd == "export":
        # raw-sample interchange dump: the journal-honoring read path,
        # (metric, time)-pruned, written via the schema-pinned format
        # writers (sources/formats.py — CSV timestamps survive a
        # round-trip; see that module's fidelity notes)
        import os as _os

        from pyspark.sql import functions as F

        from metricq_db_hta_spark.plans.history import (
            _time_pruned,
            glob_to_like,
        )
        from metricq_db_hta_spark.plans.serve import build_history_service
        from metricq_db_hta_spark.sources import formats

        if args.metric is not None and args.pattern is not None:
            print("export: pass at most one of --metric / --pattern")
            return 2
        if _os.path.exists(args.dest):
            print(f"export: destination already exists: {args.dest}")
            return 2
        try:
            raw = build_history_service(spark, args.store).raw
        except (ValueError, RuntimeError) as e:
            print(f"export: {e}", file=sys.stderr)
            return 1
        if args.metric is not None:
            raw = raw.filter(F.col("metric") == args.metric)
        elif args.pattern is not None:
            raw = raw.filter(F.col("metric").like(glob_to_like(args.pattern)))
        raw = _time_pruned(raw, args.start, args.end).filter(
            (F.col("ts_ns") >= args.start) & (F.col("ts_ns") < args.end)
        )
        out = raw.select("metric", "ts_ns", "value", "event_id").orderBy(
            "metric", "ts_ns"
        )
        if args.format == "csv":
            formats.write_csv(out, args.dest)
        elif args.format == "jsonl":
            formats.write_jsonl(out, args.dest)
        else:
            out.write.parquet(args.dest)
        print(f"exported to {args.dest} ({args.format})", file=sys.stderr)
        return 0

    if args.cmd == "sql":
        from metricq_db_hta_spark.plans.serve import register_store_views

        try:
            views = register_store_views(spark, args.store)
        except (ValueError, RuntimeError) as e:
            print(f"sql: {e}", file=sys.stderr)
            return 1
        print(f"views: {', '.join(views)}", file=sys.stderr)
        from pyspark.sql.utils import AnalysisException

        try:
            if args.explain:
                spark.sql(args.query).explain("formatted")
            else:
                spark.sql(args.query).show(args.max_rows, truncate=False)
        except AnalysisException as e:
            # bad SQL is an operator typo, not an engine bug: one line
            print(f"sql: {e.getMessage() if hasattr(e, 'getMessage') else e}",
                  file=sys.stderr)
            return 2
        return 0

    if args.cmd == "fsck":
        import json as _json

        from metricq_db_hta_spark.operators.fsck import (
            check_store,
            rebuild_levels,
        )

        try:
            rep = check_store(
                spark, args.store, start_ns=args.start, end_ns=args.end
            )
            if args.repair and not rep.ok:
                rewritten = rebuild_levels(spark, args.store)
                print(f"rebuilt partitions: {rewritten}", file=sys.stderr)
                rep = check_store(
                    spark, args.store, start_ns=args.start, end_ns=args.end
                )
        except (ValueError, RuntimeError) as e:
            print(f"fsck: {e}", file=sys.stderr)
            return 2
        print(
            _json.dumps(
                {
                    "ok": rep.ok,
                    "levels": [
                        {
                            "table": r.table,
                            "checked": r.n_checked,
                            "mismatched": r.n_mismatched,
                            "examples": r.examples,
                        }
                        for r in rep.levels
                    ],
                    "uncommitted_batches": rep.uncommitted_batches,
                    "journal_pending": rep.journal_pending,
                },
                indent=2,
                default=str,
            )
        )
        return 0 if rep.ok else 1

    if args.cmd == "serve":
        import time

        from metricq_db_hta_spark.plans.serve import HistoryServer

        # default: follow the writer's actual level set (store layout)
        widths = (
            None
            if args.levels is None
            else [args.width_ns * 10**k for k in range(args.levels)]
        )
        # dedicated serving session -> static-plan policy on (see
        # HistoryServer.__init__): every request is a level-router plan
        server, port = HistoryServer(
            spark, args.store, widths, static_plans=True
        ).start_background(args.host, args.port)
        print(f"history service listening on {args.host}:{port}", file=sys.stderr)
        try:
            while True:
                time.sleep(3600)
        except KeyboardInterrupt:
            server.shutdown()
        return 0

    from metricq_db_hta_spark.queries import REGISTRY

    if args.name not in REGISTRY:
        print(
            f"unknown query {args.name!r}; available: {', '.join(sorted(REGISTRY))}",
            file=sys.stderr,
        )
        return 2
    REGISTRY[args.name].spark(spark, args.sf_dir).show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
