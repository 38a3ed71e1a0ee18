#!/usr/bin/env python
"""Per-query ratio-vs-scale curve (VERDICT r8 next-step 2).

The 2x bench bar fails at sf1 because DuckDB's denominators (13-122 ms)
sit below Spark's ~0.06-0.08 s per-query scheduling floor; the whole
design-for-scale argument rests on the measured ratio falling with data
size. This script settles it with data instead of extrapolation: the FULL
14-query headline set, cold + resident, Spark vs DuckDB on the SAME
parquet, at sf3 (30x sf0.1) and sf10 (100x sf0.1) built by the bench's
own replication recipe (bench.build_replica — same data family as the
sf1 venue, so the curve's points are comparable).

Writes SCALE_SWEEP.json {sf: {query: {cold, resident, spread, duckdb,
ratio_resident}}} and prints a per-query ratio table. SCALE.md §6b cites
the output.

Usage: python scripts/scale_sweep.py [--reps 30 100] [--sweeps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

import bench  # noqa: E402
from metricq_db_hta_spark import get_spark  # noqa: E402
from metricq_db_hta_spark.queries import REGISTRY  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, nargs="+", default=[30, 100],
                    help="replication factors of sf0.1 to sweep (30=sf3, 100=sf10)")
    ap.add_argument("--sweeps", type=int, default=3,
                    help="resident sweeps per scale (bench default 3)")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = get_spark("scale_sweep")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup
    names = [n for n, s in REGISTRY.items() if s.bench]

    out_path = os.path.join(REPO, "SCALE_SWEEP.json")
    try:
        with open(out_path) as f:
            result = json.load(f)
    except (OSError, ValueError):
        result = {}

    for reps in args.reps:
        sf_label = f"sf{reps / 10:g}"
        print(f"== building {sf_label} ({reps}x {args.sf_dir}) ==", flush=True)
        data_dir = bench.build_replica(args.sf_dir, reps)
        nb = bench.prewarm_files(data_dir)  # warm-warm cache protocol
        print(f"== prewarmed {nb/1e9:.2f} GB ==", flush=True)
        print(f"== spark {sf_label} ==", flush=True)
        cold, resident, spread = bench.time_spark(
            spark, names, data_dir, resident_sweeps=args.sweeps
        )
        print(f"== duckdb {sf_label} ==", flush=True)
        duck = bench.time_duckdb(names, data_dir, sweeps=args.sweeps)
        entry: dict[str, dict] = {}
        for n in names:
            d = duck.get(n)
            entry[n] = {
                "cold": cold[n],
                "resident": resident[n],
                "spread": spread[n],
                "duckdb": d,
                "ratio_cold": round(cold[n] / d, 2) if d else None,
                "ratio_resident": round(resident[n] / d, 2) if d else None,
            }
        tot_c = round(sum(cold.values()), 3)
        tot_r = round(sum(resident.values()), 3)
        tot_d = round(sum(duck.values()), 3)
        result[sf_label] = {
            "reps": reps,
            "cache_protocol": "warm-warm (+ per-phase re-prewarm inside "
            "time_duckdb; both engines min over identical "
            "warm-then-measure sweeps): every replica file read into "
            "the page cache before either engine runs (bench.prewarm_files)",
            "queries": entry,
            "total_cold": tot_c,
            "total_resident": tot_r,
            "total_duckdb": tot_d,
            "ratio_cold": round(tot_c / tot_d, 2),
            "ratio_resident": round(tot_r / tot_d, 2),
        }
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1)
        print(f"{sf_label}: cold {tot_c}s resident {tot_r}s duckdb {tot_d}s "
              f"ratio {result[sf_label]['ratio_cold']}x cold / "
              f"{result[sf_label]['ratio_resident']}x resident", flush=True)

    # final table across all recorded scales
    scales = sorted(result, key=lambda s: result[s]["reps"])
    hdr = "query".ljust(34) + "".join(f"{s:>12}" for s in scales)
    print("\nresident ratio vs DuckDB (rows = headline queries)")
    print(hdr)
    for n in names:
        row = n.ljust(34)
        for s in scales:
            q = result[s]["queries"].get(n, {})
            r = q.get("ratio_resident")
            row += f"{r if r is not None else '-':>12}"
        print(row)
    print("total".ljust(34) + "".join(
        f"{result[s]['ratio_resident']:>12}" for s in scales))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
